from decompdiff_tpu.guidance.funcs import (
    center_prox_energy, armsca_prox_energy, clash_energy, arms_repul_energy)
