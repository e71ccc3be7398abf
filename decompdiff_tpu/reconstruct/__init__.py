from decompdiff_tpu.reconstruct.builder import (
    MolReconsError, reconstruct_from_generated_with_bond,
    reconstruct_from_generated, mol_record_from_prediction)
