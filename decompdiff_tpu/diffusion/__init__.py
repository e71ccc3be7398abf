from decompdiff_tpu.diffusion.schedules import (
    cosine_alpha_schedule, get_beta_schedule)
from decompdiff_tpu.diffusion.gaussian import GaussianDiffusion
from decompdiff_tpu.diffusion.categorical import CategoricalDiffusion
