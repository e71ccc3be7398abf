from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
