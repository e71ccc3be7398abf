"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware (the JAX analog of a fake distributed
backend; see SURVEY.md §4).

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
we must also force the platform through jax.config before any computation.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
# persistent compilation cache: repeat suite runs skip XLA compiles
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
