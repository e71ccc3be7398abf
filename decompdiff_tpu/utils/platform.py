"""Platform selection workaround: the axon TPU plugin in this image ignores
the JAX_PLATFORMS environment variable, so scripts must re-apply it through
jax.config before the backend initializes."""

import os


def apply_platform_env() -> None:
    platforms = os.environ.get('JAX_PLATFORMS')
    if not platforms:
        return
    import jax
    try:
        jax.config.update('jax_platforms', platforms)
    except Exception:
        pass
