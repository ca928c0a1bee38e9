from lmc_atomi_tpu.utils.cli import auto_cli
from lmc_atomi_tpu.utils.images import phantom

__all__ = ["auto_cli", "phantom"]


def default_real_dtype():
    """float64 when x64 is actually enabled (e.g. CPU parity runs), else
    float32 — requesting f64 without jax_enable_x64 silently truncates."""
    import jax
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
