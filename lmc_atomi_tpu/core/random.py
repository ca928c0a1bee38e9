"""PRNG key management.

TPU-native replacement for the reference's host-side NumPy PCG64 generators
(reference lmc.py:96, algs.py:431, algs.py:561) and for scipy's
``multivariate_normal.rvs`` (reference algs.py:433,565): all noise is drawn
on-chip with JAX's threefry2x32 counter-based PRNG from splittable keys.

Key discipline: one *base* key per run; per-chain keys by ``fold_in`` with the
chain index; per-step keys by ``fold_in`` with the step index. This fixes the
key-reuse defect of the reference JAX port (reference jax/lmc_jax.py:111-114,
which re-used a single key every iteration).
"""
from __future__ import annotations



import jax
import jax.numpy as jnp

__all__ = [
    "as_key",
    "step_key",
    "chain_keys",
    "normal_like",
]


def as_key(seed_or_key) -> jax.Array:
    """Coerce an int seed or an existing PRNG key to a PRNG key."""
    if isinstance(seed_or_key, jax.Array) and jnp.issubdtype(
        seed_or_key.dtype, jax.dtypes.prng_key
    ):
        return seed_or_key
    if isinstance(seed_or_key, jax.Array) and seed_or_key.dtype == jnp.uint32:
        return jax.random.wrap_key_data(seed_or_key)
    return jax.random.PRNGKey(int(seed_or_key))


def step_key(base: jax.Array, step) -> jax.Array:
    """Key for step ``step`` of a chain: fold the step counter into the base."""
    return jax.random.fold_in(base, step)


def chain_keys(base: jax.Array, n_chains: int) -> jax.Array:
    """Independent per-chain base keys (vmap/shard over leading axis)."""
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(n_chains))


def normal_like(key: jax.Array, x: jax.Array) -> jax.Array:
    """Standard normal noise with the shape/dtype of ``x``."""
    return jax.random.normal(key, x.shape, x.dtype)
