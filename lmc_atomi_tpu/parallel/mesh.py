"""Device-mesh parallelism: chain farming and image-state sharding.

The reference has no distributed execution at all (SURVEY.md §2c): its
multi-chain scaffolding is plumbed but unused (jax/lmc_jax.py:44-49, 267).
Here the scaling axes are explicit and TPU-native (single-controller JAX over
an ICI mesh; SURVEY.md §5 "distributed communication backend"):

  * ``chains`` axis — embarrassingly parallel chain farms via ``shard_map``;
    per-device partial streaming moments are merged with ``psum``-style tree
    reductions (``RunningMoments.merge``);
  * ``row``/``col`` axes — 2-D sharding of large image states under ``jit``
    with ``NamedSharding``; XLA inserts the FFT/conv collectives over ICI.

On CPU hosts these paths are exercised with the standard
``--xla_force_host_platform_device_count`` virtual topology.
"""
from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from lmc_atomi_tpu.core.random import as_key, chain_keys
from lmc_atomi_tpu.run.runner import ChainResult, run_chain

__all__ = [
    "chain_mesh",
    "image_mesh",
    "run_chains_sharded",
    "merge_chain_moments",
    "shard_image",
]


def chain_mesh(n_devices: Optional[int] = None, axis: str = "chains") -> Mesh:
    """1-D mesh over (a prefix of) the available devices.

    Axis type Auto: GSPMD propagates shardings and inserts collectives (jax
    0.9's ``make_mesh`` default of Explicit axes rejects halo-producing
    slices, so Auto is the right mode for stencil/FFT workloads)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh(
        (n,), (axis,), devices=devs[:n], axis_types=(AxisType.Auto,)
    )


def image_mesh(
    chains: int = 1, rows: int = 1, cols: int = 1, devices=None
) -> Mesh:
    """3-D mesh (chains, row, col) for chain-parallel + image-sharded runs."""
    devs = devices if devices is not None else jax.devices()
    need = chains * rows * cols
    return jax.make_mesh(
        (chains, rows, cols),
        ("chains", "row", "col"),
        devices=devs[:need],
        axis_types=(AxisType.Auto,) * 3,
    )


def run_chains_sharded(
    kernel,
    x0,
    key,
    n_steps: int,
    n_chains: int,
    mesh: Optional[Mesh] = None,
    axis: str = "chains",
    batched: Optional[bool] = None,
    **kwargs,
) -> ChainResult:
    """Shard ``n_chains`` independent chains across the mesh axis.

    Each device runs ``n_chains / axis_size`` chains with its own folded base
    keys; all ChainResult leaves come back with a global leading chain axis.
    ``x0`` may be a single position (broadcast) or carry a leading chain
    axis (per-chain starts); ``batched`` overrides the shape inference as in
    ``run_chains``.
    """
    mesh = mesh if mesh is not None else chain_mesh()
    n_dev = mesh.shape[axis]
    if n_chains % n_dev != 0:
        raise ValueError(f"n_chains={n_chains} not divisible by mesh axis {n_dev}")

    key = as_key(key)
    keys = chain_keys(key, n_chains)
    if batched is None:
        x0_leaves = jax.tree.leaves(x0)
        batched = len(x0_leaves) > 0 and all(
            hasattr(l, "shape") and l.ndim > 0 and l.shape[0] == n_chains
            for l in x0_leaves
        )
    x0b = x0 if batched else jax.tree.map(
        lambda l: jnp.broadcast_to(l, (n_chains,) + jnp.shape(l)), x0
    )

    def local_run(x0_local, keys_local):
        return jax.vmap(lambda x, k: run_chain(kernel, x, k, n_steps, **kwargs))(
            x0_local, keys_local
        )

    shard_fn = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    if len(mesh.devices.ravel()) > len(jax.local_devices()):
        # Multi-process mesh (DCN tier): jit cannot consume process-local
        # jax Arrays of global shape — hand it host numpy (identical on
        # every process by construction: same base key) and raw key data
        # (run_chain's as_key re-wraps uint32 rows).
        import numpy as _np

        keys = _np.asarray(jax.random.key_data(keys))
        x0b = jax.tree.map(lambda l: _np.asarray(jax.device_get(l)), x0b)
    return jax.jit(shard_fn)(x0b, keys)


def merge_chain_moments(moments):
    """Merge per-chain RunningMoments (leading chain axis) into pooled
    moments — the cross-device posterior-statistic reduction. Gathers the
    (small) per-chain summaries to host first so indexing is shard-free."""
    def fetch(l):
        # Multi-process (DCN tier): shards live on other hosts — allgather
        # the (small) per-chain summaries; device_get only sees local
        # shards. Under jit (tracers) the merge stays on-device: indexing a
        # sharded traced array is fine, XLA inserts the collectives.
        if isinstance(l, jax.core.Tracer):
            return l
        if isinstance(l, jax.Array) and not l.is_fully_addressable:
            from jax.experimental import multihost_utils

            return jnp.asarray(multihost_utils.process_allgather(l, tiled=True))
        return jnp.asarray(jax.device_get(l))

    moments = jax.tree.map(fetch, moments)
    n = jax.tree.leaves(moments.count)[0].shape[0]
    pooled = jax.tree.map(lambda l: l[0], moments)
    for i in range(1, n):
        pooled = pooled.merge(jax.tree.map(lambda l: l[i], moments))
    return pooled


def shard_image(x, mesh: Mesh, row_axis: str = "row", col_axis: str = "col"):
    """Place a 2-D image with (row, col) sharding on the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(row_axis, col_axis)))
