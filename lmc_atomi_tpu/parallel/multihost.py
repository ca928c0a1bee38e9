"""Multi-slice / multi-host chain farms (DCN tier).

Within one slice, chains and image shards ride ICI (parallel/mesh.py). For
cross-slice chain farms the TPU-native recipe (SURVEY.md §5) is
single-controller-per-host JAX: ``jax.distributed.initialize``, a global
mesh whose leading axis spans slices over DCN, and host-local data with
``make_array_from_process_local_data``. Chains are embarrassingly parallel,
so the only DCN traffic is the final streaming-moment reduction.

Only the coordination-free pieces can execute in this single-host image;
``init_multihost`` is a no-op when world size is 1 so the same driver script
runs everywhere.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from lmc_atomi_tpu.parallel.mesh import chain_mesh, merge_chain_moments, run_chains_sharded

__all__ = ["init_multihost", "global_chain_farm"]


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed when running multi-process; returns the
    process count. Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    num = int(
        num_processes
        if num_processes is not None
        else os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    if num <= 1:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=int(
            process_id
            if process_id is not None
            else os.environ.get("JAX_PROCESS_ID", "0")
        ),
    )
    return num


def global_chain_farm(kernel, x0, key, n_steps: int, n_chains: int, **kwargs):
    """Run a chain farm over ALL addressable devices (one global mesh; the
    leading ``chains`` axis spans slices when launched multi-process) and
    return (per-chain ChainResult, pooled RunningMoments or None)."""
    mesh = chain_mesh()
    res = run_chains_sharded(
        kernel, x0, key, n_steps, n_chains, mesh=mesh, **kwargs
    )
    pooled = merge_chain_moments(res.moments) if res.moments is not None else None
    return res, pooled
