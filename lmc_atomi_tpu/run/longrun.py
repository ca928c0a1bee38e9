"""Resumable long-run driver: checkpointed scan segments.

1e5-step imaging runs (the north-star scale, BASELINE.json) execute as
host-level segments of one jitted scan each; after every segment the full
bundle — sampler state, streaming moments, base key, emitted count — is
checkpointed, so a preempted run resumes mid-trajectory with bit-identical
continuation (the per-step keys are folds of the base key by the *global*
step counter carried in the state).

The reference has no such mechanism (SURVEY.md §5: failed 80k-step runs
rerun from scratch).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from lmc_atomi_tpu.core.random import as_key, chain_keys, step_key
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.kernels.base import Kernel

__all__ = ["run_resumable", "run_resumable_fused"]


def run_resumable(
    kernel: Kernel,
    x0,
    key,
    total_steps: int,
    segment_steps: int,
    ckpt_path: Optional[str] = None,
    burn_in: int = 0,
    progress: Optional[Callable[[int, dict], None]] = None,
):
    """Run ``total_steps`` kernel steps in checkpointed segments.

    Streaming moments accumulate past ``burn_in`` (in steps). Returns a dict
    bundle ``{state, moments, key, done}``. If ``ckpt_path`` exists, resumes
    from it.
    """
    key = as_key(key)
    state = kernel.init(x0)
    bundle = {
        "state": state,
        "moments": RunningMoments.init(state.position),
        "key": key,
        "done": jnp.zeros((), jnp.int32),
    }
    if ckpt_path and os.path.exists(ckpt_path):
        bundle = restore_checkpoint(ckpt_path, bundle)

    import functools

    @functools.partial(jax.jit, static_argnames="n_steps")
    def segment(bundle, n_steps):
        def body(carry, _):
            st, mom = carry
            k = step_key(bundle["key"], st.step)
            st, info = kernel.step(st, k)
            w = (st.step > burn_in).astype(jnp.int32)
            mom = mom.update(st.position, weight=w)
            return (st, mom), None

        (st, mom), _ = jax.lax.scan(
            body,
            (bundle["state"], bundle["moments"]),
            None,
            length=n_steps,
        )
        return {
            "state": st,
            "moments": mom,
            "key": bundle["key"],
            "done": bundle["done"] + n_steps,
        }

    while int(bundle["done"]) < total_steps:
        # truncate the final segment so exactly total_steps run (the tail
        # length compiles once more; results stay comparable across
        # segment_steps choices)
        n = min(segment_steps, total_steps - int(bundle["done"]))
        bundle = segment(bundle, n)
        jax.block_until_ready(bundle["state"].position)
        # failure detection: a diverged chain is caught at the segment
        # boundary, before the checkpoint is overwritten, so the last good
        # checkpoint stays restorable (SURVEY.md §5 — the reference reruns
        # 80k-step jobs from scratch on failure)
        finite = bool(
            jnp.all(
                jnp.stack(
                    [jnp.isfinite(l).all() for l in jax.tree.leaves(
                        bundle["state"].position)]
                )
            )
        )
        if not finite:
            raise FloatingPointError(
                f"chain diverged (non-finite position) before step "
                f"{int(bundle['done'])}; last checkpoint at "
                f"{int(bundle['done']) - segment_steps} steps"
                + (f" in {ckpt_path}" if ckpt_path else "")
            )
        if ckpt_path:
            save_checkpoint(ckpt_path, bundle)
        if progress is not None:
            progress(int(bundle["done"]), bundle)
    return bundle


def run_resumable_fused(
    l2,
    tv_sigma: float,
    tau,
    gamma,
    x0,
    key,
    total_steps: int,
    segment_steps: int,
    ckpt_path: Optional[str] = None,
    burn_in: int = 0,
    progress: Optional[Callable[[int, dict], None]] = None,
    runner: str = "tv",
    chains_mesh=None,
    **fused_kwargs,
):
    """Checkpointed long MYULA runs on the block-fused TPU path.

    Same bundle/checkpoint/failure-detection contract as
    :func:`run_resumable`, but each segment is ONE
    ``run_myula_tv_fused`` call (the image stays in VMEM across the
    segment's steps), so a checkpointed 1e5-step run costs nearly the same
    as the monolithic one. Per-segment PRNG keys are folds of the base key
    by the segment's ABSOLUTE start step (not the segment ordinal), so a
    preempted run resumes bit-identically — re-running an interrupted
    segment reproduces the same draws — and resuming a checkpoint with a
    *different* ``segment_steps`` than the run that wrote it still never
    reuses a fold index (distinct start steps -> distinct noise streams).
    Per-segment moments merge into the bundle via the exact Chan et al.
    parallel-Welford combine.

    ``runner`` selects the fused chain: ``"tv"`` (default,
    ``run_myula_tv_fused`` — ``tv_sigma`` is the TV weight),
    ``"wavelet"`` (``run_myula_wavelet_fused`` on an ``L2Data(Mask)``
    inpainting posterior — ``tv_sigma`` is the wavelet-l1 weight ``lam``;
    ``levels``/``taps`` pass through ``fused_kwargs``), ``"tiled"``
    (``run_myula_tv_tiled``, the row-band kernel for 2048^2-scale images;
    ``segment_steps`` must be even), or ``"ulpda_tiled"``
    (``run_ulpda_tv_tiled`` — primal-dual at the tiled scale; ``tv_sigma``
    is the L21 dual weight and ``gamma`` is the dual step ``mu``; the
    persistent duals + extrapolation state ride the bundle/checkpoint, so
    a preempted primal-dual run resumes exactly). All carry the in-kernel
    P^2 ``quantiles`` stream through checkpoints.

    CHAIN-FARM MODE: an ``x0`` of shape ``(n_chains, ny, nx)`` runs
    ``n_chains`` independent chains of the same posterior, each segment a
    single vmapped fused call with per-chain fold keys. ``chains_mesh`` (a
    one-axis ``jax.sharding.Mesh`` named ``"chains"``) additionally
    shard_maps the farm across devices — the checkpointed multi-device
    production path: per-chain moments/quantile markers ride in the bundle,
    so a preempted farm resumes bit-identically on a fresh slice, and
    pooled stats + Gelman-Rubin come from
    ``eval.diagnostics.rhat_from_moments`` on the per-chain moments.
    """
    import functools as _ft

    from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
    from lmc_atomi_tpu.kernels.wavelet_fused import run_myula_wavelet_fused

    key = as_key(key)
    x0 = jnp.asarray(x0)
    multi = x0.ndim == 3
    n_chains = x0.shape[0] if multi else 0
    field_shape = x0.shape[-2:]
    quantiles = tuple(float(p) for p in fused_kwargs.pop("quantiles", ()))
    bundle = {
        "position": x0,
        # per-chain counts in farm mode (vmapped init/merge): Chan combine
        # broadcasting expects count/field ranks to pair up per chain
        "moments": (
            jax.vmap(RunningMoments.init)(x0) if multi
            else RunningMoments.init(x0)
        ),
        "key": key,
        "done": jnp.zeros((), jnp.int32),
    }
    if quantiles:
        n_q = len(quantiles)
        lead = (n_chains,) if multi else ()
        qn0 = jnp.tile(
            jnp.arange(2.0, 5.0, dtype=x0.dtype)[:, None, None],
            (n_q,) + field_shape,
        )
        bundle["quantile_state"] = (
            jnp.zeros(lead + (5 * n_q,) + field_shape, x0.dtype),
            # interior marker positions (n1, n2, n3); extremes implicit
            jnp.broadcast_to(qn0, lead + qn0.shape) if multi else qn0,
        )
    if runner == "ulpda_tiled":
        # persistent primal-dual state: stacked (py, px) duals + the
        # PREVIOUS primal iterate (x_prev = x0 is the cold start; the
        # exact xprev handoff keeps segmented == monolithic bit-wise —
        # inverting xbar instead costs a rounding the theta-extrapolated
        # iteration amplifies exponentially)
        lead = (n_chains,) if multi else ()
        bundle["ulpda_extras"] = (
            jnp.zeros(lead + (2,) + field_shape, x0.dtype),
            x0,
        )
    if ckpt_path and os.path.exists(ckpt_path):
        bundle = restore_checkpoint(ckpt_path, bundle)

    def _one_chain(x, k, n, off, qstate, extras):
        if runner == "wavelet":
            return run_myula_wavelet_fused(
                l2, tv_sigma, tau, gamma, x, k, n, burn_in=burn_in,
                quantiles=quantiles, quantile_state=qstate,
                step_offset=off, **fused_kwargs,
            )
        if runner == "tiled":
            # row-band tiled kernel (2048^2-scale production path);
            # segments must be even (parity-paired steps)
            from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled

            return run_myula_tv_tiled(
                l2, tv_sigma, tau, gamma, x, k, n, burn_in=burn_in,
                quantiles=quantiles, quantile_state=qstate,
                step_offset=off, **fused_kwargs,
            )
        if runner == "ulpda_tiled":
            from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled
            from lmc_atomi_tpu.ops.functionals import L21Norm
            from lmc_atomi_tpu.ops.linops import Gradient2D

            y0, xprev0 = extras
            return run_ulpda_tv_tiled(
                l2, L21Norm(sigma=tv_sigma), Gradient2D(), tau, gamma,
                x, k, n, burn_in=burn_in, quantiles=quantiles,
                quantile_state=qstate, step_offset=off, y0=y0,
                xprev0=xprev0, **fused_kwargs,
            )
        return run_myula_tv_fused(
            l2, tv_sigma, tau, gamma, x, k, n, burn_in=burn_in,
            quantiles=quantiles, quantile_state=qstate, step_offset=off,
            **fused_kwargs,
        )

    # jit the segment runner ONCE: eager per-segment calls re-trace the
    # block scan every segment (~16 s each at 512^2). The global start step
    # (`off` = done) is traced, so only distinct tail lengths recompile.
    @_ft.partial(jax.jit, static_argnames="n")
    def run_seg(x, k, n, off, qstate, extras):
        if not multi:
            return _one_chain(x, k, n, off, qstate, extras)
        ks = chain_keys(k, n_chains)
        # `off` rides through explicitly (closed-over tracers do not cross
        # a shard_map boundary)
        farm = jax.vmap(
            lambda xi, ki, qi, offi, ei: _one_chain(xi, ki, n, offi, qi, ei),
            in_axes=(0, 0, 0 if quantiles else None, None, 0),
        )
        if chains_mesh is not None:
            from jax.sharding import PartitionSpec as P

            c = P("chains")
            farm = jax.shard_map(
                farm, mesh=chains_mesh,
                in_specs=(c, c, c if quantiles else P(), P(),
                          c if runner == "ulpda_tiled" else P()),
                out_specs=c, check_vma=False,
            )
        return farm(x, ks, qstate, off, extras)

    while int(bundle["done"]) < total_steps:
        done = int(bundle["done"])
        n = min(segment_steps, total_steps - done)
        res = run_seg(
            bundle["position"], step_key(bundle["key"], done), n,
            bundle["done"], bundle.get("quantile_state"),
            bundle.get("ulpda_extras"),
        )
        pos = res.final_state.position
        jax.block_until_ready(pos)
        if not bool(jnp.isfinite(pos).all()):
            raise FloatingPointError(
                f"chain diverged (non-finite position) before step "
                f"{done + n}; last checkpoint at {done} steps"
                + (f" in {ckpt_path}" if ckpt_path else "")
            )
        merged = (
            jax.vmap(lambda a, b: a.merge(b))(bundle["moments"], res.moments)
            if multi else bundle["moments"].merge(res.moments)
        )
        bundle = {
            "position": pos,
            "moments": merged,
            "key": bundle["key"],
            "done": bundle["done"] + n,
        }
        if quantiles:
            bundle["quantile_state"] = res.quantile_state
        if runner == "ulpda_tiled":
            bundle["ulpda_extras"] = (
                res.final_state.extras.y, res.final_state.extras.xprev,
            )
        if ckpt_path:
            save_checkpoint(ckpt_path, bundle)
        if progress is not None:
            progress(int(bundle["done"]), bundle)
    if quantiles:
        qh = bundle["quantile_state"][0]
        bundle["quantiles"] = {
            p: qh[..., 5 * j + 2, :, :] for j, p in enumerate(quantiles)
        }
    return bundle
