"""Chain runners: one jitted ``lax.scan`` over steps, ``vmap`` over chains.

Replaces the reference's per-step Python loops and host RNG (lmc.py:99-104,
algs.py:432-467) and its sample-hoarding memory pattern
(prox_lmc_deconv.py:474-475). Three collection modes, combinable:

  * ``collect="samples"`` — stack (thinned) positions, the small-d mixture
    workloads;
  * ``collect="stats"`` — streaming Welford moments (+ optional P^2
    quantiles) of the position in HBM, the 512^2 imaging workloads;
  * ``collect="both"`` — thinned samples AND streaming stats in one pass;
  * ``collect="last"`` — final state only.

``metrics`` is a dict of jittable ``fn(position) -> scalar/array`` evaluated
every emitted step and stacked — the TPU-native equivalent of the reference's
per-iteration callbacks (cost/err/SNR/PSNR/MSE, prox_lmc_deconv.py:128-133).

Per-step keys are folded from one base key (core.random discipline); chains
get independent folded base keys.
"""
from __future__ import annotations


from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import as_key, chain_keys, step_key
from lmc_atomi_tpu.core.state import SamplerState
from lmc_atomi_tpu.core.stats import RunningMoments, RunningQuantile
from lmc_atomi_tpu.kernels.base import Kernel

__all__ = [
    "ChainResult",
    "run_chain",
    "run_chains",
    "run_chain_jit",
    "run_chains_jit",
]


class ChainResult(NamedTuple):
    final_state: SamplerState
    samples: Optional[Any]  # (n_emitted, *shape) when collect includes samples
    infos: Any  # stacked StepInfo pytree (n_emitted, ...)
    metrics: Optional[Dict[str, jnp.ndarray]]
    moments: Optional[RunningMoments]
    quantiles: Optional[Any]  # dict p -> RunningQuantile
    extras: Optional[Any] = None  # stacked kernel extras (e.g. ULPDA duals)


def _emit_block(kernel: Kernel, key, thin: int):
    """One emitted step = ``thin`` kernel steps; info from the last one."""

    def block(state, idx):
        def body(i, carry):
            st, _ = carry
            k = step_key(key, st.step)
            st, info = kernel.step(st, k)
            return st, info

        # Run thin steps; keep the last info. First iteration computed
        # explicitly to get the info structure.
        k0 = step_key(key, state.step)
        st, info = kernel.step(state, k0)
        if thin > 1:
            st, info = jax.lax.fori_loop(0, thin - 1, body, (st, info))
        return st, info

    return block


def run_chain(
    kernel: Kernel,
    x0,
    key,
    n_steps: int,
    *,
    collect: str = "samples",
    thin: int = 1,
    metrics: Optional[Dict[str, Callable]] = None,
    quantile_ps: tuple = (),
    burn_in: int = 0,
    init_args: tuple = (),
    collect_extras: Any = False,  # bool, or a projection fn extras -> pytree
    unroll: int = 1,
) -> ChainResult:
    """Run one chain for ``n_steps`` kernel steps (jit-compiled caller side).

    ``n_steps`` must be divisible by ``thin``; positions/metrics are emitted
    every ``thin`` steps. ``burn_in`` (in *emitted* steps) masks the streaming
    moment/quantile updates, matching "discard the first B samples" eval.
    """
    if n_steps % thin != 0:
        raise ValueError(f"n_steps={n_steps} not divisible by thin={thin}")
    n_emit = n_steps // thin

    key = as_key(key)
    state0 = kernel.init(x0, *init_args)
    if collect not in ("samples", "stats", "both", "last"):
        raise ValueError(f"unknown collect mode {collect!r}")
    want_samples = collect in ("samples", "both")
    want_stats = collect in ("stats", "both")

    moments0 = RunningMoments.init(state0.position) if want_stats else None
    quants0 = (
        {
            p: RunningQuantile.init(
                jnp.shape(state0.position), p, jnp.asarray(state0.position).dtype
            )
            for p in quantile_ps
        }
        if (want_stats and quantile_ps)
        else None
    )
    block = _emit_block(kernel, key, thin)

    def body(carry, idx):
        state, moments, quants = carry
        state, info = block(state, idx)
        out = {"info": info}
        if want_samples:
            out["position"] = state.position
        if collect_extras:
            # e.g. ULPDA dual-variable samples (the reference's returny,
            # algs.py:429-451). A callable projects the extras pytree before
            # stacking — essential when extras hold large state (CSGLD's
            # (num_partitions,) energy histogram would stack to an
            # (n_emit, num_partitions) array otherwise).
            out["extras"] = (
                collect_extras(state.extras)
                if callable(collect_extras)
                else state.extras
            )
        if metrics:
            out["metrics"] = {name: fn(state.position) for name, fn in metrics.items()}
        if want_stats:
            w = (idx >= burn_in).astype(jnp.int32)
            moments = moments.update(state.position, weight=w)
            if quants is not None:
                quants = {
                    p: jax.lax.cond(
                        w > 0, lambda q: q.update(state.position), lambda q: q, q
                    )
                    for p, q in quants.items()
                }
        return (state, moments, quants), out

    (final_state, moments, quants), outs = jax.lax.scan(
        body,
        (state0, moments0, quants0),
        jnp.arange(n_emit),
        unroll=unroll,
    )
    return ChainResult(
        final_state=final_state,
        samples=outs.get("position"),
        infos=outs["info"],
        metrics=outs.get("metrics"),
        moments=moments,
        quantiles=quants,
        extras=outs.get("extras"),
    )


def run_chains(
    kernel: Kernel,
    x0,
    key,
    n_steps: int,
    n_chains: int,
    *,
    axis: int = 0,
    batched: Optional[bool] = None,
    **kwargs,
) -> ChainResult:
    """vmap ``run_chain`` over ``n_chains`` independent chains.

    ``x0`` is either a single position (broadcast to all chains) or a batched
    pytree with leading chain axis. The per-chain base keys are folds of
    ``key`` — the multi-chain scaffolding the reference plumbed but never used
    (jax/lmc_jax.py:44-49, 267; SURVEY.md §2c P1).

    ``batched`` disambiguates the corner case where a *single* position's
    leading dimension equals ``n_chains`` (e.g. a 4-dim state with 4 chains):
    pass ``batched=False`` to broadcast, ``batched=True`` to treat the
    leading axis as chains; ``None`` infers from shapes.
    """
    key = as_key(key)
    keys = chain_keys(key, n_chains)
    if batched is None:
        x0_leaves = jax.tree.leaves(x0)
        batched = len(x0_leaves) > 0 and all(
            hasattr(l, "shape") and l.ndim > 0 and l.shape[0] == n_chains
            for l in x0_leaves
        )
    if not batched:
        x0 = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (n_chains,) + jnp.shape(l)), x0
        )

    def one(x, k):
        return run_chain(kernel, x, k, n_steps, **kwargs)

    return jax.vmap(one)(x0, keys)


def run_chain_segmented(
    kernel: Kernel,
    x0,
    key,
    n_steps: int,
    *,
    segment_steps: int = 250,
    burn_in: int = 0,
    init_args: tuple = (),
    quantile_ps: tuple = (),
    progress=None,
) -> ChainResult:
    """``run_chain(collect='stats')`` split into bounded device executions.

    The tunneled TPU runtime kills single executions running much past a
    minute; expensive-step chains (Radon data terms, PnP denoiser priors)
    at reference step counts exceed that in one scan. This runner executes
    ``segment_steps``-sized jitted segments in a host loop, carrying the
    sampler state (and its global step counter) across segments — per-step
    keys fold ``state.step``, so the draws, the burn-in weights, and the
    streaming Welford moments are bit-identical to the single-execution
    ``run_chain``.

    ``quantile_ps`` carries per-pixel streaming P^2 quantile state across
    segments (credible-interval maps for expensive-step chains, cf.
    ``run_chain``). ``progress(done, moments)`` is called after every
    segment — long-run convergence monitoring (e.g. running-mean PSNR per
    segment in experiments/ct.py) without hoarding samples.
    """
    import functools

    key = as_key(key)
    state = kernel.init(x0, *init_args)
    moments = RunningMoments.init(state.position)
    quants = {
        p: RunningQuantile.init(
            jnp.shape(state.position), p, jnp.asarray(state.position).dtype
        )
        for p in quantile_ps
    } or None
    block = _emit_block(kernel, key, 1)

    @functools.partial(jax.jit, static_argnames="ns")
    def seg(state, moments, quants, done, ns):
        def body(carry, i):
            st, mom, qs = carry
            st, _ = block(st, i)
            w = ((done + i) >= burn_in).astype(jnp.int32)
            mom = mom.update(st.position, weight=w)
            if qs is not None:
                qs = {
                    p: jax.lax.cond(
                        w > 0, lambda q: q.update(st.position),
                        lambda q: q, q,
                    )
                    for p, q in qs.items()
                }
            return (st, mom, qs), None

        (st, mom, qs), _ = jax.lax.scan(
            body, (state, moments, quants), jnp.arange(ns)
        )
        return st, mom, qs

    done = 0
    while done < n_steps:
        ns = min(segment_steps, n_steps - done)
        state, moments, quants = seg(
            state, moments, quants, jnp.asarray(done, jnp.int32), ns
        )
        jax.block_until_ready(state.position)
        done += ns
        if progress is not None:
            progress(done, moments)
    return ChainResult(
        final_state=state, samples=None, infos=None, metrics=None,
        moments=moments, quantiles=quants,
    )


def run_chain_jit(kernel, x0, key, n_steps, **kwargs):
    """``run_chain`` under an outer ``jax.jit``.

    Calling ``run_chain`` eagerly dispatches the scan (and every metric)
    through the op-by-op path — measured ~10x slower on the tunneled TPU
    than one compiled program. Experiments that call a runner ONCE per
    kernel should use this wrapper (one compile per call; steady-state
    loops should build their own jitted closure instead)."""
    return jax.jit(
        lambda x, k: run_chain(kernel, x, k, n_steps, **kwargs)
    )(x0, as_key(key))


def run_chains_jit(kernel, x0, key, n_steps, n_chains, **kwargs):
    """``run_chains`` under an outer ``jax.jit`` (see ``run_chain_jit``)."""
    return jax.jit(
        lambda x, k: run_chains(kernel, x, k, n_steps, n_chains, **kwargs)
    )(x0, as_key(key))
