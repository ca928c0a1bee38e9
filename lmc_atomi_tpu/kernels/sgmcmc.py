"""Stochastic-gradient Langevin family (components C22/C23, native dep N7).

Native re-implementations of the blackjax-backed kernels of reference
jax/sgld.py and jax/prox_sgld.py — SGLD, MSGLD, cyclical SGLD, contour
(CSGLD), and the proximal variants SPGLD / SSGLD / MYSGLD plus their
cyclical/contour compositions — as pure (init, step) kernels scanning on-chip
(the reference re-jits every step from a Python loop, jax/sgld.py:146).

Known reference defects NOT mirrored (SURVEY.md §7): single-key reuse
(jax/lmc_jax.py:111-114), the MSGLD acceptance ratio using raw logprob ratio
instead of the density ratio (jax/sgld.py:190-229), and MYSGLD's
``gamma - prox`` typo (jax/prox_sgld.py:236 — should be ``x - prox``).

Conventions: kernels ascend ``grad_fn = grad log pi`` (blackjax sgld update
``x + g * grad + sqrt(2 g) xi``); step sizes come from ``stepsize_at`` specs
(e.g. the 0.05 k^-0.55 polynomial of jax/sgld.py:132).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import normal_like
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.kernels.base import Kernel, stepsize_at

__all__ = [
    "polynomial_schedule",
    "cyclical_cosine_schedule",
    "minibatch_grad_estimator",
    "sgld",
    "msgld",
    "cyclical_sgld",
    "csgld",
    "csgld_importance_resample",
    "spgld",
    "ssgld",
    "mysgld",
    "cyclical_spgld",
    "contour_spgld",
]


def polynomial_schedule(a: float = 0.05, b: float = -0.55):
    """gamma_k = a * (k+1)^b — the reference's SGLD schedule
    (jax/sgld.py:131-132, 1-indexed)."""

    def fn(step):
        return a * (step + 1.0) ** b

    return fn


def cyclical_cosine_schedule(
    n_steps: int,
    num_cycles: int = 4,
    initial_step_size: float = 1e-3,
    exploration_ratio: float = 0.25,
):
    """Cosine cyclical schedule (reference jax/sgld.py:236-248): returns
    ``fn(step) -> (step_size, do_sample)``."""
    cycle_length = n_steps // num_cycles

    def fn(step):
        pos = (step % cycle_length) / cycle_length
        do_sample = pos >= exploration_ratio
        step_size = 0.5 * (jnp.cos(jnp.pi * pos) + 1.0) * initial_step_size
        return step_size, do_sample

    return fn


def minibatch_grad_estimator(
    logprior_fn: Callable,
    loglik_fn: Callable,
    data,
    data_size: int,
    batch_size: Optional[int] = None,
):
    """Unbiased posterior score estimator (the blackjax
    ``gradients.grad_estimator`` contract used at reference
    jax/prox_sgld.py:131): grad logprior(x) + (N/n) sum_batch grad loglik.

    Returns ``grad_fn(position, key)``; with ``data=None`` the likelihood is
    treated as already-full-batch and scaled by ``data_size`` (the
    reference's usage, where loglik ignores the minibatch argument).
    """

    if data is None:

        def grad_fn(x, key):
            del key
            return jax.grad(logprior_fn)(x) + data_size * jax.grad(loglik_fn)(x)

        return grad_fn

    n = data.shape[0]
    bs = batch_size or n

    def grad_fn(x, key):
        idx = jax.random.choice(key, n, (bs,), replace=False)
        batch = data[idx]
        lik = lambda xx: jnp.sum(jax.vmap(lambda d: loglik_fn(xx, d))(batch))
        return jax.grad(logprior_fn)(x) + (data_size / bs) * jax.grad(lik)(x)

    return grad_fn


def _as_keyed_grad(grad_fn: Callable) -> Callable:
    """Accept both grad_fn(x) and grad_fn(x, key)."""
    import inspect

    try:
        nparams = len(inspect.signature(grad_fn).parameters)
    except (TypeError, ValueError):
        nparams = 1
    if nparams >= 2:
        return grad_fn
    return lambda x, key: grad_fn(x)


def sgld(grad_fn: Callable, schedule) -> Kernel:
    """SGLD: x <- x + g grad log pi + sqrt(2 g) xi (reference
    jax/sgld.py:120-165 via blackjax.sgld)."""
    gf = _as_keyed_grad(grad_fn)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(schedule, state.step)
        k_batch, k_noise = jax.random.split(key)
        xi = normal_like(k_noise, state.position)
        x = state.position + g * gf(state.position, k_batch) + jnp.sqrt(2 * g) * xi
        return state.next(x), StepInfo()

    return Kernel(init, step)


def msgld(logprob_fn: Callable, grad_fn: Callable, schedule) -> Kernel:
    """Metropolized SGLD (reference jax/sgld.py:169-229): SGLD proposal +
    density-ratio MH filter (log-space; the reference's ratio-of-logprobs is
    a defect not mirrored)."""
    gf = _as_keyed_grad(grad_fn)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(schedule, state.step)
        k_batch, k_noise, k_accept = jax.random.split(key, 3)
        xi = normal_like(k_noise, state.position)
        prop = state.position + g * gf(state.position, k_batch) + jnp.sqrt(2 * g) * xi
        log_ratio = logprob_fn(prop) - logprob_fn(state.position)
        u = jax.random.uniform(k_accept, dtype=log_ratio.dtype)
        accept = jnp.log(u) <= jnp.minimum(log_ratio, 0.0)
        x = jnp.where(accept, prop, state.position)
        return state.next(x), StepInfo(
            accepted=accept, log_accept_ratio=jnp.minimum(log_ratio, 0.0)
        )

    return Kernel(init, step)


def cyclical_sgld(
    grad_fn: Callable,
    n_steps: int,
    num_cycles: int = 4,
    initial_step_size: float = 1e-3,
    exploration_ratio: float = 0.25,
    prox_fn: Optional[Callable] = None,
) -> Kernel:
    """Cyclical SG-MCMC (reference jax/sgld.py:232-326): cosine step sizes;
    exploration phase does plain gradient ascent (SGD), sampling phase does
    SGLD, switched by ``lax.cond``. ``info.accepted`` flags sampling-phase
    steps (the reference only appends those, jax/sgld.py:320-322).

    ``prox_fn`` composes the proximal cyclical variants (reference
    jax/prox_sgld.py:345-418): the prox is applied after each move.
    """
    gf = _as_keyed_grad(grad_fn)
    sched = cyclical_cosine_schedule(
        n_steps, num_cycles, initial_step_size, exploration_ratio
    )

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g, do_sample = sched(state.step)
        k_batch, k_noise = jax.random.split(key)
        grad = gf(state.position, k_batch)

        def sample_move(x):
            return x + g * grad + jnp.sqrt(2 * g) * normal_like(k_noise, x)

        def explore_move(x):
            return x + g * grad

        x = jax.lax.cond(do_sample, sample_move, explore_move, state.position)
        if prox_fn is not None:
            x = _as_stepped_prox(prox_fn)(x, g)
        return state.next(x), StepInfo(accepted=do_sample)

    return Kernel(init, step)


class CSGLDExtras(NamedTuple):
    energy_pdf: jnp.ndarray  # (num_partitions,) self-adapted energy histogram
    energy_idx: jnp.ndarray  # current energy bin


def csgld(
    logdensity_fn: Callable,
    num_partitions: int = 512,
    energy_gap: float = 0.25,
    min_energy: float = 0.0,
    zeta: float = 1.0,
    temperature: float = 1.0,
    lr_schedule=1e-3,
    sa_schedule=None,
    prox_fn: Optional[Callable] = None,
    mult_clip: float = 100.0,
) -> Kernel:
    """Contour SGLD (Deng et al. 2020; the blackjax.csgld kernel driven at
    reference jax/sgld.py:329-394).

    Maintains a self-adapting energy histogram ``energy_pdf`` over
    ``num_partitions`` bins of width ``energy_gap`` starting at
    ``min_energy``. Per step, with U = -logdensity and bin J(U):

        mult  = 1 + zeta T (log pdf[J] - log pdf[J-1]) / energy_gap
        x    <- x + lr * mult * grad logdensity + sqrt(2 lr T) xi
        pdf  <- pdf + omega_k pdf[J]^zeta (onehot(J) - pdf)

    ``sa_schedule`` defaults to the reference's min(1e-2,(k+100)^-0.8)
    (jax/sgld.py:372). ``prox_fn`` composes contour-proximal SGLD
    (jax/prox_sgld.py:421-491).

    ``mult_clip`` bounds the drift multiplier (documented stabilization,
    not in Deng et al.): as the learned pdf sharpens, the log-pdf
    difference between adjacent bins grows without bound and the
    amplified drift ``lr * mult * grad`` can enter a tail-escape feedback
    loop — measured to NaN the 25-mode-grid contour-proximal chain
    between 5k and 50k steps at the reference hyperparameters (f64 and
    f32 alike; the reference's own contourSPGLD main is unrunnable,
    SURVEY.md C23, so it never hit this). The clip caps the multiplier
    magnitude while preserving its sign — the bouncy out-of-mode moves
    that make CSGLD explore.
    """
    if sa_schedule is None:
        sa_schedule = lambda step: jnp.minimum(1e-2, (step + 100.0) ** (-0.8))

    grad_fn = jax.grad(logdensity_fn)

    def init(x0):
        pdf = jnp.full((num_partitions,), 1.0 / num_partitions)
        return SamplerState.init(
            x0, extras=CSGLDExtras(energy_pdf=pdf, energy_idx=jnp.zeros((), jnp.int32))
        )

    def step(state, key):
        lr = stepsize_at(lr_schedule, state.step)
        omega = stepsize_at(sa_schedule, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        pdf = state.extras.energy_pdf

        energy = -logdensity_fn(x)
        j = jnp.clip(
            jnp.ceil((energy - min_energy) / energy_gap).astype(jnp.int32),
            1,
            num_partitions - 1,
        )
        log_pdf = jnp.log(jnp.maximum(pdf, 1e-30))
        mult = 1.0 + zeta * temperature * (log_pdf[j] - log_pdf[j - 1]) / energy_gap
        mult = jnp.clip(mult, -mult_clip, mult_clip)
        x_new = x + lr * mult * grad_fn(x) + jnp.sqrt(2 * lr * temperature) * xi
        if prox_fn is not None:
            x_new = _as_stepped_prox(prox_fn)(x_new, lr)

        onehot = jax.nn.one_hot(j, num_partitions, dtype=pdf.dtype)
        # Deng et al. stochastic-approximation update; it preserves total
        # mass exactly (sum of the increment is zero when sum(pdf)=1), so no
        # renormalization — only a floor clamp guarding log_pdf above.
        pdf_new = pdf + omega * (pdf[j] ** zeta) * (onehot - pdf)
        pdf_new = jnp.maximum(pdf_new, 1e-30)

        return (
            state.next(x_new, extras=CSGLDExtras(energy_pdf=pdf_new, energy_idx=j)),
            StepInfo(energy=energy),
        )

    return Kernel(init, step)


def csgld_importance_resample(
    samples, energy_idx, energy_pdf, zeta: float = 1.0, quantile: float = 0.95,
    key=None, rounds: int = 5,
):
    """Post-hoc importance resampling of CSGLD draws (reference
    jax/sgld.py:380-394): keep samples whose energy bin lies in the top
    (1-quantile) mass of the learned energy pdf, accepted with probability
    proportional to pdf[bin]^zeta. Host-side eval utility."""
    import numpy as np

    samples = np.asarray(samples)
    energy_idx = np.asarray(energy_idx)
    pdf = np.asarray(energy_pdf)
    thresh = np.quantile(pdf, quantile)
    important = np.where(pdf > thresh)[0]
    if important.size == 0:
        return samples[:0]
    scaled = pdf[important] ** zeta
    scaled = scaled / scaled.max()
    if key is None:
        seed = 0
    elif isinstance(key, (int, np.integer)):
        seed = int(key)
    else:  # a JAX PRNG key
        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(rounds):
        for w, idx in zip(scaled, important):
            if rng.uniform() < w:
                out.append(samples[energy_idx == idx])
    return np.concatenate(out, axis=0) if out else samples[:0]


# --- proximal SGLD variants (C23) -------------------------------------------


def _as_stepped_prox(prox_fn: Callable) -> Callable:
    """Normalize a prior prox to the ``(x, g) -> x`` contract.

    Proximal-gradient Langevin theory wants ``prox_{g*f}`` — the prox
    threshold must scale with the CURRENT step size. A constant-threshold
    prox corresponds to an effective prior weight of ``threshold / g``,
    which GROWS as the schedule decays (at the reference polynomial
    schedule, ~40x between step 1 and step 50000) and was measured to
    collapse SPGLD onto the near-origin modes (4/25; see RESULTS.md
    "SGLD family"). One-arg proxes are still accepted for explicitly
    step-free composition, with the bias documented here."""
    import inspect

    try:
        n = len(inspect.signature(prox_fn).parameters)
    except (TypeError, ValueError):
        n = 1
    if n >= 2:
        return prox_fn
    return lambda x, g: prox_fn(x)


def spgld(grad_fn: Callable, prox_fn: Callable, schedule) -> Kernel:
    """Stochastic proximal gradient LD: SGLD move, then prior prox
    (the proximal analogue of PGLD, reference prox_lmc.py:99-110 /
    jax/prox_sgld.py:111-162 intent). ``prox_fn`` may take ``(x, g)``
    to receive the current step size (see ``_as_stepped_prox``)."""
    gf = _as_keyed_grad(grad_fn)
    pf = _as_stepped_prox(prox_fn)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(schedule, state.step)
        k_batch, k_noise = jax.random.split(key)
        xi = normal_like(k_noise, state.position)
        x = state.position + g * gf(state.position, k_batch) + jnp.sqrt(2 * g) * xi
        return state.next(pf(x, g)), StepInfo()

    return Kernel(init, step)


def ssgld(grad_fn: Callable, moreau_grad_fn: Callable, schedule) -> Kernel:
    """Smoothed SGLD: the nonsmooth prior enters through its Moreau-envelope
    gradient added to the stochastic score (jax/prox_sgld.py:165-216 intent)."""
    gf = _as_keyed_grad(grad_fn)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(schedule, state.step)
        k_batch, k_noise = jax.random.split(key)
        xi = normal_like(k_noise, state.position)
        drift = gf(state.position, k_batch) - moreau_grad_fn(state.position)
        x = state.position + g * drift + jnp.sqrt(2 * g) * xi
        return state.next(x), StepInfo()

    return Kernel(init, step)


def mysgld(
    grad_fn: Callable, prox_fn: Callable, lam: float, schedule
) -> Kernel:
    """Moreau-Yosida SGLD (MYULA with stochastic score; fixes the
    ``gamma - prox`` typo of reference jax/prox_sgld.py:236):

        x <- (1 - g/lam) x + g grad log pi + (g/lam) prox(x) + sqrt(2g) xi
    """
    gf = _as_keyed_grad(grad_fn)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(schedule, state.step)
        k_batch, k_noise = jax.random.split(key)
        xi = normal_like(k_noise, state.position)
        x = state.position
        x_new = (
            (1.0 - g / lam) * x
            + g * gf(x, k_batch)
            + (g / lam) * prox_fn(x)
            + jnp.sqrt(2 * g) * xi
        )
        return state.next(x_new), StepInfo()

    return Kernel(init, step)


def cyclical_spgld(
    grad_fn: Callable,
    prox_fn: Callable,
    n_steps: int,
    num_cycles: int = 4,
    initial_step_size: float = 1e-3,
    exploration_ratio: float = 0.25,
) -> Kernel:
    """Cyclical SPGLD (reference jax/prox_sgld.py:345-418)."""
    return cyclical_sgld(
        grad_fn,
        n_steps,
        num_cycles,
        initial_step_size,
        exploration_ratio,
        prox_fn=prox_fn,
    )


def contour_spgld(
    logdensity_fn: Callable,
    prox_fn: Callable,
    **csgld_kwargs,
) -> Kernel:
    """Contour proximal SGLD (reference jax/prox_sgld.py:421-491)."""
    return csgld(logdensity_fn, prox_fn=prox_fn, **csgld_kwargs)
