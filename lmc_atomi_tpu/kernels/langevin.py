"""Unadjusted/adjusted Langevin kernels on smooth(ed) potentials.

Components C7-C11 of SURVEY.md §2: ULA, MALA, PULA, IHPULA, MLA — the method
suite of the reference ``LangevinMonteCarlo`` (lmc.py:94-190) and
``LangevinMonteCarloLaplacian`` (lmc_laplace.py:110-216), redesigned as pure
(init, step) kernels:

  * noise is on-chip threefry (one folded key per step) instead of host
    ``rng.multivariate_normal`` (lmc.py:100);
  * MALA keeps the standard stay-at-state chain and emits an acceptance mask
    (the reference *drops* rejected proposals, lmc.py:128-131 — reproduce its
    "effective samples" by mask-filtering at eval time, SURVEY idiom shift 3);
  * fixed preconditioners are factorized once at trace time (the reference
    recomputes ``sqrtm(M)`` every step, lmc.py:145);
  * IHPULA's per-step Hessian shift-and-invert uses symmetric ``eigh``
    (lmc.py:159-166 uses general ``eigvals`` on a symmetric matrix).

All kernels take callables (``grad_fn``, ``log_density_fn``, ``hess_fn``) so
they work with any target model.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import normal_like
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.kernels.base import Kernel, stepsize_at

__all__ = ["ula", "mala", "pula", "ihpula", "mla", "sqrtm_psd"]


def sqrtm_psd(m):
    """Symmetric PSD matrix square root via eigh (GPU/TPU-safe replacement
    for scipy.linalg.sqrtm, cf. reference jax/lmc_jax.py:36-41)."""
    w, v = jnp.linalg.eigh(m)
    w = jnp.maximum(w, 0.0)
    return (v * jnp.sqrt(w)) @ v.T


def ula(grad_fn: Callable, gamma) -> Kernel:
    """Unadjusted Langevin: theta <- theta - g*grad U + sqrt(2g) xi
    (reference lmc.py:94-104)."""

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position - g * grad_fn(state.position) + jnp.sqrt(2 * g) * xi
        return state.next(x), StepInfo()

    return Kernel(init, step)


def mala(
    log_density_fn: Callable,
    grad_fn: Callable,
    gamma,
) -> Kernel:
    """Metropolis-adjusted Langevin (reference lmc.py:107-131).

    Proposal ``N(theta - g grad U(theta), 2g I)``; the acceptance ratio uses
    the target density and forward/reverse proposal densities exactly as the
    reference's ``prob`` (lmc.py:112-115), but computed in log space.
    """

    def init(x0):
        return SamplerState.init(x0)

    def log_q(x_to, x_from, g):
        mean = x_from - g * grad_fn(x_from)
        dev = x_to - mean
        # N(mean, 2g I) log-density up to the common normalizer (cancels).
        return -jnp.sum(dev * dev) / (4.0 * g)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        k_noise, k_accept = jax.random.split(key)
        xi = normal_like(k_noise, state.position)
        prop = state.position - g * grad_fn(state.position) + jnp.sqrt(2 * g) * xi
        log_ratio = (
            log_density_fn(prop)
            - log_density_fn(state.position)
            + log_q(state.position, prop, g)
            - log_q(prop, state.position, g)
        )
        # Reference: accept if uniform <= min(1, ratio)  (lmc.py:127-128)
        u = jax.random.uniform(k_accept, dtype=log_ratio.dtype)
        accept = jnp.log(u) <= jnp.minimum(log_ratio, 0.0)
        x = jnp.where(accept, prop, state.position)
        return state.next(x), StepInfo(
            accepted=accept, log_accept_ratio=jnp.minimum(log_ratio, 0.0)
        )

    return Kernel(init, step)


def pula(grad_fn: Callable, gamma, m) -> Kernel:
    """Preconditioned ULA with fixed SPD M (reference lmc.py:134-148):
    theta <- theta - g M grad U + sqrt(2g) sqrtm(M) xi."""
    m = jnp.asarray(m)
    sqrt_m = sqrtm_psd(m)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        drift = state.position - g * (m @ grad_fn(state.position))
        x = drift + jnp.sqrt(2 * g) * (sqrt_m @ xi)
        return state.next(x), StepInfo()

    return Kernel(init, step)


def ihpula(
    grad_fn: Callable,
    hess_fn: Callable,
    gamma,
    shift: float = 0.05,
    regularize: bool = True,
) -> Kernel:
    """Inverse-Hessian preconditioned ULA (reference lmc.py:151-169).

    Per step: H = hess U(theta); if ``regularize`` (the reference's
    multi-mixture branch, with shift 0.05 in lmc.py:162 / 0.02 in
    lmc_laplace.py:186), M = (H + (|lambda_min| + shift) I)^{-1}, else
    M = H^{-1}. Small-d only: dense eigh per step inside scan (SURVEY.md §7
    hard parts).

    Numerics: ONE symmetric eigendecomposition provides shift, inverse, and
    inverse square root together (the naive eigvalsh + inv + sqrtm-eigh chain
    amplified f32 rounding enough to diverge the gamma=0.1, n=2 chain on
    TPU), the small matvecs run at ``Precision.HIGHEST`` (TPU matmuls default
    to bf16 passes), and the whole linear-algebra block upcasts to f64 on
    demand when x64 is enabled (CPU), matching the reference's f64 NumPy.
    """

    def init(x0):
        return SamplerState.init(x0)

    hi = jax.lax.Precision.HIGHEST

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        # f64-on-demand: canonicalize gives f64 under x64 (CPU), f32 on TPU
        dt = jax.dtypes.canonicalize_dtype(jnp.float64)
        h = hess_fn(x).astype(dt)
        w, v = jnp.linalg.eigh(h)
        if regularize:
            w = w + (jnp.abs(w.min()) + shift)
        # M = V diag(1/w) V^T and sqrtm(M) = V diag(1/sqrt(w)) V^T from the
        # same factorization; applied as matvecs.
        vt_grad = jnp.dot(v.T, grad_fn(x).astype(dt), precision=hi)
        vt_xi = jnp.dot(v.T, xi.astype(dt), precision=hi)
        drift = x.astype(dt) - g * jnp.dot(v, vt_grad / w, precision=hi)
        noise = jnp.sqrt(2 * g) * jnp.dot(
            v, vt_xi / jnp.sqrt(w), precision=hi
        )
        return state.next((drift + noise).astype(x.dtype)), StepInfo()

    return Kernel(init, step)


def mla(grad_fn: Callable, gamma, beta) -> Kernel:
    """Mirror-Langevin with hyperbolic entropy mirror map (reference
    lmc.py:172-190): dual step then pull back through beta*sinh."""
    beta = jnp.asarray(beta)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        dual = (
            jnp.arcsinh(x / beta)
            - g * grad_fn(x)
            + jnp.sqrt(2 * g) * (x**2 + beta**2) ** (-0.25) * xi
        )
        return state.next(beta * jnp.sinh(dual)), StepInfo()

    return Kernel(init, step)
