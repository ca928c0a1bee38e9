"""Proximal Langevin kernels on composite targets (component C14).

The six-kernel suite of the reference ``ProximalLangevinMonteCarlo``
(prox_lmc.py:99-255) — PGLD, MYULA, MYMALA, PP-ULA, FBULA, LBMUMLA — for
targets of the form ``smooth potential + alpha ||theta - mu||_1`` (Gaussian
mixture times Laplace prior, prox_lmc.py:316-319). Kernels take the composite
target object (``MixtureWithLaplacePrior`` protocol: grad_smooth_potential,
prior_prox, grad_moreau_prior, log densities) plus step sizes.

Inner iterative pieces (PP-ULA's t-step dual fixed point, prox_lmc.py:165-173)
are fixed-trip ``fori_loop`` bodies inside the jitted step.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import normal_like
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.kernels.base import Kernel, stepsize_at
from lmc_atomi_tpu.kernels.langevin import sqrtm_psd
from lmc_atomi_tpu.ops.bregman import (
    bregman_moreau_env_grad_l1_hypent,
    grad_conjugate_mirror_hyp,
    grad_mirror_hyp,
)
from lmc_atomi_tpu.ops.prox import prox_laplace

__all__ = ["pgld", "myula", "mymala", "ppula", "fbula", "lbmumla"]


def pgld(target, gamma) -> Kernel:
    """Proximal Gradient Langevin Dynamics (reference prox_lmc.py:98-110):
    prox the current state, then one ULA step from the proxed point."""

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        p = target.prior_prox(state.position)  # prox_{lam*alpha l1}
        x = p - g * target.grad_smooth_potential(p) + jnp.sqrt(2 * g) * xi
        return state.next(x), StepInfo()

    return Kernel(init, step)


def myula(target, gamma) -> Kernel:
    """Moreau-Yosida ULA (reference prox_lmc.py:113-130): ULA drift plus the
    Moreau-envelope gradient of the prior, (theta - prox)/lam."""

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        drift = (
            x
            - g * target.grad_smooth_potential(x)
            - g * target.grad_moreau_prior(x)
        )
        return state.next(drift + jnp.sqrt(2 * g) * xi), StepInfo()

    return Kernel(init, step)


def mymala(target, gamma) -> Kernel:
    """MYULA proposal + Metropolis filter against the *exact* nonsmooth
    product density (reference prox_lmc.py:133-158), in log space."""

    def init(x0):
        return SamplerState.init(x0)

    def log_target(x):
        return target.log_density(x)

    def drift(x, g):
        return (
            x
            - g * target.grad_smooth_potential(x)
            - g * target.grad_moreau_prior(x)
        )

    def log_q(x_to, x_from, g):
        dev = x_to - drift(x_from, g)
        return -jnp.sum(dev * dev) / (4.0 * g)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        k_noise, k_accept = jax.random.split(key)
        xi = normal_like(k_noise, state.position)
        prop = drift(state.position, g) + jnp.sqrt(2 * g) * xi
        log_ratio = (
            log_target(prop)
            - log_target(state.position)
            + log_q(state.position, prop, g)
            - log_q(prop, state.position, g)
        )
        u = jax.random.uniform(k_accept, dtype=log_ratio.dtype)
        accept = jnp.log(u) <= jnp.minimum(log_ratio, 0.0)
        x = jnp.where(accept, prop, state.position)
        return state.next(x), StepInfo(
            accepted=accept, log_accept_ratio=jnp.minimum(log_ratio, 0.0)
        )

    return Kernel(init, step)


def ppula(target, gamma, m, q, t: int = 100) -> Kernel:
    """Preconditioned Proximal ULA (reference prox_lmc.py:161-188).

    Drift: theta - g M grad U(theta) - g Q^{-1}(theta - pprox(theta))/lam,
    noise sqrt(2g) sqrtm(M) xi, where ``pprox`` is the Q-preconditioned prox
    of the l1 prior computed by ``t`` dual fixed-point iterations
    (prox_lmc.py:165-173) — here a fixed-trip ``fori_loop``.
    """
    m = jnp.asarray(m)
    q = jnp.asarray(q)
    sqrt_m = sqrtm_psd(m)
    q_inv = jnp.linalg.inv(q)
    # rho = 1/||Q||_2 (largest singular value; reference prox_lmc.py:166)
    rho = 1.0 / jnp.linalg.norm(q, ord=2)
    eps = jnp.maximum(jnp.minimum(1.0, rho) - 1e-5, 1e-9)
    eta = rho - eps

    def preconditioned_prox(x, gam):
        def body(_, wu):
            w, _ = wu
            u = x - q @ w
            w = w + eta * u - eta * prox_laplace(w / eta + u, gam / eta)
            return w, u

        _, u = jax.lax.fori_loop(
            0, t, body, (jnp.zeros_like(x), jnp.zeros_like(x))
        )
        return u

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        pprox = preconditioned_prox(x, target.lam)
        prox_term = -g * (q_inv @ (x - pprox)) / target.lam
        drift = x - g * (m @ target.grad_smooth_potential(x)) + prox_term
        return state.next(drift + jnp.sqrt(2 * g) * (sqrt_m @ xi)), StepInfo()

    def init(x0):
        return SamplerState.init(x0)

    return Kernel(init, step)


def fbula(target, gamma) -> Kernel:
    """Forward-Backward envelope ULA (reference prox_lmc.py:191-208).

    grad FB-env = (I - lam hess U)(theta - prox_{lam alpha}(theta - lam
    grad U(theta)))/lam; one ULA step on that gradient.
    """

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        lam = target.lam
        d = x.shape[-1]
        gd = x - lam * target.grad_smooth_potential(x)
        inner = (x - target.prior_prox(gd)) / lam
        jac = jnp.eye(d, dtype=x.dtype) - lam * target.hess_smooth_potential(x)
        drift = x - g * (jac @ inner)
        return state.next(drift + jnp.sqrt(2 * g) * xi), StepInfo()

    return Kernel(init, step)


def lbmumla(target, gamma, beta, sigma) -> Kernel:
    """Left-Bregman-Moreau Unadjusted Mirror-Langevin (reference
    prox_lmc.py:211-255): mirror step under hyperbolic entropy with the
    Bregman-Moreau envelope gradient of the l1 prior (closed-form
    three-branch Bregman prox), pulled back through beta*sinh."""
    beta = jnp.asarray(beta)
    sigma = jnp.asarray(sigma)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        breg_grad = bregman_moreau_env_grad_l1_hypent(
            x, sigma, target.lam, target.prior.alpha
        )
        dual = (
            grad_mirror_hyp(x, beta)
            - g * target.grad_smooth_potential(x)
            - g * breg_grad
            + jnp.sqrt(2 * g) * (x**2 + beta**2) ** (-0.25) * xi
        )
        return state.next(grad_conjugate_mirror_hyp(dual, beta)), StepInfo()

    return Kernel(init, step)
