"""Composite targets: smooth potential + nonsmooth prior.

Covers the reference's workload-3 target — Gaussian mixture likelihood times
an uncentered Laplace (l1) prior (reference prox_lmc.py:316-319) — and the
general smooth+prox split every proximal kernel consumes.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops.prox import prox_uncentered_laplace

__all__ = ["LaplacePrior", "MixtureWithLaplacePrior"]


@struct.dataclass
class LaplacePrior:
    """Uncentered l1 prior ``alpha ||theta - mu||_1`` with density
    ``(alpha/2)^d exp(-alpha ||theta - mu||_1)`` (reference prox_lmc.py:56-57)."""

    mu: jnp.ndarray
    alpha: jnp.ndarray

    @classmethod
    def create(cls, mu, alpha) -> "LaplacePrior":
        return cls(mu=jnp.asarray(mu), alpha=jnp.asarray(alpha))

    @property
    def dim(self) -> int:
        return self.mu.shape[-1]

    def value(self, theta):
        return self.alpha * jnp.sum(jnp.abs(theta - self.mu), axis=-1)

    def log_density(self, theta):
        return self.dim * jnp.log(self.alpha / 2.0) - self.value(theta)

    def density(self, theta):
        return jnp.exp(self.log_density(theta))

    def prox(self, theta, gamma):
        """prox of ``gamma * ||. - mu||_1`` — note the alpha scaling is the
        caller's job (the reference passes gamma = lam * alpha)."""
        return prox_uncentered_laplace(theta, gamma, self.mu)


@struct.dataclass
class MixtureWithLaplacePrior:
    """Target ``pi(theta) ∝ mixture(theta) * laplace_prior(theta)`` with the
    smooth part handled by gradients and the l1 part by prox/Moreau-envelope
    machinery (reference ``ProximalLangevinMonteCarlo``, prox_lmc.py:29-96)."""

    mixture: Any  # GaussianMixture
    prior: LaplacePrior
    lam: jnp.ndarray  # Moreau smoothing parameter of the prior

    @classmethod
    def create(cls, mixture, prior, lam) -> "MixtureWithLaplacePrior":
        return cls(mixture=mixture, prior=prior, lam=jnp.asarray(lam))

    def log_density(self, theta):
        return self.mixture.log_density(theta) + self.prior.log_density(theta)

    def density(self, theta):
        return jnp.exp(self.log_density(theta))

    def smooth_potential(self, theta):
        """The differentiable part: mixture potential only."""
        return self.mixture.potential(theta)

    def grad_smooth_potential(self, theta):
        return self.mixture.grad_potential(theta)

    def hess_smooth_potential(self, theta):
        return self.mixture.hess_potential(theta)

    def prior_prox(self, theta, gamma=None):
        """prox of ``gamma * alpha ||. - mu||_1``; gamma defaults to lam."""
        g = self.lam if gamma is None else gamma
        return self.prior.prox(theta, g * self.prior.alpha)

    def grad_moreau_prior(self, theta):
        """grad of the lam-Moreau envelope of the prior (reference
        prox_lmc.py:114-115): (theta - prox)/lam."""
        return (theta - self.prior_prox(theta)) / self.lam

    def gd_update(self, theta, gamma):
        return theta - gamma * self.grad_smooth_potential(theta)
