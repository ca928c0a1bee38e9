"""Laplacian-mixture target with Moreau-Yosida smoothing (component C13).

Reference semantics (reference lmc_laplace.py:31-95): mixture of multivariate
Laplacians ``(alpha_i/2)^d exp(-alpha_i ||theta - mu_i||_1)``; the nonsmooth
l1 term of each component is replaced by its lam-Moreau envelope, and the
samplers run on the smoothed potential. Gradient of the smoothed potential
uses the envelope identity grad env = (theta - prox)/lam
(reference lmc_laplace.py:70-78); the Hessian is taken by ``jax.hessian`` of
the smoothed potential (the reference's hand Hessian at lmc_laplace.py:80-82
drops the ``theta - mu`` centering; autodiff of the stated potential is the
ground truth here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops.prox import prox_uncentered_laplace

__all__ = ["LaplaceMixture"]


@struct.dataclass
class LaplaceMixture:
    mus: jnp.ndarray  # (n, d)
    alphas: jnp.ndarray  # (n,)
    log_weights: jnp.ndarray  # (n,)
    lam: jnp.ndarray  # Moreau smoothing parameter

    @classmethod
    def create(cls, mus, alphas, weights, lam) -> "LaplaceMixture":
        mus = jnp.asarray(mus)
        return cls(
            mus=mus,
            alphas=jnp.asarray(alphas),
            log_weights=jnp.log(jnp.asarray(weights)),
            lam=jnp.asarray(lam),
        )

    @property
    def dim(self) -> int:
        return self.mus.shape[-1]

    # -- exact (nonsmooth) density -------------------------------------------

    def component_log_densities(self, theta):
        d = self.dim
        dev = theta[..., None, :] - self.mus  # (..., n, d)
        l1 = jnp.sum(jnp.abs(dev), axis=-1)
        return d * jnp.log(self.alphas / 2.0) - self.alphas * l1

    def log_density(self, theta):
        comp = self.component_log_densities(theta) + self.log_weights
        return jax.scipy.special.logsumexp(comp, axis=-1)

    def density(self, theta):
        return jnp.exp(self.log_density(theta))

    def potential(self, theta):
        return -self.log_density(theta)

    # -- Moreau-smoothed density ----------------------------------------------

    def _component_prox(self, theta):
        """prox of lam*alpha_i*||. - mu_i||_1 at theta, all components:
        (..., n, d) (reference lmc_laplace.py:53-54)."""
        gam = (self.lam * self.alphas)[..., None]  # (n, 1)
        return prox_uncentered_laplace(theta[..., None, :], gam, self.mus)

    def component_smooth_log_densities(self, theta):
        """log of the per-component smoothed density (lmc_laplace.py:56-61)."""
        d = self.dim
        p = self._component_prox(theta)
        l1 = jnp.sum(jnp.abs(p - self.mus), axis=-1)
        quad = jnp.sum(jnp.square(p - theta[..., None, :]), axis=-1)
        env = self.alphas * l1 + quad / (2.0 * self.lam)
        return d * jnp.log(self.alphas / 2.0) - env

    def smooth_log_density(self, theta):
        comp = self.component_smooth_log_densities(theta) + self.log_weights
        return jax.scipy.special.logsumexp(comp, axis=-1)

    def smooth_density(self, theta):
        return jnp.exp(self.smooth_log_density(theta))

    def smooth_potential(self, theta):
        return -self.smooth_log_density(theta)

    def grad_smooth_potential(self, theta):
        """Envelope-identity gradient in responsibility form (reference
        lmc_laplace.py:70-78): grad U = -sum_i r_i (prox_i - theta)/lam."""
        comp = self.component_smooth_log_densities(theta) + self.log_weights
        r = jax.nn.softmax(comp, axis=-1)  # (..., n)
        p = self._component_prox(theta)  # (..., n, d)
        grad_env = (theta[..., None, :] - p) / self.lam
        return jnp.einsum("...n,...ni->...i", r, grad_env)

    def hess_smooth_potential(self, theta):
        return jax.hessian(self.smooth_potential)(theta)

    def gd_update(self, theta, gamma):
        return theta - gamma * self.grad_smooth_potential(theta)

    # -- sampling --------------------------------------------------------------

    def sample(self, key, n_samples: int):
        """Ancestral true samples: component index, then iid Laplace draws
        with scale 1/alpha_i — the distribution actually defined by
        ``component_log_densities`` ((alpha/2)^d exp(-alpha ||.||_1) is a
        product of Laplace(1/alpha) marginals).

        NOTE: the reference draws through ``multivariate_laplace.rvs`` with
        cov = (2/alpha) I (lmc_laplace.py:41,106), whose SVD coloring yields
        scale sqrt(2/alpha) — inconsistent with its own density except at
        alpha = 0.5, which skews its W2 ground truth. Not mirrored."""
        kc, kl = jax.random.split(key)
        n = self.mus.shape[0]
        idx = jax.random.categorical(
            kc, jnp.broadcast_to(self.log_weights, (n_samples, n))
        )
        z = jax.random.laplace(kl, (n_samples, self.dim), self.mus.dtype)
        scale = (1.0 / self.alphas)[idx][:, None]
        return self.mus[idx] + scale * z
