"""Gaussian-mixture target (component C6/C12 of SURVEY.md §2).

Same math as the reference ``LangevinMonteCarlo`` model (reference
lmc.py:39-90) — mixture density, potential U = -log density, analytic
gradient and Hessian of U — but computed in log space with responsibilities
(softmax of per-component log densities) for f32/TPU stability, batched over
arbitrary leading axes, and with ancestral sampling vectorized over split PRNG
keys instead of a Python loop (reference lmc.py:82-90).

Analytic derivatives are cross-checked against ``jax.grad``/``jax.hessian`` in
tests (SURVEY.md idiom shift 2 keeps them as golden forms).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["GaussianMixture"]


@struct.dataclass
class GaussianMixture:
    mus: jnp.ndarray  # (n, d)
    sigmas: jnp.ndarray  # (n, d, d)
    log_weights: jnp.ndarray  # (n,)
    precs: jnp.ndarray  # (n, d, d) precision matrices
    log_norms: jnp.ndarray  # (n,) -log((2 pi)^{d/2} det^{1/2})
    chols: jnp.ndarray  # (n, d, d) cholesky of sigmas (sampling)

    @classmethod
    def create(cls, mus, sigmas, weights) -> "GaussianMixture":
        mus = jnp.asarray(mus)
        sigmas = jnp.asarray(sigmas)
        weights = jnp.asarray(weights)
        n, d = mus.shape
        precs = jnp.linalg.inv(sigmas)
        sign, logdet = jnp.linalg.slogdet(sigmas)
        log_norms = -0.5 * (d * jnp.log(2 * jnp.pi) + logdet)
        return cls(
            mus=mus,
            sigmas=sigmas,
            log_weights=jnp.log(weights),
            precs=precs,
            log_norms=log_norms,
            chols=jnp.linalg.cholesky(sigmas),
        )

    @property
    def dim(self) -> int:
        return self.mus.shape[-1]

    # -- densities ----------------------------------------------------------

    def component_log_densities(self, theta):
        """(..., n) per-component Gaussian log densities."""
        dev = theta[..., None, :] - self.mus  # (..., n, d)
        maha = jnp.einsum("...ni,nij,...nj->...n", dev, self.precs, dev)
        return self.log_norms - 0.5 * maha

    def log_density(self, theta):
        comp = self.component_log_densities(theta) + self.log_weights
        return jax.scipy.special.logsumexp(comp, axis=-1)

    def density(self, theta):
        return jnp.exp(self.log_density(theta))

    def potential(self, theta):
        return -self.log_density(theta)

    # -- analytic derivatives (reference lmc.py:53-75 in responsibility form)

    def responsibilities(self, theta):
        comp = self.component_log_densities(theta) + self.log_weights
        return jax.nn.softmax(comp, axis=-1)

    def grad_potential(self, theta):
        r = self.responsibilities(theta)  # (..., n)
        dev = self.mus - theta[..., None, :]  # (..., n, d)
        pulls = jnp.einsum("nij,...nj->...ni", self.precs, dev)
        return -jnp.einsum("...n,...ni->...i", r, pulls)

    def hess_potential(self, theta):
        """Hess U = E_r[prec_i] - E_r[pdev_i pdev_i^T] + (grad U)(grad U)^T
        with pdev_i = Sigma_i^{-1}(theta - mu_i) — the responsibility form of
        reference lmc.py:63-75."""
        r = self.responsibilities(theta)
        dev = theta[..., None, :] - self.mus
        pdev = jnp.einsum("nij,...nj->...ni", self.precs, dev)
        grad_u = jnp.einsum("...n,...ni->...i", r, pdev)
        e_prec = jnp.einsum("...n,nij->...ij", r, self.precs)
        e_outer = jnp.einsum("...n,...ni,...nj->...ij", r, pdev, pdev)
        return e_prec - e_outer + jnp.einsum("...i,...j->...ij", grad_u, grad_u)

    def gd_update(self, theta, gamma):
        """Gradient-descent step on U (reference lmc.py:77-78)."""
        return theta - gamma * self.grad_potential(theta)

    # -- sampling ------------------------------------------------------------

    def sample(self, key, n_samples: int):
        """Ancestral sampling: component index then component draw (reference
        lmc.py:82-90), fully vectorized."""
        kc, kn = jax.random.split(key)
        n = self.mus.shape[0]
        # NOTE: the reference draws the component uniformly (lmc.py:88),
        # ignoring the weights; mixtures there are equal-weighted so this is
        # equivalent. We sample from the actual weights.
        idx = jax.random.categorical(
            kc, jnp.broadcast_to(self.log_weights, (n_samples, n))
        )
        eps = jax.random.normal(kn, (n_samples, self.dim), self.mus.dtype)
        chol = self.chols[idx]
        return self.mus[idx] + jnp.einsum("sij,sj->si", chol, eps)
