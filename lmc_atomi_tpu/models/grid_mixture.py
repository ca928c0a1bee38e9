"""25-mode grid Gaussian mixture — the SGLD-family target (component C22).

Reference semantics (reference jax/sgld.py:49-57): modes on the Cartesian
product ``positions x positions`` with common isotropic covariance
``sigma^2... * I`` and *tempered* log-probability

    logprob(x) = lamda * logsumexp_i N(x; mu_i, sigma I).logpdf

(unnormalized, no mixture weights). ``sample`` draws one mode uniformly then a
Gaussian, vmapped over keys (reference jax/sgld.py:59-66).
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["GridGaussianMixture"]


@struct.dataclass
class GridGaussianMixture:
    mus: jnp.ndarray  # (n, d)
    sigma: jnp.ndarray  # scalar isotropic std^2 scale (matches reference)
    lam: jnp.ndarray  # tempering factor

    @classmethod
    def create(cls, positions, sigma, lam) -> "GridGaussianMixture":
        positions = list(positions)
        mus = jnp.asarray(
            [list(p) for p in itertools.product(positions, positions)],
            jnp.float32,
        )
        return cls(mus=mus, sigma=jnp.asarray(sigma), lam=jnp.asarray(lam))

    @property
    def dim(self) -> int:
        return self.mus.shape[-1]

    def log_prob(self, x):
        d = self.dim
        dev = x[..., None, :] - self.mus
        maha = jnp.sum(dev * dev, axis=-1) / self.sigma
        logpdf = -0.5 * (maha + d * jnp.log(2 * jnp.pi * self.sigma))
        return self.lam * jax.scipy.special.logsumexp(logpdf, axis=-1)

    def grad_log_prob(self, x):
        return jax.grad(self.log_prob)(x)

    def sample(self, key, n_samples: int):
        kc, kn = jax.random.split(key)
        n = self.mus.shape[0]
        idx = jax.random.randint(kc, (n_samples,), 0, n)
        eps = jax.random.normal(kn, (n_samples, self.dim), self.mus.dtype)
        return self.mus[idx] + jnp.sqrt(self.sigma) * eps
