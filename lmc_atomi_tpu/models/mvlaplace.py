"""Multivariate Laplace distribution (component C16).

JAX re-design of the reference's scipy-protocol ``multivariate_laplace``
(reference multivariate_laplace.py:228-256 logpdf, 310-341 cdf, 399-454 rvs,
456-476 entropy): an elliptically-colored product-Laplace with

  * ``logpdf(x) = -(d log 2 + 1/2 logdet(cov) + ||(x - mu) U||_1)`` where
    ``U U^T = cov^{-1}`` is the eigen square-root of the precision,
  * ``rvs`` = iid standard Laplace, colored by ``sqrt(s) v`` from the SVD of
    cov, shifted by the mean (same coloring convention as the reference),
  * ``entropy = 1/2 logdet(2 pi e cov)`` (the reference's Gaussian-style
    convention, multivariate_laplace.py:474-476),
  * ``cdf`` on the summed whitened deviation: the standard scalar-Laplace
    orientation ``F(s) = 0.5 e^s (s<0); 1 - 0.5 e^{-s} (s>=0)``. (The
    reference's branch assignment at multivariate_laplace.py:330-339 returns
    ``1 - F``; the standard orientation is used here.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["MultivariateLaplace"]


@struct.dataclass
class MultivariateLaplace:
    mean: jnp.ndarray  # (d,)
    cov: jnp.ndarray  # (d, d)
    prec_u: jnp.ndarray  # (d, d), prec = U U^T
    log_det_cov: jnp.ndarray
    color: jnp.ndarray  # (d, d), rvs coloring matrix sqrt(s)[:,None] * v

    @classmethod
    def create(cls, mean, cov) -> "MultivariateLaplace":
        mean = jnp.atleast_1d(jnp.asarray(mean))
        d = mean.shape[0]
        cov = jnp.asarray(cov)
        if cov.ndim == 0:
            cov = cov * jnp.eye(d, dtype=mean.dtype)
        s, u = jnp.linalg.eigh(cov)
        s = jnp.maximum(s, 1e-30)
        prec_u = u * (1.0 / jnp.sqrt(s))
        _, svd_s, svd_vt = jnp.linalg.svd(cov)
        return cls(
            mean=mean,
            cov=cov,
            prec_u=prec_u,
            log_det_cov=jnp.sum(jnp.log(s)),
            color=jnp.sqrt(svd_s)[:, None] * svd_vt,
        )

    @property
    def dim(self) -> int:
        return self.mean.shape[0]

    def logpdf(self, x):
        dev = x - self.mean
        maha = jnp.sum(jnp.abs(dev @ self.prec_u), axis=-1)
        return -(self.dim * jnp.log(2.0) + 0.5 * self.log_det_cov + maha)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cdf(self, x):
        s = jnp.sum((x - self.mean) @ self.prec_u, axis=-1)
        return jnp.where(s < 0, 0.5 * jnp.exp(s), 1.0 - 0.5 * jnp.exp(-s))

    def logcdf(self, x):
        return jnp.log(self.cdf(x))

    def rvs(self, key, size: int = 1):
        z = jax.random.laplace(key, (size, self.dim), self.mean.dtype)
        return z @ self.color + self.mean

    def entropy(self):
        return 0.5 * (
            self.dim * jnp.log(2 * jnp.pi * jnp.e) + self.log_det_cov
        )
