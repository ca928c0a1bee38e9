"""Convex functionals with value / grad / prox / proxdual.

The functional protocol mirrored from pyproximal (``__call__``/``prox``/
``grad``/``proxdual`` contract used throughout the reference, e.g.
algs.py:129-132, prox_lmc_deconv.py:101-122), re-implemented as pytree
dataclasses over naturally shaped arrays with exact spectral solves where the
operator permits.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops import tv as tv_ops
from lmc_atomi_tpu.ops.prox import prox_laplace

__all__ = [
    "L2Data",
    "L1Norm",
    "L21Norm",
    "TVNorm",
    "TV1DNorm",
    "OrthogonalL1",
]


@struct.dataclass
class L2Data:
    """``f(x) = sigma/2 ||Op x - b||^2`` (pyproximal ``L2`` of reference
    prox_lmc_deconv.py:101-103). ``prox`` is the exact
    ``(I + tau sigma Op^T Op)^{-1}(x + tau sigma Op^T b)`` via ``gram_solve``
    — no LSQR inner loop (SURVEY.md §2b N3).

    For circulant operators, build with :meth:`create` to cache the
    loop-invariant half-plane product spectrum ``conj(E) rfft2(b)``: XLA
    does NOT hoist it out of the sampling scan, and caching cuts the hot
    gradient to exactly two transforms (~20% step-time at 512^2).
    """

    op: Any
    b: jnp.ndarray
    sigma: float = 1.0
    niter_solve: int = struct.field(pytree_node=False, default=50)
    b_spec_re: Optional[jnp.ndarray] = None
    b_spec_im: Optional[jnp.ndarray] = None
    atb: Optional[jnp.ndarray] = None  # cached A^T b (stencil-gram path)

    @classmethod
    def create(cls, op, b, sigma: float = 1.0, niter_solve: int = 50):
        kwargs = {}
        if (getattr(op, "prefer_stencil", False)
                and getattr(op, "hh", None) is not None and jnp.isrealobj(b)):
            # opt-in small-PSF stencil path: grad = sigma (A^T A x - A^T b)
            kwargs["atb"] = jax.jit(op.rmatvec)(b)
        elif hasattr(op, "_half") and jnp.isrealobj(b):
            def spec(bb):
                er, ei = op._half()
                s = jax.lax.complex(er, -ei) * jnp.fft.rfft2(bb)
                return s.real, s.imag

            # computed under jit: complex stays inside traced code (axon)
            re, im = jax.jit(spec)(b)
            kwargs = {"b_spec_re": re, "b_spec_im": im}
        return cls(op=op, b=b, sigma=sigma, niter_solve=niter_solve, **kwargs)

    def __call__(self, x):
        return 0.5 * self.sigma * jnp.sum(jnp.square(self.op.matvec(x) - self.b))

    def grad(self, x):
        if self.atb is not None and jnp.isrealobj(x):
            return self.sigma * (self.op.gram_matvec(x) - self.atb)
        if self.b_spec_re is not None and jnp.isrealobj(x):
            er, ei = self.op._half()
            e2 = er * er + ei * ei
            spec = e2 * jnp.fft.rfft2(x) - jax.lax.complex(
                self.b_spec_re, self.b_spec_im
            )
            return self.sigma * jnp.fft.irfft2(spec, s=x.shape).astype(x.dtype)
        if hasattr(self.op, "normal_grad"):
            return self.sigma * self.op.normal_grad(x, self.b)
        return self.sigma * self.op.rmatvec(self.op.matvec(x) - self.b)

    def prox(self, x, tau):
        y = x + tau * self.sigma * self.op.rmatvec(self.b)
        return self.op.gram_solve(tau * self.sigma, y, niter=self.niter_solve)


@struct.dataclass
class L1Norm:
    """``g(z) = sigma ||z||_1`` — anisotropic TV regularizer when composed
    with a gradient operator (reference prox_lmc_deconv.py:119)."""

    sigma: float = 1.0

    def __call__(self, z):
        return self.sigma * jnp.sum(jnp.abs(z))

    def prox(self, z, tau):
        return prox_laplace(z, tau * self.sigma)

    def proxdual(self, z, mu):
        # Projection onto the l-inf ball of radius sigma (independent of mu).
        return jnp.clip(z, -self.sigma, self.sigma)


@struct.dataclass
class L21Norm:
    """``g(z) = sigma sum_i ||z_i||_2`` over the leading axis — isotropic TV
    regularizer for primal-dual schemes (pyproximal ``L21`` of reference
    prox_lmc_deconv.py:116). ``z`` has shape ``(ndim, ...)``."""

    sigma: float = 1.0

    def __call__(self, z):
        return self.sigma * jnp.sum(jnp.sqrt(jnp.sum(z * z, axis=0)))

    def prox(self, z, tau):
        nrm = jnp.sqrt(jnp.sum(z * z, axis=0, keepdims=True))
        scale = jnp.maximum(1.0 - tau * self.sigma / jnp.maximum(nrm, 1e-30), 0.0)
        return z * scale

    def proxdual(self, z, mu):
        # Per-group projection onto the l2 ball of radius sigma.
        nrm = jnp.sqrt(jnp.sum(z * z, axis=0, keepdims=True))
        return z * jnp.minimum(1.0, self.sigma / jnp.maximum(nrm, 1e-30))


@struct.dataclass
class TVNorm:
    """``g(x) = sigma TV_iso(x)`` with Chambolle-prox (pyproximal ``TV`` of
    reference prox_lmc_deconv.py:122); fixed inner trip count."""

    sigma: float = 1.0
    niter: int = struct.field(pytree_node=False, default=10)

    def __call__(self, x):
        return self.sigma * tv_ops.tv_iso(x)

    def prox(self, x, tau):
        return tv_ops.prox_tv_iso(x, tau * self.sigma, self.niter)


@struct.dataclass
class OrthogonalL1:
    """``g(x) = sigma ||W x||_1`` for an *orthogonal* analysis operator W
    (e.g. Haar DWT): the prox has the exact closed form
    ``W^T soft(W x, tau sigma)`` — the wavelet-l1 prior of BASELINE.json
    config 4."""

    op: Any  # orthogonal LinOp (rmatvec == inverse)
    sigma: float = 1.0

    def __call__(self, x):
        return self.sigma * jnp.sum(jnp.abs(self.op.matvec(x)))

    def prox(self, x, tau):
        c = self.op.matvec(x)
        return self.op.rmatvec(prox_laplace(c, tau * self.sigma))

    def moreau_grad(self, x, lam):
        """grad of the lam-Moreau envelope: (x - prox_lam(x))/lam."""
        return (x - self.prox(x, lam)) / lam

    def moreau_value(self, x, lam):
        """lam-Moreau envelope value (in coefficient space, W orthogonal):
        sigma ||p||_1 + ||p - c||^2 / (2 lam), p = soft(c, lam sigma)."""
        c = self.op.matvec(x)
        p = prox_laplace(c, lam * self.sigma)
        return self.sigma * jnp.sum(jnp.abs(p)) + jnp.sum(
            jnp.square(p - c)
        ) / (2.0 * lam)


@struct.dataclass
class TV1DNorm:
    """``g(x) = sigma TV_1d(flatten(x))`` (reference algs.py:169-170)."""

    sigma: float = 1.0
    niter: int = struct.field(pytree_node=False, default=10)

    def __call__(self, x):
        return self.sigma * tv_ops.tv1d(x.ravel())

    def prox(self, x, tau):
        return tv_ops.prox_tv1d(x.ravel(), tau * self.sigma, self.niter).reshape(
            x.shape
        )
