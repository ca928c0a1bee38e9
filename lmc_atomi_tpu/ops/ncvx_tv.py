"""Nonconvex TV data functional (MC-TV / ME-TV).

TPU-native re-design of the reference ``L2_ncvx_tv`` (reference
algs.py:22-291, component C3):

    f(x) = sigma/2 ||Op x - b||^2 - lamda * MoreauEnv_gamma(g)(.) [+ alpha q.x]

with two modes:
  * **MC-TV** (``op2`` = gradient operator): minimax-concave TV; ``g`` is the
    (an)isotropic l1 of the gradient field, with the isotropic per-pixel
    gradient-norm clamp of reference algs.py:213-217.
  * **ME-TV** (``op2 is None``): Moreau envelope of TV directly on x
    (reference algs.py:221-223); isotropic uses the 2-D Chambolle TV prox,
    anisotropic the 1-D TV on the flattened image (reference algs.py:169-170).

``prox`` performs the concave-part linearization step then the quadratic
solve ``(I + tau sigma Op^T Op)^{-1}`` — *exact* via the operator's spectral
``gram_solve`` instead of the reference's cached-Cholesky / LSQR paths
(reference algs.py:230-254). ``grad`` matches reference algs.py:270-291.

Everything is a pytree dataclass operating on natural ``(ny, nx)`` images.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops import tv as tv_ops
from lmc_atomi_tpu.ops.prox import prox_laplace

__all__ = ["L2NcvxTV"]


@struct.dataclass
class L2NcvxTV:
    op: Optional[Any]  # data-term LinOp (None => identity)
    b: Optional[jnp.ndarray]
    op2: Optional[Any] = None  # gradient LinOp => MC-TV mode
    q: Optional[jnp.ndarray] = None
    sigma: float = 1.0
    alpha: float = 1.0
    lamda: float = 1.0
    gamma: float = 0.5
    isotropic: bool = struct.field(pytree_node=False, default=False)
    qgrad: bool = struct.field(pytree_node=False, default=True)
    niter_inner: int = struct.field(pytree_node=False, default=10)
    niter_solve: int = struct.field(pytree_node=False, default=50)

    # -- Moreau-envelope building blocks -----------------------------------

    def _grad_moreau(self, x):
        """grad of MoreauEnv_gamma(g) at x (reference algs.py:270-282)."""
        if self.op2 is not None:
            gx = self.op2.matvec(x)
            if self.isotropic:
                mag = jnp.sqrt(jnp.sum(gx * gx, axis=0, keepdims=True))
                mag = jnp.where(mag != 0, mag, 1e-9)
                clamp = jnp.minimum(1.0 / self.gamma, 1.0 / mag)
                return self.op2.rmatvec(clamp * gx)
            return self.op2.rmatvec(gx - prox_laplace(gx, self.gamma)) / self.gamma
        if self.isotropic:
            p = tv_ops.prox_tv_iso(x, self.gamma, self.niter_inner)
        else:
            p = tv_ops.prox_tv1d(x.ravel(), self.gamma, self.niter_inner).reshape(
                x.shape
            )
        return (x - p) / self.gamma

    def _moreau_env(self, x):
        """MoreauEnv_gamma(g) value (reference algs.py:173-180)."""
        if self.op2 is not None:
            gx = self.op2.matvec(x)
            if self.isotropic:
                gx = jnp.sqrt(jnp.sum(gx * gx, axis=0))
            p = prox_laplace(gx, self.gamma)
            return jnp.sum(jnp.abs(p)) + jnp.sum(jnp.square(gx - p)) / (
                2.0 * self.gamma
            )
        if self.isotropic:
            p = tv_ops.prox_tv_iso(x, self.gamma, self.niter_inner)
            gval = tv_ops.tv_iso(p)
        else:
            p = tv_ops.prox_tv1d(x.ravel(), self.gamma, self.niter_inner).reshape(
                x.shape
            )
            gval = tv_ops.tv1d(p.ravel())
        return gval + jnp.sum(jnp.square(x - p)) / (2.0 * self.gamma)

    # -- functional protocol ------------------------------------------------

    def __call__(self, x):
        env = self._moreau_env(x)
        if self.op is not None and self.b is not None:
            f = 0.5 * self.sigma * jnp.sum(jnp.square(self.op.matvec(x) - self.b))
        elif self.b is not None:
            f = 0.5 * self.sigma * jnp.sum(jnp.square(x - self.b))
        else:
            f = 0.5 * self.sigma * jnp.sum(jnp.square(x))
        if self.q is not None:
            f = f + self.alpha * jnp.vdot(self.q, x).real
        return f - self.lamda * env

    def grad(self, x):
        gm = self._grad_moreau(x)
        if self.op is not None and self.b is not None:
            g = self.sigma * self.op.rmatvec(self.op.matvec(x) - self.b)
        elif self.b is not None:
            g = self.sigma * (x - self.b)
        else:
            g = self.sigma * x
        if self.q is not None and self.qgrad:
            g = g + self.alpha * self.q
        return g - self.lamda * gm

    def prox(self, x, tau):
        # Concave-part linearization (reference algs.py:211-223).
        if self.op2 is not None:
            gx = self.op2.matvec(x)
            if self.isotropic:
                mag = jnp.sqrt(jnp.sum(gx * gx, axis=0, keepdims=True))
                mag = jnp.where(mag != 0, mag, 1e-9)
                clamp = jnp.minimum(1.0 / self.gamma, 1.0 / mag)
                x = x + tau * self.lamda * self.op2.rmatvec(clamp * gx)
            else:
                x = x + tau * self.lamda / self.gamma * self.op2.rmatvec(
                    gx - prox_laplace(gx, self.gamma)
                )
        else:
            if self.isotropic:
                p = tv_ops.prox_tv_iso(x, self.gamma, self.niter_inner)
            else:
                p = tv_ops.prox_tv1d(
                    x.ravel(), self.gamma, self.niter_inner
                ).reshape(x.shape)
            x = x + tau * self.lamda / self.gamma * (x - p)

        # Quadratic data-term solve (reference algs.py:224-267).
        if self.op is not None and self.b is not None:
            y = x + tau * self.sigma * self.op.rmatvec(self.b)
            if self.q is not None:
                y = y - tau * self.alpha * self.q
            return self.op.gram_solve(tau * self.sigma, y, niter=self.niter_solve)
        if self.b is not None:
            num = x + tau * self.sigma * self.b
            if self.q is not None:
                num = num - tau * self.alpha * self.q
            return num / (1.0 + tau * self.sigma)
        num = x if self.q is None else x - tau * self.alpha * self.q
        return num / (1.0 + tau * self.sigma)
