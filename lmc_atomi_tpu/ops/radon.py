"""Parallel-beam Radon transform operator.

Completes the imaging forward-operator set of SURVEY.md §7 (blur, gradient,
mask, wavelet, Radon). Forward projection: bilinear sampling of the image
along rotated rays (``jax.scipy.ndimage.map_coordinates``); the adjoint
(backprojection) is derived mechanically with ``jax.linear_transpose``, so
the dot test holds to machine precision by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops.linops import LinOp

__all__ = ["Radon2D"]


@struct.dataclass
class Radon2D(LinOp):
    thetas: jnp.ndarray  # (n_angles,) radians
    shape: tuple = struct.field(pytree_node=False, default=(0, 0))

    @classmethod
    def create(cls, shape, n_angles: int = 90, dtype=jnp.float32):
        thetas = jnp.linspace(0.0, jnp.pi, n_angles, endpoint=False, dtype=dtype)
        return cls(thetas=thetas, shape=tuple(shape))

    def _project(self, x):
        ny, nx = self.shape
        n_det = max(ny, nx)
        c = (jnp.asarray([ny, nx], x.dtype) - 1.0) / 2.0
        t = jnp.arange(n_det, dtype=x.dtype) - (n_det - 1.0) / 2.0  # detector
        s = jnp.arange(n_det, dtype=x.dtype) - (n_det - 1.0) / 2.0  # along ray

        def one(theta):
            ct, st = jnp.cos(theta), jnp.sin(theta)
            # ray direction (ct, st); detector axis (-st, ct)
            yy = c[0] + t[None, :] * ct + s[:, None] * (-st)
            xx = c[1] + t[None, :] * st + s[:, None] * ct
            vals = jax.scipy.ndimage.map_coordinates(
                x, [yy, xx], order=1, mode="constant", cval=0.0
            )
            return vals.sum(axis=0)

        return jax.vmap(one)(self.thetas)

    def matvec(self, x):
        return self._project(x)

    def rmatvec(self, sino):
        ny, nx = self.shape
        zero = jnp.zeros(self.shape, sino.dtype)
        transpose = jax.linear_transpose(self._project, zero)
        (out,) = transpose(sino)
        return out
