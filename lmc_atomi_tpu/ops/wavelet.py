"""Orthogonal Haar wavelet transform operator (2-D, multi-level).

The sparsifying operator for the wavelet-l1 inpainting workload
(BASELINE.json config 4). Orthogonal: ``rmatvec`` is the exact inverse, so
adjoint tests and gram solves are trivial (``A^T A = I``). Coefficients are
packed in the standard pyramid layout (approximation in the top-left).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops.linops import LinOp

__all__ = ["HaarDWT2D"]

_SQRT2 = 2.0**0.5


def _fwd_1level(x):
    ny, nx = x.shape
    a = (x[0::2] + x[1::2]) / _SQRT2  # rows
    d = (x[0::2] - x[1::2]) / _SQRT2
    xa = jnp.concatenate([a, d], axis=0)
    a2 = (xa[:, 0::2] + xa[:, 1::2]) / _SQRT2  # cols
    d2 = (xa[:, 0::2] - xa[:, 1::2]) / _SQRT2
    return jnp.concatenate([a2, d2], axis=1)


def _inv_1level(c):
    ny, nx = c.shape
    a2, d2 = c[:, : nx // 2], c[:, nx // 2 :]
    xa = jnp.zeros_like(c)
    xa = xa.at[:, 0::2].set((a2 + d2) / _SQRT2)
    xa = xa.at[:, 1::2].set((a2 - d2) / _SQRT2)
    a, d = xa[: ny // 2], xa[ny // 2 :]
    x = jnp.zeros_like(c)
    x = x.at[0::2].set((a + d) / _SQRT2)
    x = x.at[1::2].set((a - d) / _SQRT2)
    return x


@struct.dataclass
class HaarDWT2D(LinOp):
    levels: int = struct.field(pytree_node=False, default=3)

    def matvec(self, x):
        ny, nx = x.shape
        for lv in range(self.levels):
            sy, sx = ny >> lv, nx >> lv
            if sy % 2 or sx % 2:
                break
            sub = _fwd_1level(x[:sy, :sx])
            x = x.at[:sy, :sx].set(sub)
        return x

    def rmatvec(self, c):
        ny, nx = c.shape
        for lv in reversed(range(self.levels)):
            sy, sx = ny >> lv, nx >> lv
            if sy % 2 or sx % 2:
                continue
            sub = _inv_1level(c[:sy, :sx])
            c = c.at[:sy, :sx].set(sub)
        return c

    def gram_solve(self, rho, y, niter: int = 0):
        # orthogonal: A^T A = I
        return y / (1.0 + rho)

    def max_gram_eig(self, probe=None, iters: int = 0):
        return jnp.asarray(1.0)
