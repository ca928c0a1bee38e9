"""Parallel-beam Radon transform operator.

Completes the imaging forward-operator set of SURVEY.md §7 (blur, gradient,
mask, wavelet, Radon). Forward projection: bilinear sampling of the image
along rotated rays; the adjoint (backprojection) is the exact transpose.

Two execution modes:

- **Dense-matrix (TPU production path).** Gathers are pathologically slow
  on TPU (~100 ms per 128^2 application through
  ``jax.scipy.ndimage.map_coordinates``), but the full projection matrix
  for the workload sizes is small (30 angles x 128 detectors x 128^2
  pixels = 251 MB f32), so the projector precomputes the exact
  bilinear-footprint matrix ONCE on the host and both ``matvec`` and
  ``rmatvec`` become a single MXU matmul — HBM-bandwidth bound,
  ~300x faster, and bit-equivalent linear algebra (full-precision dot;
  equality with the gather path gated in tests/test_radon.py).
- **Gather (fallback).** ``map_coordinates`` + ``jax.linear_transpose``
  for sizes whose matrix would not fit the budget; the adjoint is derived
  mechanically so the dot test holds by construction.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from lmc_atomi_tpu.ops.linops import LinOp

__all__ = ["Radon2D"]

_DENSE_BUDGET_BYTES = 512 * 1024 * 1024


def _footprint_coo(shape, thetas, n_det):
    """COO triplets of the exact ``_project`` matrix: entry
    ``(angle * n_det + t, pixel) -> bilinear weight`` for every sample
    point along every ray. Host-side NumPy, but only O(nnz) memory
    (~2M triplets at the CT workload scale) — the dense matrix itself is
    materialized ON DEVICE by one scatter-add, because faulting hundreds
    of fresh MB on this sandboxed single-vCPU host costs tens of seconds
    while the device scatter is milliseconds."""
    ny, nx = shape
    c0, c1 = (ny - 1.0) / 2.0, (nx - 1.0) / 2.0
    t = np.arange(n_det, dtype=np.float64) - (n_det - 1.0) / 2.0
    s = np.arange(n_det, dtype=np.float64) - (n_det - 1.0) / 2.0
    tidx = np.broadcast_to(np.arange(n_det)[None, :], (n_det, n_det))
    out_r, out_c, out_w = [], [], []
    for a, th in enumerate(np.asarray(thetas, np.float64)):
        ct, st = np.cos(th), np.sin(th)
        yy = c0 + t[None, :] * ct + s[:, None] * (-st)  # (s, t)
        xx = c1 + t[None, :] * st + s[:, None] * ct
        iy = np.floor(yy).astype(np.int64)
        ix = np.floor(xx).astype(np.int64)
        fy = yy - iy
        fx = xx - ix
        for dy in (0, 1):
            for dx in (0, 1):
                py = iy + dy
                px = ix + dx
                w = (fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx)
                ok = (py >= 0) & (py < ny) & (px >= 0) & (px < nx)
                out_r.append(a * n_det + tidx[ok])
                out_c.append((py * nx + px)[ok])
                out_w.append(w[ok])
    return (
        np.concatenate(out_r).astype(np.int32),
        np.concatenate(out_c).astype(np.int32),
        np.concatenate(out_w),
    )


def _dense_matrix(shape, thetas, n_det, dtype=jnp.float32):
    """Dense projection matrix ``(n_angles * n_det, ny * nx)`` assembled on
    host from the COO triplets (one weighted bincount per angle into a
    preallocated output — an XLA scatter-add of ~2M indices was measured
    minutes-slow on TPU, while this is seconds once per operator)."""
    ny, nx = shape
    thetas_np = np.asarray(thetas, np.float64)
    n_rows = len(thetas_np) * n_det
    out = np.zeros((n_rows, ny * nx), np.dtype(jnp.dtype(dtype)))
    for a in range(len(thetas_np)):
        # single-angle COO: rows come back 0-based for this angle
        r, c, w = _footprint_coo(shape, thetas_np[a : a + 1], n_det)
        out[a * n_det : (a + 1) * n_det] = np.bincount(
            r.astype(np.int64) * (ny * nx) + c,
            weights=w,
            minlength=n_det * ny * nx,
        ).reshape(n_det, ny * nx)
    return jnp.asarray(out, dtype)


@struct.dataclass
class Radon2D(LinOp):
    thetas: jnp.ndarray  # (n_angles,) radians
    dense: Optional[jnp.ndarray] = None  # (n_angles*n_det, ny*nx) or None
    shape: tuple = struct.field(pytree_node=False, default=(0, 0))

    @classmethod
    def create(cls, shape, n_angles: int = 90, dtype=jnp.float32,
               dense: Optional[bool] = None):
        """``dense=None`` auto-selects the matrix path when the projection
        matrix fits ``_DENSE_BUDGET_BYTES`` (it always does at the CT
        workload's 128^2/30-angle scale)."""
        thetas = jnp.linspace(0.0, jnp.pi, n_angles, endpoint=False,
                              dtype=dtype)
        ny, nx = shape
        n_det = max(ny, nx)
        nbytes = n_angles * n_det * ny * nx * jnp.dtype(dtype).itemsize
        if dense is None:
            dense = nbytes <= _DENSE_BUDGET_BYTES
        mat = None
        if dense:
            mat = _dense_matrix(shape, np.asarray(thetas), n_det, dtype)
        return cls(thetas=thetas, dense=mat, shape=tuple(shape))

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
        if self.dense is not None:
            n_angles = self.thetas.shape[0]
            out = jnp.dot(self.dense, x.ravel(),
                          precision=jax.lax.Precision.HIGHEST)
            return out.reshape(n_angles, -1)
        return self._project(x)

    def rmatvec(self, sino):
        if self.dense is not None:
            out = jnp.dot(sino.ravel(), self.dense,
                          precision=jax.lax.Precision.HIGHEST)
            return out.reshape(self.shape)
        zero = jnp.zeros(self.shape, sino.dtype)
        transpose = jax.linear_transpose(self._project, zero)
        (out,) = transpose(sino)
        return out
