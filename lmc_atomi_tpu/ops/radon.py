"""Parallel-beam Radon transform operator.

Completes the imaging forward-operator set of SURVEY.md §7 (blur, gradient,
mask, wavelet, Radon). Forward projection: sampling of the image along
rotated rays; the adjoint (backprojection) is the exact transpose.

Three execution modes:

- **Dense-matrix (small-size TPU path).** Gathers are pathologically slow
  on TPU (~100 ms per 128^2 application through
  ``jax.scipy.ndimage.map_coordinates``), but the full projection matrix
  for small sizes is manageable (30 angles x 128 detectors x 128^2
  pixels = 251 MB f32), so the projector precomputes the exact
  bilinear-footprint matrix ONCE on the host and both ``matvec`` and
  ``rmatvec`` become a single MXU matmul — HBM-bandwidth bound,
  ~300x faster, and bit-equivalent linear algebra (full-precision dot;
  equality with the gather path gated in tests/test_wavelet_radon.py).
- **Shear-FFT (reference-scale TPU path, round-3 VERDICT item 4).** At
  256^2/90 angles the dense matrix is 16 GB — instead each rotation
  factors into THREE 1-D fractional shears (Paeth decomposition
  ``R_phi = Sx(tan(phi/2)) Sy(-sin(phi)) Sx(tan(phi/2))``), each shear a
  batched 1-D FFT x per-row phase ramp x inverse FFT — all
  XLA-native batched FFTs, no gathers, O(M^2 log M) per angle. Angles are
  reduced to |phi| <= 45 deg with exact ``rot90`` pre-rotations (grouped
  statically at build time), and the image is zero-padded 2x so the
  periodic shears never wrap content. The interpolation is spectral
  (periodic sinc) rather than bilinear — a *different discretization* of
  the same continuous operator; the adjoint is ``jax.linear_transpose``
  of the forward map (transposed FFTs, still gather-free), so the dot
  test holds to roundoff by construction.
- **Gather (fallback).** ``map_coordinates`` + ``jax.linear_transpose``
  for anything else.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from lmc_atomi_tpu.ops.linops import LinOp

__all__ = ["Radon2D", "fbp"]

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


def _shear_fft(x, shifts, axis):
    """Fractional-shift shear: ``out[..., v, ...] = x[..., v + shift, ...]``
    with a per-line shift (``shifts`` indexed by the OTHER axis), realized
    as FFT x phase ramp x iFFT along ``axis``. Spectral (periodic sinc)
    interpolation; exactly linear in x."""
    m = x.shape[axis]
    k = jnp.fft.fftfreq(m).astype(x.dtype)
    xf = jnp.fft.fft(x, axis=axis)
    ang = 2.0 * jnp.pi * (
        shifts[:, None] * k[None, :] if axis == 1
        else k[:, None] * shifts[None, :]
    )
    return jnp.real(jnp.fft.ifft(xf * jnp.exp(1j * ang), axis=axis))


def _rot_shear(x, phi):
    """Rotate a centered 2-D field by ``phi`` via the 3-shear (Paeth)
    factorization: ``out(q) = x(R_phi q)`` in centered (y, x) coordinates.
    Valid for |phi| <= ~45 deg (larger angles pre-reduce with rot90)."""
    ny, nx = x.shape
    u = jnp.arange(ny, dtype=x.dtype) - (ny - 1.0) / 2.0
    v = jnp.arange(nx, dtype=x.dtype) - (nx - 1.0) / 2.0
    a = jnp.tan(phi / 2.0)
    b = -jnp.sin(phi)
    x = _shear_fft(x, a * u, axis=1)
    x = _shear_fft(x, b * v, axis=0)
    return _shear_fft(x, a * u, axis=1)


@struct.dataclass
class Radon2D(LinOp):
    thetas: jnp.ndarray  # (n_angles,) radians
    dense: Optional[jnp.ndarray] = None  # (n_angles*n_det, ny*nx) or None
    shape: tuple = struct.field(pytree_node=False, default=(0, 0))
    mode: str = struct.field(pytree_node=False, default="gather")
    shear_phis: Optional[jnp.ndarray] = None  # (n_angles,) residual angles
    shear_ks: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def create(cls, shape, n_angles: int = 90, dtype=jnp.float32,
               dense: Optional[bool] = None, mode: Optional[str] = None):
        """``mode=None`` auto-selects: the dense-matrix path when the
        projection matrix fits ``_DENSE_BUDGET_BYTES`` (the 128^2/30-angle
        scale), else the shear-FFT path (256^2/90 angles and beyond).
        ``dense`` is the legacy boolean override (True -> "dense",
        False -> "gather")."""
        thetas = jnp.linspace(0.0, jnp.pi, n_angles, endpoint=False,
                              dtype=dtype)
        ny, nx = shape
        n_det = max(ny, nx)
        nbytes = n_angles * n_det * ny * nx * jnp.dtype(dtype).itemsize
        if mode is None:
            if dense is not None:
                mode = "dense" if dense else "gather"
            else:
                mode = "dense" if nbytes <= _DENSE_BUDGET_BYTES else "shear"
        mat = None
        phis = None
        ks = ()
        if mode == "dense":
            mat = _dense_matrix(shape, np.asarray(thetas), n_det, dtype)
        elif mode == "shear":
            th = np.asarray(thetas, np.float64)
            k = np.round(th / (np.pi / 2.0)).astype(int)
            phis = jnp.asarray(th - k * (np.pi / 2.0), dtype)
            ks = tuple(int(i) for i in k)
        return cls(thetas=thetas, dense=mat, shape=tuple(shape), mode=mode,
                   shear_phis=phis, shear_ks=ks)

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

    def _project_shear(self, x):
        """Shear-FFT projection: per angle, rotate the 2x zero-padded image
        by theta (exact rot90 pre-rotation + 3-shear residual) and sum
        along the padded column axis; the central ``n_det`` rows are the
        detector bins. Angle groups (by rot90 quadrant) are static."""
        ny, nx = self.shape
        if ny != nx:
            raise ValueError("shear-FFT Radon needs a square image")
        n = ny
        m = 2 * n
        pad = (m - n) // 2
        xp = jnp.zeros((m, m), x.dtype).at[pad:pad + n, pad:pad + n].set(x)
        outs = [None] * len(self.shear_ks)
        for k in sorted(set(self.shear_ks)):
            idx = [i for i, kk in enumerate(self.shear_ks) if kk == k]
            xk = jnp.rot90(xp, -k)
            phis = self.shear_phis[jnp.asarray(idx)]
            z = jax.vmap(lambda p, xx=xk: _rot_shear(xx, p))(phis)
            proj = z.sum(axis=2)[:, pad:pad + n]
            for j, i in enumerate(idx):
                outs[i] = proj[j]
        return jnp.stack(outs)

    def matvec(self, x):
        if self.mode == "shear":
            # jitted wrapper: the shear path's complex FFT intermediates
            # must exist only inside a compiled computation — the axon TPU
            # runtime rejects complex64 at the eager-op boundary
            return _shear_matvec_jit(self, x)
        if self.dense is not None:
            n_angles = self.thetas.shape[0]
            out = jnp.dot(self.dense, x.ravel(),
                          precision=jax.lax.Precision.HIGHEST)
            return out.reshape(n_angles, -1)
        return self._project(x)

    def rmatvec(self, sino):
        if self.mode == "shear":
            return _shear_rmatvec_jit(self, sino)
        if self.dense is not None:
            out = jnp.dot(sino.ravel(), self.dense,
                          precision=jax.lax.Precision.HIGHEST)
            return out.reshape(self.shape)
        zero = jnp.zeros(self.shape, sino.dtype)
        transpose = jax.linear_transpose(self._project, zero)
        (out,) = transpose(sino)
        return out


@functools.partial(jax.jit, static_argnames=("filter_name", "calibrate"))
def fbp(op: Radon2D, sino, filter_name: str = "ramp",
        calibrate: bool = True):
    """Filtered backprojection reconstruction (classic CT analytic inverse).

    Ramp-filters the sinogram along the detector axis (|f| in cycles/sample,
    optional Hann apodization for noise suppression) and backprojects through
    the operator's exact adjoint — works with every Radon2D mode (dense,
    shear-FFT, gather).  Because the discrete adjoint's footprint
    normalization differs from the continuous-FBP constant, ``calibrate=True``
    rescales by the 1-D least-squares fit ``c = <A x, y> / ||A x||^2`` (one
    extra matvec), which makes the output scale-correct for any mode and
    detector convention.  Used as the chain/MAP initializer in
    experiments/ct.py — an analytic init the reference lacks (its imaging
    inits are the observation itself, prox_lmc_deconv.py:447).
    """
    n_angles, n_det = sino.shape
    # discrete bandlimited ramp (Kak & Slaney eq. 61): built in REAL space
    # so DC comes out small-positive instead of zero — plain |f| filtering
    # destroys each projection's mean and with it all low frequencies.
    # 2x zero-padding avoids circular-convolution wrap.
    m = 1
    while m < 2 * n_det:
        m *= 2
    idx = np.concatenate([np.arange(m // 2 + 1), np.arange(m // 2 - 1, 0, -1)])
    h = np.zeros(m)
    h[0] = 0.25
    odd = idx % 2 == 1
    h[odd] = -1.0 / (np.pi * idx[odd]) ** 2
    filt = 2.0 * jnp.asarray(np.real(np.fft.rfft(h)), sino.dtype)
    if filter_name == "hann":
        f = jnp.fft.rfftfreq(m).astype(sino.dtype)
        filt = filt * (0.5 + 0.5 * jnp.cos(2.0 * jnp.pi * f))
    elif filter_name != "ramp":
        raise ValueError(f"unknown FBP filter {filter_name!r}")
    pad = jnp.zeros((n_angles, m), sino.dtype).at[:, :n_det].set(sino)
    sf = jnp.fft.irfft(
        jnp.fft.rfft(pad, axis=1) * filt[None, :], n=m, axis=1
    )[:, :n_det].astype(sino.dtype)
    x = op.rmatvec(sf) * (jnp.pi / (2.0 * n_angles))
    if calibrate:
        # affine fit min_{a,b} ||a A x + b A 1 - y||^2 (2x2 normal system,
        # two extra matvecs): a fixes the discrete-adjoint normalization,
        # b recovers the DC pedestal the ramp filter cannot represent
        ax = op.matvec(x).ravel()
        a1 = op.matvec(jnp.ones_like(x)).ravel()
        g11 = jnp.vdot(ax, ax).real
        g12 = jnp.vdot(ax, a1).real
        g22 = jnp.vdot(a1, a1).real
        r1 = jnp.vdot(ax, sino.ravel()).real
        r2 = jnp.vdot(a1, sino.ravel()).real
        det = jnp.maximum(g11 * g22 - g12 * g12, 1e-30)
        a = (g22 * r1 - g12 * r2) / det
        b = (g11 * r2 - g12 * r1) / det
        x = a.astype(x.dtype) * x + b.astype(x.dtype)
    return x


@jax.jit
def _shear_matvec_jit(op: Radon2D, x):
    return op._project_shear(x)


@jax.jit
def _shear_rmatvec_jit(op: Radon2D, sino):
    zero = jnp.zeros(op.shape, sino.dtype)
    transpose = jax.linear_transpose(op._project_shear, zero)
    (out,) = transpose(sino)
    return out
