"""Orthogonal wavelet transform operators (2-D, multi-level).

The sparsifying operators for the wavelet-l1 inpainting workload
(BASELINE.json config 4). Orthogonal with periodic boundary: ``rmatvec`` is
the exact inverse, so adjoint tests and gram solves are trivial
(``A^T A = I``). Coefficients are packed in the standard pyramid layout
(approximation in the top-left).

``HaarDWT2D`` is the split/average special case; ``DaubechiesDWT2D``
implements the longer orthogonal Daubechies filters (D4 kills linear
trends in the detail bands, D8 cubic) via rolled periodic filter banks —
roll + strided-slice ops that XLA fuses, no gathers.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from lmc_atomi_tpu.ops.linops import LinOp

__all__ = ["HaarDWT2D", "DaubechiesDWT2D", "daubechies_filter", "make_dwt"]

_SQRT2 = 2.0**0.5

# Orthonormal Daubechies low-pass filters (sum h = sqrt(2), sum h^2 = 1).
_D4 = (
    0.48296291314469025,
    0.836516303737469,
    0.22414386804185735,
    -0.12940952255092145,
)
_D8 = (
    0.23037781330885523,
    0.7148465705525415,
    0.6308807679295904,
    -0.02798376941698385,
    -0.18703481171888114,
    0.030841381835986965,
    0.032883011666982945,
    -0.010597401784997278,
)


def daubechies_filter(taps: int) -> Tuple[float, ...]:
    """Orthonormal Daubechies low-pass filter with ``taps`` coefficients
    (4 = D4/db2, 8 = D8/db4; 2 = Haar)."""
    if taps == 2:
        return (1.0 / _SQRT2, 1.0 / _SQRT2)
    if taps == 4:
        return _D4
    if taps == 8:
        return _D8
    raise ValueError(f"no built-in Daubechies filter with {taps} taps")


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


def _dwt_step_axis(x, h, g, axis):
    """One periodic analysis step along ``axis``:
    a[k] = sum_i h[i] x[(2k+i) % n], d likewise with g."""
    a = None
    d = None
    for i, (hi, gi) in enumerate(zip(h, g)):
        xs = jnp.roll(x, -i, axis) if i else x
        ev = xs[0::2] if axis == 0 else xs[:, 0::2]
        a = hi * ev if a is None else a + hi * ev
        d = gi * ev if d is None else d + gi * ev
    return jnp.concatenate([a, d], axis=axis)


def _idwt_step_axis(c, h, g, axis):
    """Transpose (= inverse, orthogonal) of ``_dwt_step_axis``."""
    n = c.shape[axis]
    half = n // 2
    if axis == 0:
        a, d = c[:half], c[half:]
    else:
        a, d = c[:, :half], c[:, half:]
    up_shape = list(c.shape)
    up_a = jnp.zeros(up_shape, c.dtype)
    if axis == 0:
        up_a = up_a.at[0::2].set(a)
        up_d = jnp.zeros(up_shape, c.dtype).at[0::2].set(d)
    else:
        up_a = up_a.at[:, 0::2].set(a)
        up_d = jnp.zeros(up_shape, c.dtype).at[:, 0::2].set(d)
    x = None
    for i, (hi, gi) in enumerate(zip(h, g)):
        term = hi * (jnp.roll(up_a, i, axis) if i else up_a) + gi * (
            jnp.roll(up_d, i, axis) if i else up_d
        )
        x = term if x is None else x + term
    return x


@struct.dataclass
class DaubechiesDWT2D(LinOp):
    """Multi-level 2-D orthogonal Daubechies DWT, periodic boundary.

    ``taps=4`` (D4/db2) annihilates linear trends in the detail bands,
    ``taps=8`` (D8/db4) cubic — stronger sparsification of smooth images
    than Haar for the wavelet-l1 prior (VERDICT r1 next-step #10).
    Orthogonal: ``rmatvec`` is the exact inverse/adjoint.
    """

    taps: int = struct.field(pytree_node=False, default=4)
    levels: int = struct.field(pytree_node=False, default=3)

    def _filters(self):
        h = daubechies_filter(self.taps)
        g = tuple((-1.0) ** i * h[len(h) - 1 - i] for i in range(len(h)))
        return h, g

    def matvec(self, x):
        h, g = self._filters()
        ny, nx = x.shape
        for lv in range(self.levels):
            sy, sx = ny >> lv, nx >> lv
            if sy % 2 or sx % 2 or sy < len(h) or sx < len(h):
                break
            sub = x[:sy, :sx]
            sub = _dwt_step_axis(sub, h, g, 0)
            sub = _dwt_step_axis(sub, h, g, 1)
            x = x.at[:sy, :sx].set(sub)
        return x

    def rmatvec(self, c):
        h, g = self._filters()
        ny, nx = c.shape
        for lv in reversed(range(self.levels)):
            sy, sx = ny >> lv, nx >> lv
            if sy % 2 or sx % 2 or sy < len(h) or sx < len(h):
                continue
            sub = c[:sy, :sx]
            sub = _idwt_step_axis(sub, h, g, 1)
            sub = _idwt_step_axis(sub, h, g, 0)
            c = c.at[:sy, :sx].set(sub)
        return c

    def gram_solve(self, rho, y, niter: int = 0):
        # orthogonal: A^T A = I
        return y / (1.0 + rho)

    def max_gram_eig(self, probe=None, iters: int = 0):
        return jnp.asarray(1.0)


def make_dwt(name: str, levels: int = 3) -> LinOp:
    """Named DWT factory: 'haar', 'd4', 'd8'."""
    if name == "haar":
        return HaarDWT2D(levels=levels)
    if name in ("d4", "db2"):
        return DaubechiesDWT2D(taps=4, levels=levels)
    if name in ("d8", "db4"):
        return DaubechiesDWT2D(taps=8, levels=levels)
    raise ValueError(f"unknown wavelet {name!r}")
