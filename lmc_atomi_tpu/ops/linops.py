"""Linear operators (TPU-native replacements for pylops, SURVEY.md §2b N2/N3).

Protocol: ``matvec`` / ``rmatvec`` plus, where the normal equations are
diagonalizable, an exact ``gram_solve(rho, y)`` returning
``(I + rho A^T A)^{-1} y`` with no inner iterations — this collapses the
reference's triple-nested LSQR loops (reference algs.py:246-254, pyproximal L2
``niter=50`` at prox_lmc_deconv.py:101) into one FFT round trip.

Operators act on *naturally shaped* arrays (images stay ``(ny, nx)``, gradient
fields are ``(2, ny, nx)``) rather than flattened vectors — XLA keeps layouts
tiled and fusable this way.

All operators are flax pytree dataclasses: safe to close over in jit/scan and
to shard with the rest of the state.
"""
from __future__ import annotations


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "Identity",
    "Diagonal",
    "Matrix",
    "CirculantBlur2D",
    "Convolve2D",
    "Gradient2D",
    "Mask",
    "uniform_kernel",
    "gaussian_kernel",
    "cg_gram_solve",
    "dot_test",
]


class LinOp:
    """Mixin with shared linear-operator helpers."""

    def matvec(self, x):
        raise NotImplementedError

    def rmatvec(self, y):
        raise NotImplementedError

    def gram_matvec(self, x):
        return self.rmatvec(self.matvec(x))

    def gram_solve(self, rho, y, niter: int = 50):
        """Solve ``(I + rho A^T A) x = y``; CG fallback, exact where possible."""
        return cg_gram_solve(self, rho, y, niter=niter)

    def max_gram_eig(self, probe: Optional[jax.Array] = None, iters: int = 50):
        """Power-method bound on ``lambda_max(A^T A)`` (used for step sizes).

        The base method iterates from ``probe`` (required — the operator's
        input shape is unknown here); operators with closed forms override.
        """
        if probe is None:
            raise ValueError(
                "max_gram_eig needs a probe array of the operator's input "
                "shape for the power method"
            )
        x = probe

        def body(_, x):
            x = self.gram_matvec(x)
            return x / jnp.linalg.norm(x.ravel())

        x = jax.lax.fori_loop(0, iters, body, x / jnp.linalg.norm(x.ravel()))
        return jnp.vdot(x.ravel(), self.gram_matvec(x).ravel()).real


@struct.dataclass
class Identity(LinOp):
    def matvec(self, x):
        return x

    def rmatvec(self, y):
        return y

    def gram_solve(self, rho, y, niter: int = 0):
        return y / (1.0 + rho)


@struct.dataclass
class Diagonal(LinOp):
    diag: jax.Array

    def matvec(self, x):
        return self.diag * x

    def rmatvec(self, y):
        return jnp.conj(self.diag) * y

    def gram_solve(self, rho, y, niter: int = 0):
        return y / (1.0 + rho * jnp.abs(self.diag) ** 2)


@struct.dataclass
class Matrix(LinOp):
    """Dense matrix operator — small-d targets; solves via Cholesky
    (the TPU analogue of reference algs.py:239-245 ``cho_factor`` path)."""

    a: jax.Array

    def matvec(self, x):
        return self.a @ x

    def rmatvec(self, y):
        return self.a.T.conj() @ y

    def gram_solve(self, rho, y, niter: int = 0):
        n = self.a.shape[1]
        m = jnp.eye(n, dtype=self.a.dtype) + rho * (self.a.T.conj() @ self.a)
        return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(m), y)


def uniform_kernel(size: int, dtype=jnp.float32) -> jax.Array:
    """The reference's uniform blur kernels (prox_lmc_deconv.py:55-69)."""
    h = jnp.ones((size, size), dtype)
    return h / h.sum()


def gaussian_kernel(size: int, sigma: float, dtype=jnp.float32) -> jax.Array:
    r = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (r / sigma) ** 2)
    k = jnp.outer(g, g)
    return k / k.sum()


@struct.dataclass
class CirculantBlur2D(LinOp):
    """Periodic 2-D convolution, diagonalized by the 2-D DFT.

    The TPU-native blur operator: ``A x = real(ifft2(fft2(x) * eigs))`` with
    adjoint via the conjugate spectrum and an *exact* gram solve
    ``(I + rho A^T A)^{-1}`` as a spectral divide (SURVEY.md §2b N2/N3). For
    uniform/gaussian kernels on natural images the periodic boundary matches
    the reference's zero-padded pylops ``Convolve2D`` away from a (k-1)-pixel
    border frame; ``Convolve2D`` below is the exact-parity variant.

    The spectrum is stored as separate real/imag float arrays (computed on
    host at build time): complex arrays exist only *inside* traced
    computations, because the axon TPU runtime rejects complex64 at the
    eager-op/transfer boundary.
    """

    eigs_re: jax.Array
    eigs_im: jax.Array
    h: Optional[jax.Array] = None  # small PSF (stencil path, opt-in)
    hh: Optional[jax.Array] = None  # autocorrelation of h (the A^T A stencil)
    offset: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    # Direct wrap-conv stencils are OPT-IN: on TPU a single-channel spatial
    # convolution cannot use the MXU and measured ~25x SLOWER than the rfft
    # spectral path at 512^2 (8.9s vs 0.32s for the 2000-step bench). The
    # stencil path remains available for platforms/shapes where it wins.
    prefer_stencil: bool = struct.field(pytree_node=False, default=False)

    _STENCIL_MAX = 13

    @classmethod
    def from_kernel(cls, shape, h, offset=None):
        import numpy as _np

        h_np = _np.asarray(h)
        if offset is None:
            offset = (h_np.shape[0] // 2, h_np.shape[1] // 2)
        ny, nx = shape
        e = _np.zeros(tuple(shape), h_np.dtype)
        e[: h_np.shape[0], : h_np.shape[1]] = h_np
        e = _np.roll(e, shift=(-offset[0], -offset[1]), axis=(0, 1))
        eigs = _np.fft.fft2(e)
        small = max(h_np.shape) <= cls._STENCIL_MAX
        hh = None
        if small:
            # A^T A is circulant convolution with the autocorrelation of h
            from scipy.signal import correlate2d

            hh = jnp.asarray(correlate2d(h_np, h_np, mode="full"), h_np.dtype)
        return cls(
            eigs_re=jnp.asarray(eigs.real, h_np.dtype),
            eigs_im=jnp.asarray(eigs.imag, h_np.dtype),
            h=jnp.asarray(h_np) if small else None,
            hh=hh,
            offset=tuple(int(o) for o in offset),
        )

    @property
    def eigs(self):
        return jax.lax.complex(self.eigs_re, self.eigs_im)

    def _wrap_conv(self, x, kernel, oy, ox):
        """Periodic convolution: y[i,j] = sum_ab k[a,b] x[(i-a+oy)%, (j-b+ox)%]."""
        kh, kw = kernel.shape
        xp = jnp.pad(x, ((kh - 1 - oy, oy), (kw - 1 - ox, ox)), mode="wrap")
        out = jax.lax.conv_general_dilated(
            xp[None, None],
            kernel[::-1, ::-1][None, None].astype(xp.dtype),
            window_strides=(1, 1),
            padding="VALID",
            # TPU convs default to bf16 accumulation: force full precision so
            # the stencil path agrees with the spectral path
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[0, 0].astype(x.dtype)

    def matvec(self, x):
        if self.prefer_stencil and self.h is not None and jnp.isrealobj(x):
            return self._wrap_conv(x, self.h, *self.offset)
        return jnp.fft.ifft2(jnp.fft.fft2(x) * self.eigs).real.astype(x.dtype)

    def rmatvec(self, y):
        if self.prefer_stencil and self.h is not None and jnp.isrealobj(y):
            kh, kw = self.h.shape
            oy, ox = self.offset
            return self._wrap_conv(
                y, self.h[::-1, ::-1], kh - 1 - oy, kw - 1 - ox
            )
        return jnp.fft.ifft2(jnp.fft.fft2(y) * jnp.conj(self.eigs)).real.astype(
            y.dtype
        )

    def gram_matvec(self, x):
        """A^T A x: one (2k-1)x(2k-1) wrap stencil for small PSFs (opt-in)."""
        if self.prefer_stencil and self.hh is not None and jnp.isrealobj(x):
            return self._wrap_conv(
                x, self.hh, self.hh.shape[0] // 2, self.hh.shape[1] // 2
            )
        return self.rmatvec(self.matvec(x))

    def _half(self):
        """Spectrum restricted to the rfft2 half-plane (real inputs)."""
        k = self.eigs_re.shape[-1] // 2 + 1
        return self.eigs_re[..., :k], self.eigs_im[..., :k]

    def gram_solve(self, rho, y, niter: int = 0):
        if jnp.isrealobj(y):
            er, ei = self._half()
            denom = 1.0 + rho * (er * er + ei * ei)
            return jnp.fft.irfft2(jnp.fft.rfft2(y) / denom, s=y.shape).astype(
                y.dtype
            )
        denom = 1.0 + rho * (self.eigs_re**2 + self.eigs_im**2)
        return jnp.fft.ifft2(jnp.fft.fft2(y) / denom).real.astype(y.dtype)

    def normal_grad(self, x, b):
        """Fused ``A^T(A x - b)`` in one spectral round trip:
        ``irfft2(|E|^2 rfft2(x) - conj(E) rfft2(b))`` — half-plane
        transforms for real images, 2 transforms instead of the 4 of
        ``rmatvec(matvec(x) - b)``. The hot term of every data-fidelity
        gradient (reference algs.py:284)."""
        if jnp.isrealobj(x) and jnp.isrealobj(b):
            er, ei = self._half()
            e2 = er * er + ei * ei
            ec = jax.lax.complex(er, -ei)
            spec = e2 * jnp.fft.rfft2(x) - ec * jnp.fft.rfft2(b)
            return jnp.fft.irfft2(spec, s=x.shape).astype(x.dtype)
        e2 = self.eigs_re**2 + self.eigs_im**2
        spec = e2 * jnp.fft.fft2(x) - jnp.conj(self.eigs) * jnp.fft.fft2(b)
        return jnp.fft.ifft2(spec).real.astype(x.dtype)

    def max_gram_eig(self, probe=None, iters: int = 0):
        return jnp.max(self.eigs_re**2 + self.eigs_im**2)


@struct.dataclass
class Convolve2D(LinOp):
    """Zero-padded linear 2-D convolution ('same' output), exact parity with
    pylops ``Convolve2D`` (reference prox_lmc_deconv.py:58-69): taps outside
    the image read zeros. Adjoint is correlation with the flipped kernel.
    Gram solves fall back to CG (fixed trip count)."""

    h: jax.Array
    offset: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))

    @classmethod
    def from_kernel(cls, h, offset=None):
        h = jnp.asarray(h)
        if offset is None:
            offset = (h.shape[0] // 2, h.shape[1] // 2)
        return cls(h=h, offset=tuple(int(o) for o in offset))

    def _conv(self, x, kernel):
        kh, kw = kernel.shape
        oy, ox = self.offset
        # y[i,j] = sum_{a,b} kernel[a,b] * x[i - (a - oy), j - (b - ox)]
        pad = ((kh - 1 - oy, oy), (kw - 1 - ox, ox))
        xp = jnp.pad(x, pad)
        out = jax.lax.conv_general_dilated(
            xp[None, None],
            kernel[::-1, ::-1][None, None].astype(xp.dtype),
            window_strides=(1, 1),
            padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return out[0, 0].astype(x.dtype)

    def matvec(self, x):
        return self._conv(x, self.h)

    def rmatvec(self, y):
        kh, kw = self.h.shape
        oy, ox = self.offset
        flipped = self.h[::-1, ::-1]
        # Adjoint offset mirrors within the kernel support.
        adj = Convolve2D(h=flipped, offset=(kh - 1 - oy, kw - 1 - ox))
        return adj.matvec(y)


@struct.dataclass
class Gradient2D(LinOp):
    """Forward-difference gradient, ``edge=False`` semantics of pylops
    ``Gradient(kind='forward')`` (reference prox_lmc_deconv.py:98): the last
    row/column of each partial is zero. Output is stacked ``(2, ny, nx)``
    (d/dy first, then d/dx), adjoint is exact negative divergence."""

    sampling: float = struct.field(pytree_node=False, default=1.0)

    def matvec(self, x):
        from lmc_atomi_tpu.ops.tv import _fwd_diff

        return jnp.stack([_fwd_diff(x, 0), _fwd_diff(x, 1)]) / self.sampling

    def rmatvec(self, p):
        from lmc_atomi_tpu.ops.tv import _fwd_diff_adjoint_neg

        # Adjoint of forward difference = negative divergence component.
        return -(
            _fwd_diff_adjoint_neg(p[0], 0) + _fwd_diff_adjoint_neg(p[1], 1)
        ) / self.sampling

    def max_gram_eig(self, probe=None, iters: int = 0):
        return jnp.asarray(8.0) / self.sampling**2


@struct.dataclass
class Mask(LinOp):
    """Sampling/inpainting mask (0/1)."""

    mask: jax.Array

    def matvec(self, x):
        return self.mask * x

    def rmatvec(self, y):
        return self.mask * y

    def gram_solve(self, rho, y, niter: int = 0):
        return y / (1.0 + rho * self.mask)


def cg_gram_solve(op: LinOp, rho, b, x0=None, niter: int = 50):
    """Conjugate gradient for ``(I + rho A^T A) x = b``.

    Fixed-trip-count ``lax.fori_loop`` body — the scan-safe replacement for
    scipy LSQR (reference algs.py:246-254; SURVEY.md idiom shift 4).
    """

    def mv(x):
        return x + rho * op.gram_matvec(x)

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mv(x)
    p = r
    rs = jnp.vdot(r.ravel(), r.ravel()).real

    def body(_, carry):
        x, r, p, rs = carry
        ap = mv(p)
        denom = jnp.vdot(p.ravel(), ap.ravel()).real
        alpha = rs / jnp.maximum(denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r.ravel(), r.ravel()).real
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return x, r, p, rs_new

    x, *_ = jax.lax.fori_loop(0, niter, body, (x, r, p, rs))
    return x


def dot_test(op: LinOp, key, x_shape, y_shape=None, dtype=jnp.float64):
    """<A x, y> == <x, A^T y> check; returns the two inner products."""
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, x_shape, dtype)
    ax = op.matvec(x)
    y = jax.random.normal(ky, ax.shape if y_shape is None else y_shape, dtype)
    lhs = jnp.vdot(ax.ravel(), y.ravel())
    rhs = jnp.vdot(x.ravel(), op.rmatvec(y).ravel())
    return lhs, rhs
