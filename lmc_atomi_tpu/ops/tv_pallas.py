"""Fused Pallas TPU kernel for the Chambolle isotropic TV prox.

The XLA version (ops/tv.py) round-trips x and the dual field p through HBM
on every one of the ``niter`` dual iterations. Here the whole iteration runs
inside one Pallas kernel with x and p resident in VMEM: at 512x512 f32 the
working set (x 1MB + p 2x1MB + temporaries) fits comfortably in the ~16MB
VMEM, so the 10-iteration prox costs one HBM read + one write total.

Same math as ops/tv.py ``prox_tv_iso`` (forward-difference Neumann gradient,
dual step 0.25); shifts are ``pltpu.roll`` + iota masks. Falls back to the
XLA path off-TPU or when the image would not fit VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["prox_tv_iso_pallas", "pallas_tv_supported"]

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # leave headroom of the ~16MB VMEM


def pallas_tv_supported(shape, dtype) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if len(shape) != 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # x, py, px plus ~5 temporaries of the same size
    working = 8 * shape[0] * shape[1] * itemsize
    return working <= _VMEM_BUDGET_BYTES


def _masks(shape, dtype, chain_nx: int = 0):
    """Forward-difference boundary masks. ``chain_nx > 0`` makes the column
    mask periodic mod ``chain_nx`` — the lane-packing mode where several
    independent width-``chain_nx`` images sit side-by-side in one array:
    zeroing the last column of EVERY chain makes all the roll-based TV
    stencils chain-local (cross-seam reads are produced but masked off)."""
    ny, nx = shape
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    my = (row < ny - 1).astype(dtype)
    if chain_nx and chain_nx < nx:
        mx = (col % chain_nx < chain_nx - 1).astype(dtype)
    else:
        mx = (col < nx - 1).astype(dtype)
    return my, mx


def _kernel(x_ref, gamma_ref, out_ref, *, niter: int, step: float):
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    gamma = gamma_ref[0]
    my, mx = _masks(x.shape, x.dtype)

    ny, nx = x.shape

    # pltpu.roll requires non-negative shifts: roll by -1 == roll by n-1
    def fwd_y(a):
        return (pltpu.roll(a, ny - 1, 0) - a) * my

    def fwd_x(a):
        return (pltpu.roll(a, nx - 1, 1) - a) * mx

    def div(py, px):
        pym = py * my
        pxm = px * mx
        return (pym - pltpu.roll(pym, 1, 0)) + (pxm - pltpu.roll(pxm, 1, 1))

    xg = x / gamma

    def body(_, carry):
        py, px = carry
        u = div(py, px) - xg
        gy = fwd_y(u)
        gx = fwd_x(u)
        mag = jnp.sqrt(gy * gy + gx * gx)
        denom = 1.0 + step * mag
        return (py + step * gy) / denom, (px + step * gx) / denom

    zero = jnp.zeros_like(x)
    py, px = jax.lax.fori_loop(0, niter, body, (zero, zero))
    out_ref[:] = x - gamma * div(py, px)


@functools.partial(jax.jit, static_argnames=("niter", "step", "interpret"))
def prox_tv_iso_pallas(x, gamma, niter: int = 10, step: float = 0.25,
                       interpret: bool = False):
    """Prox of ``gamma * TV_iso`` — fused single-kernel Chambolle."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gamma_arr = jnp.reshape(jnp.asarray(gamma, x.dtype), (1,))
    return pl.pallas_call(
        functools.partial(_kernel, niter=niter, step=step),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, gamma_arr)
