"""Fully fused MYULA tail: Chambolle TV prox + convex-combination update +
Gaussian noise in ONE Pallas kernel.

Per step the standard path does: TV prox (fused already), threefry noise
(HBM write+read), and the elementwise update — several extra HBM round
trips over the image. Here everything after the spectral data-term gradient
happens in VMEM: the dual TV iterations, the update

    x' = (1 - tau/gamma) x - tau g + (tau/gamma) tvprox(x) + sqrt(2 tau) xi

and the noise, generated on-core with the Pallas PRNG (Box-Muller over
``prng_random_bits``). The PRNG stream differs from the runner's threefry
keys — statistically equivalent, not bit-equal; the deterministic part is
bit-checked against the unfused kernel in tests (noise_scale=0).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.kernels.base import Kernel
from lmc_atomi_tpu.ops.tv_pallas import _masks

__all__ = ["myula_tv_fused_update", "myula_imaging_fused"]


def _kernel(x_ref, g_ref, seed_ref, scal_ref, out_ref, *, niter, step, with_noise):
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    grad = g_ref[:]
    tau = scal_ref[0]
    gamma = scal_ref[1]
    tv_gamma = scal_ref[2]
    noise_scale = scal_ref[3]
    ny, nx = x.shape
    my, mx = _masks(x.shape, x.dtype)

    def fwd_y(a):
        return (pltpu.roll(a, ny - 1, 0) - a) * my

    def fwd_x(a):
        return (pltpu.roll(a, nx - 1, 1) - a) * mx

    def div(py, px):
        pym = py * my
        pxm = px * mx
        return (pym - pltpu.roll(pym, 1, 0)) + (pxm - pltpu.roll(pxm, 1, 1))

    # --- Chambolle dual TV prox of x (identical math to ops/tv.py) ---------
    xg = x / tv_gamma

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
    tvprox = x - tv_gamma * div(py, px)

    # --- on-core Gaussian noise (Box-Muller over raw PRNG bits) ------------
    drift = (1.0 - tau / gamma) * x - tau * grad + (tau / gamma) * tvprox
    if with_noise:
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])
        b1 = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        # uniform in (0, 1): top 24 bits (fits int32 — Mosaic cannot cast
        # uint32 to float directly), offset half an ulp
        i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
        i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
        u1 = i1.astype(x.dtype) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
        u2 = i2.astype(x.dtype) * (1.0 / (1 << 24))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        xi = r * jnp.cos(2.0 * jnp.pi * u2)
        drift = drift + noise_scale * jnp.sqrt(2.0 * tau) * xi
    out_ref[:] = drift


@functools.partial(
    jax.jit, static_argnames=("niter", "step", "interpret", "with_noise")
)
def myula_tv_fused_update(
    x, grad, seed, tau, gamma, tv_gamma, noise_scale=1.0,
    niter: int = 10, step: float = 0.25, interpret: bool = False,
    with_noise: bool = True,
):
    """One fused MYULA update given the data-term gradient ``grad``.

    ``seed`` is an int32 array of shape (2,) (fold the step counter in)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # seed rides in VMEM padded to a (1, 128) tile: SMEM operands cannot gain
    # a batch dim under vmap, and sub-tile VMEM blocks violate Mosaic tiling
    seed_tile = jnp.zeros((1, 128), jnp.int32)
    seed_tile = seed_tile.at[0, :2].set(jnp.asarray(seed, jnp.int32))

    scal = jnp.stack(
        [
            jnp.asarray(tau, x.dtype),
            jnp.asarray(gamma, x.dtype),
            jnp.asarray(tv_gamma, x.dtype),
            jnp.asarray(noise_scale, x.dtype),
        ]
    )
    return pl.pallas_call(
        functools.partial(_kernel, niter=niter, step=step,
                          with_noise=with_noise),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, grad, seed_tile, scal)


def myula_imaging_fused(
    proxf: Any,
    tv_sigma: float,
    tau,
    gamma,
    niter_tv: int = 10,
    base_seed: int = 0,
    noise_scale: float = 1.0,
) -> Kernel:
    """MYULA with isotropic-TV prior, fused tail (TPU, image must fit VMEM).

    Drop-in alternative to ``myula_imaging(proxf, TVNorm(tv_sigma,
    niter_tv), ...)`` with on-core noise. The Pallas PRNG is seeded from the
    runner's per-step/per-chain threefry key (its raw key data), so distinct
    chains and distinct user keys get distinct noise streams; ``base_seed``
    adds a stream offset.
    """

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        x = state.position
        g = proxf.grad(x)
        kd = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.int32
        ).ravel()
        seed = jnp.stack(
            [kd[0] + jnp.asarray(base_seed, jnp.int32), kd[-1]]
        )
        x_new = myula_tv_fused_update(
            x, g, seed,
            tau, gamma, tv_sigma * gamma, noise_scale, niter=niter_tv,
        )
        return state.next(x_new), StepInfo()

    return Kernel(init, step)
