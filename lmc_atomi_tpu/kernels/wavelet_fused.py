"""Fully fused Pallas MYULA for the wavelet-l1 inpainting posterior.

The unfused 512^2 wavelet-l1 MYULA chain (experiments/inpainting.py,
BASELINE config 4; reference wavelet workload has no GPU analogue) runs
~1.1k iters/s: every step round-trips HBM through an XLA DWT, the
soft-threshold, the masked-data gradient, threefry noise and the moment
update.  This kernel keeps the image in VMEM across a block of steps and
fuses

  * an ORTHOGONAL multi-level 2-D DWT computed in interleaved
    (in-place) layout — Haar (masked ``pltpu.roll`` butterfly, an
    involution serving forward AND inverse) or the longer periodic
    Daubechies D4/D8 filter banks (``dwt_interleaved``: taps+1 masked
    rolls per axis pass, wrap reads exact because lattice positions wrap
    onto lattice positions);
  * the exact wavelet-l1 prox ``W^T soft(W x, thr)``.  Layout
    invariance: interleaved W equals ``P @ W_mallat`` for a permutation
    P, and soft-thresholding commutes with permutations, so the prox is
    EXACTLY the Mallat-layout prox of ``ops/functionals.py::OrthogonalL1``
    (tested to fp tolerance in tests/test_wavelet_fused.py);
  * the masked-observation data gradient ``sigma m(mx - y)``
    (ops/linops.py::Mask), the MYULA update, paired on-core Box-Muller
    noise, and streaming Welford posterior moments.

Kernel recursion (= kernels/imaging.py::myula_imaging on
``L2Data(Mask)`` + ``OrthogonalL1(HaarDWT2D)``, reference MYULA
prox_lmc.py:128-157):

    x <- (1 - tau/gamma) x - tau sigma m(mx - y)
         + (tau/gamma) W^T soft(W x, epsg gamma lam) + sqrt(2 tau) xi

The same in-VMEM DWT also fuses the WAVELET-DUAL ULPDA
(``run_ulpda_wavelet_fused``; reference generic-operator primal-dual,
algs.py:436-448): the dual lives in the interleaved coefficient domain,
its prox is the l-inf clip, and the ``L2Data(Mask)`` primal prox is the
closed form ``(v + ts m y)/(1 + ts m)`` — no inner solve at all, so one
ULPDA step is two lifting DWTs plus elementwise work.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import as_key, step_key
from lmc_atomi_tpu.core.state import SamplerState
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.kernels.myula_fused import (
    FusedChainResult,
    _VMEM_LIMIT_BYTES,
    _box_muller2,
    _key_seed,
)

__all__ = [
    "dwt_interleaved",
    "dwt_interleaved_inv",
    "haar_interleaved",
    "haar_interleaved_inv",
    "run_myula_wavelet_fused",
    "run_ulpda_wavelet_fused",
    "ulpda_wavelet_block_update",
    "wavelet_block_update",
]

_SQRT1_2 = 0.7071067811865476


def _haar_pass(x, s, axis, iy, ix, roll):
    """One masked Haar lifting butterfly at stride ``s`` along ``axis``,
    restricted to the level's LL lattice on the other axis.  Involution:
    applying it twice is the identity, so it serves forward AND inverse.

    Butterfly (slots p = idx%2s==0, q = idx%2s==s, on the lattice
    other%s==0):  new[p] = (x[p] + x[q])/sqrt2, new[q] = (x[p] - x[q])/sqrt2.
    The circular-roll wrap reads are never selected by the masks (n
    divisible by 2s), so periodic roll is safe.
    """
    n = x.shape[axis]
    idx = iy if axis == 0 else ix
    other = ix if axis == 0 else iy
    lat = (other & (s - 1)) == 0 if s > 1 else None
    r = idx & (2 * s - 1)
    m0 = r == 0
    m1 = r == s
    x_fwd = roll(x, n - s, axis)  # reads x[i + s]
    x_bwd = roll(x, s, axis)  # reads x[i - s]
    new = jnp.where(
        m0,
        (x + x_fwd) * _SQRT1_2,
        jnp.where(m1, (x_bwd - x) * _SQRT1_2, x),
    )
    return new if lat is None else jnp.where(lat, new, x)


def _iotas(shape):
    iy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return iy, ix


def haar_interleaved(x, levels: int, roll=jnp.roll, iotas=None):
    """Multi-level orthogonal 2-D Haar DWT in interleaved layout.

    Equivalent to ``ops/wavelet.py::HaarDWT2D.matvec`` up to a fixed
    permutation of coefficient positions (level-l coefficients live on
    the stride-2^l lattice instead of Mallat subband blocks)."""
    iy, ix = _iotas(x.shape) if iotas is None else iotas
    for lv in range(levels):
        s = 1 << lv
        if x.shape[0] % (2 * s) or x.shape[1] % (2 * s):
            break
        x = _haar_pass(x, s, 0, iy, ix, roll)
        x = _haar_pass(x, s, 1, iy, ix, roll)
    return x


def haar_interleaved_inv(c, levels: int, roll=jnp.roll, iotas=None):
    """Inverse (= transpose: W is orthogonal) of ``haar_interleaved``."""
    iy, ix = _iotas(c.shape) if iotas is None else iotas
    for lv in reversed(range(levels)):
        s = 1 << lv
        if c.shape[0] % (2 * s) or c.shape[1] % (2 * s):
            continue
        c = _haar_pass(c, s, 1, iy, ix, roll)
        c = _haar_pass(c, s, 0, iy, ix, roll)
    return c


def _db_filters(taps: int):
    from lmc_atomi_tpu.ops.wavelet import daubechies_filter

    h = daubechies_filter(taps)
    g = tuple((-1.0) ** i * h[len(h) - 1 - i] for i in range(len(h)))
    return h, g


def _db_pass(x, h, g, s, axis, iy, ix, roll, inverse: bool):
    """One periodic Daubechies analysis/synthesis step at stride ``s``
    along ``axis`` in INTERLEAVED layout (level-l coefficients on the
    stride-2^l lattice; cf. ``_haar_pass``, which this generalizes —
    ``taps=2`` reproduces the Haar butterfly exactly).

    Analysis (matches ``ops/wavelet.py::_dwt_step_axis`` values):
      even slot (idx%2s==0): a = sum_i h[i] x[q + i s]
      odd  slot (idx%2s==s): d = sum_i g[i] x[q + (i-1) s]
    Synthesis (transpose):
      even: sum_i h[2i] c[q - 2is] + g[2i] c[q + s - 2is]
      odd:  sum_i h[2i+1] c[q - (2i+1)s] + g[2i+1] c[q - 2is]
    Periodic wrap is exact: lattice positions wrap onto lattice positions
    (n divisible by 2s), so circular rolls realize the mod-n filter bank.
    """
    n = x.shape[axis]
    idx = iy if axis == 0 else ix
    other = ix if axis == 0 else iy
    lat = (other & (s - 1)) == 0 if s > 1 else None
    r = idx & (2 * s - 1)
    m0 = r == 0
    m1 = r == s
    reads = {}

    def rd(k):
        # reads x[q + k*s] along axis (roll by (-k*s) mod n)
        if k not in reads:
            sh = (-k * s) % n
            reads[k] = x if sh == 0 else roll(x, sh, axis)
        return reads[k]

    T = len(h)
    if inverse:
        ev = sum(
            h[2 * i] * rd(-2 * i) + g[2 * i] * rd(1 - 2 * i)
            for i in range(T // 2)
        )
        od = sum(
            h[2 * i + 1] * rd(-2 * i - 1) + g[2 * i + 1] * rd(-2 * i)
            for i in range(T // 2)
        )
    else:
        ev = sum(h[i] * rd(i) for i in range(T))
        od = sum(g[i] * rd(i - 1) for i in range(T))
    new = jnp.where(m0, ev, jnp.where(m1, od, x))
    return new if lat is None else jnp.where(lat, new, x)


def _db_level_ok(shape, s, taps):
    # same guards as DaubechiesDWT2D.matvec: sub-lattice even and >= taps
    return (
        shape[0] % (2 * s) == 0 and shape[1] % (2 * s) == 0
        and shape[0] // s >= taps and shape[1] // s >= taps
    )


def dwt_interleaved(x, taps: int, levels: int, roll=jnp.roll, iotas=None):
    """Multi-level orthogonal 2-D Daubechies DWT in interleaved layout —
    the general-tap version of ``haar_interleaved`` (``taps=2`` == Haar).
    Coefficient VALUES equal ``DaubechiesDWT2D(taps, levels).matvec`` up to
    the fixed interleaving permutation."""
    if taps == 2:
        return haar_interleaved(x, levels, roll, iotas)
    h, g = _db_filters(taps)
    iy, ix = _iotas(x.shape) if iotas is None else iotas
    for lv in range(levels):
        s = 1 << lv
        if not _db_level_ok(x.shape, s, taps):
            break
        x = _db_pass(x, h, g, s, 0, iy, ix, roll, inverse=False)
        x = _db_pass(x, h, g, s, 1, iy, ix, roll, inverse=False)
    return x


def dwt_interleaved_inv(c, taps: int, levels: int, roll=jnp.roll,
                        iotas=None):
    """Inverse (= transpose) of :func:`dwt_interleaved`."""
    if taps == 2:
        return haar_interleaved_inv(c, levels, roll, iotas)
    h, g = _db_filters(taps)
    iy, ix = _iotas(c.shape) if iotas is None else iotas
    for lv in reversed(range(levels)):
        s = 1 << lv
        if not _db_level_ok(c.shape, s, taps):
            continue
        c = _db_pass(c, h, g, s, 1, iy, ix, roll, inverse=True)
        c = _db_pass(c, h, g, s, 0, iy, ix, roll, inverse=True)
    return c


def _wavelet_kernel(
    x_ref, y_ref, m_ref, mean_ref, m2_ref, qh_ref, qn_ref, seed_ref,
    scal_ref, int_ref,
    xo_ref, meano_ref, m2o_ref, qho_ref, qno_ref,
    *, levels, taps, n_steps, with_noise, with_stats, quantiles,
    quantile_thin,
):
    from jax.experimental.pallas import tpu as pltpu

    from lmc_atomi_tpu.kernels.myula_fused import _p2_update

    x = x_ref[:]
    y = y_ref[:]
    mask = m_ref[:]
    tau = scal_ref[0]
    gamma = scal_ref[1]
    sig = scal_ref[2]  # data-term 1/sigma_noise^2
    thr = scal_ref[3]  # epsg * gamma * lam (soft threshold)
    noise_scale = scal_ref[4]
    step0 = int_ref[0]
    burn = int_ref[1]
    cnt0 = int_ref[2]
    dtype = x.dtype
    iotas = _iotas(x.shape)

    if with_noise:
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])
    noise_amp = noise_scale * jnp.sqrt(2.0 * tau)
    a = 1.0 - tau / gamma
    tg = tau / gamma
    n_q = len(quantiles)

    def roll(v, s, axis):
        return pltpu.roll(v, s, axis)

    def one_step(i, carry, xi, do_q=True):
        x, mean, m2, qstate = carry
        grad = sig * mask * (mask * x - y)
        c = dwt_interleaved(x, taps, levels, roll, iotas)
        c = jnp.sign(c) * jnp.maximum(jnp.abs(c) - thr, 0.0)
        p = dwt_interleaved_inv(c, taps, levels, roll, iotas)
        x_new = a * x - tau * grad + tg * p
        if with_noise:
            x_new = x_new + noise_amp * xi
        g = step0 + i
        w = (g >= burn).astype(jnp.int32)
        if with_stats:
            n_new = cnt0 + jnp.maximum(g + 1 - jnp.maximum(burn, step0), 0)
            wf = w.astype(dtype)
            denom = jnp.maximum(n_new, 1).astype(dtype)
            delta = x_new - mean
            mean = mean + wf * delta / denom
            m2 = m2 + wf * delta * (x_new - mean)
        if n_q and do_q:
            # global P^2 observation count (cf. myula_fused._block_kernel)
            c_prev = jnp.maximum(
                g // quantile_thin - burn // quantile_thin, 0
            )
            qstate = tuple(
                _p2_update(x_new, qs, ns, c_prev, w, pq)
                for (qs, ns), pq in zip(qstate, quantiles)
            )
        return x_new, mean, m2, qstate

    def step_body(i, carry):
        xi = _box_muller2(x.shape, dtype, pltpu)[0] if with_noise else None
        return one_step(i, carry, xi)

    def pair_body(j, carry):
        xi1, xi2 = _box_muller2(x.shape, dtype, pltpu)
        carry = one_step(2 * j, carry, xi1)
        return one_step(2 * j + 1, carry, xi2)

    # thinned quantiles: static record positions via group unrolling
    # (cf. myula_fused._block_kernel)
    q_group = 0
    if n_q and quantile_thin > 1:
        q_group = (
            quantile_thin * 2 if (with_noise and quantile_thin % 2)
            else quantile_thin
        )

        def group_body(jj, carry):
            base = q_group * jj
            u = 0
            while u < q_group:
                if with_noise:
                    xi1, xi2 = _box_muller2(x.shape, dtype, pltpu)
                    carry = one_step(
                        base + u, carry, xi1,
                        do_q=(u + 1) % quantile_thin == 0,
                    )
                    carry = one_step(
                        base + u + 1, carry, xi2,
                        do_q=(u + 2) % quantile_thin == 0,
                    )
                    u += 2
                else:
                    carry = one_step(
                        base + u, carry, None,
                        do_q=(u + 1) % quantile_thin == 0,
                    )
                    u += 1
            return carry

    if with_stats:
        mean0, m20 = mean_ref[:], m2_ref[:]
    else:
        mean0 = m20 = jnp.zeros((1, 1), dtype)
    if n_q:
        qh0 = qh_ref[:]
        qn0 = qn_ref[:]
        qstate0 = tuple(
            (
                tuple(qh0[5 * j + i] for i in range(5)),
                tuple(qn0[3 * j + i] for i in range(3)),
            )
            for j in range(n_q)
        )
    else:
        qstate0 = ()
    carry0 = (x, mean0, m20, qstate0)
    if q_group:
        if n_steps % q_group:
            raise ValueError(
                f"n_steps={n_steps} not aligned to quantile group "
                f"{q_group} (thin={quantile_thin})"
            )
        out = jax.lax.fori_loop(0, n_steps // q_group, group_body, carry0)
    elif with_noise and n_steps % 2 == 0:
        out = jax.lax.fori_loop(0, n_steps // 2, pair_body, carry0)
    else:
        out = jax.lax.fori_loop(0, n_steps, step_body, carry0)
    x, mean, m2, qstate = out
    xo_ref[:] = x
    if with_stats:
        meano_ref[:] = mean
        m2o_ref[:] = m2
    if n_q:
        qho_ref[:] = jnp.stack([q for qs, _ in qstate for q in qs])
        qno_ref[:] = jnp.stack([n for _, ns in qstate for n in ns])


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "taps", "n_steps", "with_noise", "with_stats", "interpret",
        "quantiles", "quantile_thin",
    ),
)
def wavelet_block_update(
    x, y, mask, mean, m2, seed, scal_f, scal_i, qh=None, qn=None, *,
    levels: int = 3, taps: int = 2, n_steps: int = 1,
    with_noise: bool = True,
    with_stats: bool = True, interpret: bool = False,
    quantiles: tuple = (), quantile_thin: int = 1,
):
    """``n_steps`` fused wavelet-l1 MYULA steps.  ``scal_f = [tau, gamma,
    sig, thr, noise_scale]``; ``scal_i = [step0, burn_in, count0]``.
    ``quantiles`` adds the in-kernel P^2 marker stream (``qh``/``qn`` of
    shape ``(5*n_q, ...)`` / ``(3*n_q, ...)``, cf.
    myula_fused.myula_tv_block_update).  Returns
    ``(x', mean', m2', qh', qn')``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed_tile = jnp.zeros((1, 128), jnp.int32)
    seed_tile = seed_tile.at[0, :2].set(jnp.asarray(seed, jnp.int32))

    n_q = len(quantiles)
    if qh is None:
        qh = jnp.zeros((1, 1), x.dtype)
    if qn is None:
        qn = jnp.zeros((1, 1), x.dtype)

    kern = functools.partial(
        _wavelet_kernel,
        levels=levels, taps=taps, n_steps=n_steps,
        with_noise=with_noise, with_stats=with_stats,
        quantiles=quantiles, quantile_thin=quantile_thin,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    stat_shape = x.shape if with_stats else (1, 1)
    qh_shape = (5 * n_q,) + x.shape if n_q else (1, 1)
    qn_shape = (3 * n_q,) + x.shape if n_q else (1, 1)
    aliases = {0: 0}
    if with_stats and mean.shape == x.shape:
        aliases[3] = 1
        aliases[4] = 2
    if n_q and qh.shape == qh_shape:
        aliases[5] = 3
        aliases[6] = 4
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(qh_shape, x.dtype),
            jax.ShapeDtypeStruct(qn_shape, x.dtype),
        ),
        in_specs=[vmem] * 7 + [vmem, smem, smem],
        out_specs=(vmem,) * 5,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x, y, mask, mean, m2, qh, qn, seed_tile, scal_f, scal_i)


def _ulpda_wavelet_kernel(
    x_ref, c_ref, xb_ref, y_ref, m_ref, mean_ref, m2_ref, qh_ref, qn_ref,
    seed_ref, scal_ref, int_ref,
    xo_ref, co_ref, xbo_ref, meano_ref, m2o_ref, qho_ref, qno_ref,
    *, levels, taps, n_steps, gfirst, with_noise, with_stats, quantiles,
    quantile_thin,
):
    from jax.experimental.pallas import tpu as pltpu

    from lmc_atomi_tpu.kernels.myula_fused import _p2_update

    x = x_ref[:]
    c = c_ref[:]
    y = y_ref[:]
    mask = m_ref[:]
    tau = scal_ref[0]
    mu = scal_ref[1]
    theta = scal_ref[2]
    noise_scale = scal_ref[3]
    sig = scal_ref[4]  # data-term 1/sigma_noise^2
    g_sigma = scal_ref[5]  # dual l-inf radius (L1Norm sigma)
    step0 = int_ref[0]
    burn = int_ref[1]
    cnt0 = int_ref[2]
    dtype = x.dtype
    iotas = _iotas(x.shape)

    if with_noise:
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])
    noise_amp = noise_scale * jnp.sqrt(2.0 * tau)
    ts = tau * sig
    # L2Data(Mask).prox closed form: (v + ts m y)/(1 + ts m), binary mask
    prox_den = 1.0 / (1.0 + ts * mask)
    atb = ts * mask * y

    n_q = len(quantiles)

    def roll(v, s, axis):
        return pltpu.roll(v, s, axis)

    def fwd(v):
        return dwt_interleaved(v, taps, levels, roll, iotas)

    def inv(v):
        return dwt_interleaved_inv(v, taps, levels, roll, iotas)

    def one_step(i, carry, xi, do_q=True):
        x, c, xbar, mean, m2, qstate = carry
        if gfirst:
            c = jnp.clip(c + mu * fwd(xbar), -g_sigma, g_sigma)
            x_new = (x - tau * inv(c) + atb) * prox_den
            if with_noise:
                x_new = x_new + noise_amp * xi
            xbar = x_new + theta * (x_new - x)
        else:
            x_new = (x - tau * inv(c) + atb) * prox_den
            if with_noise:
                x_new = x_new + noise_amp * xi
            xbar = x_new + theta * (x_new - x)
            c = jnp.clip(c + mu * fwd(xbar), -g_sigma, g_sigma)
        g = step0 + i
        w = (g >= burn).astype(jnp.int32)
        if with_stats:
            n_new = cnt0 + jnp.maximum(g + 1 - jnp.maximum(burn, step0), 0)
            wf = w.astype(dtype)
            denom = jnp.maximum(n_new, 1).astype(dtype)
            delta = x_new - mean
            mean = mean + wf * delta / denom
            m2 = m2 + wf * delta * (x_new - mean)
        if n_q and do_q:
            c_prev = jnp.maximum(
                g // quantile_thin - burn // quantile_thin, 0
            )
            qstate = tuple(
                _p2_update(x_new, qs, ns, c_prev, w, pq)
                for (qs, ns), pq in zip(qstate, quantiles)
            )
        return x_new, c, xbar, mean, m2, qstate

    def step_body(i, carry):
        xi = _box_muller2(x.shape, dtype, pltpu)[0] if with_noise else None
        return one_step(i, carry, xi)

    def pair_body(j, carry):
        xi1, xi2 = _box_muller2(x.shape, dtype, pltpu)
        carry = one_step(2 * j, carry, xi1)
        return one_step(2 * j + 1, carry, xi2)

    q_group = 0
    if n_q and quantile_thin > 1:
        q_group = (
            quantile_thin * 2 if (with_noise and quantile_thin % 2)
            else quantile_thin
        )

        def group_body(jj, carry):
            base = q_group * jj
            u = 0
            while u < q_group:
                if with_noise:
                    xi1, xi2 = _box_muller2(x.shape, dtype, pltpu)
                    carry = one_step(
                        base + u, carry, xi1,
                        do_q=(u + 1) % quantile_thin == 0,
                    )
                    carry = one_step(
                        base + u + 1, carry, xi2,
                        do_q=(u + 2) % quantile_thin == 0,
                    )
                    u += 2
                else:
                    carry = one_step(
                        base + u, carry, None,
                        do_q=(u + 1) % quantile_thin == 0,
                    )
                    u += 1
            return carry

    if with_stats:
        mean0, m20 = mean_ref[:], m2_ref[:]
    else:
        mean0 = m20 = jnp.zeros((1, 1), dtype)
    if n_q:
        qh0 = qh_ref[:]
        qn0 = qn_ref[:]
        qstate0 = tuple(
            (
                tuple(qh0[5 * j + i] for i in range(5)),
                tuple(qn0[3 * j + i] for i in range(3)),
            )
            for j in range(n_q)
        )
    else:
        qstate0 = ()
    # gfirst=False never READS the incoming xbar; the dead initial value is x
    carry0 = (x, c, xb_ref[:] if gfirst else x, mean0, m20, qstate0)
    if q_group:
        if n_steps % q_group:
            raise ValueError(
                f"n_steps={n_steps} not aligned to quantile group "
                f"{q_group} (thin={quantile_thin})"
            )
        out = jax.lax.fori_loop(0, n_steps // q_group, group_body, carry0)
    elif with_noise and n_steps % 2 == 0:
        out = jax.lax.fori_loop(0, n_steps // 2, pair_body, carry0)
    else:
        out = jax.lax.fori_loop(0, n_steps, step_body, carry0)
    x, c, xbar, mean, m2, qstate = out
    xo_ref[:] = x
    co_ref[:] = c
    xbo_ref[:] = xbar
    if with_stats:
        meano_ref[:] = mean
        m2o_ref[:] = m2
    if n_q:
        qho_ref[:] = jnp.stack([q for qs, _ in qstate for q in qs])
        qno_ref[:] = jnp.stack([n for _, ns in qstate for n in ns])


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "taps", "n_steps", "gfirst", "with_noise", "with_stats",
        "interpret", "quantiles", "quantile_thin",
    ),
)
def ulpda_wavelet_block_update(
    x, c, xbar, y, mask, mean, m2, seed, scal_f, scal_i, qh=None, qn=None,
    *,
    levels: int = 3, taps: int = 2, n_steps: int = 1, gfirst: bool = False,
    with_noise: bool = True, with_stats: bool = True,
    interpret: bool = False, quantiles: tuple = (), quantile_thin: int = 1,
):
    """``n_steps`` fused wavelet-dual ULPDA steps.  ``scal_f = [tau, mu,
    theta, noise_scale, sigma, g_sigma]``; ``scal_i = [step0, burn_in,
    count0]``.  The dual ``c`` lives in the INTERLEAVED coefficient
    layout.  ``quantiles`` adds the in-kernel P^2 marker stream.  Returns
    ``(x', c', xbar', mean', m2', qh', qn')``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed_tile = jnp.zeros((1, 128), jnp.int32)
    seed_tile = seed_tile.at[0, :2].set(jnp.asarray(seed, jnp.int32))

    n_q = len(quantiles)
    if qh is None:
        qh = jnp.zeros((1, 1), x.dtype)
    if qn is None:
        qn = jnp.zeros((1, 1), x.dtype)
    kern = functools.partial(
        _ulpda_wavelet_kernel,
        levels=levels, taps=taps, n_steps=n_steps, gfirst=gfirst,
        with_noise=with_noise, with_stats=with_stats,
        quantiles=quantiles, quantile_thin=quantile_thin,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    stat_shape = x.shape if with_stats else (1, 1)
    qh_shape = (5 * n_q,) + x.shape if n_q else (1, 1)
    qn_shape = (3 * n_q,) + x.shape if n_q else (1, 1)
    aliases = {0: 0, 1: 1}
    if xbar.shape == x.shape:
        aliases[2] = 2
    if with_stats and mean.shape == x.shape:
        aliases[5] = 3
        aliases[6] = 4
    if n_q and qh.shape == qh_shape:
        aliases[7] = 5
        aliases[8] = 6
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(qh_shape, x.dtype),
            jax.ShapeDtypeStruct(qn_shape, x.dtype),
        ),
        in_specs=[vmem] * 9 + [vmem, smem, smem],
        out_specs=(vmem,) * 7,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x, c, xbar, y, mask, mean, m2, qh, qn, seed_tile, scal_f, scal_i)


def run_ulpda_wavelet_fused(
    l2,  # L2Data over a Mask operator (ops/linops.py::Mask)
    g_sigma: float,  # wavelet-l1 weight (L1Norm.sigma on the dual)
    tau,
    mu,
    x0,
    key,
    n_steps: int,
    *,
    theta: float = 1.0,
    gfirst: bool = False,
    levels: int = 3,
    taps: int = 2,
    block: Optional[int] = None,
    burn_in: int = 0,
    noise_scale: float = 1.0,
    interpret: bool = False,
    quantiles: tuple = (),
    quantile_thin: int = 1,
    quantile_state=None,
) -> FusedChainResult:
    """Block-fused wavelet-dual ULPDA chain (in-kernel Welford moments;
    optional in-kernel P^2 ``quantiles`` stream, cf. run_myula_tv_fused).

    The primal recursion is EXACTLY ``kernels/imaging.py::ulpda(L2Data(Mask),
    L1Norm, HaarDWT2D(levels))`` (reference generic-operator ULPDA,
    algs.py:436-448): interleaved W = P @ W_mallat for a permutation P, the
    l-inf clip commutes with P, and W^T P^T P = W^T, so the x-sequence is
    layout-independent.  The returned dual ``extras.y`` is in the
    INTERLEAVED layout — resume only with this runner, not the Mallat-layout
    unfused kernel.  The closed-form mask prox needs no inner solve, so the
    whole primal-dual step fuses in VMEM."""
    mask = l2.op.mask
    y = l2.b
    x0 = jnp.asarray(x0)
    if block is None:
        block = min(n_steps, 250)
    while n_steps % block:
        block -= 1
    quantiles = tuple(float(p) for p in quantiles)
    n_q = len(quantiles)
    if n_q and quantile_thin > 1:
        group = (
            quantile_thin * 2
            if (noise_scale != 0.0 and quantile_thin % 2)
            else quantile_thin
        )
        if n_steps % group:
            raise ValueError(
                f"n_steps={n_steps} must be a multiple of the quantile "
                f"group {group} (quantile_thin={quantile_thin})"
            )
        b = max(block - block % group, group)
        while n_steps % b:
            b -= group
        block = b
    n_blocks = n_steps // block
    key = as_key(key)
    scal_f = jnp.asarray(
        [tau, mu, theta, noise_scale, l2.sigma, g_sigma], x0.dtype
    )
    zeros = jnp.zeros_like(x0)
    if n_q:
        if quantile_state is not None:
            qh0, qn0 = quantile_state
        else:
            qh0 = jnp.zeros((5 * n_q,) + x0.shape, x0.dtype)
            qn0 = jnp.tile(
                jnp.arange(2.0, 5.0, dtype=x0.dtype)[:, None, None],
                (n_q, x0.shape[0], x0.shape[1]),
            )
    else:
        qh0 = qn0 = jnp.zeros((1, 1), x0.dtype)

    def body(carry, b):
        x, c, xbar, mean, m2, qh, qn = carry
        step0 = b * block
        cnt0 = jnp.maximum(step0 - burn_in, 0)
        scal_i = jnp.stack(
            [step0, jnp.asarray(burn_in, jnp.int32), cnt0]
        ).astype(jnp.int32)
        x, c, xbar, mean, m2, qh, qn = ulpda_wavelet_block_update(
            x, c, xbar, y, mask, mean, m2, _key_seed(step_key(key, b)),
            scal_f, scal_i, qh, qn, levels=levels, taps=taps,
            n_steps=block, gfirst=gfirst,
            with_noise=noise_scale != 0.0, with_stats=True,
            interpret=interpret, quantiles=quantiles,
            quantile_thin=quantile_thin,
        )
        return (x, c, xbar, mean, m2, qh, qn), None

    (x, c, xbar, mean, m2, qh, qn), _ = jax.lax.scan(
        body, (x0, zeros, x0, zeros, zeros, qh0, qn0),
        jnp.arange(n_blocks, dtype=jnp.int32),
    )
    count = jnp.asarray(max(n_steps - burn_in, 0), jnp.int32)
    from lmc_atomi_tpu.kernels.imaging import ULPDAExtras

    return FusedChainResult(
        final_state=SamplerState.init(x, extras=ULPDAExtras(y=c, xbar=xbar)),
        moments=RunningMoments(count=count, mean=mean, m2=m2),
        quantiles=(
            {p: qh[5 * j + 2] for j, p in enumerate(quantiles)}
            if n_q else None
        ),
        quantile_state=(qh, qn) if n_q else None,
    )


def run_myula_wavelet_fused(
    l2,  # L2Data over a Mask operator (ops/linops.py::Mask)
    lam: float,  # wavelet-l1 weight (OrthogonalL1.sigma)
    tau: float,
    gamma: float,
    x0,
    key,
    n_steps: int,
    *,
    levels: int = 3,
    taps: int = 2,
    epsg: float = 1.0,
    block: Optional[int] = None,
    burn_in: int = 0,
    noise_scale: float = 1.0,
    interpret: bool = False,
    step_offset: int = 0,
    quantiles: tuple = (),
    quantile_thin: int = 1,
    quantile_state=None,
) -> FusedChainResult:
    """Block-fused wavelet-l1 MYULA chain with in-kernel Welford posterior
    moments (cf. run_myula_tv_fused). ``l2.op`` must be a ``Mask``;
    the prior is ``lam * ||W x||_1`` with the level-``levels`` orthogonal
    DWT (``taps``: 2 = Haar, 4 = D4, 8 = D8).  ``step_offset`` is this
    run's global starting step, so burn-in masking continues across
    segmented/resumable executions (cf. run_resumable_fused; the Welford
    count restarts per run and partial results merge via
    ``RunningMoments.merge``)."""
    mask = l2.op.mask
    y = l2.b
    x0 = jnp.asarray(x0)
    if block is None:
        block = min(n_steps, 500)
    while n_steps % block:
        block -= 1
    quantiles = tuple(float(p) for p in quantiles)
    n_q = len(quantiles)
    if n_q and quantile_thin > 1:
        group = (
            quantile_thin * 2
            if (noise_scale != 0.0 and quantile_thin % 2)
            else quantile_thin
        )
        if n_steps % group:
            raise ValueError(
                f"n_steps={n_steps} must be a multiple of the quantile "
                f"group {group} (quantile_thin={quantile_thin})"
            )
        b = max(block - block % group, group)
        while n_steps % b:
            b -= group
        block = b
        if isinstance(step_offset, int) and step_offset % quantile_thin:
            raise ValueError(
                f"step_offset={step_offset} must align to "
                f"quantile_thin={quantile_thin}"
            )
    n_blocks = n_steps // block
    key = as_key(key)
    scal_f = jnp.asarray(
        [tau, gamma, l2.sigma, epsg * gamma * lam, noise_scale], x0.dtype
    )
    zeros = jnp.zeros_like(x0)
    step_offset = jnp.asarray(step_offset, jnp.int32)
    if n_q:
        if quantile_state is not None:
            qh0, qn0 = quantile_state
        else:
            qh0 = jnp.zeros((5 * n_q,) + x0.shape, x0.dtype)
            qn0 = jnp.tile(
                jnp.arange(2.0, 5.0, dtype=x0.dtype)[:, None, None],
                (n_q, x0.shape[0], x0.shape[1]),
            )
    else:
        qh0 = qn0 = jnp.zeros((1, 1), x0.dtype)

    def body(carry, b):
        x, mean, m2, qh, qn = carry
        step0 = step_offset + b * block
        cnt0 = jnp.maximum(step0 - jnp.maximum(burn_in, step_offset), 0)
        scal_i = jnp.stack(
            [step0, jnp.asarray(burn_in, jnp.int32), cnt0]
        ).astype(jnp.int32)
        x, mean, m2, qh, qn = wavelet_block_update(
            x, y, mask, mean, m2, _key_seed(step_key(key, b)),
            scal_f, scal_i, qh, qn, levels=levels, taps=taps,
            n_steps=block,
            with_noise=noise_scale != 0.0, with_stats=True,
            interpret=interpret, quantiles=quantiles,
            quantile_thin=quantile_thin,
        )
        return (x, mean, m2, qh, qn), None

    (x, mean, m2, qh, qn), _ = jax.lax.scan(
        body, (x0, zeros, zeros, qh0, qn0),
        jnp.arange(n_blocks, dtype=jnp.int32),
    )
    count = (
        jnp.maximum(step_offset + n_steps - burn_in, 0)
        - jnp.maximum(step_offset - burn_in, 0)
    ).astype(jnp.int32)
    return FusedChainResult(
        final_state=SamplerState.init(x),
        moments=RunningMoments(count=count, mean=mean, m2=m2),
        quantiles=(
            {p: qh[5 * j + 2] for j, p in enumerate(quantiles)}
            if n_q else None
        ),
        quantile_state=(qh, qn) if n_q else None,
    )
