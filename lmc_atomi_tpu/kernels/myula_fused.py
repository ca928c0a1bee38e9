"""Fully fused MYULA TV-deblurring: the ENTIRE sampling step (data-term
gradient + Chambolle TV prox + convex-combination update + Gaussian noise +
streaming Welford moments) in ONE Pallas kernel, multiple steps per launch.

The unfused step (kernels/imaging.py::myula_imaging) is FFT-bound: the
spectral gradient ``sigma A^T(A x - b)`` costs one rfft2+irfft2 round trip
(~64us of ~160us at 512^2). But for the small PSFs of the deconvolution
workload (reference prox_lmc_deconv.py:55-69: 5x5/6x6/7x7 uniform blurs),
``A^T A`` is circulant convolution with the (2k-1)x(2k-1) *autocorrelation*
``hh`` of the PSF, and ``hh`` is separable (exactly rank-1 for uniform and
Gaussian kernels: the autocorrelation of an outer product is the outer
product of the 1-D autocorrelations). So

    grad f(x) = sigma (A^T A x - A^T b)
              = sigma (sum_r colconv(rowconv(x, wx_r), wy_r)) - sigma A^T b

with ``hh = sum_r wy_r wx_r^T`` from a host-side SVD. Each 1-D wrap
convolution is a handful of ``pltpu.roll`` multiply-adds on the VPU — no FFT,
no MXU, no HBM traffic.

On top of that, the kernel loops ``n_steps`` sampling steps per launch with
the image resident in VMEM: per-step HBM traffic and kernel-launch overhead
amortize away. Noise is generated on-core (Box-Muller over
``pltpu.prng_random_bits``); the posterior mean/variance accumulate in-kernel
with the same weighted Welford recurrence as ``core.stats.RunningMoments``
(burn-in masked by global step index).

The PRNG stream differs from the runner's threefry keys — statistically
equivalent, not bit-equal. Parity gates: the deterministic part matches the
unfused kernel to f32 tolerance (tests/test_myula_fused.py) and the
posterior-mean PSNR matches the threefry path within 0.1 dB.

Nonconvex data terms (round-2 extension): the same kernel also fuses the
isotropic L2NcvxTV gradients (reference algs.py:270-291) — MC-TV's
clamped-gradient divergence term is a handful more VPU rolls, ME-TV's
Moreau-envelope term is a second in-VMEM Chambolle loop — so all nine
deconvolution models (3 PSFs x {TV, MC-TV, ME-TV}) run the fused path.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.core.random import as_key, step_key
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.kernels.base import Kernel
from lmc_atomi_tpu.ops.tv_pallas import _masks

__all__ = [
    "separable_gram_taps",
    "myula_tv_block_update",
    "myula_imaging_sep_fused",
    "run_myula_tv_fused",
    "run_myula_tv_fused_packed",
    "sep_fused_supported",
]

Taps = Tuple[Tuple[Tuple[float, ...], Tuple[float, ...]], ...]

# Mosaic's default scoped-VMEM limit is 16 MiB; a v5e core has 128 MiB of
# VMEM, so the fused whole-image kernels raise the limit explicitly (the
# nonconvex modes keep a few extra live 512^2 fields on the stack, and the
# fused ULPDA at 1024^2 measures ~68 MiB scoped; 96 MiB leaves room for
# the ~28 MiB of kernel operands beside the stack).
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024
_VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def separable_gram_taps(hh, tol: float = 1e-6) -> Taps:
    """Separable factorization ``hh = sum_r wy_r wx_r^T`` via SVD (host side).

    Returns a nested tuple of Python floats — static (hashable) so the taps
    bake into the Pallas kernel as immediate constants. Uniform and Gaussian
    PSF autocorrelations are exactly rank 1.
    """
    hh_np = np.asarray(hh, np.float64)
    u, s, vt = np.linalg.svd(hh_np)
    keep = s > tol * s[0]
    taps = []
    for i in np.nonzero(keep)[0]:
        scale = np.sqrt(s[i])
        taps.append(
            (
                tuple((scale * u[:, i]).tolist()),
                tuple((scale * vt[i, :]).tolist()),
            )
        )
    return tuple(taps)


def sep_fused_supported(op, shape, dtype, max_rank: int = 4) -> bool:
    """Whether the fused separable path applies: TPU backend, a circulant
    operator with a cached small-PSF autocorrelation of low separable rank,
    and a working set that fits VMEM."""
    if jax.default_backend() != "tpu":
        return False
    if getattr(op, "hh", None) is None:
        return False
    if len(shape) != 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # x, atb, mean, m2, py, px + ~6 temporaries
    if 12 * shape[0] * shape[1] * itemsize > _VMEM_BUDGET_BYTES:
        return False
    return len(separable_gram_taps(op.hh)) <= max_rank


def _sep_gram(x, taps: Taps, oy: int, ox: int, pltpu, chain_nx: int = 0):
    """``A^T A x`` as separable wrap convolutions with static-float taps.

    Matches ``CirculantBlur2D._wrap_conv(x, hh, oy, ox)``:
    ``y[i,j] = sum_ab hh[a,b] x[(i-a+oy)%ny, (j-b+ox)%nx]``.

    ``chain_nx > 0`` is the lane-packing mode: ``x`` holds ``nx/chain_nx``
    independent width-``chain_nx`` images side-by-side, and the column wrap
    must be circulant PER CHAIN.  A full-width roll by ``s`` sends chain
    boundaries into the neighbouring chain, so each tap selects between
    ``roll(s)`` (lanes with ``col%chain_nx >= s``, in-chain read) and
    ``roll(s + nx - chain_nx)`` (the own chain's tail) — one extra roll +
    select per nonzero column tap, which the doubled lane occupancy more
    than pays for on sub-128-wide images.
    """
    ny, nx = x.shape
    lane_r = None
    if chain_nx and chain_nx < nx:
        lane_r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % chain_nx

    def conv1d(v, w, off, n, axis):
        out = None
        for i, wi in enumerate(w):
            if wi == 0.0:
                continue
            s = (i - off) % n
            term = v if s == 0 else pltpu.roll(v, s, axis)
            if axis == 1 and lane_r is not None and s != 0:
                wrap = pltpu.roll(v, s + nx - chain_nx, 1)
                term = jnp.where(lane_r >= s, term, wrap)
            term = term * wi
            out = term if out is None else out + term
        return out

    out = None
    for wy, wx in taps:
        t = conv1d(x, wx, ox, chain_nx if lane_r is not None else nx, 1)
        r = conv1d(t, wy, oy, ny, 0)
        out = r if out is None else out + r
    return out


def _grad_div_ops(shape, masks, pltpu):
    """Forward-difference gradient and divergence on the VPU, identical math
    to ops/tv.py::_fwd_diff / _fwd_diff_adjoint_neg (zeroed last slot)."""
    my, mx = masks
    ny, nx = shape

    def fwd_y(a):
        return (pltpu.roll(a, ny - 1, 0) - a) * my

    def fwd_x(a):
        return (pltpu.roll(a, nx - 1, 1) - a) * mx

    def div(py, px):
        # The mask multiplies are redundant math when py/px are already
        # masked by construction, but measurably HELP Mosaic's schedule:
        # 63.6 vs 69.3 us/step at 512^2 without them.
        pym = py * my
        pxm = px * mx
        return (pym - pltpu.roll(pym, 1, 0)) + (pxm - pltpu.roll(pxm, 1, 1))

    return fwd_y, fwd_x, div


def _tv_prox(x, tv_gamma, masks, niter: int, step: float, pltpu,
             p0=None, return_dual: bool = False):
    """Chambolle dual TV prox, identical math to ops/tv.py::prox_tv_iso.

    ``p0`` warm-starts the dual ascent (the tv_warm path: across sampling
    steps the prox argument moves by O(noise), so the previous step's dual
    is a near-fixed-point and few trips recover cold-start-10 accuracy).
    """
    fwd_y, fwd_x, div = _grad_div_ops(x.shape, masks, pltpu)

    xg = x / tv_gamma

    def body(_, carry):
        py, px = carry
        u = div(py, px) - xg
        gy = fwd_y(u)
        gx = fwd_x(u)
        mag = jnp.sqrt(gy * gy + gx * gx)
        # one reciprocal + two multiplies instead of two VPU divisions
        inv = 1.0 / (1.0 + step * mag)
        return (py + step * gy) * inv, (px + step * gx) * inv

    zero = jnp.zeros_like(x)
    py, px = jax.lax.fori_loop(
        0, niter, body, (zero, zero) if p0 is None else p0
    )
    out = x - tv_gamma * div(py, px)
    return (out, (py, px)) if return_dual else out


def _tv_prox_fgp(x, tv_gamma, masks, niter: int, step: float, pltpu,
                 p0=None, return_dual: bool = False):
    """Projected-dual TV prox with FISTA momentum (FGP, Beck & Teboulle
    2009), identical math to ops/tv.py::prox_tv_iso_proj(accel=True).

    One ``rsqrt`` per trip where Chambolle's semi-implicit scaling spends a
    sqrt AND a reciprocal — the VPU transcendentals are the fused step's
    largest serial-cycle term (scripts/roofline.py) — and the momentum
    coefficients are host floats (compile-time immediates). At
    ``step = 1/8`` (the dual gradient's 1/L) FGP-8 beats cold Chambolle-10
    accuracy at every tested gamma (scripts/diag_tv_proj.py), in 32 rolls
    vs Chambolle-10's 40. ``rsqrt(0) = inf`` makes the dual-ball
    projection exact at zero duals (``min(1, inf) = 1``).
    """
    from ..ops.tv import fgp_momentum

    fwd_y, fwd_x, div = _grad_div_ops(x.shape, masks, pltpu)
    xg = x / tv_gamma
    one = jnp.asarray(1.0, x.dtype)

    def ascend(ry, rx):
        u = div(ry, rx) - xg
        py = ry + step * fwd_y(u)
        px = rx + step * fwd_x(u)
        scale = jnp.minimum(one, jax.lax.rsqrt(py * py + px * px))
        return py * scale, px * scale

    zero = jnp.zeros_like(x)
    py, px = (zero, zero) if p0 is None else p0
    ry, rx = py, px
    # momentum coefficients differ per trip -> Python-unrolled (niter static)
    for c in fgp_momentum(niter):
        qy, qx = ascend(ry, rx)
        ry = qy + c * (qy - py)
        rx = qx + c * (qx - px)
        py, px = qy, qx
    out = x - tv_gamma * div(py, px)
    return (out, (py, px)) if return_dual else out


def _sort5(v):
    """Sort a 5-tuple of fields elementwise (9 compare-exchange network)."""
    v = list(v)

    def ce(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    for i, j in ((0, 1), (3, 4), (2, 4), (2, 3), (0, 3), (0, 2), (1, 4),
                 (1, 3), (1, 2)):
        ce(i, j)
    return tuple(v)


def _p2_update(x, qs, ns, c_prev, w, p):
    """One vectorized P^2 step (Jain & Chlamtac 1985) for the ``p``-quantile.

    Elementwise over image fields — the exact recurrence of
    ``core.stats.RunningQuantile.update`` restated without dynamic indexing
    or ``lax.cond`` so it runs on the VPU inside the fused block kernel:
    ``qs`` is a 5-tuple of marker-height fields; ``ns`` a 3-tuple of
    INTERIOR marker-position fields (n1, n2, n3) — the extremes need no
    state, since n0 == 1 always and n4 == observation count (marker 4 sits
    above every cell, so it increments every step). ``c_prev`` is the
    (scalar, shared across pixels) number of observations already absorbed,
    ``w`` the 0/1 mask for this observation (burn-in). Bootstrap
    (c_prev < 5) stores into slot c_prev and sorts on the 5th; ``ns`` init
    is (2, 3, 4).
    """
    dtype = x.dtype

    # --- bootstrap branch: store x into slot c_prev; sort once full -------
    boot = [
        jnp.where((c_prev == i) & (w > 0), x, qi) for i, qi in enumerate(qs)
    ]
    srt = _sort5(tuple(boot))
    boot = [
        jnp.where((c_prev == 4) & (w > 0), si, bi) for si, bi in zip(srt, boot)
    ]

    # --- steady-state P^2 branch (valid once c_prev >= 5) -----------------
    q = list(qs)
    q[0] = jnp.minimum(q[0], x)
    q[4] = jnp.maximum(q[4], x)
    k = (
        (x >= q[1]).astype(dtype)
        + (x >= q[2]).astype(dtype)
        + (x >= q[3]).astype(dtype)
    )  # cell index in {0,1,2,3}
    cnt = jnp.asarray(c_prev + 1, dtype)
    # positions after the increment pass; extremes are implicit
    n = [
        jnp.ones((), dtype),
        ns[0] + (1.0 > k).astype(dtype),
        ns[1] + (2.0 > k).astype(dtype),
        ns[2] + (3.0 > k).astype(dtype),
        cnt,
    ]

    dn = (1.0, 1.0 + 2.0 * p, 1.0 + 4.0 * p, 3.0 + 2.0 * p, 5.0)
    nprime = [1.0 + (d - 1.0) / 4.0 * (cnt - 1.0) for d in dn]

    for i in (1, 2, 3):
        d = nprime[i] - n[i]
        move_up = (d >= 1.0) & (n[i + 1] - n[i] > 1.0)
        move_dn = (d <= -1.0) & (n[i - 1] - n[i] < -1.0)
        s = jnp.where(move_up, 1.0, jnp.where(move_dn, -1.0, 0.0)).astype(
            dtype
        )
        do_move = s != 0.0
        nm, ni, np_ = n[i - 1], n[i], n[i + 1]
        qm, qi, qp = q[i - 1], q[i], q[i + 1]
        # guard divisors: where no move happens the result is discarded, but
        # inf/NaN from 0-divides must not poison the VPU pipeline
        d_t = jnp.where(np_ - nm != 0.0, np_ - nm, 1.0)
        d_u = jnp.where(np_ - ni != 0.0, np_ - ni, 1.0)
        d_l = jnp.where(ni - nm != 0.0, ni - nm, 1.0)
        para = qi + s / d_t * (
            (ni - nm + s) * (qp - qi) / d_u + (np_ - ni - s) * (qi - qm) / d_l
        )
        ok = (qm < para) & (para < qp)
        lin = qi + s * jnp.where(s > 0.0, (qp - qi) / d_u, (qi - qm) / d_l)
        q[i] = jnp.where(do_move, jnp.where(ok, para, lin), qi)
        n[i] = jnp.where(do_move, ni + s, ni)

    # --- select branch, apply mask ---------------------------------------
    in_boot = c_prev < 5
    qs_new = tuple(
        jnp.where(w > 0, jnp.where(in_boot, bi, pi), q0i)
        for bi, pi, q0i in zip(boot, q, qs)
    )
    ns_new = tuple(
        jnp.where((w > 0) & jnp.logical_not(in_boot), pi, n0i)
        for pi, n0i in zip(n[1:4], ns)
    )
    return qs_new, ns_new


def _box_muller2(shape, dtype, pltpu):
    """TWO independent standard-normal fields from the on-core PRNG (seed
    beforehand) — Box-Muller yields a cos AND a sin variate per uniform
    pair, so consecutive sampling steps share one bits/log/sqrt pass."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniforms from the top 24 bits (fits int32 — Mosaic cannot cast uint32
    # to float directly), offset half an ulp into (0, 1)
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = i1.astype(dtype) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = i2.astype(dtype) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * jnp.pi) * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def _marker_band_rows(shape) -> int:
    """Row-band height for the HBM-paged P^2 pass: the largest power of two
    <= 128 dividing the image height (>= 2 bands so double buffering is
    actually exercised)."""
    ny = shape[0]
    band = 128
    while band > 1 and (ny % band or ny // band < 2):
        band //= 2
    return band


def _p2_hbm_pass(
    x_new, c_prev, w, qho_ref, qno_ref, qh_s, qn_s, sems,
    quantiles, pltpu, x_ref=None, xq_s=None,
):
    """One P^2 observation with marker state resident in HBM.

    ``x_new`` is the whole-image sample in VMEM; alternatively (the
    stream_x tiled layout, where no whole image ever sits in VMEM) pass
    ``x_new=None`` with ``x_ref`` an HBM ref of the updated sample and
    ``xq_s`` a (2, band, nx) VMEM scratch — the sample's bands then ride
    the same double-buffered DMA slots as the markers (``sems`` must be
    (2, 6): channel 4 is the x band in-copy).

    The (5+3)·n_q marker fields do not fit VMEM past 512^2 (at 1024^2 a
    95%-CI in-VMEM program measures 325 MB against the 128 MB core), so the
    update streams them through VMEM in row bands with double-buffered
    async copies: while band ``b`` is being updated on the VPU, band
    ``b+1`` is in flight HBM->VMEM and band ``b-1`` VMEM->HBM. The band
    loop is Python-unrolled (n_bands is static) so DMA slots are immediate.

    ``x_new`` is the freshly produced sample (whole image, in VMEM);
    ``qh_s``/``qn_s`` are (2, 5n_q|3n_q, band, nx) VMEM scratch; ``sems``
    is a (2, 4) DMA semaphore array [slot, {in_h, in_n, out_h, out_n}].
    All reads AND writes go through the OUTPUT refs (the launch prologue
    copied the incoming marker state there): within one launch a later
    recorded step must see the earlier step's updates, and an input ref
    is not guaranteed to reflect writes to its aliased output.
    """
    from jax.experimental import pallas as pl

    pl_ds = pl.ds
    ny = (x_ref if x_new is None else x_new).shape[0]
    band = qh_s.shape[2]
    n_bands = ny // band

    def dma_in(slot, b):
        cps = [
            pltpu.make_async_copy(
                qho_ref.at[:, pl_ds(b * band, band)], qh_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                qno_ref.at[:, pl_ds(b * band, band)], qn_s.at[slot],
                sems.at[slot, 1],
            ),
        ]
        if x_new is None:
            cps.append(pltpu.make_async_copy(
                x_ref.at[pl_ds(b * band, band)], xq_s.at[slot],
                sems.at[slot, 4],
            ))
        return cps

    def dma_out(slot, b):
        return (
            pltpu.make_async_copy(
                qh_s.at[slot], qho_ref.at[:, pl_ds(b * band, band)],
                sems.at[slot, 2],
            ),
            pltpu.make_async_copy(
                qn_s.at[slot], qno_ref.at[:, pl_ds(b * band, band)],
                sems.at[slot, 3],
            ),
        )

    for d in dma_in(0, 0):
        d.start()
    for b in range(n_bands):
        slot = b % 2
        nxt = (b + 1) % 2
        if b + 1 < n_bands:
            if b >= 1:
                # slot `nxt` still holds band b-1's outbound copy: the
                # write-back must land before the slot is refilled
                for d in dma_out(nxt, b - 1):
                    d.wait()
            for d in dma_in(nxt, b + 1):
                d.start()
        for d in dma_in(slot, b):
            d.wait()
        # static slice: `b` is a Python int (the band loop is unrolled) and
        # Mosaic TC has no dynamic_slice lowering — lax.slice_in_dim keeps
        # the primitive static even inside the surrounding step scan
        if x_new is None:
            xb = xq_s[slot]
        else:
            xb = jax.lax.slice_in_dim(
                x_new, b * band, (b + 1) * band, axis=0
            )
        new_h, new_n = [], []
        for j, p in enumerate(quantiles):
            qs = tuple(qh_s[slot, 5 * j + i] for i in range(5))
            ns = tuple(qn_s[slot, 3 * j + i] for i in range(3))
            qs2, ns2 = _p2_update(xb, qs, ns, c_prev, w, p)
            new_h.extend(qs2)
            new_n.extend(ns2)
        qh_s[slot] = jnp.stack(new_h)
        qn_s[slot] = jnp.stack(new_n)
        for d in dma_out(slot, b):
            d.start()
    for b in (n_bands - 2, n_bands - 1):
        if b >= 0:
            for d in dma_out(b % 2, b):
                d.wait()


def _block_kernel(
    x_ref, atbs_ref, mean_ref, m2_ref, qh_ref, qn_ref, seed_ref, scal_ref,
    int_ref,
    xo_ref, meano_ref, m2o_ref, qho_ref, qno_ref,
    *scratch,
    taps, oy, ox, n_steps, niter_tv, tv_step, with_noise, with_stats,
    mode, niter_inner, tv_warm, quantiles, quantile_thin, chain_nx,
    marker_hbm=False, tv_solver="chambolle",
):
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    atbs = atbs_ref[:]  # sigma * A^T b, precomputed
    tau = scal_ref[0]
    gamma = scal_ref[1]
    tv_gamma = scal_ref[2]
    noise_scale = scal_ref[3]
    gscale = scal_ref[4]  # sigma of the data term
    if mode != "tv":
        lamda = scal_ref[5]  # nonconvex-prior weight (L2NcvxTV.lamda)
        gamma_mc = scal_ref[6]  # Moreau-envelope gamma (L2NcvxTV.gamma)
    step0 = int_ref[0]  # global step index of the first step in this block
    burn = int_ref[1]  # burn-in in steps (stats masked while step < burn)
    cnt0 = int_ref[2]  # Welford count entering this block
    masks = _masks(x.shape, x.dtype, chain_nx)
    dtype = x.dtype
    if marker_hbm:
        qh_s, qn_s, dma_sems = scratch
        # prologue: land the incoming marker state in the OUTPUT buffers —
        # all in-kernel paging then goes through qho/qno so every recorded
        # step sees its predecessors' updates (HBM->HBM, no VMEM staging)
        init_h = pltpu.make_async_copy(qh_ref, qho_ref, dma_sems.at[0, 0])
        init_n = pltpu.make_async_copy(qn_ref, qno_ref, dma_sems.at[0, 1])
        init_h.start()
        init_n.start()
        init_h.wait()
        init_n.wait()
    else:
        assert not scratch

    if with_noise:
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])

    noise_amp = noise_scale * jnp.sqrt(2.0 * tau)

    warm_env = tv_warm and mode == "metv"
    n_q = len(quantiles)
    if tv_solver == "fgp":
        prox_tv, ts = _tv_prox_fgp, 0.125  # dual gradient's 1/L
    else:
        prox_tv, ts = _tv_prox, tv_step

    def one_step(i, carry, xi, do_q=True):
        # carry is a nested pytree: (x, mean, m2, tv_dual, env_dual, qstate)
        # where tv_dual/env_dual are () or (py, px), and qstate is a tuple of
        # per-quantile ((q0..q4), (n1..n3)) marker-field pairs. ``do_q`` is
        # STATIC — quantile_thin > 1 runs the P^2 update only on group-final
        # sub-steps (autocorrelated chains lose almost nothing to thinned
        # quantile streams, and the update is ~half the CI step cost).
        x, mean, m2, tv_dual, env_dual, qstate = carry
        grad = gscale * _sep_gram(x, taps, oy, ox, pltpu, chain_nx) - atbs
        if mode == "mctv":
            # MC-TV concave term (ops/ncvx_tv.py::_grad_moreau, op2 path):
            # grad f -= lamda * G^T(min(1/gamma, 1/|Gx|) Gx); G^T p = -div p
            fwd_y, fwd_x, div = _grad_div_ops(x.shape, masks, pltpu)
            gy = fwd_y(x)
            gx = fwd_x(x)
            mag = jnp.sqrt(gy * gy + gx * gx)
            mag = jnp.where(mag != 0.0, mag, 1e-9)
            clamp = jnp.minimum(1.0 / gamma_mc, 1.0 / mag)
            grad = grad + lamda * div(clamp * gy, clamp * gx)
        elif mode == "metv":
            # ME-TV concave term: grad f -= lamda * (x - prox_{gamma TV}x)/gamma
            if warm_env:
                p, env_dual = prox_tv(
                    x, gamma_mc, masks, niter_inner, ts, pltpu,
                    p0=env_dual, return_dual=True,
                )
            else:
                p = prox_tv(x, gamma_mc, masks, niter_inner, ts, pltpu)
            grad = grad - (lamda / gamma_mc) * (x - p)
        if tv_warm:
            tvprox, tv_dual = prox_tv(
                x, tv_gamma, masks, niter_tv, ts, pltpu,
                p0=tv_dual, return_dual=True,
            )
        else:
            tvprox = prox_tv(x, tv_gamma, masks, niter_tv, ts, pltpu)
        x_new = (1.0 - tau / gamma) * x - tau * grad + (tau / gamma) * tvprox
        if with_noise:
            x_new = x_new + noise_amp * xi
        g = step0 + i
        w = (g >= burn).astype(jnp.int32)
        if with_stats:
            # weighted Welford, same recurrence as core.stats.RunningMoments
            # weighted count = cnt0 + weighted steps *within this block*
            n_new = cnt0 + jnp.maximum(
                g + 1 - jnp.maximum(burn, step0), 0
            )
            wf = w.astype(dtype)
            denom = jnp.maximum(n_new, 1).astype(dtype)
            delta = x_new - mean
            mean = mean + wf * delta / denom
            m2 = m2 + wf * delta * (x_new - mean)
        if n_q and do_q:
            # P^2 observation count BEFORE this step = GLOBAL recorded
            # observations so far: steps g' in [burn, g) with
            # (g'+1) % thin == 0, i.e. g//thin - burn//thin (continues
            # across segmented runs via step_offset, unlike the Welford
            # count which restarts per run for Chan merging; thin=1
            # reduces to g - burn)
            c_prev = jnp.maximum(
                g // quantile_thin - burn // quantile_thin, 0
            )
            if marker_hbm:
                _p2_hbm_pass(
                    x_new, c_prev, w, qho_ref, qno_ref,
                    qh_s, qn_s, dma_sems, quantiles, pltpu,
                )
            else:
                qstate = tuple(
                    _p2_update(x_new, qs, ns, c_prev, w, p)
                    for (qs, ns), p in zip(qstate, quantiles)
                )
        return x_new, mean, m2, tv_dual, env_dual, qstate

    def step_body(i, carry):
        if with_noise:
            xi, _ = _box_muller2(x.shape, dtype, pltpu)
        else:
            xi = None
        return one_step(i, carry, xi)

    def pair_body(j, carry):
        # one Box-Muller per TWO steps: the cos AND sin variates are both
        # consumed, halving the ~8us/step PRNG+transcendental cost (the
        # extra live field needs the raised scoped-VMEM limit at 512^2)
        xi1, xi2 = _box_muller2(x.shape, dtype, pltpu)
        carry = one_step(2 * j, carry, xi1)
        return one_step(2 * j + 1, carry, xi2)

    # thinned quantiles: unroll `group` sub-steps per loop iteration so the
    # record positions ((u+1) % thin == 0) are STATIC — the P^2 update is
    # simply absent from the other sub-steps' code. Requires the caller to
    # align step0 and n_steps to `group` (run_myula_tv_fused enforces it).
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
        mean0 = m20 = jnp.zeros((1, 1), dtype)  # unused placeholder
    zero = jnp.zeros_like(x)
    # dual warm starts are per-launch: cold zeros on the first step of the
    # block, then carried across the block's steps
    tv_dual0 = (zero, zero) if tv_warm else ()
    env_dual0 = (zero, zero) if warm_env else ()
    if n_q and not marker_hbm:
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
    carry0 = (x, mean0, m20, tv_dual0, env_dual0, qstate0)
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
    x, mean, m2, _, _, qstate = out
    xo_ref[:] = x
    if with_stats:
        meano_ref[:] = mean
        m2o_ref[:] = m2
    if n_q and not marker_hbm:
        qho_ref[:] = jnp.stack(
            [q for qs, _ in qstate for q in qs]
        )
        qno_ref[:] = jnp.stack(
            [n for _, ns in qstate for n in ns]
        )
    # marker_hbm: the P^2 passes already wrote every band of qho/qno via
    # DMA (qh aliases qho, so later recorded steps read the updated state)


@functools.partial(
    jax.jit,
    static_argnames=(
        "taps", "oy", "ox", "n_steps", "niter_tv", "tv_step",
        "with_noise", "with_stats", "interpret", "mode", "niter_inner",
        "tv_warm", "quantiles", "quantile_thin", "chain_nx", "marker_hbm",
        "tv_solver",
    ),
)
def myula_tv_block_update(
    x, atbs, mean, m2, seed, scal_f, scal_i, qh=None, qn=None, *,
    taps: Taps, oy: int, ox: int, n_steps: int = 1, niter_tv: int = 10,
    tv_step: float = 0.25, with_noise: bool = True, with_stats: bool = True,
    interpret: bool = False, mode: str = "tv", niter_inner: int = 10,
    tv_warm: bool = False, quantiles: Tuple[float, ...] = (),
    quantile_thin: int = 1, chain_nx: int = 0, marker_hbm: bool = False,
    tv_solver: str = "chambolle",
):
    """``n_steps`` fused MYULA steps (+ optional in-kernel Welford / P^2).

    ``atbs = sigma * A^T b``; ``scal_f = [tau, gamma, tv_gamma, noise_scale,
    sigma]`` (dtype of x) — nonconvex modes append ``[lamda, gamma_mc]``;
    ``scal_i = [step0, burn_in, count0]`` (int32); ``seed`` is int32 (2,).
    ``mode`` selects the data-term gradient: ``"tv"`` (plain L2Data),
    ``"mctv"`` / ``"metv"`` (isotropic L2NcvxTV concave corrections,
    reference algs.py:270-291). ``quantiles`` is a static tuple of
    probabilities; when non-empty, per-pixel P^2 marker state rides in VMEM
    as ``qh``/``qn`` of shape ``(5 * len(quantiles), *x.shape)`` (heights /
    positions, cf. ``core.stats.RunningQuantile``). Returns
    ``(x', mean', m2', qh', qn')``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # seed rides in VMEM padded to a (1, 128) tile: SMEM operands cannot gain
    # a batch dim under vmap, and sub-tile VMEM blocks violate Mosaic tiling
    seed_tile = jnp.zeros((1, 128), jnp.int32)
    seed_tile = seed_tile.at[0, :2].set(jnp.asarray(seed, jnp.int32))

    n_q = len(quantiles)
    if qh is None:
        qh = jnp.zeros((1, 1), x.dtype)
    if qn is None:
        qn = jnp.zeros((1, 1), x.dtype)

    kern = functools.partial(
        _block_kernel,
        taps=taps, oy=oy, ox=ox, n_steps=n_steps, niter_tv=niter_tv,
        tv_step=tv_step, with_noise=with_noise, with_stats=with_stats,
        mode=mode, niter_inner=niter_inner, tv_warm=tv_warm,
        quantiles=quantiles, quantile_thin=quantile_thin,
        chain_nx=chain_nx, marker_hbm=marker_hbm, tv_solver=tv_solver,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    stat_shape = x.shape if with_stats else (1, 1)
    qh_shape = (5 * n_q,) + x.shape if n_q else (1, 1)
    qn_shape = (3 * n_q,) + x.shape if n_q else (1, 1)
    # donate x/mean/m2/qh/qn into the outputs: the block is a pure update
    aliases = {0: 0}
    if with_stats and mean.shape == x.shape:
        aliases[2] = 1
        aliases[3] = 2
    if n_q and qh.shape == qh_shape and not marker_hbm:
        aliases[4] = 3
        aliases[5] = 4
    marker_spec = vmem
    scratch_shapes = []
    if marker_hbm:
        if not n_q:
            raise ValueError("marker_hbm without quantiles has no effect")
        if qh.shape != qh_shape:
            raise ValueError(
                "marker_hbm needs qh/qn of the full marker shape"
            )
        # marker state stays in HBM (NOT aliased: the kernel prologue
        # copies qh/qn into the output buffers and pages row bands of
        # those through double-buffered VMEM scratch, see _p2_hbm_pass)
        marker_spec = pl.BlockSpec(memory_space=pl.ANY)
        band = _marker_band_rows(x.shape)
        scratch_shapes = [
            pltpu.VMEM((2, 5 * n_q, band, x.shape[1]), x.dtype),
            pltpu.VMEM((2, 3 * n_q, band, x.shape[1]), x.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(qh_shape, x.dtype),
            jax.ShapeDtypeStruct(qn_shape, x.dtype),
        ),
        in_specs=[vmem] * 4 + [marker_spec] * 2 + [vmem, smem, smem],
        out_specs=(vmem,) * 3 + (marker_spec,) * 2,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
        scratch_shapes=scratch_shapes,
    )(x, atbs, mean, m2, qh, qn, seed_tile, scal_f, scal_i)
    return out


def _key_seed(key, offset: int = 0):
    kd = jax.lax.bitcast_convert_type(
        jax.random.key_data(key), jnp.int32
    ).ravel()
    return jnp.stack([kd[0] + jnp.asarray(offset, jnp.int32), kd[-1]])


def _fused_mode(l2) -> Tuple[str, float, float, int]:
    """Classify the data term: plain L2Data -> "tv"; isotropic L2NcvxTV ->
    "mctv" (op2 = forward-difference gradient) or "metv" (op2 = None).
    Returns ``(mode, lamda, gamma_mc, niter_inner)``."""
    if not hasattr(l2, "lamda"):
        return "tv", 0.0, 1.0, 0
    if not l2.isotropic:
        raise ValueError("fused nonconvex MYULA supports isotropic TV only")
    if l2.q is not None:
        raise ValueError("fused nonconvex MYULA does not support a q term")
    if l2.op2 is None:
        mode = "metv"
    else:
        from lmc_atomi_tpu.ops.linops import Gradient2D

        if not isinstance(l2.op2, Gradient2D) or float(l2.op2.sampling) != 1.0:
            raise ValueError(
                "fused MC-TV needs op2 = Gradient2D(sampling=1)"
            )
        mode = "mctv"
    return mode, float(l2.lamda), float(l2.gamma), int(l2.niter_inner)


def _fused_params(l2, tv_sigma, tau, gamma, niter_tv):
    """Shared setup: taps/offsets/atbs + static scalars from an L2Data or an
    isotropic L2NcvxTV over a CirculantBlur2D with a cached small-PSF
    autocorrelation."""
    op = l2.op
    hh = op.hh
    if hh is None:
        raise ValueError(
            "fused MYULA needs a CirculantBlur2D with a cached small-PSF "
            "autocorrelation (kernels up to 13x13)"
        )
    taps = separable_gram_taps(hh)
    oy, ox = hh.shape[0] // 2, hh.shape[1] // 2
    sigma = l2.sigma
    if getattr(l2, "atb", None) is not None:
        atbs = sigma * l2.atb
    else:
        atbs = jax.jit(lambda b: sigma * op.rmatvec(b))(l2.b)
    return taps, (oy, ox), atbs


def myula_imaging_sep_fused(
    l2: Any,
    tv_sigma: float,
    tau,
    gamma,
    niter_tv: int = 10,
    base_seed: int = 0,
    noise_scale: float = 1.0,
    interpret: bool = False,
) -> Kernel:
    """Kernel-protocol wrapper: ONE fused step per call (runner-compatible).

    Drop-in replacement for ``myula_imaging(l2, TVNorm(tv_sigma, niter_tv),
    tau, gamma)`` on TPU — the per-step key seeds the on-core PRNG, so
    distinct chains/steps get distinct noise streams.
    """
    taps, (oy, ox), atbs = _fused_params(l2, tv_sigma, tau, gamma, niter_tv)
    mode, lamda, gamma_mc, niter_inner = _fused_mode(l2)
    dummy = jnp.zeros((1, 1), atbs.dtype)

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        x = state.position
        scal_f = _pack_scal_f(
            l2, tau, gamma, tv_sigma, noise_scale, lamda, gamma_mc, x.dtype
        )
        scal_i = jnp.zeros((3,), jnp.int32)
        x_new, _, _, _, _ = myula_tv_block_update(
            x, atbs, dummy, dummy, _key_seed(key, base_seed), scal_f, scal_i,
            taps=taps, oy=oy, ox=ox, n_steps=1, niter_tv=niter_tv,
            with_noise=noise_scale != 0.0, with_stats=False,
            interpret=interpret, mode=mode, niter_inner=niter_inner,
        )
        return state.next(x_new), StepInfo()

    return Kernel(init, step)


def _pack_scal_f(l2, tau, gamma, tv_sigma, noise_scale, lamda, gamma_mc, dtype):
    return jnp.stack(
        [
            jnp.asarray(tau, dtype),
            jnp.asarray(gamma, dtype),
            jnp.asarray(tv_sigma * gamma, dtype),
            jnp.asarray(noise_scale, dtype),
            jnp.asarray(l2.sigma, dtype),
            jnp.asarray(lamda, dtype),
            jnp.asarray(gamma_mc, dtype),
        ]
    )


class FusedChainResult(NamedTuple):
    """Duck-typed subset of run.runner.ChainResult (moments + final state).

    ``quantiles`` (when requested) is a dict ``{p: estimate}`` of per-pixel
    streaming P^2 quantile maps; ``quantile_state`` carries the raw marker
    fields ``(qh, qn)`` for continuation."""

    final_state: SamplerState
    moments: RunningMoments
    samples: Any = None
    metrics: Any = None
    quantiles: Any = None
    quantile_state: Any = None


def run_myula_tv_fused(
    l2: Any,
    tv_sigma: float,
    tau,
    gamma,
    x0,
    key,
    n_steps: int,
    *,
    niter_tv: int = 10,
    burn_in: int = 0,
    block: Optional[int] = None,
    noise_scale: float = 1.0,
    interpret: bool = False,
    tv_warm: bool = False,
    quantiles: Tuple[float, ...] = (),
    quantile_thin: int = 1,
    quantile_state=None,
    step_offset: int = 0,
    chain_nx: int = 0,
    marker_hbm: Optional[bool] = None,
    tv_solver: str = "chambolle",
):
    """Block-fused MYULA chain: lax.scan over blocks of fused in-VMEM steps.

    The TPU production path for the 512^2 TV-deblur north star — per-step HBM
    traffic and launch overhead amortize over ``block`` steps per Pallas
    launch. Returns moments-compatible results (posterior mean/var via
    in-kernel Welford; ``burn_in`` in steps).

    ``quantiles`` requests per-pixel streaming quantile maps (e.g.
    ``(0.025, 0.975)`` for 95% credible intervals) computed IN-KERNEL by the
    vectorized P^2 recurrence — marker state lives in VMEM beside the
    Welford accumulators, so UQ runs at fused speed instead of the ~5x
    slower unfused runner (the reference's posterior protocol keeps only the
    mean, prox_lmc_deconv.py:447-474; credible intervals are the point of
    sampling). 10 extra image fields per quantile: at 512^2 f32 a 95% CI
    adds ~20 MiB of VMEM, fine under the raised limit; at 1024^2 the
    markers do NOT fit, so ``marker_hbm`` (default: auto by size) keeps
    them resident in HBM and the kernel pages them through VMEM in
    double-buffered row bands on each recorded observation — combine with
    ``quantile_thin`` to amortize the marker traffic (the paging cost is
    per OBSERVATION, so thin=16 makes 1024^2 CI nearly free; see
    scripts/bench_ci_1024.py). ``quantile_state`` resumes from a prior
    ``result.quantile_state``,
    with ``step_offset`` giving this run's global starting step so the P^2
    observation count (and burn-in masking) continue across segmented runs.

    ``tv_warm=True`` carries the Chambolle dual across the block's steps
    (cold zeros at each launch boundary) so fewer trips suffice: measured
    against a 300-trip converged prox along a real chain, warm-5 holds
    ~3e-4 relative error vs cold-10's ~1.9e-4 — same order, and the
    20k-step posterior-mean PSNR agrees with cold-10 to 0.001 dB — for
    ~1.5x throughput (29k vs 20k iters/s at 512^2). An explicit
    accuracy/semantics trade the caller opts into; the reference runs
    cold 10-trip proxes (prox_lmc_deconv.py:122) and the deconvolution
    experiment keeps that default.

    ``tv_solver="fgp"`` swaps Chambolle's semi-implicit dual iteration for
    projected dual ascent with FISTA momentum (same minimizer, cheaper
    trips): FGP-8 beats cold Chambolle-10 accuracy at every tested gamma
    (scripts/diag_tv_proj.py) with 32 rolls + 8 rsqrt vs 40 rolls +
    10 sqrt + 10 reciprocals — pass ``niter_tv=8`` with it. Default stays
    "chambolle" (the reference's solver family, pyproximal TV).
    """
    taps, (oy, ox), atbs = _fused_params(l2, tv_sigma, tau, gamma, niter_tv)
    mode, lamda, gamma_mc, niter_inner = _fused_mode(l2)
    x0 = jnp.asarray(x0)
    if chain_nx and atbs.shape[1] == chain_nx and x0.shape[1] != chain_nx:
        # lane-packed chains share the observation: tile A^T b sideways
        atbs = jnp.tile(atbs, (1, x0.shape[1] // chain_nx))
    if block is None:
        block = min(n_steps, 256)
    while n_steps % block:
        block -= 1
    if quantiles and quantile_thin > 1:
        # thinned P^2 record positions are static in the kernel, so block
        # boundaries (and the run's start step) must align to the group
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
        # largest block <= requested that is a multiple of group AND
        # divides n_steps (b = group always qualifies)
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
    x0 = jnp.asarray(x0)

    scal_f = _pack_scal_f(
        l2, tau, gamma, tv_sigma, noise_scale, lamda, gamma_mc, x0.dtype
    )
    quantiles = tuple(float(p) for p in quantiles)
    n_q = len(quantiles)
    if marker_hbm is None:
        # auto: page markers through HBM once their in+out VMEM windows
        # (16 fields per quantile) would crowd the 128 MiB core — in
        # practice: in-VMEM through 512^2, HBM-paged at 1024^2 and up
        marker_bytes = 16 * n_q * x0.size * jnp.dtype(x0.dtype).itemsize
        marker_hbm = n_q > 0 and marker_bytes > 64 * 1024 * 1024
    # traced-friendly (run_resumable_fused passes the bundle's done counter)
    step_offset = jnp.asarray(step_offset, jnp.int32)

    def body(carry, b):
        x, mean, m2, qh, qn = carry
        step0 = step_offset + b * block
        # Welford count restarts at THIS run's first recorded step (partial
        # results merge via RunningMoments.merge); the in-kernel P^2 count
        # is global (max(g - burn, 0)) and needs no base here.
        cnt0 = jnp.maximum(step0 - jnp.maximum(burn_in, step_offset), 0)
        scal_i = jnp.stack(
            [step0, jnp.asarray(burn_in, jnp.int32), cnt0]
        ).astype(jnp.int32)
        x, mean, m2, qh, qn = myula_tv_block_update(
            x, atbs, mean, m2, _key_seed(step_key(key, b)), scal_f, scal_i,
            qh, qn,
            taps=taps, oy=oy, ox=ox, n_steps=block, niter_tv=niter_tv,
            with_noise=noise_scale != 0.0, with_stats=True,
            interpret=interpret, mode=mode, niter_inner=niter_inner,
            tv_warm=tv_warm, quantiles=quantiles,
            quantile_thin=quantile_thin, chain_nx=chain_nx,
            marker_hbm=bool(marker_hbm), tv_solver=tv_solver,
        )
        return (x, mean, m2, qh, qn), None

    zeros = jnp.zeros_like(x0)
    if n_q:
        if quantile_state is not None:
            qh0, qn0 = quantile_state
        else:
            qh0 = jnp.zeros((5 * n_q,) + x0.shape, x0.dtype)
            # interior marker positions start at (2, 3, 4) — the extremes
            # are implicit (n0 == 1, n4 == count), cf. _p2_update
            qn0 = jnp.tile(
                jnp.arange(2.0, 5.0, dtype=x0.dtype)[:, None, None],
                (n_q, x0.shape[0], x0.shape[1]),
            )
    else:
        qh0 = qn0 = jnp.zeros((1, 1), x0.dtype)
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
        # marker 2 is the running quantile estimate (valid once count >= 5)
        quantiles=(
            {p: qh[5 * j + 2] for j, p in enumerate(quantiles)}
            if n_q else None
        ),
        quantile_state=(qh, qn) if n_q else None,
    )


def run_myula_tv_fused_packed(
    l2: Any,
    tv_sigma: float,
    tau,
    gamma,
    x0,  # (n_chains, ny, nx) independent chains of the SAME posterior
    key,
    n_steps: int,
    **kwargs,
) -> FusedChainResult:
    """Lane-packed multi-chain fused MYULA: ``n_chains`` independent chains
    of one posterior run side-by-side in a SINGLE Pallas kernel instance.

    A 64-wide image fills only half of each 8x128 VPU register, so a lone
    64^2 chain wastes half the machine — and vmapping whole kernel
    instances does not help (grid instances serialize on the one
    TensorCore, measured ~1.2x aggregate in scripts/bench_multichain.py).
    Packing chains along the LANE axis instead makes every register full:
    the TV stencils become chain-local through the periodic column masks
    (ops/tv_pallas.py::_masks(chain_nx=...)) and the circulant gram through
    the dual-roll select in ``_sep_gram`` — the same instruction stream then
    advances all chains at once.  Per-chain posterior moments / quantiles
    come back unpacked; the deterministic per-chain recursion is EXACTLY
    the single-chain kernel's (parity-gated in tests/test_myula_fused.py) —
    with noise the chains are independent but draw from the packed PRNG
    stream, so they equal solo runs statistically, not bitwise.

    Accepts every ``run_myula_tv_fused`` keyword.  ``n_chains * nx`` should
    be a multiple of 128 for full lane occupancy (2 chains at 64^2, 4 at
    32^2); other multiples are allowed."""
    x0 = jnp.asarray(x0)
    if x0.ndim != 3:
        raise ValueError("packed runner wants x0 of shape (n_chains, ny, nx)")
    c, ny, nxc = x0.shape
    xp = jnp.concatenate([x0[i] for i in range(c)], axis=1)
    res = run_myula_tv_fused(
        l2, tv_sigma, tau, gamma, xp, key, n_steps, chain_nx=nxc, **kwargs
    )

    def unpack(a):
        return jnp.stack([a[:, i * nxc:(i + 1) * nxc] for i in range(c)])

    m = res.moments
    return FusedChainResult(
        final_state=SamplerState.init(unpack(res.final_state.position)),
        moments=RunningMoments(
            count=m.count, mean=unpack(m.mean), m2=unpack(m.m2)
        ),
        quantiles=(
            {p: unpack(v) for p, v in res.quantiles.items()}
            if res.quantiles is not None else None
        ),
        quantile_state=res.quantile_state,
    )
