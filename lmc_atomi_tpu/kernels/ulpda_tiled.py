"""Row-band tiled fused ULPDA TV: the primal-dual flagship past the
whole-image VMEM ceiling.

Same tiling contract as kernels/myula_tiled.py (halo-exact row bands,
periodic wrap reads for the circulant gram, Welford + optional P^2
credible-interval markers streamed through HBM in double-buffered DMA
bands), applied to the ULPDA iteration of kernels/ulpda_fused.py
(reference anchor: /root/reference/algs.py:295-474). The primal-dual
structure adds two wrinkles the MYULA tiling does not have:

- PERSISTENT duals. ULPDA's dual fields ``(py, px)`` carry across steps,
  so they stay VMEM-resident and are updated band-IN-PLACE: the dual
  update ``p' = proj(p + mu * grad(xbar))`` reads only its own rows (the
  forward-difference of xbar reaches one row down, provided by the tile
  halo), never neighbouring dual rows. The whole-image kernel's Neumann
  boundary comes for free: the update masks (myula_tiled._band_masks)
  keep the stored duals ZERO at the image's last row/column, so plain
  periodic tile reads reproduce the masked divergence everywhere — the
  wrapped halo rows read genuine zeros exactly where the whole-image
  ``div`` would read masked zeros.
- NO stored xbar. ``xbar = (1 + theta) x_new - theta x_old`` is an
  affine combination of the two x parity buffers, so each dual pass
  recomputes it from the (new, old) pair instead of spending a third
  whole-image field: ``gfirst=False`` runs primal-then-dual on
  ``(dst, src)``; ``gfirst=True`` runs dual-then-primal on
  ``(src, stale dst)`` — the stale parity partner IS x from two steps
  ago, which is exactly what the previous step's extrapolation used.
  Resuming a ``gfirst=True`` chain inverts the identity:
  ``x_prev0 = ((1 + theta) x0 - xbar0) / theta``.

Each step is two band passes (dual, primal — order set by ``gfirst``);
the primal pass runs the fixed-trip Chebyshev gram solve
(ulpda_fused._chebyshev_gram_solve) on the tile, so the halo must absorb
``niter_solve`` gram applications: ``halo >= niter_solve * oy + 1``
(+1 for the divergence roll). With ``noise_scale=0`` the tiled chain
matches ``run_ulpda_fused`` to f32 roundoff / ~1e-11 in f64
(tests/test_ulpda_tiled.py). The PRNG stream differs from the
whole-image kernel (noise is drawn band-by-band), so noisy runs are
statistically — not bit — equal.

Supported configuration: ``proxf`` an ``L2Data`` OR an isotropic
``L2NcvxTV`` (MC-TV / ME-TV concave corrections applied to the
pre-solve primal argument per band, cold envelope prox — see
``_ulpda_halo_need`` for the composed seam-depth accounting) over a
``CirculantBlur2D``, Gradient2D dual (``L21Norm`` isotropic or
``L1Norm`` anisotropic), both ``gfirst`` orders, constant tau/mu.

VMEM budget: the resident layout's five whole-image input fields
(x + parity partner + py + px + A^T b) plus the four aliased output
windows are ~9 windows the TPU compiler counts separately — MEASURED
176-191M at 2048^2 f32 for every band (fig/r4_measurements/
ulpda_tiled.log), so the resident ceiling is 1024^2 (38M of windows),
4x the whole-image ULPDA's. Past that, ``stream_x=True`` (auto) moves
all five state fields to HBM and pages tile-sized slots through
double-buffered VMEM in both passes (the dual band update is a pure
band-rows read-modify-write; x parities and atb ride <= 2-segment wrap
tile DMAs) — the band-by-band draw order is unchanged, so streamed and
resident are the same chain.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import as_key, step_key
from lmc_atomi_tpu.core.state import SamplerState
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.kernels.imaging import ULPDAExtras
from lmc_atomi_tpu.kernels.myula_fused import (
    FusedChainResult,
    _box_muller2,
    _grad_div_ops,
    _key_seed,
    _marker_band_rows,
    _p2_hbm_pass,
    _tv_prox,
)
from lmc_atomi_tpu.kernels.myula_tiled import (
    _band_masks,
    _marker_band_rows_streamed,
    _read_tile,
    _round8,
    pick_band,
)
from lmc_atomi_tpu.kernels.ulpda_fused import (
    _chebyshev_gram_solve,
    _pack_ulpda_scal,
    _ulpda_setup,
)

__all__ = ["ulpda_tv_tiled_update", "run_ulpda_tv_tiled"]


def _ulpda_halo_need(niter_solve: int, oy: int, mode: str,
                     niter_inner: int) -> int:
    """One primal pass's seam-contamination depth: the nonconvex
    correction COMPOSES with the divergence roll (depth 1) before the
    Chebyshev solve's ``niter_solve`` gram applications (depth oy each) —
    unlike the MYULA tiling, where all per-step operators read the same
    tile in parallel."""
    corr = {"tv": 0, "mctv": 2}.get(mode, niter_inner + 1)
    return niter_solve * oy + 1 + corr

# five resident whole-image fields + band temporaries: the whole-image
# kernels' 96 MiB allowance is too small at 2048^2, the core's usable
# scoped VMEM is ~120 MiB (measured: a 121.64 MiB stack is refused)
_VMEM_LIMIT_BYTES = 108 * 1024 * 1024


def _ulpda_tiled_kernel(
    x_ref, xp_ref, py_ref, px_ref, atb_ref, mean_ref, m2_ref, qh_ref,
    qn_ref, seed_ref, scal_ref, int_ref,
    xo_ref, xpo_ref, pyo_ref, pxo_ref, meano_ref, m2o_ref, qho_ref, qno_ref,
    *scratch,
    taps, oy, ox, lam, n_steps, niter_solve, band, halo, gfirst, dual,
    with_noise, quantiles, quantile_thin, mode="tv", niter_inner=0,
    stream_x=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = x_ref.shape
    n_bands = ny // band
    tile = band + 2 * halo
    n_q = len(quantiles)
    if stream_x and n_q:
        (xt_s, xt2_s, pyt_s, pxt_s, ab_s, xo_s, pyo_s, pxo_s,
         mean_s, m2_s, sems, sems_x, qh_s, qn_s, xq_s, sems_q) = scratch
    elif stream_x:
        (xt_s, xt2_s, pyt_s, pxt_s, ab_s, xo_s, pyo_s, pxo_s,
         mean_s, m2_s, sems, sems_x) = scratch
    elif n_q:
        mean_s, m2_s, sems, qh_s, qn_s, sems_q = scratch
    else:
        mean_s, m2_s, sems = scratch
    tau = scal_ref[0]
    mu = scal_ref[1]
    theta = scal_ref[2]
    noise_scale = scal_ref[3]
    sigma = scal_ref[4]
    g_sigma = scal_ref[5]
    if mode != "tv":
        lamda = scal_ref[6]  # nonconvex-prior weight (L2NcvxTV.lamda)
        gamma_mc = scal_ref[7]  # Moreau-envelope gamma (L2NcvxTV.gamma)
    step0 = int_ref[0]
    burn = int_ref[1]
    cnt0 = int_ref[2]
    dtype = x_ref.dtype

    # prologue: land the incoming state in the output buffers (cf.
    # myula_tiled — all reads and read-modify-writes go through outputs)
    if stream_x:
        init_st = [
            pltpu.make_async_copy(x_ref, xo_ref, sems_x.at[0, 0]),
            pltpu.make_async_copy(xp_ref, xpo_ref, sems_x.at[0, 1]),
            pltpu.make_async_copy(py_ref, pyo_ref, sems_x.at[0, 2]),
            pltpu.make_async_copy(px_ref, pxo_ref, sems_x.at[0, 3]),
        ]
        for c in init_st:
            c.start()
        for c in init_st:
            c.wait()
    else:
        xo_ref[:] = x_ref[:]
        xpo_ref[:] = xp_ref[:]
        pyo_ref[:] = py_ref[:]
        pxo_ref[:] = px_ref[:]
    init_m = pltpu.make_async_copy(mean_ref, meano_ref, sems.at[0, 0])
    init_v = pltpu.make_async_copy(m2_ref, m2o_ref, sems.at[0, 1])
    init_m.start()
    init_v.start()
    if n_q:
        init_h = pltpu.make_async_copy(qh_ref, qho_ref, sems_q.at[0, 0])
        init_n = pltpu.make_async_copy(qn_ref, qno_ref, sems_q.at[0, 1])
        init_h.start()
        init_n.start()
        init_h.wait()
        init_n.wait()
    init_m.wait()
    init_v.wait()

    if with_noise:
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])
    noise_amp = noise_scale * jnp.sqrt(2.0 * tau)
    ts = tau * sigma

    def project(cy, cx):
        if dual == "l21":
            nrm = jnp.sqrt(cy * cy + cx * cx)
            s = jnp.minimum(1.0, g_sigma / jnp.maximum(nrm, 1e-30))
            return cy * s, cx * s
        return (
            jnp.clip(cy, -g_sigma, g_sigma),
            jnp.clip(cx, -g_sigma, g_sigma),
        )

    def _tile_copies(src, dst_slots, slot, b, ch0):
        """DMA the wrap-read tile rows of HBM ``src`` into
        ``dst_slots[slot]`` (<= 2 static segments, semaphore channels
        ``ch0``/``ch0+1``)."""
        lo = b * band - halo
        if lo < 0:
            segs = [(ny + lo, -lo), (0, tile + lo)]
        elif lo + tile > ny:
            segs = [(lo, ny - lo), (0, lo + tile - ny)]
        else:
            segs = [(lo, tile)]
        cps, off = [], 0
        for i, (s, nrow) in enumerate(segs):
            cps.append(pltpu.make_async_copy(
                src.at[pl.ds(s, nrow)],
                dst_slots.at[slot, pl.ds(off, nrow)],
                sems_x.at[slot, ch0 + i],
            ))
            off += nrow
        return cps

    def dual_pass(new_ref, old_ref):
        # p' = proj(p + mu * grad(xbar)), xbar = (1+theta) new - theta old.
        # Row-local in the duals: update bands in place. The _band_masks
        # row/col masks zero the gradient at the image's Neumann boundary,
        # maintaining the stored-zeros invariant the primal pass's plain
        # periodic divergence reads rely on.
        if stream_x:
            # streamed: x parities tile-DMA in; dual bands are a pure
            # band-rows read-modify-write (the update is row-local)
            def dma_d_in(slot, b):
                return (
                    _tile_copies(new_ref, xt_s, slot, b, 0)
                    + _tile_copies(old_ref, xt2_s, slot, b, 2)
                    + [
                        pltpu.make_async_copy(
                            pyo_ref.at[pl.ds(b * band, band)],
                            pyt_s.at[slot, pl.ds(0, band)],
                            sems_x.at[slot, 4],
                        ),
                        pltpu.make_async_copy(
                            pxo_ref.at[pl.ds(b * band, band)],
                            pxt_s.at[slot, pl.ds(0, band)],
                            sems_x.at[slot, 5],
                        ),
                    ]
                )

            def dma_d_out(slot, b):
                return [
                    pltpu.make_async_copy(
                        pyo_s.at[slot], pyo_ref.at[pl.ds(b * band, band)],
                        sems_x.at[slot, 8],
                    ),
                    pltpu.make_async_copy(
                        pxo_s.at[slot], pxo_ref.at[pl.ds(b * band, band)],
                        sems_x.at[slot, 9],
                    ),
                ]

            for d in dma_d_in(0, 0):
                d.start()
        for b in range(n_bands):
            if stream_x:
                slot = b % 2
                nxt = (b + 1) % 2
                if b + 1 < n_bands:
                    if b >= 1:
                        for d in dma_d_out(nxt, b - 1):
                            d.wait()
                    for d in dma_d_in(nxt, b + 1):
                        d.start()
                for d in dma_d_in(slot, b):
                    d.wait()
                xn = xt_s[slot]
                xo = xt2_s[slot]
            else:
                xn = _read_tile(new_ref, b, band, halo, ny, pl)
                xo = _read_tile(old_ref, b, band, halo, ny, pl)
            xbar = (1.0 + theta) * xn - theta * xo
            my, mx = _band_masks(b, n_bands, band, halo, nx, dtype)
            gy = (pltpu.roll(xbar, tile - 1, 0) - xbar) * my
            gx = (pltpu.roll(xbar, nx - 1, 1) - xbar) * mx
            gy_b = mu * jax.lax.slice_in_dim(gy, halo, halo + band, axis=0)
            gx_b = mu * jax.lax.slice_in_dim(gx, halo, halo + band, axis=0)
            if stream_x:
                cy, cx = project(pyt_s[slot, :band] + gy_b,
                                 pxt_s[slot, :band] + gx_b)
                pyo_s[slot] = cy
                pxo_s[slot] = cx
                for d in dma_d_out(slot, b):
                    d.start()
            else:
                sl = pl.ds(b * band, band)
                cy, cx = project(pyo_ref[sl, :] + gy_b,
                                 pxo_ref[sl, :] + gx_b)
                pyo_ref[sl, :] = cy
                pxo_ref[sl, :] = cx
        if stream_x:
            for b in (n_bands - 2, n_bands - 1):
                if b >= 0:
                    # drain before the primal pass re-reads these rows
                    for d in dma_d_out(b % 2, b):
                        d.wait()

    def dma_in(slot, b):
        return (
            pltpu.make_async_copy(
                meano_ref.at[pl.ds(b * band, band)], mean_s.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                m2o_ref.at[pl.ds(b * band, band)], m2_s.at[slot],
                sems.at[slot, 1],
            ),
        )

    def dma_out(slot, b):
        return (
            pltpu.make_async_copy(
                mean_s.at[slot], meano_ref.at[pl.ds(b * band, band)],
                sems.at[slot, 2],
            ),
            pltpu.make_async_copy(
                m2_s.at[slot], m2o_ref.at[pl.ds(b * band, band)],
                sems.at[slot, 3],
            ),
        )

    def primal_pass(g, src_ref, dst_ref):
        # x' = (I + tau sigma A^T A)^{-1}(x + tau div(p) + tau sigma A^T b)
        # + noise, Chebyshev-solved on the tile, plus streaming Welford.
        w = (g >= burn).astype(dtype)
        n_new = cnt0 + jnp.maximum(g + 1 - jnp.maximum(burn, step0), 0)
        denom = jnp.maximum(n_new, 1).astype(dtype)

        def dma_p_in(slot, b):
            return (
                _tile_copies(src_ref, xt_s, slot, b, 0)
                + _tile_copies(pyo_ref, pyt_s, slot, b, 2)
                + _tile_copies(pxo_ref, pxt_s, slot, b, 4)
                + _tile_copies(atb_ref, ab_s, slot, b, 6)
            )

        def dma_p_out(slot, b):
            return [pltpu.make_async_copy(
                xo_s.at[slot], dst_ref.at[pl.ds(b * band, band)],
                sems_x.at[slot, 8],
            )]

        for d in dma_in(0, 0):
            d.start()
        if stream_x:
            for d in dma_p_in(0, 0):
                d.start()
        for b in range(n_bands):
            slot = b % 2
            nxt = (b + 1) % 2
            if b + 1 < n_bands:
                if b >= 1:
                    for d in dma_out(nxt, b - 1):
                        d.wait()
                    if stream_x:
                        for d in dma_p_out(nxt, b - 1):
                            d.wait()
                for d in dma_in(nxt, b + 1):
                    d.start()
                if stream_x:
                    for d in dma_p_in(nxt, b + 1):
                        d.start()
            if stream_x:
                for d in dma_p_in(slot, b):
                    d.wait()
                xt = xt_s[slot]
                pyt = pyt_s[slot]
                pxt = pxt_s[slot]
            else:
                xt = _read_tile(src_ref, b, band, halo, ny, pl)
                pyt = _read_tile(pyo_ref, b, band, halo, ny, pl)
                pxt = _read_tile(pxo_ref, b, band, halo, ny, pl)
            # plain periodic divergence: the stored-zeros invariant stands
            # in for the whole-image kernel's boundary masks (module doc)
            dv = (pyt - pltpu.roll(pyt, 1, 0)) + (pxt - pltpu.roll(pxt, 1, 1))
            v = xt + tau * dv
            if mode != "tv":
                # L2NcvxTV concave-part linearization on the tile, same
                # math as ulpda_fused._ulpda_kernel.prox_f (cold envelope
                # prox — no cross-step dual warm start in the tiled path)
                masks = _band_masks(b, n_bands, band, halo, nx, dtype)
                if mode == "mctv":
                    fwd_y, fwd_x, dvg = _grad_div_ops(v.shape, masks, pltpu)
                    gy = fwd_y(v)
                    gx = fwd_x(v)
                    mag = jnp.sqrt(gy * gy + gx * gx)
                    mag = jnp.where(mag != 0.0, mag, 1e-9)
                    clamp = jnp.minimum(1.0 / gamma_mc, 1.0 / mag)
                    v = v - tau * lamda * dvg(clamp * gy, clamp * gx)
                else:  # metv
                    p = _tv_prox(v, gamma_mc, masks, niter_inner, 0.25,
                                 pltpu)
                    v = v + (tau * lamda / gamma_mc) * (v - p)
            rhs = v + ts * (ab_s[slot] if stream_x
                            else _read_tile(atb_ref, b, band, halo, ny, pl))
            u = _chebyshev_gram_solve(
                rhs, xt, ts, lam, taps, oy, ox, niter_solve, pltpu
            )
            x_new = jax.lax.slice_in_dim(u, halo, halo + band, axis=0)
            if with_noise:
                z1, z2 = _box_muller2((band // 2, nx), dtype, pltpu)
                x_new = x_new + noise_amp * jnp.concatenate([z1, z2], 0)
            if stream_x:
                xo_s[slot] = x_new
                for d in dma_p_out(slot, b):
                    d.start()
            else:
                dst_ref[pl.ds(b * band, band), :] = x_new
            for d in dma_in(slot, b):
                d.wait()
            delta = x_new - mean_s[slot]
            mean_b = mean_s[slot] + w * delta / denom
            mean_s[slot] = mean_b
            m2_s[slot] = m2_s[slot] + w * delta * (x_new - mean_b)
            for d in dma_out(slot, b):
                d.start()
        for b in (n_bands - 2, n_bands - 1):
            if b >= 0:
                for d in dma_out(b % 2, b):
                    d.wait()
                if stream_x:
                    for d in dma_p_out(b % 2, b):
                        d.wait()

    def one_step(g, src_ref, dst_ref):
        if gfirst:
            # previous step's xbar = (1+theta) x_prev - theta x_prevprev;
            # the stale parity partner IS x from two steps ago
            dual_pass(src_ref, dst_ref)
            primal_pass(g, src_ref, dst_ref)
        else:
            primal_pass(g, src_ref, dst_ref)
            dual_pass(dst_ref, src_ref)
        if n_q:
            c_prev = jnp.maximum(
                g // quantile_thin - burn // quantile_thin, 0
            )
            w = (g >= burn).astype(jnp.int32)

            @pl.when((g + 1) % quantile_thin == 0)
            def _record():
                if stream_x:
                    # no whole image in VMEM: the sample's bands ride
                    # the marker DMA slots from the HBM parity buffer
                    _p2_hbm_pass(
                        None, c_prev, w, qho_ref, qno_ref, qh_s, qn_s,
                        sems_q, quantiles, pltpu, x_ref=dst_ref,
                        xq_s=xq_s,
                    )
                else:
                    _p2_hbm_pass(
                        dst_ref[:], c_prev, w, qho_ref, qno_ref, qh_s,
                        qn_s, sems_q, quantiles, pltpu,
                    )

    def pair_body(j, c):
        g = step0 + 2 * j
        one_step(g, xo_ref, xpo_ref)
        one_step(g + 1, xpo_ref, xo_ref)
        return c

    jax.lax.fori_loop(0, n_steps // 2, pair_body, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "taps", "oy", "ox", "lam", "n_steps", "niter_solve", "band",
        "halo", "gfirst", "dual", "with_noise", "quantiles",
        "quantile_thin", "mode", "niter_inner", "stream_x", "interpret",
    ),
)
def ulpda_tv_tiled_update(
    x, xp, py, px, atb, mean, m2, seed, scal_f, scal_i, qh=None, qn=None, *,
    taps, oy: int, ox: int, lam: float, n_steps: int, niter_solve: int = 3,
    band: int, halo: int, gfirst: bool = False, dual: str = "l21",
    with_noise: bool = True, quantiles: Tuple[float, ...] = (),
    quantile_thin: int = 1, mode: str = "tv", niter_inner: int = 0,
    stream_x: bool = False,
    interpret: bool = False,
):
    """``n_steps`` (even) tiled fused ULPDA TV steps + in-kernel Welford.

    ``xp`` is the PREVIOUS sample (the x parity partner —
    ``((1 + theta) x - xbar) / theta`` when resuming a ``gfirst=True``
    chain; ignored-then-overwritten for ``gfirst=False``). ``atb`` is the
    raw ``A^T b``. ``scal_f`` as packed by ulpda_fused._pack_ulpda_scal.
    Returns ``(x', xp', py', px', mean', m2', qh', qn')``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = x.shape
    if n_steps % 2:
        raise ValueError("tiled kernel runs steps in parity pairs: "
                         f"n_steps={n_steps} must be even")
    if ny % band or ny // band < 2:
        raise ValueError(f"band={band} must divide ny={ny} with >= 2 bands")
    if band % 8:
        raise ValueError(f"band={band} must be a multiple of 8")
    halo_need = _ulpda_halo_need(niter_solve, oy, mode, niter_inner)
    if halo % 8 or halo < halo_need:
        raise ValueError(
            f"halo={halo} must be a multiple of 8 and >= {halo_need} "
            f"(niter_solve * oy + 1, plus the nonconvex correction's "
            f"depth for mode={mode!r})"
        )
    if band + 2 * halo > ny:
        raise ValueError(
            f"tile = band + 2*halo = {band + 2 * halo} exceeds ny={ny}: "
            "a tile may wrap the image at most once"
        )
    seed_tile = jnp.zeros((1, 128), jnp.int32)
    seed_tile = seed_tile.at[0, :2].set(jnp.asarray(seed, jnp.int32))

    n_q = len(quantiles)
    qh_shape = (5 * n_q,) + x.shape if n_q else (1, 1)
    qn_shape = (3 * n_q,) + x.shape if n_q else (1, 1)
    if qh is None:
        qh = jnp.zeros(qh_shape, x.dtype)
    if qn is None:
        qn = jnp.zeros(qn_shape, x.dtype)

    kern = functools.partial(
        _ulpda_tiled_kernel,
        taps=taps, oy=oy, ox=ox, lam=lam, n_steps=n_steps,
        niter_solve=niter_solve, band=band, halo=halo, gfirst=gfirst,
        dual=dual, with_noise=with_noise, quantiles=quantiles,
        quantile_thin=quantile_thin, mode=mode, niter_inner=niter_inner,
        stream_x=stream_x,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    marker_spec = hbm if n_q else vmem
    state_spec = hbm if stream_x else vmem
    if stream_x:
        # streamed layout: all five state fields + both dual/parity
        # buffers live in HBM; tile- and band-sized slots page through
        # VMEM (no aliases — the prologue DMA-copies state in)
        tile = band + 2 * halo
        scratch_shapes = [
            pltpu.VMEM((2, tile, nx), x.dtype),      # x tiles (src / xn)
            pltpu.VMEM((2, tile, nx), x.dtype),      # x tiles (dual xo)
            pltpu.VMEM((2, tile, nx), x.dtype),      # py tiles
            pltpu.VMEM((2, tile, nx), x.dtype),      # px tiles
            pltpu.VMEM((2, tile, nx), x.dtype),      # atb tiles
            pltpu.VMEM((2, band, nx), x.dtype),      # x out staging
            pltpu.VMEM((2, band, nx), x.dtype),      # py out staging
            pltpu.VMEM((2, band, nx), x.dtype),      # px out staging
            pltpu.VMEM((2, band, nx), x.dtype),      # mean band slots
            pltpu.VMEM((2, band, nx), x.dtype),      # m2 band slots
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 10)),
        ]
        if n_q:
            band_m = _marker_band_rows_streamed(
                x.shape, n_q, x.dtype.itemsize
            )
            scratch_shapes += [
                pltpu.VMEM((2, 5 * n_q, band_m, nx), x.dtype),
                pltpu.VMEM((2, 3 * n_q, band_m, nx), x.dtype),
                pltpu.VMEM((2, band_m, nx), x.dtype),  # x band slots
                pltpu.SemaphoreType.DMA((2, 6)),
            ]
        aliases = {}
    else:
        scratch_shapes = [
            pltpu.VMEM((2, band, nx), x.dtype),      # mean band slots
            pltpu.VMEM((2, band, nx), x.dtype),      # m2 band slots
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
        if n_q:
            band_m = _marker_band_rows(x.shape)
            scratch_shapes += [
                pltpu.VMEM((2, 5 * n_q, band_m, nx), x.dtype),
                pltpu.VMEM((2, 3 * n_q, band_m, nx), x.dtype),
                pltpu.SemaphoreType.DMA((2, 4)),
            ]
        aliases = {0: 0, 1: 1, 2: 2, 3: 3}
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(qh_shape, x.dtype),
            jax.ShapeDtypeStruct(qn_shape, x.dtype),
        ),
        in_specs=[state_spec, state_spec, state_spec, state_spec,
                  state_spec, hbm, hbm, marker_spec, marker_spec, vmem,
                  smem, smem],
        out_specs=(state_spec, state_spec, state_spec, state_spec,
                   hbm, hbm, marker_spec, marker_spec),
        input_output_aliases=aliases,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x, xp, py, px, atb, mean, m2, qh, qn, seed_tile, scal_f, scal_i)


def run_ulpda_tv_tiled(
    proxf: Any,
    proxg: Any,
    a_op: Any,
    tau,
    mu,
    x0,
    key,
    n_steps: int,
    *,
    theta: float = 1.0,
    gfirst: bool = False,
    niter_solve: int = 3,
    burn_in: int = 0,
    block: Optional[int] = None,
    noise_scale: float = 1.0,
    interpret: bool = False,
    band: Optional[int] = None,
    halo: Optional[int] = None,
    quantiles: Tuple[float, ...] = (),
    quantile_thin: int = 1,
    quantile_state=None,
    step_offset: int = 0,
    y0=None,
    xbar0=None,
    xprev0=None,
    stream_x: Optional[bool] = None,
):
    """Row-band tiled fused ULPDA TV chain for images past the whole-image
    VMEM ceiling (2048^2 and the like), with in-kernel Welford moments and
    optional streaming P^2 ``quantiles`` (HBM-paged, amortized by
    ``quantile_thin``).

    Same chain semantics as ``run_ulpda_fused`` with a ``Gradient2D``
    dual (``proxf`` an ``L2Data`` or isotropic ``L2NcvxTV``, dual
    ``L21Norm``/``L1Norm``); with ``noise_scale=0`` the trajectories match the
    whole-image kernel to roundoff (tests/test_ulpda_tiled.py). ``y0`` /
    ``xbar0`` resume a handed-off dual/extrapolation state; ``xprev0``
    (the returned ``extras.xprev``) takes precedence over ``xbar0`` and
    makes the resume BIT-exact — the ``xbar -> x_prev`` inversion costs
    a rounding that the theta-extrapolated iteration amplifies."""
    (taps, (oy, ox), atb, mode, lamda, gamma_mc, niter_inner, dual,
     lam, levels) = _ulpda_setup(proxf, proxg, a_op, tau, mu)
    if dual == "wl1":
        raise ValueError("tiled fused ULPDA supports Gradient2D duals only")
    x0 = jnp.asarray(x0)
    ny, nx = x0.shape
    if halo is None:
        halo = _round8(
            max(_ulpda_halo_need(niter_solve, oy, mode, niter_inner), 8)
        )
    if band is None:
        band = pick_band(ny, halo)
    if stream_x is None:
        # the resident layout pins 9 whole-image windows in VMEM (5 in +
        # 4 aliased out) — measured 176-191M at 2048^2 f32 for EVERY
        # band, so past ~1024^2 only the HBM-streamed layout compiles
        stream_x = 9 * ny * nx * x0.dtype.itemsize > _VMEM_LIMIT_BYTES
    if block is None:
        block = min(n_steps, 256)
    block -= block % 2
    while block > 0 and n_steps % block:
        block -= 2
    if block <= 0:
        raise ValueError(f"n_steps={n_steps} must be even")
    n_blocks = n_steps // block
    key = as_key(key)

    scal_f = _pack_ulpda_scal(
        proxf, proxg, tau, mu, theta, noise_scale, lamda, gamma_mc, x0.dtype
    )

    quantiles = tuple(float(p) for p in quantiles)
    n_q = len(quantiles)
    if n_q and block % quantile_thin:
        raise ValueError(
            f"block={block} must be a multiple of quantile_thin="
            f"{quantile_thin}"
        )

    step_offset = jnp.asarray(step_offset, jnp.int32)
    zeros = jnp.zeros_like(x0)
    py0, px0 = (zeros, zeros) if y0 is None else (y0[0], y0[1])
    if xprev0 is not None:
        xp0 = jnp.asarray(xprev0)
    elif xbar0 is None or theta == 0.0:
        xp0 = x0
    else:
        # invert xbar = (1+theta) x - theta x_prev for the parity partner
        xp0 = ((1.0 + theta) * x0 - jnp.asarray(xbar0)) / theta

    if n_q:
        if quantile_state is not None:
            qh0, qn0 = quantile_state
        else:
            qh0 = jnp.zeros((5 * n_q,) + x0.shape, x0.dtype)
            qn0 = jnp.tile(
                jnp.arange(2.0, 5.0, dtype=x0.dtype)[:, None, None],
                (n_q, ny, nx),
            )
    else:
        qh0 = qn0 = jnp.zeros((1, 1), x0.dtype)

    def body(carry, b):
        x, xp, py, px, mean, m2, qh, qn = carry
        step0 = step_offset + b * block
        cnt0 = jnp.maximum(step0 - jnp.maximum(burn_in, step_offset), 0)
        scal_i = jnp.stack(
            [step0, jnp.asarray(burn_in, jnp.int32), cnt0]
        ).astype(jnp.int32)
        x, xp, py, px, mean, m2, qh, qn = ulpda_tv_tiled_update(
            x, xp, py, px, atb, mean, m2,
            _key_seed(step_key(key, b)), scal_f, scal_i, qh, qn,
            taps=taps, oy=oy, ox=ox, lam=lam, n_steps=block,
            niter_solve=niter_solve, band=band, halo=halo, gfirst=gfirst,
            dual=dual, with_noise=noise_scale != 0.0, quantiles=quantiles,
            quantile_thin=quantile_thin, mode=mode,
            niter_inner=niter_inner, stream_x=stream_x,
            interpret=interpret,
        )
        return (x, xp, py, px, mean, m2, qh, qn), None

    (x, xp, py, px, mean, m2, qh, qn), _ = jax.lax.scan(
        body, (x0, xp0, py0, px0, zeros, zeros, qh0, qn0),
        jnp.arange(n_blocks, dtype=jnp.int32),
    )
    count = (
        jnp.maximum(step_offset + n_steps - burn_in, 0)
        - jnp.maximum(step_offset - burn_in, 0)
    ).astype(jnp.int32)
    xbar = (1.0 + theta) * x - theta * xp
    return FusedChainResult(
        final_state=SamplerState.init(
            x, extras=ULPDAExtras(y=jnp.stack([py, px]), xbar=xbar,
                                  xprev=xp)
        ),
        moments=RunningMoments(count=count, mean=mean, m2=m2),
        quantiles=(
            {p: qh[5 * j + 2] for j, p in enumerate(quantiles)}
            if n_q else None
        ),
        quantile_state=(qh, qn) if n_q else None,
    )
