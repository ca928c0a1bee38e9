"""Row-band tiled fused MYULA TV: the fused design past the whole-image
VMEM ceiling.

The whole-image kernel (kernels/myula_fused.py) holds x plus ~7 live
temporaries in VMEM, which caps it near 1024^2 f32 (the temporaries are
the budget, not x itself: 12 fields x 16 MiB > the 128 MiB core). This
variant computes each sampling step in ROW BANDS so the temporaries are
tile-sized, keeping only the chain state resident:

- ``x`` stays in VMEM twice (the evolving sample + a parity partner
  scratch): band ``b``'s stencils need band ``b +/- 1``'s PREVIOUS-step
  rows, so steps alternate A->B, B->A — a read/write hazard a parity
  buffer removes outright. 2 x 16 MiB at 2048^2.
- ``sigma A^T b`` stays resident (read-only, 16 MiB).
- The Welford mean/M2 accumulators live in HBM and stream through VMEM
  in double-buffered row bands per step (the DMA idiom of
  myula_fused._p2_hbm_pass): ~64 MiB/step of HBM traffic against ~0.5 ms
  of VPU work at 2048^2 — fully overlapped.

Past 2048^2 even the resident set (x in/out windows + parity partner +
atbs, 4 whole-image fields) exceeds the core, so ``stream_x=True``
(auto past the VMEM budget) moves x, atbs and BOTH step-parity buffers
to HBM and pages tile-sized slots through double-buffered VMEM with the
same slot/semaphore discipline as the moments: per band, the tile
(band + 2 halo rows, <= 2 wrap segments) DMAs in from the parity-source
buffer, the updated band rows DMA out to the parity-destination buffer,
and the noise/Welford stream is unchanged — band-by-band draw order is
identical, so streamed and resident chains are the SAME chain (bitwise
in f64 interpret; tests/test_myula_tiled.py gates it). This lifts the
ceiling to HBM capacity: 4096^2 needs ~6 x 64 MiB of HBM and ~50 MiB of
VMEM slots at band=256.

Tiles carry a ``halo`` of neighbour rows on each side so the band
interior is EXACT: the separable gram (radius ``oy``) and each TV dual
trip propagate information one row per application, so
``halo >= max(niter_tv + 1, oy)`` makes the tile-edge wrap contamination
(pltpu.roll wraps the TILE) die out before it reaches the interior.
Halos are read with image-periodic wrap — correct for the circulant blur
gram; the TV prox gets per-band masks that kill the dual rows outside
the real image, reproducing the whole-image Neumann boundary exactly
(a noise-free tiled chain matches the whole-image kernel bit-for-bit in
f32 tolerance; tests/test_myula_tiled.py).

Same sampling semantics as ``run_myula_tv_fused`` (cold per-step TV
prox, in-kernel Welford with burn-in masking, on-core Box-Muller noise),
including the isotropic L2NcvxTV data terms — MC-TV adds a 2-row
forward-difference correction per band, ME-TV a cold ``niter_inner``-trip
Moreau-envelope prox (both inside the halo's propagation budget, see
``_halo_need``). Reference anchor: the MYULA iteration of
/root/reference/algs.py:477-587 at 4x the reference's maximum problem
area (prox_lmc_deconv.py:52 stops at 512^2).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import as_key, step_key
from lmc_atomi_tpu.core.state import SamplerState
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.kernels.myula_fused import (
    FusedChainResult,
    _box_muller2,
    _fused_mode,
    _fused_params,
    _grad_div_ops,
    _key_seed,
    _marker_band_rows,
    _p2_hbm_pass,
    _pack_scal_f,
    _tv_prox,
    _tv_prox_fgp,
    _sep_gram,
    _VMEM_LIMIT_BYTES,
)

__all__ = ["myula_tv_tiled_update", "run_myula_tv_tiled", "pick_band"]


def pick_band(ny: int, halo: int) -> int:
    """Largest power-of-two band <= 512 dividing ``ny`` with >= 2 bands
    and a tile (band + 2 halo) no taller than the image."""
    band = 512
    while band > 8 and (ny % band or ny // band < 2 or band + 2 * halo > ny):
        band //= 2
    return band


def _round8(v: int) -> int:
    return (v + 7) // 8 * 8


def _marker_band_rows_streamed(shape, n_q: int, itemsize: int) -> int:
    """Marker-pass band height for the stream_x layout: start from the
    whole-image rule (_marker_band_rows) and halve until the marker
    scratch — 2 slots x ((5+3) n_q marker fields + 1 x band) — fits a
    24 MiB budget, leaving the tile slots and compute temporaries room
    inside the scoped-VMEM allowance at 2048^2+."""
    ny, nx = shape
    bm = _marker_band_rows(shape)
    budget = 24 * 1024 * 1024
    while bm > 8 and 2 * (8 * n_q + 1) * bm * nx * itemsize > budget:
        bm //= 2
    return bm


def _halo_need(niter_tv: int, oy: int, mode: str, niter_inner: int) -> int:
    """Rows the tile seam's wrap contamination can travel in one step: the
    per-step operators act on the SAME tile read (not composed), so the
    requirement is the max of their depths — TV prox ``niter_tv + 1``,
    gram ``oy``, MC-TV correction 2, ME-TV inner prox ``niter_inner + 1``."""
    need = max(niter_tv + 1, oy)
    if mode == "mctv":
        need = max(need, 2)
    elif mode == "metv":
        need = max(need, niter_inner + 1)
    return need


def _read_tile(ref, b: int, band: int, halo: int, ny: int, pl):
    """Rows ``[b*band - halo, (b+1)*band + halo)`` of ``ref``, wrapping
    periodically at the image edges (static slices: ``b`` is unrolled)."""
    lo = b * band - halo
    tile = band + 2 * halo
    if lo < 0:
        segs = [(ny + lo, -lo), (0, tile + lo)]
    elif lo + tile > ny:
        segs = [(lo, ny - lo), (0, lo + tile - ny)]
    else:
        segs = [(lo, tile)]
    parts = [ref[pl.ds(s, n), :] for s, n in segs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _band_masks(b: int, n_bands: int, band: int, halo: int, nx: int, dtype):
    """Forward-difference masks for a tile, in TILE coordinates.

    The row mask zeroes the dual's forward difference at image row
    ``ny - 1`` WHEREVER it falls in the tile (tile rows map to image rows
    with periodic wrap). That single zero makes the wrap seam exact for
    the Neumann TV boundary in any halo/band geometry: the whole image's
    dual at row ny-1 is identically zero, so a wrapped read across the
    seam sees ``div`` at row 0 as ``py[0] - 0`` and the forward
    difference at row ny-1 as zero — both exactly the whole-image values.
    (Masking only band 0 / last band's halos — the pre-round-5 scheme —
    silently broke when halo >= band put the image boundary inside an
    interior band's halo.)"""
    tile = band + 2 * halo
    ny = n_bands * band
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, nx), 1)
    mx = (col < nx - 1).astype(dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, nx), 0)
    img_row = (row + (b * band - halo) % ny) % ny
    my = (img_row != ny - 1).astype(dtype)
    return my, mx


def _tiled_kernel(
    x_ref, atbs_ref, mean_ref, m2_ref, qh_ref, qn_ref, seed_ref, scal_ref,
    int_ref,
    xo_ref, meano_ref, m2o_ref, qho_ref, qno_ref,
    *scratch,
    taps, oy, ox, n_steps, niter_tv, tv_step, band, halo,
    with_noise, tv_solver, quantiles, quantile_thin,
    mode="tv", niter_inner=0, stream_x=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = x_ref.shape
    n_bands = ny // band
    n_q = len(quantiles)
    if stream_x and n_q:
        # 6th output (the HBM parity partner) precedes the true scratch
        (xs_ref, xt_s, xo_s, ab_s, mean_s, m2_s, sems, sems_x,
         qh_s, qn_s, xq_s, sems_q) = scratch
    elif stream_x:
        xs_ref, xt_s, xo_s, ab_s, mean_s, m2_s, sems, sems_x = scratch
    elif n_q:
        xs_ref, mean_s, m2_s, sems, qh_s, qn_s, sems_q = scratch
    else:
        xs_ref, mean_s, m2_s, sems = scratch
    tau = scal_ref[0]
    gamma = scal_ref[1]
    tv_gamma = scal_ref[2]
    noise_scale = scal_ref[3]
    gscale = scal_ref[4]
    if mode != "tv":
        lamda = scal_ref[5]  # nonconvex-prior weight (L2NcvxTV.lamda)
        gamma_mc = scal_ref[6]  # Moreau-envelope gamma (L2NcvxTV.gamma)
    step0 = int_ref[0]
    burn = int_ref[1]
    cnt0 = int_ref[2]
    dtype = x_ref.dtype

    # prologue: land the incoming state in the output buffers — all
    # further reads and read-modify-writes go through the outputs (an
    # input ref is not guaranteed to reflect writes to its aliased
    # output, and mean/m2/markers are NOT aliased)
    if stream_x:
        init_x = pltpu.make_async_copy(x_ref, xo_ref, sems_x.at[0, 0])
        init_x.start()
        init_x.wait()
    else:
        xo_ref[:] = x_ref[:]
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

    if tv_solver == "fgp":
        prox_tv, ts = _tv_prox_fgp, 0.125
    else:
        prox_tv, ts = _tv_prox, tv_step

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

    def one_step(g, src_ref, dst_ref):
        # Welford weight/count for global step g (same recurrence as
        # myula_fused._block_kernel / core.stats.RunningMoments)
        w = (g >= burn).astype(dtype)
        n_new = cnt0 + jnp.maximum(g + 1 - jnp.maximum(burn, step0), 0)
        denom = jnp.maximum(n_new, 1).astype(dtype)

        def dma_x_in(slot, b):
            # tile rows [b*band - halo, (b+1)*band + halo) of the
            # HBM-resident src, periodic wrap as <= 2 static segments
            lo = b * band - halo
            tile = band + 2 * halo
            if lo < 0:
                segs = [(ny + lo, -lo), (0, tile + lo)]
            elif lo + tile > ny:
                segs = [(lo, ny - lo), (0, lo + tile - ny)]
            else:
                segs = [(lo, tile)]
            cps = []
            off = 0
            for i, (s, nrow) in enumerate(segs):
                cps.append(pltpu.make_async_copy(
                    src_ref.at[pl.ds(s, nrow)],
                    xt_s.at[slot, pl.ds(off, nrow)],
                    sems_x.at[slot, i],
                ))
                off += nrow
            cps.append(pltpu.make_async_copy(
                atbs_ref.at[pl.ds(b * band, band)], ab_s.at[slot],
                sems_x.at[slot, 2],
            ))
            return cps

        def dma_x_out(slot, b):
            return [pltpu.make_async_copy(
                xo_s.at[slot], dst_ref.at[pl.ds(b * band, band)],
                sems_x.at[slot, 3],
            )]

        for d in dma_in(0, 0):
            d.start()
        if stream_x:
            for d in dma_x_in(0, 0):
                d.start()
        for b in range(n_bands):
            slot = b % 2
            nxt = (b + 1) % 2
            if b + 1 < n_bands:
                if b >= 1:
                    # slot `nxt` still holds band b-1's outbound copy
                    for d in dma_out(nxt, b - 1):
                        d.wait()
                    if stream_x:
                        for d in dma_x_out(nxt, b - 1):
                            d.wait()
                for d in dma_in(nxt, b + 1):
                    d.start()
                if stream_x:
                    for d in dma_x_in(nxt, b + 1):
                        d.start()
            if stream_x:
                for d in dma_x_in(slot, b):
                    d.wait()
                xt = xt_s[slot]
            else:
                xt = _read_tile(src_ref, b, band, halo, ny, pl)
            masks = _band_masks(b, n_bands, band, halo, nx, dtype)
            grad = gscale * _sep_gram(xt, taps, oy, ox, pltpu)
            if mode == "mctv":
                # MC-TV concave term, identical math to the whole-image
                # kernel (myula_fused._block_kernel): the correction's
                # 2-row stencil is inside every legal halo, and the band
                # masks keep the image's Neumann boundary exact
                fwd_y, fwd_x, dvg = _grad_div_ops(xt.shape, masks, pltpu)
                gy = fwd_y(xt)
                gx = fwd_x(xt)
                mag = jnp.sqrt(gy * gy + gx * gx)
                mag = jnp.where(mag != 0.0, mag, 1e-9)
                clamp = jnp.minimum(1.0 / gamma_mc, 1.0 / mag)
                grad = grad + lamda * dvg(clamp * gy, clamp * gx)
            elif mode == "metv":
                # ME-TV concave term: cold Moreau-envelope prox per step
                # (no cross-step env-dual warm start in the tiled kernel
                # — its dual would be another resident whole-image pair)
                p = prox_tv(xt, gamma_mc, masks, niter_inner, ts, pltpu)
                grad = grad - (lamda / gamma_mc) * (xt - p)
            tvp = prox_tv(xt, tv_gamma, masks, niter_tv, ts, pltpu)
            upd = (1.0 - tau / gamma) * xt - tau * grad + (tau / gamma) * tvp
            x_new = (
                jax.lax.slice_in_dim(upd, halo, halo + band, axis=0)
                + tau * (ab_s[slot] if stream_x
                         else atbs_ref[pl.ds(b * band, band), :])
            )
            if with_noise:
                z1, z2 = _box_muller2((band // 2, nx), dtype, pltpu)
                x_new = x_new + noise_amp * jnp.concatenate([z1, z2], 0)
            if stream_x:
                xo_s[slot] = x_new
                for d in dma_x_out(slot, b):
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
                # drain before the next step re-reads the same HBM rows
                for d in dma_out(b % 2, b):
                    d.wait()
                if stream_x:
                    for d in dma_x_out(b % 2, b):
                        d.wait()
        if n_q:
            # streaming P^2 quantiles on the recorded steps: the marker
            # pass (myula_fused._p2_hbm_pass) pages the HBM marker fields
            # through VMEM row bands; the record guard is DYNAMIC
            # (pl.when), so any quantile_thin works without unrolling
            c_prev = jnp.maximum(
                g // quantile_thin - burn // quantile_thin, 0
            )

            @pl.when((g + 1) % quantile_thin == 0)
            def _record():
                if stream_x:
                    # no whole image in VMEM: the sample's bands ride
                    # the marker DMA slots from the HBM parity buffer
                    _p2_hbm_pass(
                        None, c_prev, w.astype(jnp.int32), qho_ref,
                        qno_ref, qh_s, qn_s, sems_q, quantiles, pltpu,
                        x_ref=dst_ref, xq_s=xq_s,
                    )
                else:
                    _p2_hbm_pass(
                        dst_ref[:], c_prev, w.astype(jnp.int32), qho_ref,
                        qno_ref, qh_s, qn_s, sems_q, quantiles, pltpu,
                    )

    def pair_body(j, c):
        g = step0 + 2 * j
        one_step(g, xo_ref, xs_ref)
        one_step(g + 1, xs_ref, xo_ref)
        return c

    jax.lax.fori_loop(0, n_steps // 2, pair_body, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "taps", "oy", "ox", "n_steps", "niter_tv", "tv_step", "band",
        "halo", "with_noise", "tv_solver", "quantiles", "quantile_thin",
        "mode", "niter_inner", "stream_x", "interpret",
    ),
)
def myula_tv_tiled_update(
    x, atbs, mean, m2, seed, scal_f, scal_i, qh=None, qn=None, *,
    taps, oy: int, ox: int, n_steps: int, niter_tv: int = 10,
    tv_step: float = 0.25, band: int, halo: int,
    with_noise: bool = True, tv_solver: str = "chambolle",
    quantiles: Tuple[float, ...] = (), quantile_thin: int = 1,
    mode: str = "tv", niter_inner: int = 0,
    stream_x: bool = False,
    interpret: bool = False,
):
    """``n_steps`` (even) tiled fused MYULA TV steps + in-kernel Welford.

    ``atbs = sigma * A^T b`` exactly as for the whole-image kernel; the
    data gradient is assembled per band as ``gscale * gram(x) - atbs``.
    ``quantiles`` adds streaming P^2 marker maps, HBM-resident and paged
    through VMEM per recorded step (``qh``/``qn`` of shapes
    ``(5 n_q, ny, nx)`` / ``(3 n_q, ny, nx)``). Returns
    ``(x', mean', m2', qh', qn')``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = x.shape
    if n_steps % 2:
        raise ValueError("tiled kernel runs steps in parity pairs: "
                         f"n_steps={n_steps} must be even")
    if ny % band or ny // band < 2:
        raise ValueError(f"band={band} must divide ny={ny} with >= 2 bands")
    if band % 2 or band % 8:
        raise ValueError(f"band={band} must be a multiple of 8")
    halo_need = _halo_need(niter_tv, oy, mode, niter_inner)
    if halo % 8 or halo < halo_need:
        raise ValueError(
            f"halo={halo} must be a multiple of 8 and >= {halo_need} "
            f"(max over the TV prox's niter_tv + 1, the gram radius oy"
            + (", the ME-TV inner prox's niter_inner + 1"
               if mode == "metv" else "")
            + ")"
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
        _tiled_kernel,
        taps=taps, oy=oy, ox=ox, n_steps=n_steps, niter_tv=niter_tv,
        tv_step=tv_step, band=band, halo=halo, with_noise=with_noise,
        tv_solver=tv_solver, quantiles=quantiles,
        quantile_thin=quantile_thin, mode=mode, niter_inner=niter_inner,
        stream_x=stream_x,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    marker_spec = hbm if n_q else vmem
    x_spec = hbm if stream_x else vmem
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(qh_shape, x.dtype),
        jax.ShapeDtypeStruct(qn_shape, x.dtype),
    ]
    out_specs = [x_spec, hbm, hbm, marker_spec, marker_spec]
    if stream_x:
        # streamed layout: x, atbs and BOTH parity buffers live in HBM;
        # only tile-sized slots page through VMEM. The parity partner is
        # an extra (discarded) output — Pallas scratch cannot live in ANY
        tile = band + 2 * halo
        out_shape.append(jax.ShapeDtypeStruct(x.shape, x.dtype))
        out_specs.append(hbm)
        scratch_shapes = [
            pltpu.VMEM((2, tile, nx), x.dtype),      # tile in slots
            pltpu.VMEM((2, band, nx), x.dtype),      # x out staging
            pltpu.VMEM((2, band, nx), x.dtype),      # atbs band slots
            pltpu.VMEM((2, band, nx), x.dtype),      # mean band slots
            pltpu.VMEM((2, band, nx), x.dtype),      # m2 band slots
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 4)),
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
            pltpu.VMEM((ny, nx), x.dtype),           # parity partner
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
        aliases = {0: 0}
    out = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        in_specs=[x_spec, x_spec, hbm, hbm, marker_spec, marker_spec,
                  vmem, smem, smem],
        out_specs=tuple(out_specs),
        input_output_aliases=aliases,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x, atbs, mean, m2, qh, qn, seed_tile, scal_f, scal_i)
    return out[:5]


def run_myula_tv_tiled(
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
    tv_solver: str = "chambolle",
    band: Optional[int] = None,
    halo: Optional[int] = None,
    quantiles: Tuple[float, ...] = (),
    quantile_thin: int = 1,
    quantile_state=None,
    step_offset: int = 0,
    stream_x: Optional[bool] = None,
):
    """Block-tiled fused MYULA chain for images past the whole-image VMEM
    ceiling (2048^2 and the like).

    Same chain semantics as ``run_myula_tv_fused`` (cold TV prox each
    step, weighted Welford with ``burn_in`` masking, optional streaming
    P^2 ``quantiles`` — always HBM-paged here, amortized by
    ``quantile_thin``, and the record guard is dynamic so any thin
    works); the PRNG stream differs (noise is drawn band-by-band), so
    noisy runs are statistically — not bit — equal to the whole-image
    kernel. With ``noise_scale=0`` the trajectories match the
    whole-image kernel to f32 roundoff (tests/test_myula_tiled.py gates
    this)."""
    taps, (oy, ox), atbs = _fused_params(l2, tv_sigma, tau, gamma, niter_tv)
    mode, lamda, gamma_mc, niter_inner = _fused_mode(l2)
    x0 = jnp.asarray(x0)
    ny, nx = x0.shape
    if halo is None:
        halo = _round8(max(_halo_need(niter_tv, oy, mode, niter_inner), 8))
    if band is None:
        band = pick_band(ny, halo)
    if stream_x is None:
        # resident layout keeps ~4 whole-image fields in VMEM (x in/out
        # windows, the parity scratch, atbs) — past 2048^2 f32 that alone
        # exceeds the core, so switch to the HBM-streamed layout
        stream_x = 4 * ny * nx * x0.dtype.itemsize > _VMEM_LIMIT_BYTES
    if block is None:
        block = min(n_steps, 256)
    block -= block % 2
    while block > 0 and n_steps % block:
        block -= 2
    if block <= 0:
        raise ValueError(f"n_steps={n_steps} must be even")
    n_blocks = n_steps // block
    key = as_key(key)

    scal_f = _pack_scal_f(
        l2, tau, gamma, tv_sigma, noise_scale, lamda, gamma_mc, x0.dtype
    )

    quantiles = tuple(float(p) for p in quantiles)
    n_q = len(quantiles)
    if n_q and block % quantile_thin:
        # record positions are (g+1) % thin == 0 with a dynamic guard, so
        # only the BLOCK boundary needs aligning (blocks tile the chain)
        raise ValueError(
            f"block={block} must be a multiple of quantile_thin="
            f"{quantile_thin}"
        )

    step_offset = jnp.asarray(step_offset, jnp.int32)

    def body(carry, b):
        x, mean, m2, qh, qn = carry
        step0 = step_offset + b * block
        # Welford count restarts at THIS run's first recorded step
        # (partials merge via RunningMoments.merge); the P^2 count is
        # global — same convention as run_myula_tv_fused
        cnt0 = jnp.maximum(step0 - jnp.maximum(burn_in, step_offset), 0)
        scal_i = jnp.stack(
            [step0, jnp.asarray(burn_in, jnp.int32), cnt0]
        ).astype(jnp.int32)
        x, mean, m2, qh, qn = myula_tv_tiled_update(
            x, atbs, mean, m2, _key_seed(step_key(key, b)), scal_f, scal_i,
            qh, qn,
            taps=taps, oy=oy, ox=ox, n_steps=block, niter_tv=niter_tv,
            band=band, halo=halo, with_noise=noise_scale != 0.0,
            tv_solver=tv_solver, quantiles=quantiles,
            quantile_thin=quantile_thin, mode=mode,
            niter_inner=niter_inner, stream_x=stream_x,
            interpret=interpret,
        )
        return (x, mean, m2, qh, qn), None

    zeros = jnp.zeros_like(x0)
    if n_q:
        if quantile_state is not None:
            qh0, qn0 = quantile_state
        else:
            qh0 = jnp.zeros((5 * n_q,) + x0.shape, x0.dtype)
            # interior marker positions start at (2, 3, 4), cf. _p2_update
            qn0 = jnp.tile(
                jnp.arange(2.0, 5.0, dtype=x0.dtype)[:, None, None],
                (n_q, ny, nx),
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
        quantiles=(
            {p: qh[5 * j + 2] for j, p in enumerate(quantiles)}
            if n_q else None
        ),
        quantile_state=(qh, qn) if n_q else None,
    )
