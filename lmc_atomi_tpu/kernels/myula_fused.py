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


def _sep_gram(x, taps: Taps, oy: int, ox: int, pltpu):
    """``A^T A x`` as separable wrap convolutions with static-float taps.

    Matches ``CirculantBlur2D._wrap_conv(x, hh, oy, ox)``:
    ``y[i,j] = sum_ab hh[a,b] x[(i-a+oy)%ny, (j-b+ox)%nx]``.
    """
    ny, nx = x.shape

    def conv1d(v, w, off, n, axis):
        out = None
        for i, wi in enumerate(w):
            if wi == 0.0:
                continue
            s = (i - off) % n
            term = v if s == 0 else pltpu.roll(v, s, axis)
            term = term * wi
            out = term if out is None else out + term
        return out

    out = None
    for wy, wx in taps:
        t = conv1d(x, wx, ox, nx, 1)
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


def _block_kernel(
    x_ref, atbs_ref, mean_ref, m2_ref, seed_ref, scal_ref, int_ref,
    xo_ref, meano_ref, m2o_ref,
    *, taps, oy, ox, n_steps, niter_tv, tv_step, with_noise, with_stats,
    mode, niter_inner, tv_warm,
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
    masks = _masks(x.shape, x.dtype)
    dtype = x.dtype

    if with_noise:
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])

    noise_amp = noise_scale * jnp.sqrt(2.0 * tau)

    warm_env = tv_warm and mode == "metv"

    def one_step(i, carry, xi):
        if warm_env:
            x, mean, m2, tpy, tpx, epy, epx = carry
        elif tv_warm:
            x, mean, m2, tpy, tpx = carry
        else:
            x, mean, m2 = carry
        grad = gscale * _sep_gram(x, taps, oy, ox, pltpu) - atbs
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
                p, (epy, epx) = _tv_prox(
                    x, gamma_mc, masks, niter_inner, tv_step, pltpu,
                    p0=(epy, epx), return_dual=True,
                )
            else:
                p = _tv_prox(x, gamma_mc, masks, niter_inner, tv_step, pltpu)
            grad = grad - (lamda / gamma_mc) * (x - p)
        if tv_warm:
            tvprox, (tpy, tpx) = _tv_prox(
                x, tv_gamma, masks, niter_tv, tv_step, pltpu,
                p0=(tpy, tpx), return_dual=True,
            )
        else:
            tvprox = _tv_prox(x, tv_gamma, masks, niter_tv, tv_step, pltpu)
        x_new = (1.0 - tau / gamma) * x - tau * grad + (tau / gamma) * tvprox
        if with_noise:
            x_new = x_new + noise_amp * xi
        if with_stats:
            # weighted Welford, same recurrence as core.stats.RunningMoments
            g = step0 + i
            w = (g >= burn).astype(jnp.int32)
            # weighted count = cnt0 + weighted steps *within this block*
            n_new = cnt0 + jnp.maximum(
                g + 1 - jnp.maximum(burn, step0), 0
            )
            wf = w.astype(dtype)
            denom = jnp.maximum(n_new, 1).astype(dtype)
            delta = x_new - mean
            mean = mean + wf * delta / denom
            m2 = m2 + wf * delta * (x_new - mean)
        if warm_env:
            return x_new, mean, m2, tpy, tpx, epy, epx
        if tv_warm:
            return x_new, mean, m2, tpy, tpx
        return x_new, mean, m2

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

    if with_stats:
        mean0, m20 = mean_ref[:], m2_ref[:]
    else:
        mean0 = m20 = jnp.zeros((1, 1), dtype)  # unused placeholder
    if tv_warm:
        # dual warm start is per-launch: cold zeros on the first step of the
        # block, then carried across the block's steps
        zero = jnp.zeros_like(x)
        carry0 = (x, mean0, m20, zero, zero)
        if warm_env:
            carry0 = carry0 + (zero, zero)
    else:
        carry0 = (x, mean0, m20)
    if with_noise and n_steps % 2 == 0:
        out = jax.lax.fori_loop(0, n_steps // 2, pair_body, carry0)
    else:
        out = jax.lax.fori_loop(0, n_steps, step_body, carry0)
    x, mean, m2 = out[:3]
    xo_ref[:] = x
    if with_stats:
        meano_ref[:] = mean
        m2o_ref[:] = m2


@functools.partial(
    jax.jit,
    static_argnames=(
        "taps", "oy", "ox", "n_steps", "niter_tv", "tv_step",
        "with_noise", "with_stats", "interpret", "mode", "niter_inner",
        "tv_warm",
    ),
)
def myula_tv_block_update(
    x, atbs, mean, m2, seed, scal_f, scal_i, *,
    taps: Taps, oy: int, ox: int, n_steps: int = 1, niter_tv: int = 10,
    tv_step: float = 0.25, with_noise: bool = True, with_stats: bool = True,
    interpret: bool = False, mode: str = "tv", niter_inner: int = 10,
    tv_warm: bool = False,
):
    """``n_steps`` fused MYULA steps (+ optional in-kernel Welford).

    ``atbs = sigma * A^T b``; ``scal_f = [tau, gamma, tv_gamma, noise_scale,
    sigma]`` (dtype of x) — nonconvex modes append ``[lamda, gamma_mc]``;
    ``scal_i = [step0, burn_in, count0]`` (int32); ``seed`` is int32 (2,).
    ``mode`` selects the data-term gradient: ``"tv"`` (plain L2Data),
    ``"mctv"`` / ``"metv"`` (isotropic L2NcvxTV concave corrections,
    reference algs.py:270-291). Returns ``(x', mean', m2')``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # seed rides in VMEM padded to a (1, 128) tile: SMEM operands cannot gain
    # a batch dim under vmap, and sub-tile VMEM blocks violate Mosaic tiling
    seed_tile = jnp.zeros((1, 128), jnp.int32)
    seed_tile = seed_tile.at[0, :2].set(jnp.asarray(seed, jnp.int32))

    kern = functools.partial(
        _block_kernel,
        taps=taps, oy=oy, ox=ox, n_steps=n_steps, niter_tv=niter_tv,
        tv_step=tv_step, with_noise=with_noise, with_stats=with_stats,
        mode=mode, niter_inner=niter_inner, tv_warm=tv_warm,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    stat_shape = x.shape if with_stats else (1, 1)
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
            jax.ShapeDtypeStruct(stat_shape, x.dtype),
        ),
        in_specs=[vmem, vmem, vmem, vmem, vmem, smem, smem],
        out_specs=(vmem, vmem, vmem),
        # donate x/mean/m2 into the outputs: the block is a pure state update
        input_output_aliases=(
            {0: 0, 2: 1, 3: 2} if with_stats and mean.shape == x.shape
            else {0: 0}
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x, atbs, mean, m2, seed_tile, scal_f, scal_i)
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
        x_new, _, _ = myula_tv_block_update(
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
    """Duck-typed subset of run.runner.ChainResult (moments + final state)."""

    final_state: SamplerState
    moments: RunningMoments
    samples: Any = None
    metrics: Any = None
    quantiles: Any = None


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
):
    """Block-fused MYULA chain: lax.scan over blocks of fused in-VMEM steps.

    The TPU production path for the 512^2 TV-deblur north star — per-step HBM
    traffic and launch overhead amortize over ``block`` steps per Pallas
    launch. Returns moments-compatible results (posterior mean/var via
    in-kernel Welford; ``burn_in`` in steps).

    ``tv_warm=True`` carries the Chambolle dual across the block's steps
    (cold zeros at each launch boundary) so fewer trips suffice: measured
    against a 300-trip converged prox along a real chain, warm-5 holds
    ~3e-4 relative error vs cold-10's ~1.9e-4 — same order, and the
    20k-step posterior-mean PSNR agrees with cold-10 to 0.001 dB — for
    ~1.5x throughput (29k vs 20k iters/s at 512^2). An explicit
    accuracy/semantics trade the caller opts into; the reference runs
    cold 10-trip proxes (prox_lmc_deconv.py:122) and the deconvolution
    experiment keeps that default.
    """
    taps, (oy, ox), atbs = _fused_params(l2, tv_sigma, tau, gamma, niter_tv)
    mode, lamda, gamma_mc, niter_inner = _fused_mode(l2)
    if block is None:
        block = min(n_steps, 256)
    while n_steps % block:
        block -= 1
    n_blocks = n_steps // block
    key = as_key(key)
    x0 = jnp.asarray(x0)

    scal_f = _pack_scal_f(
        l2, tau, gamma, tv_sigma, noise_scale, lamda, gamma_mc, x0.dtype
    )

    def body(carry, b):
        x, mean, m2 = carry
        step0 = b * block
        cnt0 = jnp.maximum(step0 - burn_in, 0)
        scal_i = jnp.stack(
            [step0, jnp.asarray(burn_in, jnp.int32), cnt0]
        ).astype(jnp.int32)
        x, mean, m2 = myula_tv_block_update(
            x, atbs, mean, m2, _key_seed(step_key(key, b)), scal_f, scal_i,
            taps=taps, oy=oy, ox=ox, n_steps=block, niter_tv=niter_tv,
            with_noise=noise_scale != 0.0, with_stats=True,
            interpret=interpret, mode=mode, niter_inner=niter_inner,
            tv_warm=tv_warm,
        )
        return (x, mean, m2), None

    zeros = jnp.zeros_like(x0)
    (x, mean, m2), _ = jax.lax.scan(
        body, (x0, zeros, zeros), jnp.arange(n_blocks, dtype=jnp.int32)
    )
    count = jnp.asarray(max(n_steps - burn_in, 0), jnp.int32)
    return FusedChainResult(
        final_state=SamplerState.init(x),
        moments=RunningMoments(count=count, mean=mean, m2=m2),
    )
