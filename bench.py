"""North-star benchmark: MYULA iterations/sec on 512x512 TV-deblurring.

Prints ONE JSON line:
  {"metric": ..., "value": iters/sec, "unit": "iters/s", "vs_baseline": x}

``vs_baseline`` is the speedup over the CPU reference implementation of the
same update rule (the reference publishes no numbers — BASELINE.md — so the
CPU baseline is produced here, the way the reference runs it: a Python loop
per step over FFT-based operator applications and a 10-iteration Chambolle
TV prox, cf. reference algs.py:564-583, prox_lmc_deconv.py:465-473).

The device path is the framework's jitted lax.scan with streaming posterior
moments (no sample hoarding). Extra diagnostic fields go to stderr only.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_SIZE", "512"))
# long enough that the fixed dispatch/tunnel latency (~30ms/call) is noise
# against the ~50us steady-state step; 2e4 steps is ~1s of device work
STEPS = int(os.environ.get("BENCH_STEPS", "20000"))
CPU_STEPS = int(os.environ.get("BENCH_CPU_STEPS", "10"))
CPU_REPS = int(os.environ.get("BENCH_CPU_REPS", "3"))
SIGMA_NOISE = 0.75
TV_WEIGHT = 0.3
TV_ITERS = 10
# The headline `value` is the fastest configuration whose inner TV prox is
# AT LEAST as accurate as the reference semantics — a cold 10-trip Chambolle
# per step (reference prox_lmc_deconv.py:122). On the fused path that is the
# FGP-8 projected-dual solver (strictly smaller prox error than cold-10 at
# every tested gamma, scripts/diag_tv_proj.py). The solver-matched cold-10
# number is always emitted as `value_cold10`, and the relaxed warm-started
# 5-trip dual (same order of prox error, ~0.001 dB posterior-mean PSNR
# agreement at 20k steps) as `value_warm5`.
TV_ITERS_WARM = 5


def cpu_baseline_iters_per_sec(y, h):
    """Reference-style NumPy MYULA: Python loop per step, FFT operator,
    Chambolle TV prox with 10 inner iterations, host RNG."""
    rng = np.random.default_rng(0)
    ny, nx = y.shape
    eigs = np.fft.fft2(np.roll(
        np.pad(h, ((0, ny - h.shape[0]), (0, nx - h.shape[1]))),
        (-(h.shape[0] // 2), -(h.shape[1] // 2)), axis=(0, 1),
    ))
    sigma = 1.0 / SIGMA_NOISE**2
    gamma = SIGMA_NOISE**2
    tau = 0.2 * gamma

    def matvec(x):
        return np.real(np.fft.ifft2(np.fft.fft2(x) * eigs))

    def rmatvec(x):
        return np.real(np.fft.ifft2(np.fft.fft2(x) * np.conj(eigs)))

    def grad_f(x):
        return sigma * rmatvec(matvec(x) - y)

    def grad2d(x):
        dy = np.zeros_like(x); dy[:-1] = x[1:] - x[:-1]
        dx = np.zeros_like(x); dx[:, :-1] = x[:, 1:] - x[:, :-1]
        return dy, dx

    def div2d(py, px):
        out = np.zeros_like(py)
        out[0] = py[0]; out[1:-1] += py[1:-1] - py[:-2]; out[-1] = -py[-2]
        ox = np.zeros_like(px)
        ox[:, 0] = px[:, 0]; ox[:, 1:-1] += px[:, 1:-1] - px[:, :-2]
        ox[:, -1] = -px[:, -2]
        return out + ox

    def prox_tv(x, g):
        py = np.zeros_like(x); px = np.zeros_like(x)
        for _ in range(TV_ITERS):
            u = div2d(py, px) - x / g
            gy, gx = grad2d(u)
            mag = np.sqrt(gy * gy + gx * gx)
            py = (py + 0.25 * gy) / (1 + 0.25 * mag)
            px = (px + 0.25 * gx) / (1 + 0.25 * mag)
        return x - g * div2d(py, px)

    # median of several short reps: the sandboxed vCPU showed a 1.5x
    # run-to-run swing across rounds (BENCH_r01 10.15 vs r02 6.74 iters/s),
    # which made vs_baseline noisy; the median pins it down
    rates = []
    x0 = np.zeros_like(y)
    for _ in range(CPU_REPS):
        x = x0
        t0 = time.perf_counter()
        for _ in range(CPU_STEPS):
            xi = rng.standard_normal(y.shape)
            x = (
                (1 - tau / gamma) * x
                - tau * grad_f(x)
                + (tau / gamma) * prox_tv(x, TV_WEIGHT * gamma)
                + np.sqrt(2 * tau) * xi
            )
        dt = time.perf_counter() - t0
        rates.append(CPU_STEPS / dt)
    return float(np.median(rates))


def device_iters_per_sec():
    import jax
    import jax.numpy as jnp

    from lmc_atomi_tpu.kernels import myula_imaging
    from lmc_atomi_tpu.kernels.myula_fused import (
        run_myula_tv_fused,
        sep_fused_supported,
    )
    from lmc_atomi_tpu.ops.functionals import L2Data, TVNorm
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.run.runner import run_chain
    from lmc_atomi_tpu.utils.images import phantom
    from lmc_atomi_tpu.eval.metrics import psnr

    dtype = jnp.float32
    img = jnp.asarray(phantom(N), dtype)
    h = uniform_kernel(5, dtype)
    blur = CirculantBlur2D.from_kernel((N, N), h)
    key = jax.random.PRNGKey(0)
    # jit the setup: complex FFT intermediates must stay inside traced code
    # on the axon TPU runtime
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + SIGMA_NOISE * jax.random.normal(k, (N, N), dtype)
    )(img, key)

    gamma = SIGMA_NOISE**2
    tau = 0.2 * gamma
    l2 = L2Data.create(op=blur, b=y, sigma=1.0 / SIGMA_NOISE**2)

    x0 = jnp.zeros((N, N), dtype)

    # Production TPU path: fully fused Pallas block kernel (separable-gram
    # gradient + Chambolle TV + update + on-core noise + Welford, multiple
    # steps per launch). BENCH_PATH=unfused forces the XLA/threefry path.
    fused = (
        os.environ.get("BENCH_PATH", "fused") == "fused"
        and sep_fused_supported(blur, (N, N), dtype)
    )

    def make_run(niter_tv, tv_warm, tv_solver="chambolle"):
        if fused:
            return jax.jit(
                lambda x, k, n: run_myula_tv_fused(
                    l2, TV_WEIGHT, tau, gamma, x, k, n,
                    niter_tv=niter_tv, block=500, tv_warm=tv_warm,
                    tv_solver=tv_solver,
                ),
                static_argnums=2,
            )
        tv = TVNorm(sigma=TV_WEIGHT, niter=niter_tv)
        kern = myula_imaging(l2, tv, tau=tau, gamma=gamma)
        return jax.jit(
            lambda x, k, n: run_chain(kern, x, k, n, collect="stats"),
            static_argnums=2,
        )

    def timed(run):
        # compile + warmup at the SAME static step count (a different count
        # is a different program and the timed call would recompile)
        warm = run(x0, jax.random.PRNGKey(1), STEPS)
        jax.block_until_ready(warm.moments.mean)
        t0 = time.perf_counter()
        out = run(x0, jax.random.PRNGKey(1), STEPS)
        jax.block_until_ready(out.moments.mean)
        return time.perf_counter() - t0, out

    # Solver-matched row: the reference's exact inner solver (cold 10-trip
    # Chambolle), always measured so BENCH history stays comparable.
    dt, out = timed(make_run(TV_ITERS, False))
    post_psnr = float(psnr(img, out.moments.mean))
    blur_psnr = float(psnr(img, y))
    print(
        f"[bench] device={jax.devices()[0].platform} n={N} steps={STEPS} "
        f"path={'fused' if fused else 'unfused'} cold10 time={dt:.2f}s "
        f"psnr_blurred={blur_psnr:.2f} psnr_mean={post_psnr:.2f}",
        file=sys.stderr,
    )
    # extra row: warm-started 5-trip dual (fused only; explicitly labelled
    # relaxed semantics — PSNR printed so the trade stays visible)
    warm5 = fgp8 = None
    if fused:
        dt_w, out_w = timed(make_run(TV_ITERS_WARM, True))
        warm5 = STEPS / dt_w
        print(
            f"[bench] warm5: time={dt_w:.2f}s -> {warm5:.0f} iters/s "
            f"psnr_mean={float(psnr(img, out_w.moments.mean)):.2f}",
            file=sys.stderr,
        )
        # HEADLINE (fused): FGP-8 projected-dual prox — the SAME MYULA
        # update with a STRICTLY MORE ACCURATE inner TV solve than the
        # reference's cold-10 Chambolle (relerr vs a 500-trip converged
        # prox: 2.7e-3 vs 7.3e-3 at gamma=0.05, 1.5e-2 vs 2.6e-2 at 0.17,
        # 8.6e-2 vs 9.4e-2 at 0.5 — scripts/diag_tv_proj.py), at 32 rolls
        # + 8 rsqrt per prox vs 40 rolls + 10 sqrt + 10 recip.
        dt_f, out_f = timed(make_run(8, False, "fgp"))
        fgp8 = STEPS / dt_f
        print(
            f"[bench] fgp8 (headline): time={dt_f:.2f}s -> {fgp8:.0f} "
            f"iters/s psnr_mean={float(psnr(img, out_f.moments.mean)):.2f}",
            file=sys.stderr,
        )

    # Labeled extras for the record: the fused primal-dual ULPDA sampler
    # (default Chebyshev-3 in-VMEM gram solve — the measured round-4
    # frontier: 33.9k iters/s at -0.011 dB vs Chebyshev-8,
    # fig/r4_measurements/ulpda_frontier_rows.jsonl; the 0.1 dB gate is
    # tests/test_ulpda_fused.py::test_default_chebyshev_sweeps_psnr_gate)
    # and the in-kernel P^2 credible-interval mode on the same problem.
    # BENCH_EXTRAS=0 skips them.
    ulpda_v = ci_v = None
    if fused and os.environ.get("BENCH_EXTRAS", "1") == "1":
        from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused
        from lmc_atomi_tpu.ops.functionals import L21Norm
        from lmc_atomi_tpu.ops.linops import Gradient2D

        # step size per the ULPDA stability setting used in
        # scripts/bench_fused_modes.py (tau0 = 0.95/sigma_data, mu=1)
        tau_u = 0.95 * SIGMA_NOISE**2
        run_u = jax.jit(
            lambda x, k, n: run_ulpda_fused(
                l2, L21Norm(sigma=TV_WEIGHT), Gradient2D(), tau_u, 1.0,
                x, k, n, block=250,
            ),
            static_argnums=2,
        )
        dt_u, _ = timed(run_u)
        ulpda_v = STEPS / dt_u
        print(f"[bench] ulpda_fused: time={dt_u:.2f}s -> {ulpda_v:.0f} "
              "iters/s", file=sys.stderr)
        run_ci = jax.jit(
            lambda x, k, n: run_myula_tv_fused(
                l2, TV_WEIGHT, tau, gamma, x, k, n, niter_tv=TV_ITERS,
                block=500, burn_in=2000, quantiles=(0.025, 0.975),
            ),
            static_argnums=2,
        )
        dt_c, _ = timed(run_ci)
        ci_v = STEPS / dt_c
        print(f"[bench] fused 95%-CI maps: time={dt_c:.2f}s -> {ci_v:.0f} "
              "iters/s", file=sys.stderr)

    # Aggregate throughput: vmapped parallel chains (the chip is mostly idle
    # on a single latency-bound chain). Reported to stderr; the headline JSON
    # metric stays the single-chain north star.
    if os.environ.get("BENCH_AGGREGATE", "1") == "1":
        n_chains = int(os.environ.get("BENCH_CHAINS", "4"))
        agg_steps = max(STEPS // 2, 250)
        from lmc_atomi_tpu.core.random import chain_keys

        def many(x, keys, n):
            if fused:
                return jax.vmap(
                    lambda xi, ki: run_myula_tv_fused(
                        l2, TV_WEIGHT, tau, gamma, xi, ki, n,
                        niter_tv=TV_ITERS, block=500,
                    ).moments.mean
                )(x, keys)
            return jax.vmap(
                lambda xi, ki: run_chain(
                    kern, xi, ki, n, collect="stats"
                ).moments.mean
            )(x, keys)

        many_j = jax.jit(many, static_argnums=2)
        xs = jnp.zeros((n_chains, N, N), dtype)
        keys = chain_keys(jax.random.PRNGKey(2), n_chains)
        warm = many_j(xs, keys, agg_steps)
        jax.block_until_ready(warm)
        t0 = time.perf_counter()
        outm = many_j(xs, keys, agg_steps)
        jax.block_until_ready(outm)
        dt_a = time.perf_counter() - t0
        print(
            f"[bench] aggregate: {n_chains} chains x {agg_steps} steps -> "
            f"{n_chains * agg_steps / dt_a:.0f} iters/s total "
            f"({agg_steps / dt_a:.0f} per chain)",
            file=sys.stderr,
        )

    return STEPS / dt, warm5, fgp8, ulpda_v, ci_v, (np.asarray(y), np.asarray(h))


def main():
    cold10, warm5, fgp8, ulpda_v, ci_v, (y_np, h_np) = device_iters_per_sec()
    cpu = cpu_baseline_iters_per_sec(y_np.astype(np.float64), h_np.astype(np.float64))
    print(f"[bench] cpu_baseline={cpu:.2f} iters/s (median of {CPU_REPS})",
          file=sys.stderr)
    # Headline: same MYULA update at >= the reference's inner-prox accuracy.
    # On the fused path that is FGP-8 (strictly tighter prox error than the
    # reference's own cold-10 Chambolle, see device_iters_per_sec); unfused
    # falls back to the solver-matched cold-10. value_cold10 always records
    # the solver-matched number for history comparability.
    value = fgp8 if fgp8 is not None else cold10
    record = {
        "metric": f"myula_iters_per_sec_{N}x{N}_tv_deblur",
        "value": round(value, 2),
        "unit": "iters/s",
        "vs_baseline": round(value / cpu, 2),
        # `solver` labels the headline semantics so automated comparisons
        # against pre-round-4 records (whose `value` was cold-10
        # Chambolle) cannot silently mix inner-solver configs; the
        # solver-matched number is always value_cold10
        "solver": "fgp8" if fgp8 is not None else "chambolle_cold10",
        "value_cold10": round(cold10, 2),
    }
    if fgp8 is not None:
        record["value_fgp8"] = round(fgp8, 2)
    if warm5 is not None:
        record["value_warm5"] = round(warm5, 2)
    if ulpda_v is not None:
        record["value_ulpda_fused"] = round(ulpda_v, 2)
    if ci_v is not None:
        record["value_ci_maps"] = round(ci_v, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
