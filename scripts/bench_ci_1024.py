"""1024^2 credible-interval maps.

Round-3 ceiling (still true for the in-VMEM marker layout): the P^2
marker state (10 extra whole-image f32 fields for a 95% CI, counted as
both input and output windows) pushes the fused kernel's Mosaic program
to 325.55 MB of VMEM against the 128 MB core — a permanent compile
error, so IN-VMEM markers top out at 512^2.

Round 4 lifts the ceiling with ``marker_hbm=True`` (auto past 512^2):
the markers stay resident in HBM and each recorded observation pages
them through double-buffered VMEM row bands inside the kernel
(kernels/myula_fused.py::_p2_hbm_pass). The paging cost is per
OBSERVATION (~128 MiB of HBM round trip for a 95% CI at 1024^2), so
``quantile_thin`` amortizes it: this script measures thin = 1/8/16
against the moments-only fused chain and the old unfused-XLA CI path.

Run on the real chip: ``python scripts/bench_ci_1024.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.eval.metrics import psnr
from lmc_atomi_tpu.kernels import myula_imaging
from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled
from lmc_atomi_tpu.ops.functionals import L2Data, TVNorm
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.run.runner import run_chain
from lmc_atomi_tpu.utils.images import phantom


def main(n: int = 1024, steps: int = 20000, burn: int = 2000):
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + 0.75 * jax.random.normal(k, im.shape, jnp.float32)
    )(img, jax.random.PRNGKey(0))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    gamma = 0.75**2
    tau = 0.2 * gamma
    kern = myula_imaging(l2, TVNorm(sigma=0.3, niter=10), tau=tau,
                         gamma=gamma)
    def fused_ci(thin):
        return jax.jit(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, steps, block=512, burn_in=burn,
                quantiles=(0.025, 0.975), quantile_thin=thin,
            )
        )

    all_runs = {
        "moments": ("fused, moments only", jax.jit(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, steps, block=500, burn_in=burn,
            ))),
        "thin32": ("fused + 95% CI, HBM-paged markers, thin=32",
                   fused_ci(32)),
        "thin16": ("fused + 95% CI, HBM-paged markers, thin=16",
                   fused_ci(16)),
        "thin8": ("fused + 95% CI, HBM-paged markers, thin=8", fused_ci(8)),
        # thin=1 whole-image is a MEASURED hardware ceiling at 1024^2:
        # 121.64 MiB scoped-VMEM stack vs the ~120 MiB the core exposes
        # (Mosaic OOM, ci1024_rest.log) — every-draw recording runs on the
        # row-band tiled kernel instead (markers streamed per band).
        "thin1": ("tiled + 95% CI, band-streamed markers, thin=1", jax.jit(
            lambda x, k: run_myula_tv_tiled(
                l2, 0.3, tau, gamma, x, k, steps, burn_in=burn,
                quantiles=(0.025, 0.975), quantile_thin=1,
            ))),
        "unfused": ("unfused XLA, moments + 95% CI (P^2 in HBM)", jax.jit(
            lambda x, k: run_chain(
                kern, x, k, steps, collect="stats",
                quantile_ps=(0.025, 0.975), burn_in=burn,
            ))),
    }
    # row selection: one Mosaic compile of this kernel takes many minutes
    # on the sandboxed vCPU, so the driver resumes a flap-killed pass by
    # re-invoking with the still-missing row names (manual argv selection;
    # unlike bench_tiled_2048 there is no JSONL ledger here — the driver
    # stage lists its rows explicitly)
    want = (sys.argv[1].split(",") if len(sys.argv) > 1 else list(all_runs))
    unknown = [k for k in want if k not in all_runs]
    if unknown:
        raise SystemExit(
            f"unknown row(s) {unknown}; valid rows: {sorted(all_runs)}"
        )
    runs = [all_runs[k] for k in want]
    for label, run in runs:
        out = run(jnp.zeros_like(img), jax.random.PRNGKey(1))
        jax.block_until_ready(out.moments.mean)
        t0 = time.perf_counter()
        out = run(jnp.zeros_like(img), jax.random.PRNGKey(1))
        jax.block_until_ready(out.moments.mean)
        ips = steps / (time.perf_counter() - t0)
        p = float(psnr(img, out.moments.mean))
        msg = f"{n}^2 {label}: {ips:.0f} iters/s psnr_mean={p:.2f}"
        if out.quantiles is not None:
            lo, hi = out.quantiles[0.025], out.quantiles[0.975]
            if hasattr(hi, "value"):  # unfused RunningQuantile objects
                lo, hi = lo.value, hi.value
            w = float(jnp.mean(hi - lo))
            msg += f" mean_ci_width={w:.3f}"
        print(msg)


if __name__ == "__main__":
    main()
