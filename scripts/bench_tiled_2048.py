"""2048^2 row-band tiled fused MYULA — the scale past every whole-image
kernel.

The whole-image fused design tops out near 1024^2 (the ~7 live
temporaries are the VMEM budget); at 2048^2 f32 the tiled kernel
(kernels/myula_tiled.py) keeps only x (twice) + A^T b resident (48 MiB),
computes in row bands with halo-exact TV proxes, and streams the Welford
accumulators through HBM in double-buffered bands. This script measures
it on the real chip at 2048^2 (band sweep) and cross-checks the tiled
path against the whole-image kernel's known rate at 1024^2.

Run: ``python scripts/bench_tiled_2048.py [prefix,prefix,...]``
(row-label prefix selection); rows persist
to ``fig/r4_measurements/tiled_rows.jsonl`` so a tunnel flap resumes
row-by-row (each row is its own many-minute Mosaic compile).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.eval.metrics import psnr
from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom

LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "fig", "r4_measurements", "tiled_rows.jsonl")


def _as_ncvx(l2, which):
    """Wrap the deblur data term in an isotropic L2NcvxTV (MC-TV keeps a
    Gradient2D op2; ME-TV a 10-trip Moreau-envelope prox), reference
    parameters of experiments/deconv.py's M2/M3 rows."""
    from lmc_atomi_tpu.ops.linops import Gradient2D
    from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV

    return L2NcvxTV(
        op=l2.op, b=l2.b, op2=Gradient2D() if which == "mctv" else None,
        sigma=l2.sigma, lamda=0.3, gamma=15.0, isotropic=True,
        niter_inner=10,
    )


def _problem(n):
    sig = 0.75
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im) + sig * jax.random.normal(k, im.shape)
    )(img, jax.random.PRNGKey(0))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / sig**2)
    return img, l2, 0.2 * sig**2, sig**2


def main(steps: int = 4000, burn: int = 1000):
    rows, done = [], {}
    ledger = LEDGER
    if jax.default_backend() != "tpu":
        ledger = os.devnull  # CPU smoke rows must not mask chip rows
    elif os.path.exists(ledger):
        with open(ledger) as f:
            for line in f:
                row = json.loads(line)
                rows.append(row)
                done[row["config"]] = row

    want = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    def _persist(row):
        rows.append(row)
        os.makedirs(os.path.dirname(os.path.abspath(ledger)), exist_ok=True)
        with open(ledger, "a") as f2:
            f2.write(json.dumps(row) + "\n")

    def _measure(label, n, img, timed):
        """Run `timed` twice (compile+warm, then measure); a compile
        failure (e.g. a VMEM overflow at this band geometry) is recorded
        as an error row — itself a measurement of the config's ceiling —
        so later rows and re-runs proceed. Returns True iff measured."""
        x0 = jnp.zeros_like(img)
        key = jax.random.PRNGKey(1)
        try:
            out = timed(x0, key)
            jax.block_until_ready(out.moments.mean)
            t0 = time.perf_counter()
            out = timed(x0, key)
            jax.block_until_ready(out.moments.mean)
            ips = steps / (time.perf_counter() - t0)
            p = float(psnr(img, out.moments.mean))
        except Exception as e:  # noqa: BLE001 — classify, then continue
            msg = str(e)
            permanent = any(s in msg for s in (
                "Ran out of memory", "RESOURCE_EXHAUSTED",
                "tpu_compile_helper subprocess exit code",
                "Mosaic failed",
            ))
            if not permanent:
                raise  # tunnel flap etc. — let the driver retry the stage
            cut = msg.find("Ran out of memory")
            msg = (msg[cut:cut + 120] if cut >= 0 else msg[:200])
            _persist({"config": label, "n": n, "error": msg})
            print(f"{label:28s} FAILED: {msg}", flush=True)
            return False
        _persist({"config": label, "n": n, "iters_per_sec": round(ips, 1),
                  "psnr_mean": round(p, 3)})
        print(f"{label:28s} {ips:8.0f} iters/s  psnr={p:.3f}", flush=True)
        return True

    def run_row(label, n, fn, ncvx=None, **kw):
        if want is not None and not any(label.startswith(w) for w in want):
            return None
        if label in done:
            return "error" not in done[label]
        img, l2, tau, gamma = _problem(n)
        if ncvx is not None:
            l2 = _as_ncvx(l2, ncvx)
        interp = jax.default_backend() != "tpu"
        f = jax.jit(lambda x, k: fn(
            l2, 0.3, tau, gamma, x, k, steps, block=200, burn_in=burn,
            tv_solver="fgp", niter_tv=8, interpret=interp,
            noise_scale=0.0 if interp else 1.0, **kw,
        ))
        return _measure(label, n, img, f)

    def run_ulpda_row(label, n, ncvx=None, **kw):
        """ULPDA rows share the ledger/selection logic but build the
        primal-dual problem (kernels/ulpda_tiled.py)."""
        if want is not None and not any(label.startswith(w) for w in want):
            return None
        if label in done:
            return "error" not in done[label]
        from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled
        from lmc_atomi_tpu.ops.functionals import L21Norm
        from lmc_atomi_tpu.ops.linops import Gradient2D

        img, l2, _, _ = _problem(n)
        tau = 0.95 / l2.sigma
        if ncvx is not None:
            l2 = _as_ncvx(l2, ncvx)
        interp = jax.default_backend() != "tpu"
        f = jax.jit(lambda x, k: run_ulpda_tv_tiled(
            l2, L21Norm(sigma=0.3), Gradient2D(), tau, 1.0, x, k, steps,
            block=200, burn_in=burn, niter_solve=3, interpret=interp,
            noise_scale=0.0 if interp else 1.0, **kw,
        ))
        return _measure(label, n, img, f)

    # band sweep with automatic fallback: a too-tall band overflows VMEM
    # at compile time (band=512 at 2048^2 measured 150.9M vs the 128M
    # core) — the error row records the ceiling, the next band runs
    if run_row("tiled 2048 band=512", 2048, run_myula_tv_tiled,
               band=512) is False:
        pass  # error row recorded; 256/128 below are the usable configs
    ok256 = run_row("tiled 2048 band=256", 2048, run_myula_tv_tiled,
                    band=256)
    if ok256 is False:
        run_row("tiled 2048 band=128", 2048, run_myula_tv_tiled, band=128)
    if run_row("tiled 2048 CI thin=8", 2048, run_myula_tv_tiled, band=256,
               quantiles=(0.025, 0.975), quantile_thin=8) is False:
        run_row("tiled 2048 CI thin=8 b128", 2048, run_myula_tv_tiled,
                band=128, quantiles=(0.025, 0.975), quantile_thin=8)
    if run_row("tiled 1024 band=512", 1024, run_myula_tv_tiled,
               band=512) is False:
        run_row("tiled 1024 band=256", 1024, run_myula_tv_tiled, band=256)
    run_row("whole-image 1024", 1024, run_myula_tv_fused)
    # 4096^2 = 16x the whole-image ceiling. The RESIDENT tiled layout
    # cannot compile here (x in/out windows + parity partner + atbs are
    # 4 x 64 MiB whole-image VMEM fields): run_myula_tv_tiled
    # auto-selects stream_x=True, which keeps x/atbs/both parities in
    # HBM and pages tile slots through VMEM
    # band=128 first: its tile temporaries (~160 x 4096) fit the 96M
    # scoped budget comfortably, so a 4096 number lands before the
    # band=256 attempt (which may OOM — kept as a ceiling probe)
    if run_row("tiled 4096 band=128", 4096, run_myula_tv_tiled,
               band=128) is not None:
        run_row("tiled 4096 band=256", 4096, run_myula_tv_tiled, band=256)
    # streamed-vs-resident overhead where BOTH compile: quantifies what
    # the 4096^2 row pays for HBM-resident x
    if run_row("tiled 2048 stream band=256", 2048, run_myula_tv_tiled,
               band=256, stream_x=True) is False:
        run_row("tiled 2048 stream band=128", 2048, run_myula_tv_tiled,
                band=128, stream_x=True)
    # CI maps in the streamed layout: sample bands ride the marker DMA
    # slots (the resident 2048 CI row's marker scratch may itself OOM)
    run_row("tiled 2048 stream CI thin=8", 2048, run_myula_tv_tiled,
            band=256, stream_x=True, quantiles=(0.025, 0.975),
            quantile_thin=8)
    run_row("tiled 4096 CI thin=8", 4096, run_myula_tv_tiled, band=128,
            stream_x=True, quantiles=(0.025, 0.975), quantile_thin=8)
    # primal-dual tiled flagship (kernels/ulpda_tiled.py): Chebyshev-3
    # gram solve (measured frontier default). The RESIDENT layout's 9
    # whole-image windows measured 176-191M at 2048^2 for every band
    # (ledger error rows) — 2048^2 runs via the streamed layout; the
    # resident rows below keep the measured ceiling on record
    if run_ulpda_row("ulpda tiled 2048 band=256", 2048, band=256,
                     stream_x=False) is False:
        run_ulpda_row("ulpda tiled 2048 band=128", 2048, band=128,
                      stream_x=False)
    if run_ulpda_row("ulpda tiled 2048 stream band=256", 2048, band=256,
                     stream_x=True) is False:
        run_ulpda_row("ulpda tiled 2048 stream band=128", 2048, band=128,
                      stream_x=True)
    run_ulpda_row("ulpda tiled 1024 band=256", 1024, band=256)
    run_ulpda_row("ulpda tiled 2048 stream CI thin=8", 2048, band=256,
                  stream_x=True, quantiles=(0.025, 0.975),
                  quantile_thin=8)
    # nonconvex data terms at the tiled scale (round-5 extension): the
    # MC-TV correction adds a 2-row stencil per band; ME-TV a cold
    # 10-trip envelope prox (ULPDA's composes pre-solve -> halo 24)
    if run_row("tiled 2048 mctv band=256", 2048, run_myula_tv_tiled,
               ncvx="mctv", band=256) is False:
        run_row("tiled 2048 mctv band=128", 2048, run_myula_tv_tiled,
                ncvx="mctv", band=128)
    if run_row("tiled 2048 metv band=256", 2048, run_myula_tv_tiled,
               ncvx="metv", band=256) is False:
        run_row("tiled 2048 metv band=128", 2048, run_myula_tv_tiled,
                ncvx="metv", band=128)
    # ULPDA ncvx at 2048^2 runs the STREAMED layout (the resident error
    # rows in the ledger are the measured ceiling: 191.4M at band=256)
    if run_ulpda_row("ulpda tiled 2048 mctv stream", 2048, ncvx="mctv",
                     band=256, stream_x=True) is False:
        run_ulpda_row("ulpda tiled 2048 mctv stream b128", 2048,
                      ncvx="mctv", band=128, stream_x=True)
    if run_ulpda_row("ulpda tiled 2048 metv stream", 2048, ncvx="metv",
                     band=256, stream_x=True) is False:
        run_ulpda_row("ulpda tiled 2048 metv stream b128", 2048,
                      ncvx="metv", band=128, stream_x=True)

    print(json.dumps({"workload": "tiled_myula", "steps": steps,
                      "rows": rows}))


if __name__ == "__main__":
    main()
