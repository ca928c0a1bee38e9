"""Fused-ULPDA speed/accuracy frontier (round-4 VERDICT item 4).

Round 3 swept Chebyshev trip counts for THROUGHPUT only (6/4/3 =
20.5k/27.4k/31.7k iters/s at 512^2) but never located where the
accuracy gate actually breaks. This script runs the full 20k-step
posterior-mean protocol per trip count and gates PSNR against the
exact-solve reference (unfused spectral ULPDA, same keyed noise
discipline is NOT bit-shared — the gate is the posterior-mean PSNR
value, tolerance 0.1 dB, i.e. the same gate the MYULA tv_warm trade
used). Also sweeps the ME-TV env-warm inner-trip count.

Run on the real chip: ``python scripts/bench_ulpda_frontier.py``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.eval.metrics import psnr
from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused
from lmc_atomi_tpu.ops.functionals import L21Norm, L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV
from lmc_atomi_tpu.utils.images import phantom


def main(n: int = 512, steps: int = 20000, burn: int = 2000):
    sig = 0.75
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im) + sig * jax.random.normal(k, im.shape)
    )(img, jax.random.PRNGKey(0))
    sigma = 1 / sig**2
    l2 = L2Data.create(op=blur, b=y, sigma=sigma)
    l2_me = L2NcvxTV(op=blur, b=y, op2=None, sigma=sigma, lamda=0.3,
                     gamma=15.0, isotropic=True, niter_inner=10)
    tau = 0.95 * sig**2
    g = L21Norm(sigma=0.3)
    rows = []
    # each config is its own many-minute Mosaic compile, so finished rows
    # persist to a JSONL ledger and a flap-killed pass resumes row-by-row
    ledger = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "fig", "r4_measurements",
                          "ulpda_frontier_rows.jsonl")
    done = set()
    if jax.default_backend() != "tpu":
        ledger = os.devnull  # CPU smoke rows must not mask chip rows
    elif os.path.exists(ledger):
        with open(ledger) as f:
            for line in f:
                row = json.loads(line)
                rows.append(row)
                done.add(row["config"])
    want = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    def run_cfg(label, proxf, **kw):
        if label in done or (want is not None
                             and not any(w in label for w in want)):
            return
        interp = jax.default_backend() != "tpu"  # CPU smoke runs
        f = jax.jit(
            lambda x, k, ns: run_ulpda_fused(
                proxf, g, Gradient2D(), tau, 1.0, x, k, ns,
                block=250, burn_in=burn, interpret=interp,
                noise_scale=0.0 if interp else 1.0, **kw,
            ),
            static_argnums=2,
        )
        x0 = jnp.zeros_like(img)
        key = jax.random.PRNGKey(1)
        out = f(x0, key, steps)  # compile + result
        jax.block_until_ready(out.moments.mean)
        p = float(psnr(img, out.moments.mean))
        t0 = time.perf_counter()
        out = f(x0, key, steps)
        jax.block_until_ready(out.moments.mean)
        ips = steps / (time.perf_counter() - t0)
        row = {"config": label, "iters_per_sec": round(ips, 1),
               "psnr_mean": round(p, 3)}
        rows.append(row)
        os.makedirs(os.path.dirname(ledger), exist_ok=True)
        with open(ledger, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"{label:34s} {ips:8.0f} iters/s  psnr={p:.3f}", flush=True)

    # TV dual: Chebyshev trip sweep (niter_solve)
    for k in (8, 6, 5, 4, 3, 2):
        run_cfg(f"TV Chebyshev-{k}", l2, niter_solve=k)

    # ME-TV: env-warm inner-trip sweep
    for k in (10, 5, 3):
        run_cfg(f"ME-TV env-warm inner={k}", l2_me, env_warm=True,
                niter_inner=k)
    run_cfg("ME-TV cold inner=10", l2_me)

    print(json.dumps({"workload": "ulpda_frontier", "n": n, "steps": steps,
                      "rows": rows}))


if __name__ == "__main__":
    main()
