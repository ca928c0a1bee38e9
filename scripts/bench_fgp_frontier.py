"""Fused-MYULA TV-solver frontier: FGP projected-dual vs Chambolle.

Round-4 lever from the roofline (RESULTS.md): the Chambolle trips'
10 sqrt + 10 recip are the fused step's largest transcendental term, and
FGP's dual-ball projection needs ONE rsqrt per trip. diag_tv_proj.py shows
FGP-8 beats cold Chambolle-10 prox accuracy at every gamma; this script
measures the 20k-step posterior-mean protocol per solver/trip config on
the real chip, gating PSNR against the cold Chambolle-10 reference row
(the reference semantics, prox_lmc_deconv.py:122) at 0.1 dB — the same
gate the warm-5 and Chebyshev sweeps used. Also sweeps warm-started FGP
(momentum restarts each step, dual carried like tv_warm).

Run on the real chip: ``python scripts/bench_fgp_frontier.py``.
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
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom


def main(n: int = 512, steps: int = 20000, burn: int = 2000):
    sig = 0.75
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im) + sig * jax.random.normal(k, im.shape)
    )(img, jax.random.PRNGKey(0))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / sig**2)
    gamma = sig**2
    tau = 0.2 * gamma
    interp = jax.default_backend() != "tpu"  # CPU smoke runs
    rows = []

    def run_cfg(label, **kw):
        f = jax.jit(
            lambda x, k, ns: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, ns, block=500, burn_in=burn,
                interpret=interp, noise_scale=0.0 if interp else 1.0, **kw,
            ),
            static_argnums=2,
        )
        x0 = jnp.zeros_like(img)
        key = jax.random.PRNGKey(1)
        out = f(x0, key, steps)
        jax.block_until_ready(out.moments.mean)
        p = float(psnr(img, out.moments.mean))
        t0 = time.perf_counter()
        out = f(x0, key, steps)
        jax.block_until_ready(out.moments.mean)
        ips = steps / (time.perf_counter() - t0)
        rows.append({"config": label, "iters_per_sec": round(ips, 1),
                     "psnr_mean": round(p, 3)})
        print(f"{label:36s} {ips:8.0f} iters/s  psnr={p:.3f}", flush=True)

    run_cfg("chambolle cold-10 (reference)")
    run_cfg("chambolle warm-5", niter_tv=5, tv_warm=True)
    for k in (10, 8, 6, 5, 4):
        run_cfg(f"fgp cold-{k}", niter_tv=k, tv_solver="fgp")
    for k in (5, 4, 3):
        run_cfg(f"fgp warm-{k}", niter_tv=k, tv_solver="fgp", tv_warm=True)
    # CI mode: does the FGP gain survive the P^2 quantile stream?
    run_cfg("chambolle cold-10 + 95% CI", quantiles=(0.025, 0.975))
    run_cfg("fgp cold-8 + 95% CI", niter_tv=8, tv_solver="fgp",
            quantiles=(0.025, 0.975))

    print(json.dumps({"workload": "fgp_frontier", "n": n, "steps": steps,
                      "rows": rows}))


if __name__ == "__main__":
    main()
