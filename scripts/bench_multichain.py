"""Aggregate throughput of the fused MYULA kernel vmapped over chains.

Round-3 note #2 (CLAUDE.md): at small image sizes a single chain cannot
fill the chip and per-launch overhead dominates, so the lever is many
chains per launch.  ``jax.vmap`` of a ``pallas_call`` lifts the batch
axis to a leading grid dimension — the whole chain farm becomes ONE
kernel launch with one program instance per chain (the grid-over-chains
mode VERDICT r2 weak #3 asked for; no bespoke kernel changes needed).
MEASURED: grid instances serialize on the one TensorCore (~1.2x
aggregate), so the real lever is LANE PACKING — several sub-128-wide
chains side-by-side in one kernel instance
(``run_myula_tv_fused_packed``), which this script also measures.

Run on the real chip: ``python scripts/bench_multichain.py``.
Prints aggregate iters/s (= chains * steps / wall) per (size, chains).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.kernels.myula_fused import (
    run_myula_tv_fused,
    run_myula_tv_fused_packed,
)
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom


def main(steps: int = 20000):
    for n, chains_list in ((64, (1, 64, 256)), (128, (1, 16, 64)),
                           (256, (1, 4, 16)), (512, (1, 4))):
        img = jnp.asarray(phantom(n), jnp.float32)
        blur = CirculantBlur2D.from_kernel(
            (n, n), uniform_kernel(5, jnp.float32)
        )
        y = jax.jit(
            lambda im, k: blur.matvec(im)
            + 0.75 * jax.random.normal(k, (n, n), jnp.float32)
        )(img, jax.random.PRNGKey(0))
        l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
        gamma = 0.75**2
        for c in chains_list:
            xs = jnp.zeros((c, n, n), jnp.float32)
            ks = jax.random.split(jax.random.PRNGKey(1), c)
            run = jax.jit(jax.vmap(
                lambda x, k: run_myula_tv_fused(
                    l2, 0.3, 0.2 * gamma, gamma, x, k, steps,
                    block=500, burn_in=1000,
                )
            ))
            out = run(xs, ks)
            jax.block_until_ready(out.moments.mean)
            t0 = time.perf_counter()
            out = run(xs, ks)
            jax.block_until_ready(out.moments.mean)
            dt = time.perf_counter() - t0
            print(
                f"N={n} chains={c}: {steps * c / dt:.0f} aggregate iters/s"
                f" ({steps / dt:.0f}/chain)",
                flush=True,
            )
        # lane packing: fill the 128 lanes of one kernel instance
        if n < 128:
            c = 128 // n
            xs = jnp.zeros((c, n, n), jnp.float32)
            runp = jax.jit(
                lambda x, k: run_myula_tv_fused_packed(
                    l2, 0.3, 0.2 * gamma, gamma, x, k, steps,
                    block=500, burn_in=1000,
                )
            )
            out = runp(xs, jax.random.PRNGKey(1))
            jax.block_until_ready(out.moments.mean)
            t0 = time.perf_counter()
            out = runp(xs, jax.random.PRNGKey(1))
            jax.block_until_ready(out.moments.mean)
            dt = time.perf_counter() - t0
            print(
                f"N={n} lane-packed x{c}: {steps * c / dt:.0f} aggregate"
                f" iters/s ({steps / dt:.0f}/chain)",
                flush=True,
            )


if __name__ == "__main__":
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(main)
