"""Accuracy study: projected-dual (FGP) TV prox vs Chambolle semi-implicit.

Decides the trip count at which `prox_tv_iso_proj` (one rsqrt per trip)
matches the reference cold-10 / warm-5 Chambolle accuracy, against a
500-trip converged prox. CPU-runnable; the throughput side is measured on
TPU (scripts/tpu_measure_r4b.sh).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
import jax.numpy as jnp

from lmc_atomi_tpu.ops.tv import prox_tv_iso, prox_tv_iso_proj
from lmc_atomi_tpu.utils.images import phantom


def main():
    n = 256
    img = jnp.asarray(phantom(n), jnp.float32)
    key = jax.random.PRNGKey(0)
    # prox argument along a chain: image + O(noise) perturbation
    x = img + 0.75 * jax.random.normal(key, img.shape)
    for gamma in (0.05, 0.17, 0.5):
        ref = prox_tv_iso(x, gamma, niter=500, backend="xla")
        nref = float(jnp.linalg.norm(ref - x))
        base10 = prox_tv_iso(x, gamma, niter=10, backend="xla")
        e10 = float(jnp.linalg.norm(base10 - ref)) / nref
        base5 = prox_tv_iso(x, gamma, niter=5, backend="xla")
        e5 = float(jnp.linalg.norm(base5 - ref)) / nref
        print(f"gamma={gamma}: chambolle-10 relerr={e10:.2e} "
              f"chambolle-5 relerr={e5:.2e}")
        for accel in (True, False):
            errs = []
            for k in (5, 8, 10, 12, 16, 20):
                out = prox_tv_iso_proj(x, gamma, niter=k, accel=accel)
                errs.append(
                    (k, float(jnp.linalg.norm(out - ref)) / nref))
            tag = "fgp" if accel else "gp"
            print("  " + tag + ": " + "  ".join(
                f"k={k}:{e:.2e}" for k, e in errs))


if __name__ == "__main__":
    main()
