"""Laplace-prior (pixel l1) denoising via MYULA (BASELINE.json config 2).

Identity forward operator, sparsity-promoting l1 prior directly on pixel
deviations from the observation median — the soft-threshold prox is exact,
so this is the minimal imaging instance of the MYULA recursion.
"""
from __future__ import annotations

import json
import time

import numpy as np


def l1_denoise_myula(
    size: int = 64,
    sigma: float = 0.2,
    alpha: float = 5.0,
    n_steps: int = 2000,
    burn_in: int = 200,
    seed: int = 0,
    outdir: str = "fig",
    make_plots: bool = True,
    platform: str = "",
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from flax import struct

    from lmc_atomi_tpu.eval.metrics import psnr as psnr_fn
    from lmc_atomi_tpu.kernels import myula_imaging
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import Identity
    from lmc_atomi_tpu.ops.prox import prox_laplace
    from lmc_atomi_tpu.utils.images import phantom

    from lmc_atomi_tpu.utils import default_real_dtype
    dtype = default_real_dtype()
    img = jnp.asarray(phantom(size), dtype) / 255.0
    key = jax.random.PRNGKey(seed)
    y = img + sigma * jax.random.normal(key, img.shape, dtype)

    l2 = L2Data(op=Identity(), b=y, sigma=1.0 / sigma**2)

    @struct.dataclass
    class PixelL1:
        """alpha * ||x - m||_1 around the observation median m."""

        m: jnp.ndarray
        alpha: float

        def __call__(self, x):
            return self.alpha * jnp.sum(jnp.abs(x - self.m))

        def prox(self, x, tau):
            return self.m + prox_laplace(x - self.m, tau * self.alpha)

    prior = PixelL1(m=jnp.median(y), alpha=alpha)
    gamma = sigma**2
    kern = myula_imaging(l2, prior, tau=0.2 * gamma, gamma=gamma)

    from lmc_atomi_tpu.run.runner import run_chain

    run = jax.jit(
        lambda x, k: run_chain(kern, x, k, n_steps, collect="stats",
                               burn_in=burn_in)
    )
    # compile outside the timed region (iters/s is a device-rate number)
    res = run(y, jax.random.fold_in(key, 1))
    jax.block_until_ready(res.moments.mean)
    t0 = time.perf_counter()
    res = run(y, jax.random.fold_in(key, 1))
    jax.block_until_ready(res.moments.mean)
    dt = time.perf_counter() - t0

    mean = np.asarray(res.moments.mean)
    report = {
        "psnr_noisy": float(psnr_fn(img, y)),
        "psnr_posterior_mean": float(psnr_fn(img, jnp.asarray(mean, dtype))),
        "iters_per_sec": round(n_steps / dt, 1),
    }
    print(json.dumps({"workload": "l1_denoise_myula", "size": size, **report}))

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        F.image_grid(
            {"Ground truth": np.asarray(img), "Noisy": np.asarray(y),
             "Posterior mean": mean},
            f"{outdir}/fig_l1_denoise_{size}_{n_steps}.pdf",
        )
    return mean, report


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(l1_denoise_myula)


if __name__ == "__main__":
    main()
