"""Lane-packed multi-chain UQ: many fused MYULA chains of ONE posterior
with pooled posterior statistics and a streaming Gelman-Rubin R-hat.

Small images leave the 128-lane VPU registers half-idle and vmapped kernel
instances serialize on the single TensorCore (scripts/bench_multichain.py),
so the multi-chain workhorse is ``run_myula_tv_fused_packed``: ``pack``
chains side-by-side per kernel instance, ``n_chains / pack`` instances
vmapped. Per-chain streaming Welford moments merge into pooled posterior
mean/std (the cross-chain reduction of ``parallel/mesh.py``), and
between/within-chain R-hat comes straight from the moments
(``eval/diagnostics.py::rhat_from_moments``) — no sample hoarding at any
point, matching the framework's streaming-statistics design (SURVEY.md §5;
the reference runs single chains only and keeps full sample arrays,
prox_lmc_deconv.py:474).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def multichain_deblur(
    size: int = 64,
    n_chains: int = 8,
    pack: int = 0,  # chains per kernel instance; 0 -> max(128 // size, 1)
    sigma: float = 0.75,
    tau_tv: float = 0.3,
    n_steps: int = 5000,
    burn_in: int = 500,
    niter_tv: int = 10,
    kernel: str = "myula",  # 'myula' | 'ulpda' (packed fused chains)
    seed: int = 0,
    outdir: str = "fig",
    make_plots: bool = True,
    platform: str = "",
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.core.random import chain_keys
    from lmc_atomi_tpu.core.stats import RunningMoments
    from lmc_atomi_tpu.eval.diagnostics import rhat_from_moments
    from lmc_atomi_tpu.eval.metrics import psnr as psnr_fn
    from lmc_atomi_tpu.kernels.myula_fused import (
        run_myula_tv_fused_packed,
        sep_fused_supported,
    )
    from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused_packed
    from lmc_atomi_tpu.ops.functionals import L21Norm
    from lmc_atomi_tpu.ops.linops import Gradient2D
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.parallel.mesh import merge_chain_moments
    from lmc_atomi_tpu.utils.images import phantom

    dtype = jnp.float32
    # 0..255 scale with sigma=0.75, the bench.py / BASELINE convention
    img = jnp.asarray(phantom(size), dtype)
    blur = CirculantBlur2D.from_kernel((size, size), uniform_kernel(5, dtype))
    key = jax.random.PRNGKey(seed)
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + sigma * jax.random.normal(k, (size, size), dtype)
    )(img, key)
    l2 = L2Data.create(op=blur, b=y, sigma=1.0 / sigma**2)
    gamma = sigma**2
    tau = 0.2 * gamma

    if pack <= 0:
        pack = max(128 // size, 1)
    pack = min(pack, n_chains)
    while n_chains % pack:
        pack -= 1
    groups = n_chains // pack

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not sep_fused_supported(blur, (size, size), dtype):
        raise ValueError("fused path unsupported for this configuration")

    xs = jnp.zeros((groups, pack, size, size), dtype)
    keys = chain_keys(jax.random.fold_in(key, 1), groups)

    if kernel == "ulpda":
        tau_u = 0.95 * sigma**2

        def one(x, k):
            return run_ulpda_fused_packed(
                l2, L21Norm(sigma=tau_tv), Gradient2D(), tau_u, 1.0,
                x, k, n_steps, burn_in=burn_in,
                noise_scale=1.0 if on_tpu else 0.0,
                interpret=not on_tpu,
            ).moments
    else:

        def one(x, k):
            return run_myula_tv_fused_packed(
                l2, tau_tv, tau, gamma, x, k, n_steps,
                niter_tv=niter_tv, burn_in=burn_in,
                noise_scale=1.0 if on_tpu else 0.0,
                interpret=not on_tpu,
            ).moments

    run = jax.jit(jax.vmap(one))
    mom = run(xs, keys)  # leading axes (groups, pack)
    jax.block_until_ready(mom.mean)
    t0 = time.perf_counter()
    mom = run(xs, keys)
    jax.block_until_ready(mom.mean)
    dt = time.perf_counter() - t0

    # flatten (groups, pack) -> chains
    per_chain = RunningMoments(
        count=jnp.repeat(mom.count, pack),
        mean=mom.mean.reshape((n_chains, size, size)),
        m2=mom.m2.reshape((n_chains, size, size)),
    )
    pooled = merge_chain_moments(per_chain)
    rhat = rhat_from_moments(per_chain)

    report = {
        "workload": "multichain_deblur",
        "kernel": kernel,
        "size": size,
        "n_chains": n_chains,
        "pack": pack,
        "steps": n_steps,
        "psnr_pooled_mean": float(psnr_fn(img, pooled.mean)),
        "psnr_observed": float(psnr_fn(img, y)),
        "rhat_max": float(jnp.max(rhat)),
        "rhat_mean": float(jnp.mean(rhat)),
        "aggregate_iters_per_sec": round(n_steps * n_chains / dt, 1),
        "per_chain_iters_per_sec": round(n_steps / dt, 1),
    }

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        F.image_grid(
            {
                "Ground truth": np.asarray(img),
                "Observed": np.asarray(y),
                "Pooled posterior mean": np.asarray(pooled.mean),
                "Pooled posterior std": np.asarray(pooled.std),
                "R-hat map": np.asarray(rhat),
            },
            f"{outdir}/fig_multichain_{size}_{n_chains}ch.pdf",
        )

    print(json.dumps(report))
    return pooled, rhat, report


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(multichain_deblur)


if __name__ == "__main__":
    main()
