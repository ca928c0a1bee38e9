"""PnP-ULA with a trained DnCNN prior + vmapped parallel chains for
credible-interval maps (BASELINE.json config 5).

Trains the denoiser in-repo on random synthetic phantoms (no external
weights exist in this environment), then runs Plug-and-Play ULA on a
deblurring posterior with ``n_chains`` vmapped chains; per-pixel posterior
mean / std / credible-interval maps come from merged streaming moments.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def pnp_ula_deblur(
    size: int = 256,
    sigma: float = 0.03,
    blur_size: int = 5,
    denoiser_sigma: float = 0.05,
    train_steps: int = 1500,
    depth: int = 8,
    features: int = 48,
    spectral_norm: float = 1.1,
    alpha: float = 1.0,  # r2 scan: 0.3 degraded PSNR, 1.0 is +5.2dB at 256^2
    n_steps: int = 2000,
    burn_in: int = 200,
    n_chains: int = 8,
    chain_block: int = 128,
    ci_z: float = 1.96,
    seed: int = 0,
    outdir: str = "fig",
    make_plots: bool = True,
    platform: str = "",
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.eval.metrics import psnr as psnr_fn
    from lmc_atomi_tpu.kernels import pnp_ula
    from lmc_atomi_tpu.models.dncnn import (
        conv_operator_norms,
        lipschitz_estimate,
        make_denoiser,
        train_denoiser,
    )
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.parallel.mesh import merge_chain_moments
    from lmc_atomi_tpu.run.runner import run_chain, run_chains
    from lmc_atomi_tpu.utils.images import phantom

    dtype = jnp.float32
    img = jnp.asarray(phantom(size), dtype) / 255.0
    key = jax.random.PRNGKey(seed)
    kd, kn, ks = jax.random.split(key, 3)

    print("training DnCNN prior on synthetic phantoms...", file=sys.stderr)
    t0 = time.perf_counter()
    params, apply_fn = train_denoiser(
        kd, noise_sigma=denoiser_sigma, steps=train_steps,
        depth=depth, features=features,
        spectral_norm=spectral_norm if spectral_norm > 0 else None,
    )
    denoiser = make_denoiser(params, apply_fn)
    print(f"denoiser trained in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Lipschitz control (Laumont et al. ergodicity condition): certified
    # layer-product bound (circular-conv operator norms) + measured local
    # constant of the residual D(x)-x by Jacobian power iteration.
    norms = conv_operator_norms(params)
    lip_bound = float(np.prod(list(norms.values())))
    probe = jnp.asarray(phantom(min(size, 128)), dtype) / 255.0
    probe = probe + denoiser_sigma * jax.random.normal(
        jax.random.fold_in(kd, 77), probe.shape, dtype
    )
    lip_measured = lipschitz_estimate(
        lambda x: denoiser(x) - x, probe, jax.random.fold_in(kd, 78)
    )
    print(
        f"denoiser residual Lipschitz: certified<= {lip_bound:.3f} "
        f"(circular bound), measured {lip_measured:.3f}",
        file=sys.stderr,
    )

    blur = CirculantBlur2D.from_kernel((size, size), uniform_kernel(blur_size, dtype))
    y = jax.jit(
        lambda im, k: blur.matvec(im) + sigma * jax.random.normal(k, im.shape, dtype)
    )(img, kn)
    l2 = L2Data.create(op=blur, b=y, sigma=1.0 / sigma**2)

    lips = 1.0 / sigma**2 + alpha / denoiser_sigma**2
    tau = 0.5 / lips
    eps = denoiser_sigma**2
    kern = pnp_ula(l2.grad, denoiser, tau=tau, eps=eps, alpha=alpha,
                   box=(-1.0, 2.0))

    t0 = time.perf_counter()
    # Bound each device execution to ~segment_steps sampler steps: the
    # tunneled TPU runtime kills single executions running much past a
    # minute, and chain-blocked farms at 2000 steps sit right at that edge.
    # Segments carry positions on host and Chan-merge their Welford partials
    # (identical statistics; burn-in masks only the first segment).
    segment_steps = min(n_steps, 500)
    segs = [segment_steps] * (n_steps // segment_steps)
    if n_steps % segment_steps:
        segs.append(n_steps % segment_steps)

    if n_chains > 1:
        # Chains run in vmapped blocks (DnCNN activations at 1024x256^2
        # would exceed single-chip HBM); blocks merge into one pooled
        # streaming estimate, so the statistics are those of all n_chains.
        # The segment runner is jitted ONCE and reused — eager run_chains
        # dispatches per scan segment and measured ~10x slower.
        block = min(chain_block, n_chains)

        run_seg = jax.jit(
            lambda x, k, nb, ns, bi: run_chains(
                kern, x, k, ns, n_chains=nb, collect="stats", burn_in=bi,
                batched=True,
            ),
            static_argnums=(2, 3, 4),
        )
        pooled = None
        for b in range(0, n_chains, block):
            nb = min(block, n_chains - b)  # exact final block size
            bkey = jax.random.fold_in(ks, b)
            x = jnp.broadcast_to(y, (nb,) + y.shape)
            for s, ns in enumerate(segs):
                res = run_seg(x, jax.random.fold_in(bkey, s), nb, ns,
                              burn_in if s == 0 else 0)
                jax.block_until_ready(res.moments.mean)
                x = res.final_state.position
                part = merge_chain_moments(res.moments)
                pooled = part if pooled is None else pooled.merge(part)
    else:
        run_seg = jax.jit(
            lambda x, k, ns, bi: run_chain(kern, x, k, ns, collect="stats",
                                           burn_in=bi),
            static_argnums=(2, 3),
        )
        x, pooled = y, None
        for s, ns in enumerate(segs):
            res = run_seg(x, jax.random.fold_in(ks, s), ns,
                          burn_in if s == 0 else 0)
            jax.block_until_ready(res.moments.mean)
            x = res.final_state.position
            pooled = res.moments if pooled is None else pooled.merge(
                res.moments
            )
    dt = time.perf_counter() - t0

    mean = np.asarray(pooled.mean)
    std = np.asarray(pooled.std)
    ci_width = 2 * ci_z * std

    report = {
        "psnr_blurred": float(psnr_fn(img, y)),
        "psnr_posterior_mean": float(psnr_fn(img, jnp.asarray(mean, dtype))),
        "mean_ci_width": float(ci_width.mean()),
        "chain_steps_per_sec": round(n_steps * n_chains / dt, 1),
    }
    print(json.dumps({"workload": "pnp_ula_deblur", "size": size,
                      "n_chains": n_chains, "steps": n_steps, **report}))

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        F.image_grid(
            {
                "Ground truth": np.asarray(img),
                "Blurred": np.asarray(y),
                "PnP-ULA posterior mean": mean,
                "Posterior std (CI map)": std,
            },
            f"{outdir}/fig_pnp_ula_{size}_{n_steps}.pdf",
        )
    return mean, std, report


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(pnp_ula_deblur)


if __name__ == "__main__":
    main()
