"""PnP-ULA with a trained DnCNN prior + vmapped parallel chains for
credible-interval maps (BASELINE.json config 5).

Trains the denoiser in-repo on random synthetic phantoms (no external
weights exist in this environment), then runs Plug-and-Play ULA on a
deblurring posterior with ``n_chains`` vmapped chains; per-pixel posterior
mean / std / credible-interval maps come from merged streaming moments.

Process-level chain farming (the 1024-chain BASELINE config 5 run): a big
farm splits into independent CLI invocations — train once with
``--train_only true --params_path p.msgpack``, then run disjoint chain
blocks with ``--chain_offset k --moments_out part_k.npz`` (each block
reloads the same denoiser and draws a disjoint key stream), and finally
``merge`` pools the per-block Welford moments into the full-farm posterior
mean / credible-interval maps. This keeps every device execution short
(flaky-link tolerant) and makes the farm resumable per block; see
``scripts/expt_pnp1024.sh``.
"""
from __future__ import annotations

import json
import os
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
    params_path: str = "",
    train_only: bool = False,
    chain_offset: int = 0,
    moments_out: str = "",
    tv_baseline: bool = True,
    tau_tv_baseline: float = 2.0,
    tv_steps: int = 0,  # 0 -> n_steps; a longer budget converges the anchor
    score_baseline: bool = False,
    score_train_steps: int = 1500,
    score_arch: str = "cnn",  # 'cnn' | 'unet' (models/score.py::ScoreUNet)
    score_class: str = "phantom",  # 'phantom' | 'terrain' | 'photo'
    pc_correctors: int = 0,  # >0: PC corrector sweeps (score_ula_pc)
    score_sigma_max: float = 0.4,
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
    from lmc_atomi_tpu.eval.metrics import psnr as psnr_fn
    from lmc_atomi_tpu.kernels import pnp_ula
    from lmc_atomi_tpu.models.dncnn import (
        DnCNN,
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

    if params_path and os.path.exists(params_path):
        model = DnCNN(depth=depth, features=features)
        tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 40, 40)))
        params = jax.tree.map(jnp.asarray, restore_checkpoint(params_path, tmpl))
        apply_fn = model.apply
        print(f"loaded denoiser from {params_path}", file=sys.stderr)
    else:
        print("training DnCNN prior on synthetic phantoms...", file=sys.stderr)
        t0 = time.perf_counter()
        params, apply_fn = train_denoiser(
            kd, noise_sigma=denoiser_sigma, steps=train_steps,
            depth=depth, features=features,
            spectral_norm=spectral_norm if spectral_norm > 0 else None,
        )
        print(
            f"denoiser trained in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        if params_path:
            save_checkpoint(params_path, params)
            print(f"saved denoiser to {params_path}", file=sys.stderr)
    denoiser = make_denoiser(params, apply_fn)

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
    if train_only:
        report = {
            "lipschitz_certified_bound": lip_bound,
            "lipschitz_measured": float(lip_measured),
        }
        print(json.dumps({"workload": "pnp_train_denoiser", **report}))
        return None, None, report

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

    def farm(kern_first, kern_rest, key_base):
        """Blocked multi-chain segmented farm -> pooled moments.

        ``kern_first`` drives segment 0 only — per-step schedules
        (annealed score-ULA sigma/tau ladders) live entirely inside the
        first segment because each segment re-inits the kernel state
        (and its step counter); ``kern_rest`` must be time-invariant.
        For schedule-free kernels pass the same kernel twice."""
        jitted = {}

        def run_seg_for(s):
            tag = 0 if s == 0 else 1
            if tag not in jitted:
                kern_s = kern_first if s == 0 else kern_rest
                if n_chains > 1:
                    jitted[tag] = jax.jit(
                        lambda x, k, nb, ns, bi, _kern=kern_s: run_chains(
                            _kern, x, k, ns, n_chains=nb, collect="stats",
                            burn_in=bi, batched=True,
                        ),
                        static_argnums=(2, 3, 4),
                    )
                else:
                    jitted[tag] = jax.jit(
                        lambda x, k, ns, bi, _kern=kern_s: run_chain(
                            _kern, x, k, ns, collect="stats", burn_in=bi,
                        ),
                        static_argnums=(2, 3),
                    )
            return jitted[tag]

        if n_chains > 1:
            # Chains run in vmapped blocks (DnCNN activations at
            # 1024x256^2 would exceed single-chip HBM); blocks merge into
            # one pooled streaming estimate, so the statistics are those
            # of all n_chains. Each segment runner is jitted ONCE and
            # reused — eager run_chains dispatches per scan segment and
            # measured ~10x slower.
            block = min(chain_block, n_chains)
            pooled = None
            for b in range(0, n_chains, block):
                nb = min(block, n_chains - b)  # exact final block size
                # chain_offset shifts the key stream so separate process
                # invocations covering disjoint chain ranges never collide
                bkey = jax.random.fold_in(key_base, chain_offset + b)
                x = jnp.broadcast_to(y, (nb,) + y.shape)
                for s, ns in enumerate(segs):
                    res = run_seg_for(s)(
                        x, jax.random.fold_in(bkey, s), nb, ns,
                        burn_in if s == 0 else 0,
                    )
                    jax.block_until_ready(res.moments.mean)
                    x = res.final_state.position
                    part = merge_chain_moments(res.moments)
                    pooled = part if pooled is None else pooled.merge(part)
            return pooled
        x, pooled = y, None
        for s, ns in enumerate(segs):
            res = run_seg_for(s)(x, jax.random.fold_in(key_base, s), ns,
                                 burn_in if s == 0 else 0)
            jax.block_until_ready(res.moments.mean)
            x = res.final_state.position
            pooled = res.moments if pooled is None else pooled.merge(
                res.moments
            )
        return pooled

    pooled = farm(kern, kern, ks)
    dt = time.perf_counter() - t0

    mean = np.asarray(pooled.mean)
    std = np.asarray(pooled.std)
    ci_width = 2 * ci_z * std

    report = {
        "psnr_blurred": float(psnr_fn(img, y)),
        "psnr_posterior_mean": float(psnr_fn(img, jnp.asarray(mean, dtype))),
        "mean_ci_width": float(ci_width.mean()),
        "chain_steps_per_sec": round(n_steps * n_chains / dt, 1),
        "lipschitz_certified_bound": lip_bound,
        "lipschitz_measured": float(lip_measured),
    }

    tv_mean = None
    if tv_baseline:
        # Anchor row (round-3 VERDICT item 5): TV-MYULA on the IDENTICAL
        # observation / blur / noise / step budget, so the PnP posterior
        # mean is read against what a hand-crafted prior buys on the same
        # problem (the reference always reports model comparisons
        # side-by-side, prox_lmc_deconv.py:707-735).
        from lmc_atomi_tpu.kernels import myula_imaging, sep_fused_supported
        from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
        from lmc_atomi_tpu.ops.functionals import TVNorm

        gamma_tv = sigma**2
        tau_step = 0.2 * gamma_tv
        n_tv = tv_steps or n_steps
        t0 = time.perf_counter()
        if sep_fused_supported(blur, y.shape, dtype):
            res_tv = jax.jit(
                lambda x, k: run_myula_tv_fused(
                    l2, tau_tv_baseline, tau_step, gamma_tv, x, k, n_tv,
                    burn_in=burn_in, quantiles=(0.025, 0.975),
                )
            )(y, jax.random.fold_in(ks, 999))
            tv_ci = float(
                jnp.mean(
                    res_tv.quantiles[0.975] - res_tv.quantiles[0.025]
                )
            )
        else:
            res_tv = run_chain(
                myula_imaging(
                    l2, TVNorm(sigma=tau_tv_baseline, niter=10),
                    tau=tau_step, gamma=gamma_tv,
                ),
                y, jax.random.fold_in(ks, 999), n_tv,
                collect="stats", burn_in=burn_in,
            )
            tv_ci = float(2 * ci_z * jnp.mean(res_tv.moments.std))
        jax.block_until_ready(res_tv.moments.mean)
        tv_mean = np.asarray(res_tv.moments.mean)
        report["psnr_tv_baseline_mean"] = float(
            psnr_fn(img, jnp.asarray(tv_mean, dtype))
        )
        report["tv_baseline_ci_width"] = tv_ci
        report["tv_baseline_steps_per_sec"] = round(
            n_tv / (time.perf_counter() - t0), 1
        )

    score_mean = None
    if score_baseline:
        # Third prior on the IDENTICAL observation and chain protocol:
        # annealed score-ULA under the noise-conditional score net
        # (models/score.py) — anneals the sigma ladder across burn-in
        # (inside segment 0, see farm()) and holds the finest level
        # during collection, so the pooled posterior is the fixed-level
        # score posterior.
        from lmc_atomi_tpu.kernels import score_ula
        from lmc_atomi_tpu.models.score import (
            geometric_sigmas,
            make_score_fn,
            train_score_net,
        )

        t0 = time.perf_counter()
        s_params, s_apply, _ = train_score_net(
            jax.random.fold_in(kd, 11), sigma_max=score_sigma_max,
            sigma_min=denoiser_sigma, n_sigmas=8, steps=score_train_steps,
            arch=score_arch, image_class=score_class,
        )
        score = make_score_fn(s_params, s_apply)
        ladder = geometric_sigmas(score_sigma_max, denoiser_sigma, 8, dtype)
        n0 = segs[0]
        anneal = jnp.repeat(ladder, max(burn_in // 8, 1))[:burn_in]
        anneal = jnp.pad(anneal, (0, burn_in - anneal.shape[0]),
                         constant_values=float(denoiser_sigma))
        sig0 = jnp.concatenate([
            anneal, jnp.full((max(n0 - burn_in, 0),), denoiser_sigma, dtype)
        ])[:n0]
        lips_f = 1.0 / sigma**2

        def kern_score(sig_spec):
            # per-level stability: tau_i = 0.5/(L_data + alpha/sigma_i^2)
            tau_spec = 0.5 / (lips_f + alpha / sig_spec**2)
            kw = dict(alpha=alpha, box=(-1.0, 2.0),
                      box_weight=denoiser_sigma**2)
            if pc_correctors > 0:
                from lmc_atomi_tpu.kernels import score_ula_pc

                return score_ula_pc(
                    l2.grad, score, sig_spec, tau_spec,
                    n_corrector=pc_correctors, **kw,
                )
            return score_ula(l2.grad, score, sig_spec, tau_spec, **kw)

        pooled_sc = farm(
            kern_score(sig0), kern_score(float(denoiser_sigma)),
            jax.random.fold_in(ks, 555),
        )
        score_mean = np.asarray(pooled_sc.mean)
        report["psnr_score_mean"] = float(
            psnr_fn(img, jnp.asarray(score_mean, dtype))
        )
        report["score_ci_width"] = float(
            2 * ci_z * jnp.mean(pooled_sc.std)
        )
        report["score_steps_per_sec"] = round(
            n_steps * n_chains / (time.perf_counter() - t0), 1
        )

    print(json.dumps({"workload": "pnp_ula_deblur", "size": size,
                      "n_chains": n_chains, "steps": n_steps, **report}))
    if moments_out:
        np.savez(
            moments_out, count=np.asarray(pooled.count),
            mean=np.asarray(pooled.mean, np.float64),
            m2=np.asarray(pooled.m2, np.float64),
            size=size, seed=seed, n_chains=n_chains, n_steps=n_steps,
        )
        print(f"saved pooled moments to {moments_out}", file=sys.stderr)

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        F.image_grid(
            {
                "Ground truth": np.asarray(img),
                "Blurred": np.asarray(y),
                "PnP-ULA posterior mean": mean,
                "Posterior std (CI map)": std,
                **(
                    {"TV-MYULA mean (same config)": tv_mean}
                    if tv_mean is not None else {}
                ),
                **(
                    {"Score-ULA mean (same config)": score_mean}
                    if score_mean is not None else {}
                ),
            },
            f"{outdir}/fig_pnp_ula_{size}_{n_steps}.pdf",
        )
    return mean, std, report


def pnp_merge(
    pattern: str = "/tmp/pnp_block_*.npz",
    size: int = 256,
    ci_z: float = 1.96,
    out: str = "",
    platform: str = "cpu",
):
    """Pool per-block moment files (``--moments_out``) into the full-farm
    posterior mean / std / credible-interval report (host-side, CPU)."""
    import glob

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.core.stats import RunningMoments
    from lmc_atomi_tpu.eval.metrics import psnr as psnr_fn
    from lmc_atomi_tpu.utils.images import phantom

    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no moment files match {pattern}")
    pooled, n_chains = None, 0
    for f in files:
        d = np.load(f)
        m = RunningMoments(
            count=jnp.asarray(d["count"]),
            mean=jnp.asarray(d["mean"], jnp.float64),
            m2=jnp.asarray(d["m2"], jnp.float64),
        )
        pooled = m if pooled is None else pooled.merge(m)
        n_chains += int(d["n_chains"]) if "n_chains" in d else 0
    img = jnp.asarray(phantom(size), jnp.float64) / 255.0
    mean, std = pooled.mean, np.asarray(pooled.std)
    report = {
        "n_blocks": len(files),
        "n_chains": n_chains,
        "n_chain_draws": int(pooled.count),
        "psnr_posterior_mean": float(psnr_fn(img, mean)),
        "mean_ci_width": float(2 * ci_z * std.mean()),
        "std_max": float(std.max()),
    }
    print(json.dumps({"workload": "pnp_merge", **report}))
    if out:
        np.savez(out, mean=np.asarray(mean), std=std)
    return report


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    if len(sys.argv) > 1 and sys.argv[1] == "merge":
        auto_cli(pnp_merge, sys.argv[2:])
    else:
        auto_cli(pnp_ula_deblur)


if __name__ == "__main__":
    main()
