"""Workload 4: Bayesian image deconvolution (reference prox_lmc_deconv.py).

One blurred/noisy observation (5x5 uniform blur + N(0, sigma^2) noise,
reference prox_lmc_deconv.py:55-59) is deblurred under 9 models — 3 assumed
blur kernels (5/6/7 uniform) x 3 priors (convex isotropic TV, nonconvex
MC-TV, nonconvex ME-TV) — via either

  * **MAP**: residual-balancing adaptive PDHG (reference
    prox_lmc_deconv.py:144-298), or
  * **posterior sampling**: ULPDA or MYULA with streaming posterior mean
    (the reference hoards N full images then means them,
    prox_lmc_deconv.py:474-475).

Per-iteration cost / error / SNR / PSNR / MSE series are collected as
jittable metrics (reference callback prox_lmc_deconv.py:128-133). Step sizes
follow prox_lmc_deconv.py:88-94.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _model_name(idx: int) -> str:
    return f"M{idx + 1}"


def prox_lmc_deconv(
    gamma_mc: float = 15.0,
    gamma_me: float = 15.0,
    sigma: float = 0.75,
    tau: float = 0.3,
    n_steps: int = 1000,
    niter_l2: int = 50,
    niter_tv: int = 10,
    niter_map: int = 1000,
    image: str = "phantom",
    size: int = 512,
    alg: str = "ULPDA",
    compute_map: bool = False,
    seed: int = 0,
    outdir: str = "fig",
    make_plots: bool = True,
    collect_metrics: bool = True,
    show: bool = False,
    platform: str = "",
    wavelet_row: bool = False,  # 10th model: k5 + wavelet-l1 prior (wl1 dual)
    wavelet_levels: int = 4,
    score_row: bool = False,  # learned-prior row: k5 + annealed score-ULA
    score_train_steps: int = 4000,
    score_arch: str = "unet",
    score_class: str = "photo",
    score_alpha: float = 1.0,
    denoiser_sigma: float = 0.03,
    score_burn_frac: float = 0.25,
    segment_steps: int = 1000,
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.eval.metrics import mse as mse_fn
    from lmc_atomi_tpu.eval.metrics import psnr as psnr_fn
    from lmc_atomi_tpu.eval.metrics import snr as snr_fn
    from lmc_atomi_tpu.kernels import myula_imaging, ulpda
    from lmc_atomi_tpu.ops.functionals import L1Norm, L21Norm, L2Data, TVNorm
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
    from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV
    from lmc_atomi_tpu.run.optimize import adaptive_pdhg
    from lmc_atomi_tpu.run.runner import run_chain_jit
    from lmc_atomi_tpu.utils.images import load_image

    from lmc_atomi_tpu.utils import default_real_dtype
    dtype = default_real_dtype()
    img = jnp.asarray(load_image(image, size), dtype)
    key = jax.random.PRNGKey(seed)

    blurs = {
        k: CirculantBlur2D.from_kernel((size, size), uniform_kernel(k, dtype))
        for k in (5, 6, 7)
    }
    # one observation from the 5x5 blur (reference prox_lmc_deconv.py:59)
    y = jax.jit(
        lambda im, kk: blurs[5].matvec(im)
        + sigma * jax.random.normal(kk, im.shape, dtype)
    )(img, key)

    lips = 1.0 / sigma**2
    tau0 = 0.95 / lips
    mu0 = 1.0
    gamma_myula = 1.0 / lips
    tau_myula = 0.2 * gamma_myula

    grad_op = Gradient2D()

    def data_terms(k):
        l2 = L2Data.create(op=blurs[k], b=y, sigma=1.0 / sigma**2, niter_solve=niter_l2)
        l2_mc = L2NcvxTV(
            op=blurs[k], b=y, op2=grad_op, sigma=1.0 / sigma**2, lamda=tau,
            gamma=gamma_mc, isotropic=True, niter_inner=niter_tv,
            niter_solve=niter_l2,
        )
        l2_me = L2NcvxTV(
            op=blurs[k], b=y, op2=None, sigma=1.0 / sigma**2, lamda=tau,
            gamma=gamma_me, isotropic=True, niter_inner=niter_tv,
            niter_solve=niter_l2,
        )
        return l2, l2_mc, l2_me

    l1iso = L21Norm(sigma=tau)
    l1 = L1Norm(sigma=tau)
    tv = TVNorm(sigma=tau, niter=niter_tv)

    # 9 models: (assumed kernel, data term, primal-dual regularizer,
    # analysis operator for the dual)
    models = []
    for k in (5, 6, 7):
        l2, l2_mc, l2_me = data_terms(k)
        models.append((f"k{k}-TV", l2, l1iso, grad_op))
        models.append((f"k{k}-MCTV", l2_mc, l1, grad_op))
        models.append((f"k{k}-METV", l2_me, l1iso, grad_op))
    if wavelet_row:
        # generic-operator primal-dual beyond gradient duals (reference
        # algs.py:436-448): wavelet-l1 prior, dual in the orthogonal Haar
        # coefficient domain — the fused wl1 kernel when supported.
        from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

        l2_w, _, _ = data_terms(5)
        models.append(
            (f"k5-WL1", l2_w, l1, HaarDWT2D(levels=wavelet_levels))
        )

    x0 = jnp.zeros((size, size), dtype)

    def make_metrics(proxf, proxg, pd: bool, a_op=None):
        if not collect_metrics:
            return None
        a_op = grad_op if a_op is None else a_op
        if pd:
            cost = lambda x: proxf(x) + proxg(a_op.matvec(x))
        else:
            cost = lambda x: proxf(x) + proxg(x)
        out = {
            "cost": cost,
            "err": lambda x: jnp.linalg.norm((x - img).ravel()),
            "snr": lambda x: snr_fn(img, x),
            "psnr": lambda x: psnr_fn(img, x),
            "mse": lambda x: mse_fn(img, x),
        }
        if show:
            # the reference's per-iteration show-table components
            # (f, g(A x), J — algs.py:459-467 for ULPDA, 576-583 for
            # MYULA; z^T x is 0 here, z=None as in the workload)
            out["f"] = lambda x: proxf(x)
            out["gA"] = (
                (lambda x: proxg(a_op.matvec(x))) if pd
                else (lambda x: proxg(x))
            )
        return out

    results, series, timings = {}, {}, {}

    for idx, (name, proxf, proxg, a_op) in enumerate(models):
        mname = _model_name(idx)
        label = f"{mname} ({name})"
        t0 = time.perf_counter()
        if compute_map:
            metrics = make_metrics(proxf, proxg, pd=True, a_op=a_op)
            out = jax.jit(
                lambda pf, pg, x, op=a_op: adaptive_pdhg(
                    pf, pg, op, x, tau0, mu0, niter_map, metrics=metrics
                )
            )(proxf, proxg, x0)
            jax.block_until_ready(out.x)
            est = out.x
            met = (
                {k: np.asarray(v) for k, v in out.metrics.items()}
                if out.metrics is not None
                else None
            )
        else:
            if alg == "ULPDA":
                # TPU production path: fused primal-dual step with a
                # fixed-trip Richardson gram solve (kernels/ulpda_fused.py; parity
                # gated in tests/test_ulpda_fused.py)
                from lmc_atomi_tpu.kernels import (
                    ulpda_fused_supported,
                    ulpda_sep_fused,
                )

                if ulpda_fused_supported(proxf, proxg, a_op, x0.shape,
                                         x0.dtype):
                    kern = ulpda_sep_fused(proxf, proxg, a_op, tau=tau0,
                                           mu=mu0, theta=1.0, gfirst=False)
                else:
                    kern = ulpda(proxf, proxg, a_op, tau=tau0, mu=mu0,
                                 theta=1.0, gfirst=False)
                metrics = make_metrics(proxf, proxg, pd=True, a_op=a_op)
            else:  # MYULA samples with the TV prox regularizer
                # TPU production path: the fully fused Pallas step (same
                # math and metrics plumbing; PSNR parity gated in
                # tests/test_myula_fused.py) — all nine models, including
                # the isotropic nonconvex MC-TV/ME-TV data terms.
                # prefer_stencil ops keep the XLA kernel.
                from lmc_atomi_tpu.kernels import (
                    myula_imaging_sep_fused,
                    sep_fused_supported,
                )

                if not isinstance(a_op, Gradient2D):
                    # wavelet row: exact orthogonal-DWT l1 prox, no Moreau
                    # inner iterations (ops/functionals.py::OrthogonalL1)
                    from lmc_atomi_tpu.ops.functionals import OrthogonalL1

                    reg = OrthogonalL1(op=a_op, sigma=tau)
                    kern = myula_imaging(proxf, reg, tau=tau_myula,
                                         gamma=gamma_myula)
                elif sep_fused_supported(
                    getattr(proxf, "op", None), x0.shape, x0.dtype
                ):
                    reg = tv
                    kern = myula_imaging_sep_fused(
                        proxf, tv.sigma, tau_myula, gamma_myula,
                        niter_tv=tv.niter,
                    )
                else:
                    reg = tv
                    kern = myula_imaging(proxf, tv, tau=tau_myula,
                                         gamma=gamma_myula)
                metrics = make_metrics(proxf, reg, pd=False)
            res = run_chain_jit(
                kern, x0, jax.random.fold_in(key, idx), n_steps,
                collect="stats", metrics=metrics,
            )
            jax.block_until_ready(res.moments.mean)
            est = res.moments.mean
            met = (
                {k: np.asarray(v) for k, v in res.metrics.items()}
                if res.metrics is not None
                else None
            )
        timings[label] = time.perf_counter() - t0
        results[label] = np.asarray(est)
        if met is not None:
            series[label] = met
            if show and "f" in met:
                # reference show=True table (iter, f, g(Ax), J) with the
                # first-10 / last-10 / every-n/10 thinning policy
                from lmc_atomi_tpu.utils.trace import print_iteration_table

                print(f"-- {label} --")
                print_iteration_table(
                    {"f": met["f"], "g(Ax)": met["gA"], "J": met["cost"]}
                )

    if score_row and not compute_map:
        # Learned-prior row (round-4 VERDICT item 3): annealed score-ULA
        # with the noise-conditional score net trained on the bundled
        # photographs (models/score.py image_class='photo') — the 4th
        # prior column the reference's model grid leaves open
        # (prox_lmc_deconv.py:101-122). The chain runs in [0,1] units
        # (the net's training scale): y/255 with sigma/255 data noise is
        # the SAME posterior as the TV rows up to the affine rescale.
        from lmc_atomi_tpu.kernels import score_ula
        from lmc_atomi_tpu.models.score import (
            geometric_sigmas,
            make_score_fn,
            train_score_net,
        )
        from lmc_atomi_tpu.run.runner import run_chain_segmented

        label = "M_score (k5-SCORE)"
        t0 = time.perf_counter()
        s_params, s_apply, _ = train_score_net(
            jax.random.fold_in(key, 101), sigma_max=0.4,
            sigma_min=denoiser_sigma, n_sigmas=8,
            steps=score_train_steps, arch=score_arch,
            image_class=score_class,
        )
        score = make_score_fn(s_params, s_apply)
        sig_d = sigma / 255.0
        l2s = L2Data.create(op=blurs[5], b=y / 255.0, sigma=1.0 / sig_d**2)
        lips_s = 1.0 / sig_d**2
        burn = int(score_burn_frac * n_steps)
        ladder = geometric_sigmas(0.4, denoiser_sigma, 8, dtype)
        anneal = jnp.repeat(ladder, max(burn // 8, 1))[:burn]
        anneal = jnp.pad(anneal, (0, burn - anneal.shape[0]),
                         constant_values=float(denoiser_sigma))
        sig_sched = jnp.concatenate([
            anneal, jnp.full((n_steps - burn,), denoiser_sigma, dtype),
        ])
        tau_sched = 0.5 / (lips_s + score_alpha / sig_sched**2)
        kern_sc = score_ula(
            l2s.grad, score, sig_sched, tau_sched, alpha=score_alpha,
            box=(-0.2, 1.2), box_weight=denoiser_sigma**2,
        )
        res = run_chain_segmented(
            kern_sc, y / 255.0, jax.random.fold_in(key, 102), n_steps,
            burn_in=burn, segment_steps=segment_steps,
        )
        jax.block_until_ready(res.moments.mean)
        timings[label] = time.perf_counter() - t0
        results[label] = 255.0 * np.asarray(res.moments.mean)

    branch = "MAP" if compute_map else alg
    report = {}
    for label, est in results.items():
        report[label] = {
            "snr": float(snr_fn(img, jnp.asarray(est, dtype))),
            "psnr": float(psnr_fn(img, jnp.asarray(est, dtype))),
            "mse": float(mse_fn(img, jnp.asarray(est, dtype))),
        }
        print(
            f"SNR of {branch} image with {label}: {report[label]['snr']:.3f}  "
            f"PSNR: {report[label]['psnr']:.3f}  MSE: {report[label]['mse']:.5f}",
            file=sys.stderr,
        )

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        panels = {"Ground truth": np.asarray(img), "Blurred": np.asarray(y)}
        panels.update(results)
        stem = f"{outdir}/fig_prox_lmc_deconv_{image}_{branch}_{n_steps if not compute_map else niter_map}"
        F.image_grid(panels, f"{stem}_images.pdf")
        if series:
            F.metric_evolution(series, f"{stem}_snr_psnr_mse.pdf")

    n_iters = niter_map if compute_map else n_steps
    summary = {
        "workload": "deconv",
        "branch": branch,
        "size": size,
        "steps": n_iters,
        "psnr_blurred": float(psnr_fn(img, y)),
        "report": report,
        "iters_per_sec": {m: round(n_iters / t, 2) for m, t in timings.items()},
    }
    print(json.dumps(summary))
    return results, series, summary


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(prox_lmc_deconv)


if __name__ == "__main__":
    main()
