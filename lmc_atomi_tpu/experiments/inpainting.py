"""Wavelet-l1 inpainting: MYULA vs MALA vs wavelet-dual ULPDA at up to
512x512 (BASELINE.json config 4).

Observation: random pixel mask + Gaussian noise. Prior: ``tau ||W x||_1``
with an orthogonal DWT, whose prox is exact (no inner iterations).
MYULA uses the Moreau-envelope drift; MALA targets the Moreau-smoothed
posterior with accept/reject (exact-target MALA on an l1 posterior at
d = size^2 has an O(d*step) kink penalty in the log ratio -> zero
acceptance; that failure mode is the MYULA family's raison d'etre);
ULPDA dualizes the wavelet term (y in the DWT coefficient domain,
proxdual = l-inf clip) — the reference's generic-operator primal-dual
sampler beyond gradient duals (algs.py:436-448, round-3 VERDICT item 8).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def wavelet_inpainting(
    size: int = 512,
    mask_frac: float = 0.5,
    sigma: float = 0.1,
    tau_w: float = 5.0,
    lam_moreau: float = 0.05,
    gamma: float = 0.0,
    mala_step_scale: float = 0.0,  # <=0: auto 0.2*(1024/d)^(1/3)
    n_steps: int = 2000,
    burn_in: int = 200,
    levels: int = 3,
    wavelet: str = "haar",  # 'haar' | 'd4' | 'd8' (ops/wavelet.py)
    image: str = "phantom",
    seed: int = 0,
    outdir: str = "fig",
    make_plots: bool = True,
    platform: str = "",
    fused: bool = False,  # adds fused MYULA + wavelet-dual ULPDA rows
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.eval.metrics import acceptance_rate, psnr as psnr_fn
    from lmc_atomi_tpu.kernels import mala, myula_imaging
    from lmc_atomi_tpu.kernels.imaging import ulpda
    from lmc_atomi_tpu.ops.functionals import L1Norm, L2Data, OrthogonalL1
    from lmc_atomi_tpu.ops.linops import Mask
    from lmc_atomi_tpu.ops.wavelet import make_dwt
    from lmc_atomi_tpu.run.runner import run_chain_jit
    from lmc_atomi_tpu.utils.images import load_image

    from lmc_atomi_tpu.utils import default_real_dtype
    dtype = default_real_dtype()
    img = jnp.asarray(load_image(image, size), dtype) / 255.0
    key = jax.random.PRNGKey(seed)
    km, kn, ks = jax.random.split(key, 3)
    mask = (jax.random.uniform(km, (size, size)) > mask_frac).astype(dtype)
    m_op = Mask(mask=mask)
    y = m_op.matvec(img) + sigma * mask * jax.random.normal(kn, img.shape, dtype)

    l2 = L2Data(op=m_op, b=y, sigma=1.0 / sigma**2)
    wav = OrthogonalL1(op=make_dwt(wavelet, levels=levels), sigma=tau_w)

    lips = 1.0 / sigma**2
    if gamma <= 0:
        gamma = 1.0 / lips
    tau_step = 0.2 * gamma

    x0 = y  # start at the observed (masked) image

    # MYULA: smooth drift with Moreau-envelope prior gradient
    kern_myula = myula_imaging(l2, wav, tau=tau_step, gamma=gamma)

    # MALA targets the Moreau-SMOOTHED posterior (as the reference's MALA
    # does, lmc_laplace.py:131): exact-target MALA on an l1 posterior at
    # d = size^2 has an O(d * step) irreducible kink penalty in the log
    # ratio — zero acceptance at any usable step; that failure mode is the
    # motivation for the MYULA family.
    def log_density_smooth(x):
        return -(l2(x) + wav.moreau_value(x, lam_moreau))

    def smoothed_grad(x):
        return l2.grad(x) + wav.moreau_grad(x, lam_moreau)

    # smooth-target MALA: optimal-scaling ~ d^{-1/3}, constant tuned for
    # ~0.5-0.7 acceptance at 512^2
    if mala_step_scale <= 0:
        mala_step_scale = 0.2 * (1024.0 / (size * size)) ** (1.0 / 3.0)
    kern_mala = mala(log_density_smooth, smoothed_grad,
                     mala_step_scale * tau_step)

    # Wavelet-dual ULPDA: the dual variable lives in the DWT coefficient
    # domain (lambda_max(W^T W) = 1 for orthogonal W, so tau*mu < 1 at the
    # reference scheme tau = 0.95/L, mu = 1 — algs.py:381).
    kern_ulpda = ulpda(
        l2, L1Norm(sigma=tau_w), wav.op, tau=0.95 / lips, mu=1.0,
        gfirst=False,
    )

    results, timings, extra = {}, {}, {}
    for i, (name, kern) in enumerate(
        [("MYULA", kern_myula), ("MALA", kern_mala),
         ("ULPDA-wavelet", kern_ulpda)]
    ):
        t0 = time.perf_counter()
        res = run_chain_jit(
            kern, x0, jax.random.fold_in(ks, i), n_steps,
            collect="stats", burn_in=burn_in,
        )
        jax.block_until_ready(res.moments.mean)
        timings[name] = time.perf_counter() - t0
        results[name] = np.asarray(res.moments.mean)
        if name == "MALA":
            extra["mala_acceptance"] = float(acceptance_rate(res.infos))
            print(f"MALA acceptance: {extra['mala_acceptance']:.3f}",
                  file=sys.stderr)

    if fused:
        # fully fused Pallas chains (kernels/wavelet_fused.py): in-VMEM
        # interleaved DWT (Haar butterflies or D4/D8 periodic filter
        # banks) -> exact soft-threshold prox (layout invariance) +
        # masked-data gradient + on-core noise + Welford, plus the
        # wavelet-DUAL ULPDA (closed-form mask prox, l-inf dual clip —
        # no inner solve)
        taps = {"haar": 2, "d4": 4, "db2": 4, "d8": 8, "db4": 8}[wavelet]
        from lmc_atomi_tpu.kernels import (
            run_myula_wavelet_fused,
            run_ulpda_wavelet_fused,
        )

        # off-TPU (tests/smokes) interpret mode still needs noise, which
        # the interpreter cannot emulate -> run the deterministic MAP-like
        # chain there; the TPU path samples
        on_tpu = jax.default_backend() == "tpu"
        run_f = jax.jit(
            lambda x, k: run_myula_wavelet_fused(
                l2, tau_w, tau_step, gamma, x, k, n_steps,
                levels=levels, taps=taps, burn_in=burn_in,
                noise_scale=1.0 if on_tpu else 0.0,
                interpret=not on_tpu,
            )
        )
        run_uf = jax.jit(
            lambda x, k: run_ulpda_wavelet_fused(
                l2, tau_w, 0.95 / lips, 1.0, x, k, n_steps,
                levels=levels, taps=taps, burn_in=burn_in,
                noise_scale=1.0 if on_tpu else 0.0,
                interpret=not on_tpu,
            )
        )
        # time a SECOND call with the identical static step count: Mosaic
        # compilation of the fused kernels is ~15 s at 512^2, so a single
        # cold call at experiment-scale step counts reports compile time,
        # not throughput (CLAUDE.md: warm up with the same static count)
        for fname, frun, fkey in (
            ("MYULA-fused", run_f, 7), ("ULPDA-wavelet-fused", run_uf, 8)
        ):
            res_f = frun(x0, jax.random.fold_in(ks, fkey))
            jax.block_until_ready(res_f.moments.mean)
            t0 = time.perf_counter()
            res_f = frun(x0, jax.random.fold_in(ks, fkey))
            jax.block_until_ready(res_f.moments.mean)
            timings[fname] = time.perf_counter() - t0
            results[fname] = np.asarray(res_f.moments.mean)

    report = {
        name: {"psnr": float(psnr_fn(img, jnp.asarray(est, dtype)))}
        for name, est in results.items()
    }
    report["observed"] = {"psnr": float(psnr_fn(img, y))}

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        panels = {"Ground truth": np.asarray(img), "Observed": np.asarray(y)}
        panels.update({f"{k} posterior mean": v for k, v in results.items()})
        F.image_grid(panels, f"{outdir}/fig_inpainting_{size}_{n_steps}.pdf")

    summary = {
        "workload": "wavelet_inpainting",
        "size": size,
        "wavelet": wavelet,
        "image": image,
        "steps": n_steps,
        "report": report,
        "iters_per_sec": {m: round(n_steps / t, 2) for m, t in timings.items()},
        **extra,
    }
    print(json.dumps(summary))
    return results, summary


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(wavelet_inpainting)


if __name__ == "__main__":
    main()
