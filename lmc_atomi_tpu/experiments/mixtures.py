"""Workload 1: Gaussian-mixture LMC (reference lmc.py:194-450).

Runs ULA / MALA / PULA / IHPULA / MLA on the n-component benchmark mixture,
computes the W2-vs-samples diagnostic against ancestral true samples, and
(optionally) writes the density/histogram/KDE/W2 figures with the reference's
filename scheme. All samplers run as one jitted scan; chains can be vmapped.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def lmc_gaussian_mixture(
    gamma_ula: float = 5e-2,
    gamma_mala: float = 5e-2,
    gamma_pula: float = 5e-2,
    gamma_ihpula: float = 5e-2,
    gamma_mla: float = 5e-2,
    n: int = 5,
    k: int = 5000,
    seed: int = 0,
    n_chains: int = 1,
    outdir: str = "fig",
    make_plots: bool = True,
    eval_w2: bool = True,
    w2_interval: int = 100,
    platform: str = "",
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.eval.metrics import acceptance_rate
    from lmc_atomi_tpu.eval.wasserstein import w2_prefix_curve
    from lmc_atomi_tpu.experiments.configs import gaussian_mixture_config
    from lmc_atomi_tpu.kernels import ihpula, mala, mla, pula, ula
    from lmc_atomi_tpu.models import GaussianMixture
    from lmc_atomi_tpu.run.runner import run_chain_jit, run_chains_jit

    mus, sigmas, omegas = gaussian_mixture_config(n)
    gm = GaussianMixture.create(mus, sigmas, omegas)
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.normal(jax.random.fold_in(key, 999), (2,))

    m_pre = jnp.asarray([[1.0, 0.1], [0.1, 0.5]])  # reference lmc.py:278
    beta = jnp.asarray([0.7, 0.3])  # reference lmc.py:284

    kernels = {
        "ULA": ula(gm.grad_potential, gamma_ula),
        "MALA": mala(gm.log_density, gm.grad_potential, gamma_mala),
        "PULA": pula(gm.grad_potential, gamma_pula, m_pre),
        "IHPULA": ihpula(gm.grad_potential, gm.hess_potential, gamma_ihpula),
        "MLA": mla(gm.grad_potential, gamma_mla, beta),
    }

    results, samples, timings = {}, {}, {}
    for i, (name, kern) in enumerate(kernels.items()):
        kkey = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        if n_chains > 1:
            res = run_chains_jit(kern, x0, kkey, k, n_chains=n_chains,
                                 collect="samples")
            s = np.asarray(res.samples).reshape(-1, 2)
        else:
            res = run_chain_jit(kern, x0, kkey, k, collect="samples")
            s = np.asarray(res.samples)
        jax.block_until_ready(res.samples)
        timings[name] = time.perf_counter() - t0
        results[name] = res
        samples[name] = s
        if name in ("MALA",):
            acc = float(acceptance_rate(res.infos))
            print(f"{name} percentage of effective samples: {acc:.4f}",
                  file=sys.stderr)

    true = np.asarray(gm.sample(jax.random.fold_in(key, 123), k))

    curves = {}
    if eval_w2:
        for name, s in samples.items():
            sj = s[: k]
            ks, vals = w2_prefix_curve(
                jnp.asarray(true), jnp.asarray(sj), interval=w2_interval
            )
            curves[name] = (np.asarray(ks), np.asarray(vals))

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        grid = np.linspace(-5, 5, 300)
        xg, yg = np.meshgrid(grid, grid)
        pos = np.stack([xg, yg], axis=-1)
        z = np.asarray(gm.density(jnp.asarray(pos)))
        stem = f"{outdir}/fig_n{n}_gamma{gamma_ula}_{k}"
        F.density_surface(xg, yg, z, f"{stem}_1.pdf")
        F.sample_grid(xg, yg, z, samples, f"{stem}_3.pdf", mode="hist")
        F.sample_grid(xg, yg, z, samples, f"{stem}_2.pdf", mode="kde")
        if curves:
            F.w2_curves(curves, f"{stem}_wass_dist.pdf")

    from lmc_atomi_tpu.eval.diagnostics import effective_sample_size

    ess = {
        m: float(np.asarray(effective_sample_size(jnp.asarray(s))).min())
        for m, s in samples.items()
    }
    summary = {
        "workload": "gaussian_mixture_lmc",
        "n": n,
        "k": k,
        "iters_per_sec": {m: round(k * max(1, n_chains) / t, 1)
                          for m, t in timings.items()},
        "final_w2": {m: float(v[1][-1]) for m, v in curves.items()},
        "min_ess": ess,
    }
    print(json.dumps(summary))
    return samples, curves, summary


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(lmc_gaussian_mixture)


if __name__ == "__main__":
    main()
