"""Workload 3: proximal LMC on mixture x Laplace-prior target
(reference prox_lmc.py:259-460).

PGLD / MYULA / MYMALA / PP-ULA / FBULA / LBMUMLA on the composite target;
histogram/KDE figure grids (the reference computes no W2 here,
prox_lmc.py:385).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def prox_lmc_gaussian_mixture(
    gamma_pgld: float = 5e-2,
    gamma_myula: float = 5e-2,
    gamma_mymala: float = 5e-2,
    gamma_ppula: float = 5e-2,
    gamma_fbula: float = 5e-2,
    gamma_lbmumla: float = 5e-2,
    lamda: float = 0.01,
    alpha: float = 0.1,
    n: int = 5,
    t: int = 100,
    k: int = 10000,
    seed: int = 0,
    n_chains: int = 1,
    outdir: str = "fig",
    make_plots: bool = True,
    platform: str = "",
):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from lmc_atomi_tpu.eval.metrics import acceptance_rate
    from lmc_atomi_tpu.experiments.configs import gaussian_mixture_config
    from lmc_atomi_tpu.kernels import fbula, lbmumla, mymala, myula, pgld, ppula
    from lmc_atomi_tpu.models import (
        GaussianMixture,
        LaplacePrior,
        MixtureWithLaplacePrior,
    )

    mus, sigmas, omegas = gaussian_mixture_config(n)
    gm = GaussianMixture.create(mus, sigmas, omegas)
    prior = LaplacePrior.create(np.zeros(2), alpha)
    tgt = MixtureWithLaplacePrior.create(gm, prior, lamda)

    key = jax.random.PRNGKey(seed)
    x0 = jax.random.normal(jax.random.fold_in(key, 999), (2,))

    m_pre = jnp.asarray([[1.0, 0.1], [0.1, 0.5]])  # reference prox_lmc.py:374
    q_pre = jnp.asarray([[1.0, 0.1], [0.1, 1.5]])  # reference prox_lmc.py:375
    beta = jnp.asarray([0.7, 0.3])
    sigma_breg = jnp.asarray([0.8, 0.2])

    kernels = {
        "PGLD": pgld(tgt, gamma_pgld),
        "MYULA": myula(tgt, gamma_myula),
        "MYMALA": mymala(tgt, gamma_mymala),
        "PP-ULA": ppula(tgt, gamma_ppula, m_pre, q_pre, t=t),
        "FBULA": fbula(tgt, gamma_fbula),
        "LBMUMLA": lbmumla(tgt, gamma_lbmumla, beta, sigma_breg),
    }

    from lmc_atomi_tpu.run.runner import run_chain, run_chains

    samples, timings = {}, {}
    for i, (name, kern) in enumerate(kernels.items()):
        kkey = jax.random.fold_in(key, i)
        if n_chains > 1:
            run = jax.jit(
                lambda x, kk, kern=kern: run_chains(
                    kern, x, kk, k, n_chains=n_chains, collect="samples"
                )
            )
        else:
            run = jax.jit(
                lambda x, kk, kern=kern: run_chain(
                    kern, x, kk, k, collect="samples"
                )
            )
        # compile outside the timed region (iters/s is a device-rate table)
        res = run(x0, kkey)
        jax.block_until_ready(res.samples)
        t0 = time.perf_counter()
        res = run(x0, kkey)
        jax.block_until_ready(res.samples)
        timings[name] = time.perf_counter() - t0
        s = np.asarray(res.samples)
        if n_chains > 1:
            s = s.reshape(-1, 2)
        samples[name] = s
        if name == "MYMALA":
            print(f"MYMALA percentage of effective samples: "
                  f"{float(acceptance_rate(res.infos)):.4f}", file=sys.stderr)

    if make_plots:
        from lmc_atomi_tpu.experiments import figures as F

        F.ensure_outdir(outdir)
        grid = np.linspace(-5, 5, 300)
        xg, yg = np.meshgrid(grid, grid)
        pos = np.stack([xg, yg], axis=-1)
        z = np.asarray(tgt.density(jnp.asarray(pos)))
        # smoothed prior panel (reference prox_lmc.py:319)
        prox_pos = tgt.prior_prox(jnp.asarray(pos))
        env = alpha * jnp.sum(jnp.abs(prox_pos), axis=-1) + jnp.sum(
            (prox_pos - pos) ** 2, axis=-1
        ) / (2 * lamda)
        z_smooth = np.asarray(
            gm.density(jnp.asarray(pos))
            * (alpha / 2) ** 2
            * jnp.exp(-env)
        )
        stem = f"{outdir}/fig_prox_n{n}_gamma{gamma_pgld}_lambda{lamda}_{k}"
        F.density_surface(xg, yg, z, f"{stem}_1.pdf")
        F.density_surface(xg, yg, z_smooth, f"{stem}_1_smooth.pdf")
        F.sample_grid(xg, yg, z, samples, f"{stem}_3.pdf", mode="hist",
                      extra_panels={"Smoothed density": z_smooth})
        F.sample_grid(xg, yg, z, samples, f"{stem}_2.pdf", mode="kde",
                      extra_panels={"Smoothed density": z_smooth})

    summary = {
        "workload": "prox_lmc_mixture",
        "n": n,
        "k": k,
        "iters_per_sec": {m: round(k * max(1, n_chains) / tt, 1)
                          for m, tt in timings.items()},
    }
    print(json.dumps(summary))
    return samples, summary


def main():
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(prox_lmc_gaussian_mixture)


if __name__ == "__main__":
    main()
