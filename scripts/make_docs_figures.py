"""Generate the documentation figure set (docs/figures/*.png).

Small PNG renditions of the reference's figure types (C18): mixture
histogram/KDE grids with W2 curves, the 9-model deconvolution image grid,
and PnP-ULA uncertainty maps. Run from the repo root; uses the TPU if
attached, CPU otherwise.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    outdir = "docs/figures"
    os.makedirs(outdir, exist_ok=True)
    import jax.numpy as jnp

    from lmc_atomi_tpu.experiments import figures as F

    # --- workload 1: mixtures ------------------------------------------------
    from lmc_atomi_tpu.experiments.mixtures import lmc_gaussian_mixture

    samples, curves, _ = lmc_gaussian_mixture(
        n=5, k=10000, make_plots=False, eval_w2=True, w2_interval=500,
    )
    from lmc_atomi_tpu.experiments.configs import gaussian_mixture_config
    from lmc_atomi_tpu.models import GaussianMixture

    mus, sigmas, om = gaussian_mixture_config(5)
    gm = GaussianMixture.create(mus, sigmas, om)
    grid = np.linspace(-5, 5, 200)
    xg, yg = np.meshgrid(grid, grid)
    z = np.asarray(gm.density(jnp.asarray(np.stack([xg, yg], -1))))
    F.sample_grid(xg, yg, z, samples, f"{outdir}/mixtures_hist.png", mode="hist")
    F.w2_curves(curves, f"{outdir}/mixtures_w2.png")

    # --- workload 4: deconvolution -------------------------------------------
    from lmc_atomi_tpu.experiments.deconv import prox_lmc_deconv

    results, _, summary = prox_lmc_deconv(
        size=256, n_steps=500, alg="MYULA", make_plots=False,
        collect_metrics=False,
    )
    panels = {"Ground truth": None, "Blurred": None}
    from lmc_atomi_tpu.utils.images import phantom

    img = phantom(256)
    panels["Ground truth"] = img
    # regenerate blurred for display
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    import jax.numpy as jnp

    blur = CirculantBlur2D.from_kernel((256, 256), uniform_kernel(5, jnp.float32))
    y = np.asarray(
        jax.jit(lambda im, k: blur.matvec(im) + 0.75 * jax.random.normal(
            k, im.shape, im.dtype))(jnp.asarray(img, jnp.float32),
                                    jax.random.PRNGKey(0))
    )
    panels["Blurred"] = y
    panels.update(results)
    F.image_grid(panels, f"{outdir}/deconv_grid.png", ncols=4)

    # --- PnP-ULA uncertainty --------------------------------------------------
    from lmc_atomi_tpu.experiments.pnp import pnp_ula_deblur

    mean, std, _ = pnp_ula_deblur(
        size=128, train_steps=300, n_steps=800, burn_in=100, n_chains=16,
        chain_block=16, make_plots=False,
    )
    F.image_grid(
        {"PnP-ULA posterior mean": mean, "Posterior std": std},
        f"{outdir}/pnp_uncertainty.png", ncols=2,
    )

    # --- sparse-view CT -------------------------------------------------------
    # all four reconstruction branches on one panel: TV posterior, TV MAP,
    # DnCNN-PnP, annealed score-ULA (round-3 learned priors)
    from lmc_atomi_tpu.experiments.ct import ct_tv_myula

    arrays = {}
    ct_tv_myula(
        n_steps=2000, burn_in=200, compute_map=True, pnp=True,
        score_prior=True, make_plots=False, arrays_out=arrays,
    )
    panels = {
        "Ground truth": arrays["img"],
        "Sinogram (30 angles)": arrays["sino"],
        "TV posterior mean": arrays["mean"],
        "Posterior std": arrays["std"],
        "TV MAP (aPDHG)": arrays["map"],
        "PnP-ULA mean (DnCNN)": arrays["pnp_mean"],
        "Score-ULA mean (annealed)": arrays["score_mean"],
    }
    F.image_grid(panels, f"{outdir}/ct_posterior.png", ncols=4)
    print("figures written to", outdir)


if __name__ == "__main__":
    main()
