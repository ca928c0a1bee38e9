from lmc_atomi_tpu.experiments import configs, figures
from lmc_atomi_tpu.experiments.ct import ct_tv_myula
from lmc_atomi_tpu.experiments.deconv import prox_lmc_deconv
from lmc_atomi_tpu.experiments.denoise import l1_denoise_myula
from lmc_atomi_tpu.experiments.laplace_mixtures import lmc_laplacian_mixture
from lmc_atomi_tpu.experiments.mixtures import lmc_gaussian_mixture
from lmc_atomi_tpu.experiments.prox_mixtures import prox_lmc_gaussian_mixture
from lmc_atomi_tpu.experiments.inpainting import wavelet_inpainting
from lmc_atomi_tpu.experiments.pnp import pnp_ula_deblur
from lmc_atomi_tpu.experiments.sgld_runs import sgld_grid_mixture

__all__ = [
    "configs",
    "figures",
    "prox_lmc_deconv",
    "lmc_laplacian_mixture",
    "lmc_gaussian_mixture",
    "prox_lmc_gaussian_mixture",
    "sgld_grid_mixture",
    "wavelet_inpainting",
    "pnp_ula_deblur",
    "ct_tv_myula",
    "l1_denoise_myula",
]
