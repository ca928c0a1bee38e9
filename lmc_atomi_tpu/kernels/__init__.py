from lmc_atomi_tpu.kernels.base import Kernel, stepsize_at
from lmc_atomi_tpu.kernels.imaging import (
    myula_imaging,
    pnp_ula,
    score_ula,
    score_ula_pc,
    ulpda,
)
from lmc_atomi_tpu.kernels.myula_pallas import myula_imaging_fused
from lmc_atomi_tpu.kernels.myula_fused import (
    myula_imaging_sep_fused,
    run_myula_tv_fused,
    run_myula_tv_fused_packed,
    sep_fused_supported,
)
from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled
from lmc_atomi_tpu.kernels.wavelet_fused import (
    run_myula_wavelet_fused,
    run_ulpda_wavelet_fused,
)
from lmc_atomi_tpu.kernels.ulpda_fused import (
    run_ulpda_fused,
    run_ulpda_fused_packed,
    ulpda_fused_supported,
    ulpda_sep_fused,
)
from lmc_atomi_tpu.kernels.langevin import ihpula, mala, mla, pula, sqrtm_psd, ula
from lmc_atomi_tpu.kernels.proximal import fbula, lbmumla, mymala, myula, pgld, ppula
from lmc_atomi_tpu.kernels.sgmcmc import (
    contour_spgld,
    csgld,
    csgld_importance_resample,
    cyclical_sgld,
    cyclical_spgld,
    cyclical_cosine_schedule,
    minibatch_grad_estimator,
    msgld,
    mysgld,
    polynomial_schedule,
    sgld,
    spgld,
    ssgld,
)

__all__ = [
    "sgld",
    "msgld",
    "cyclical_sgld",
    "csgld",
    "csgld_importance_resample",
    "spgld",
    "ssgld",
    "mysgld",
    "cyclical_spgld",
    "contour_spgld",
    "polynomial_schedule",
    "cyclical_cosine_schedule",
    "minibatch_grad_estimator",
    "Kernel",
    "stepsize_at",
    "ula",
    "mala",
    "pula",
    "ihpula",
    "mla",
    "sqrtm_psd",
    "pgld",
    "myula",
    "mymala",
    "ppula",
    "fbula",
    "lbmumla",
    "ulpda",
    "myula_imaging",
    "myula_imaging_fused",
    "pnp_ula",
    "score_ula",
    "score_ula_pc",
    "myula_imaging_sep_fused",
    "run_myula_tv_fused",
    "run_myula_tv_fused_packed",
    "run_myula_tv_tiled",
    "run_myula_wavelet_fused",
    "run_ulpda_wavelet_fused",
    "sep_fused_supported",
    "ulpda_sep_fused",
    "run_ulpda_fused",
    "run_ulpda_fused_packed",
    "ulpda_fused_supported",
]
