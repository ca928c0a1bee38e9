from lmc_atomi_tpu.kernels.base import Kernel, stepsize_at
from lmc_atomi_tpu.kernels.imaging import myula_imaging, pnp_ula, ulpda
from lmc_atomi_tpu.kernels.langevin import ihpula, mala, mla, pula, sqrtm_psd, ula
from lmc_atomi_tpu.kernels.proximal import fbula, lbmumla, mymala, myula, pgld, ppula

__all__ = [
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
    "pnp_ula",
]
