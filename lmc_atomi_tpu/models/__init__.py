from lmc_atomi_tpu.models.composite import LaplacePrior, MixtureWithLaplacePrior
from lmc_atomi_tpu.models.gaussian_mixture import GaussianMixture
from lmc_atomi_tpu.models.grid_mixture import GridGaussianMixture
from lmc_atomi_tpu.models.laplace_mixture import LaplaceMixture
from lmc_atomi_tpu.models.mvlaplace import MultivariateLaplace

__all__ = [
    "GaussianMixture",
    "GridGaussianMixture",
    "LaplaceMixture",
    "LaplacePrior",
    "MixtureWithLaplacePrior",
    "MultivariateLaplace",
]
