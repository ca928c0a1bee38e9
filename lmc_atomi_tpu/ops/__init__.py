from lmc_atomi_tpu.ops import bregman, functionals, linops, moreau, ncvx_tv, prox, tv

__all__ = ["bregman", "functionals", "linops", "moreau", "ncvx_tv", "prox", "tv"]
