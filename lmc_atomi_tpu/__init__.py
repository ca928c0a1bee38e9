"""lmc-atomi-tpu: a TPU-native Langevin Monte Carlo framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
``lmc-atomi`` codebase (see SURVEY.md): ~20 Langevin-type samplers for
non-log-concave and nonsmooth targets, proximal-operator and linear-operator
libraries, four experiment workloads (Gaussian/Laplacian mixtures, proximal
LMC, Bayesian image deconvolution), evaluation (Wasserstein, SNR/PSNR/MSE),
and multi-chip scaling via ``jax.sharding`` meshes.

Layering (bottom-up): ``core`` (PRNG/state/online stats) -> ``ops`` (prox,
linear operators, TV, Moreau/Bregman) -> ``models`` (targets) -> ``kernels``
(init/step sampler factories) -> ``run`` (scan/vmap/shard_map runners) ->
``eval`` -> ``experiments``.
"""

__version__ = "0.1.0"

from lmc_atomi_tpu import core, eval, kernels, models, ops, parallel, run, utils  # noqa: F401,E402
