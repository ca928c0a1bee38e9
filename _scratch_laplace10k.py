import json
from lmc_atomi_tpu.experiments.laplace_mixtures import lmc_laplacian_mixture
_, _, s = lmc_laplacian_mixture(k=50000, k_eval=10000, eval_w2_exact=True,
                              make_plots=False, platform="cpu")
print(json.dumps(s["final_w2_exact"]))
