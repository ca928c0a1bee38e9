import glob, sys
import numpy as np
import jax, jax.numpy as jnp
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.eval.metrics import psnr
from lmc_atomi_tpu.utils.images import phantom

jax.config.update("jax_platforms", "cpu")
files = sorted(glob.glob("/tmp/pnp_block_*.npz"))
print(f"{len(files)} blocks")
pooled = None
for f in files:
    d = np.load(f)
    m = RunningMoments(count=jnp.asarray(d["count"]), mean=jnp.asarray(d["mean"], jnp.float64), m2=jnp.asarray(d["m2"], jnp.float64))
    pooled = m if pooled is None else pooled.merge(m)
img = jnp.asarray(phantom(256), jnp.float64)/255.
mean = pooled.mean; std = np.asarray(pooled.std)
ci = 2*1.96*std
print({"n_chain_draws": int(pooled.count), "psnr_posterior_mean": float(psnr(img, mean)),
       "mean_ci_width": float(ci.mean()), "std_max": float(std.max())})
np.savez("/tmp/pnp_1024_final.npz", mean=np.asarray(mean), std=std)
