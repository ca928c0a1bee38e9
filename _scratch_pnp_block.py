# One 64-chain PnP block; saves partial Welford moments to OUT.npz.
import sys
import jax, jax.numpy as jnp
import numpy as np
from lmc_atomi_tpu.models.dncnn import DnCNN, make_denoiser
from lmc_atomi_tpu.core.checkpoint import restore_checkpoint
from lmc_atomi_tpu.kernels import pnp_ula
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.parallel.mesh import merge_chain_moments
from lmc_atomi_tpu.run.runner import run_chains
from lmc_atomi_tpu.utils.images import phantom

b, out = int(sys.argv[1]), sys.argv[2]
size, sigma, dsig, alpha, nb, n_steps, burn = 256, 0.03, 0.05, 1.0, 64, 2000, 200
model = DnCNN(depth=8, features=48)
tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size)))
params = restore_checkpoint("/tmp/pnp_params.msgpack", tmpl)
den = make_denoiser(params, model.apply)
img = jnp.asarray(phantom(size), jnp.float32)/255.
key = jax.random.PRNGKey(0)
kd, kn, ks = jax.random.split(key, 3)
blur = CirculantBlur2D.from_kernel((size, size), uniform_kernel(5, jnp.float32))
y = jax.jit(lambda im,k: blur.matvec(im)+sigma*jax.random.normal(k,im.shape,jnp.float32))(img, kn)
l2 = L2Data.create(op=blur, b=y, sigma=1/sigma**2)
eps = dsig**2
lips = 1/sigma**2 + alpha/eps
kern = pnp_ula(l2.grad, den, tau=0.5/lips, eps=eps, alpha=alpha, box=(-1.,2.))
# same key discipline as experiments/pnp.py: per-block fold of ks by start chain idx
part = jax.jit(lambda k: merge_chain_moments(
    run_chains(kern, y, k, n_steps, n_chains=nb, collect="stats", burn_in=burn).moments
))(jax.random.fold_in(ks, b * nb))
jax.block_until_ready(part.mean)
np.savez(out, count=np.asarray(part.count), mean=np.asarray(part.mean), m2=np.asarray(part.m2))
print(f"block {b} ok")
