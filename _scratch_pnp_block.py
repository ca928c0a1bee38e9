# One 64-chain PnP block in 4 segmented device calls (the tunnel kills
# single executions around ~60s); saves partial Welford moments to OUT.npz.
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
size, sigma, dsig, alpha, nb = 256, 0.03, 0.05, 1.0, 64
seg_steps, n_segs, burn = 500, 4, 200
model = DnCNN(depth=8, features=48)
tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size)))
params = jax.tree.map(jnp.asarray, restore_checkpoint("/tmp/pnp_params.msgpack", tmpl))
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
bkey = jax.random.fold_in(ks, b * nb)

seg = jax.jit(lambda x, k, bi: run_chains(
    kern, x, k, seg_steps, n_chains=nb, collect="stats", burn_in=bi,
    batched=x.ndim == 3), static_argnums=2)
x = jnp.broadcast_to(y, (nb,) + y.shape)
pooled = None
for s in range(n_segs):
    res = seg(x, jax.random.fold_in(bkey, s), burn if s == 0 else 0)
    jax.block_until_ready(res.moments.mean)
    x = res.final_state.position
    part = merge_chain_moments(res.moments)
    pooled = part if pooled is None else pooled.merge(part)
np.savez(out, count=np.asarray(pooled.count), mean=np.asarray(pooled.mean),
         m2=np.asarray(pooled.m2))
print(f"block {b} ok")
