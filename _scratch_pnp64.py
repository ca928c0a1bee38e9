# single 64-chain block probe for the 1024-chain PnP run
import time, sys
import jax, jax.numpy as jnp
from lmc_atomi_tpu.models.dncnn import DnCNN, make_denoiser
from lmc_atomi_tpu.kernels import pnp_ula
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.parallel.mesh import merge_chain_moments
from lmc_atomi_tpu.run.runner import run_chains
from lmc_atomi_tpu.utils.images import phantom

size, sigma = 256, 0.03
model = DnCNN(depth=8, features=48)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,size,size)))
den = make_denoiser(params, model.apply)
img = jnp.asarray(phantom(size), jnp.float32)/255.
blur = CirculantBlur2D.from_kernel((size,size), uniform_kernel(5, jnp.float32))
y = jax.jit(lambda im,k: blur.matvec(im)+sigma*jax.random.normal(k,im.shape))(img, jax.random.PRNGKey(1))
l2 = L2Data.create(op=blur, b=y, sigma=1/sigma**2)
lips = 1/sigma**2 + 1.0/0.05**2
kern = pnp_ula(l2.grad, den, tau=0.5/lips, eps=0.0025, alpha=1.0, box=(-1.,2.))
nb = int(sys.argv[1]) if len(sys.argv)>1 else 64
run = jax.jit(lambda k: merge_chain_moments(
    run_chains(kern, y, k, 2000, n_chains=nb, collect="stats", burn_in=200).moments))
t0=time.perf_counter()
part = run(jax.random.PRNGKey(2)); jax.block_until_ready(part.mean)
dt=time.perf_counter()-t0
print(f"block of {nb} chains x 2000 steps OK in {dt:.0f}s ({nb*2000/dt:.0f} chain-steps/s)")
