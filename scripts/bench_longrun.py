"""1e5-iteration 512^2 MYULA TV-deblur measurements with the fused paths
(the BASELINE north-star long-run config). Two variants: one monolithic
block-fused run, and the checkpoint-segmented resumable driver. Run on the
TPU: `python scripts/bench_longrun.py`."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.eval.metrics import psnr
from lmc_atomi_tpu.kernels import myula_imaging_sep_fused
from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.run.longrun import run_resumable
from lmc_atomi_tpu.utils.images import phantom

N, SIG = 512, 0.75
img = jnp.asarray(phantom(N), jnp.float32)
blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, jnp.float32))
y = jax.jit(
    lambda im, k: blur.matvec(im) + SIG * jax.random.normal(k, (N, N), jnp.float32)
)(img, jax.random.PRNGKey(0))
l2 = L2Data.create(op=blur, b=y, sigma=1 / SIG**2)
gamma = SIG**2
tau = 0.2 * gamma
x0 = jnp.zeros((N, N), jnp.float32)

# 1. block-fused 1e5 iterations in one jitted call
run = jax.jit(
    lambda x, k: run_myula_tv_fused(l2, 0.3, tau, gamma, x, k, 100000, block=500)
)
w = run(x0, jax.random.PRNGKey(1))
jax.block_until_ready(w.moments.mean)
t0 = time.perf_counter()
o = run(x0, jax.random.PRNGKey(1))
jax.block_until_ready(o.moments.mean)
dt = time.perf_counter() - t0
print(
    f"block-fused 1e5 iters: {dt:.1f}s ({1e5 / dt:.0f} iters/s), "
    f"psnr={float(psnr(img, o.moments.mean)):.2f}"
)

# 2. checkpointed longrun: block-fused segments (run_resumable_fused)
from lmc_atomi_tpu.run.longrun import run_resumable_fused

with tempfile.TemporaryDirectory() as d:
    t0 = time.perf_counter()
    b = run_resumable_fused(
        l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1), 100000, 20000,
        ckpt_path=os.path.join(d, "ck.msgpack"), block=500,
    )
    dt = time.perf_counter() - t0
print(
    f"longrun block-fused 1e5 iters (5 ckpt segments): {dt:.1f}s, "
    f"psnr={float(psnr(img, b['moments'].mean)):.2f}"
)

# 3. checkpointed longrun with the fused single-step kernel (generic driver)
kern = myula_imaging_sep_fused(l2, 0.3, tau, gamma)
with tempfile.TemporaryDirectory() as d:
    t0 = time.perf_counter()
    b = run_resumable(
        kern, x0, jax.random.PRNGKey(1), 100000, 20000,
        ckpt_path=os.path.join(d, "ck.msgpack"),
    )
    dt = time.perf_counter() - t0
print(
    f"longrun stepwise-fused 1e5 iters (5 ckpt segments): {dt:.1f}s, "
    f"psnr={float(psnr(img, b['moments'].mean)):.2f}"
)
