"""f32 vs f64 trajectory parity (SURVEY.md §7 hard parts / §4(e)).

TPU runs f32; the CPU reference is f64. With the *same* noise realization
(drawn in f32, cast up), the posterior-mean PSNR after a long MYULA
TV-deblurring run must agree within the 0.1 dB gate — the accumulation-error
budget that makes single-precision TPU runs trustworthy.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.core.random import step_key
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.core.stats import RunningMoments
from lmc_atomi_tpu.eval.metrics import psnr
from lmc_atomi_tpu.kernels.base import Kernel
from lmc_atomi_tpu.ops.functionals import L2Data, TVNorm
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.run.runner import run_chain
from lmc_atomi_tpu.utils.images import phantom


def myula_fixed_noise(proxf, proxg, tau, gamma, noise_dtype=jnp.float32):
    """MYULA with noise drawn in ``noise_dtype`` then cast to the state
    dtype, so f32 and f64 runs see the same randomness."""

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        x = state.position
        xi = jax.random.normal(key, x.shape, noise_dtype).astype(x.dtype)
        x_new = (
            (1.0 - tau / gamma) * x
            - tau * proxf.grad(x)
            + (tau / gamma) * proxg.prox(x, gamma)
            + jnp.sqrt(jnp.asarray(2.0 * tau, x.dtype)) * xi
        )
        return state.next(x_new), StepInfo()

    return Kernel(init, step)


def _run(dtype, n=64, steps=1500):
    img = jnp.asarray(phantom(n), dtype)
    h = uniform_kernel(5, dtype)
    blur = CirculantBlur2D.from_kernel((n, n), h)
    sigma = 0.75
    noise = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    y = blur.matvec(img) + sigma * noise.astype(dtype)
    l2 = L2Data(op=blur, b=y, sigma=1 / sigma**2)
    tv = TVNorm(sigma=0.3, niter=10)
    g = sigma**2
    kern = myula_fixed_noise(l2, tv, tau=0.2 * g, gamma=g)
    res = run_chain(kern, jnp.zeros((n, n), dtype), jax.random.PRNGKey(1),
                    steps, collect="stats", burn_in=200)
    return float(psnr(img, res.moments.mean))


def test_f32_posterior_mean_psnr_within_tenth_db():
    p64 = _run(jnp.float64)
    p32 = _run(jnp.float32)
    assert abs(p64 - p32) < 0.1, (p64, p32)
