"""Measure the fused Pallas sampler block kernels at 512^2: MYULA across
data-term modes (plain TV / MC-TV / ME-TV) and ULPDA (primal-dual with the
in-VMEM CG gram solve), plus the unfused XLA ULPDA for comparison. Run on
the TPU: `python scripts/bench_fused_modes.py [steps]`."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.kernels import ulpda
from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused
from lmc_atomi_tpu.ops.functionals import L21Norm, L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV
from lmc_atomi_tpu.run.runner import run_chain
from lmc_atomi_tpu.utils.images import phantom


def main(n=512, steps=4000, block=500):
    sig = 0.75
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im) + sig * jax.random.normal(k, im.shape)
    )(img, jax.random.PRNGKey(0))
    sigma = 1 / sig**2
    gamma = sig**2
    tau = 0.2 * gamma
    terms = {
        "tv": L2Data.create(op=blur, b=y, sigma=sigma),
        "mctv": L2NcvxTV(op=blur, b=y, op2=Gradient2D(), sigma=sigma,
                         lamda=0.3, gamma=15.0, isotropic=True),
        "metv": L2NcvxTV(op=blur, b=y, op2=None, sigma=sigma,
                         lamda=0.3, gamma=15.0, isotropic=True),
    }
    x0 = jnp.zeros((n, n), jnp.float32)

    def bench(name, run):
        w = run(x0, jax.random.PRNGKey(1))
        jax.block_until_ready(w.moments.mean)
        t0 = time.perf_counter()
        o = run(x0, jax.random.PRNGKey(1))
        jax.block_until_ready(o.moments.mean)
        dt = time.perf_counter() - t0
        print(
            f"{name}: {steps / dt:.0f} iters/s ({dt / steps * 1e6:.1f} us/step)"
        )

    for name, term in terms.items():
        bench(
            f"myula-{name}",
            jax.jit(
                lambda x, k, t=term: run_myula_tv_fused(
                    t, 0.3, tau, gamma, x, k, steps, block=block
                )
            ),
        )
        # warm-started Chambolle duals (main + ME-TV envelope) at half the
        # trips — same order of prox error, see run_myula_tv_fused docstring
        warm_term = (
            term.replace(niter_inner=5) if name == "metv" else term
        )
        bench(
            f"myula-{name}-warm5",
            jax.jit(
                lambda x, k, t=warm_term: run_myula_tv_fused(
                    t, 0.3, tau, gamma, x, k, steps, block=block,
                    niter_tv=5, tv_warm=True,
                )
            ),
        )

    # ULPDA: fused CG-solve kernel vs the unfused spectral-solve XLA path
    tau0 = 0.95 / sigma
    l21 = L21Norm(sigma=0.3)
    bench(
        "ulpda-fused",
        jax.jit(
            lambda x, k: run_ulpda_fused(
                terms["tv"], l21, Gradient2D(), tau0, 1.0, x, k, steps,
                block=min(block, 250),
            )
        ),
    )
    kern_u = ulpda(terms["tv"], l21, Gradient2D(), tau=tau0, mu=1.0)
    bench(
        "ulpda-unfused",
        jax.jit(
            lambda x, k: run_chain(kern_u, x, k, steps, collect="stats")
        ),
    )

    # wavelet-l1 inpainting MYULA: fused interleaved-Haar kernel vs the
    # unfused OrthogonalL1 path (BASELINE config 4 posterior)
    from lmc_atomi_tpu.kernels import myula_imaging, run_myula_wavelet_fused
    from lmc_atomi_tpu.ops.functionals import OrthogonalL1
    from lmc_atomi_tpu.ops.linops import Mask
    from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

    mask = (jax.random.uniform(jax.random.PRNGKey(5), (n, n)) > 0.5).astype(
        jnp.float32
    )
    yw = mask * img / 255.0 + 0.1 * mask * jax.random.normal(
        jax.random.PRNGKey(6), (n, n)
    )
    l2w = L2Data(op=Mask(mask=mask), b=yw, sigma=1.0 / 0.1**2)
    gam_w = 0.1**2
    bench(
        "wavelet-myula-fused",
        jax.jit(
            lambda x, k: run_myula_wavelet_fused(
                l2w, 5.0, 0.2 * gam_w, gam_w, x, k, steps, levels=3
            )
        ),
    )
    wav = OrthogonalL1(op=HaarDWT2D(levels=3), sigma=5.0)
    kern_w = myula_imaging(l2w, wav, tau=0.2 * gam_w, gamma=gam_w)
    bench(
        "wavelet-myula-unfused",
        jax.jit(
            lambda x, k: run_chain(kern_w, x, k, steps, collect="stats")
        ),
    )


if __name__ == "__main__":
    main(steps=int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
