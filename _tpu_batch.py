import sys, time, jax, jax.numpy as jnp
from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused
from lmc_atomi_tpu.kernels import ulpda
from lmc_atomi_tpu.run.runner import run_chain
from lmc_atomi_tpu.ops.functionals import L2Data, L21Norm
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom
from lmc_atomi_tpu.eval.metrics import psnr

def problem(N):
    img = jnp.asarray(phantom(N), jnp.float32)
    blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, jnp.float32))
    y = jax.jit(lambda im, k: blur.matvec(im) + 0.75*jax.random.normal(k, (N,N), jnp.float32))(img, jax.random.PRNGKey(0))
    sigma = 1/0.75**2
    return img, blur, y, L2Data.create(op=blur, b=y, sigma=sigma), 0.95/sigma, 1.0

which = sys.argv[1]
N, STEPS = 512, 10000
img, blur, y, l2, tau_u, mu = problem(N)
l21 = L21Norm(sigma=0.3); g2 = Gradient2D()
x0 = jnp.zeros((N,N), jnp.float32)
gamma = 0.75**2; tau_m = 0.2*gamma

def t(run):
    out = run(x0, jax.random.PRNGKey(1), STEPS); jax.block_until_ready(out.moments.mean)
    t0=time.perf_counter(); out = run(x0, jax.random.PRNGKey(1), STEPS); jax.block_until_ready(out.moments.mean)
    return STEPS/(time.perf_counter()-t0)

if which == "cheb512":
    for s in (8, 6, 4, 3):
        r = jax.jit(lambda x,k,n,s=s: run_ulpda_fused(l2, l21, g2, tau_u, mu, x, k, n, block=250, burn_in=1000, niter_solve=s), static_argnums=2)
        print(f"cheb s{s} @512: {t(r):.0f} iters/s", flush=True)
elif which == "chebpsnr":
    N2, S2 = 256, 10000
    img, blur, y, l2, tau_u, mu = problem(N2)
    x0 = jnp.zeros((N2,N2), jnp.float32)
    kern = ulpda(l2, l21, g2, tau=tau_u, mu=mu)
    ru = jax.jit(lambda x,k: run_chain(kern, x, k, S2, collect="stats", burn_in=1000))(x0, jax.random.PRNGKey(1))
    p_ref = float(psnr(img, ru.moments.mean))
    print(f"unfused exact-solve psnr @256: {p_ref:.3f}", flush=True)
    for s in (8, 6, 4, 3):
        rf = jax.jit(lambda x,k,s=s: run_ulpda_fused(l2, l21, g2, tau_u, mu, x, k, S2, block=250, burn_in=1000, niter_solve=s))(x0, jax.random.PRNGKey(1))
        pf = float(psnr(img, rf.moments.mean))
        print(f"cheb s{s} @256 psnr: {pf:.3f} (delta {pf-p_ref:+.3f} dB)", flush=True)
elif which == "qthin":
    for label, kw in [("cold10+ci thin1", dict(niter_tv=10, quantiles=(0.025,0.975))),
                      ("cold10+ci thin2", dict(niter_tv=10, quantiles=(0.025,0.975), quantile_thin=2)),
                      ("cold10+ci thin4", dict(niter_tv=10, quantiles=(0.025,0.975), quantile_thin=4))]:
        r = jax.jit(lambda x,k,n,kw=kw: run_myula_tv_fused(l2, 0.3, tau_m, gamma, x, k, n, block=500, burn_in=1000, **kw), static_argnums=2)
        out = r(x0, jax.random.PRNGKey(1), STEPS)
        w = float(jnp.mean(out.quantiles[0.975]-out.quantiles[0.025]))
        print(f"{label}: {t(r):.0f} iters/s ci_width={w:.4f}", flush=True)
elif which == "env512":
    from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV
    nc = L2NcvxTV(op=blur, b=y, op2=None, sigma=1/0.75**2, lamda=0.3, gamma=15.0, isotropic=True, niter_inner=10)
    for label, kw in [("metv cold", dict()),
                      ("metv env_warm5", dict(env_warm=True, niter_inner=5)),
                      ("metv env_warm3", dict(env_warm=True, niter_inner=3))]:
        r = jax.jit(lambda x,k,n,kw=kw: run_ulpda_fused(nc, l21, g2, tau_u, mu, x, k, n, block=250, burn_in=1000, **kw), static_argnums=2)
        print(f"{label}: {t(r):.0f} iters/s", flush=True)
