"""Golden tests for ULPDA / MYULA imaging kernels against NumPy
re-implementations of the reference recursions (algs.py:432-448, 564-570),
plus MAP-optimizer convergence checks on a small deblurring problem."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.core.random import step_key
from lmc_atomi_tpu.kernels.imaging import myula_imaging, pnp_ula, ulpda
from lmc_atomi_tpu.ops.functionals import L2Data, L21Norm, TVNorm
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.run.optimize import adaptive_pdhg, fista, pdhg
from lmc_atomi_tpu.run.runner import run_chain
from lmc_atomi_tpu.utils.images import phantom

KEY = jax.random.PRNGKey(11)
N = 24
SIGMA_NOISE = 0.75


def setup_problem():
    img = jnp.asarray(phantom(N, np.float64)) / 255.0
    h = uniform_kernel(5, jnp.float64)
    H = CirculantBlur2D.from_kernel((N, N), h)
    noise = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float64)
    y = H.matvec(img) + 0.02 * noise
    return img, H, y


def test_myula_imaging_golden():
    img, H, y = setup_problem()
    l2 = L2Data(op=H, b=y, sigma=1.0 / SIGMA_NOISE**2)
    tv = TVNorm(sigma=0.3, niter=10)
    gamma = SIGMA_NOISE**2
    tau = 0.2 * gamma
    kern = myula_imaging(l2, tv, tau=tau, gamma=gamma)
    x0 = jnp.zeros((N, N), jnp.float64)
    res = run_chain(kern, x0, KEY, 20, collect="samples")
    got = np.asarray(res.samples)

    # NumPy reference recursion (algs.py:569) with the same prox/grad calls
    # evaluated through the library's own functionals (prox internals are
    # tested separately); only the *update rule* is re-implemented here.
    x = np.zeros((N, N))
    want = []
    for i in range(20):
        k = step_key(KEY, i)
        xi = np.asarray(jax.random.normal(k, (N, N), jnp.float64))
        gr = np.asarray(l2.grad(jnp.asarray(x)))
        px = np.asarray(tv.prox(jnp.asarray(x), 1.0 * gamma))
        x = (1 - tau / gamma) * x - tau * gr + (tau / gamma) * px + np.sqrt(
            2 * tau
        ) * xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-8, atol=1e-10)


def test_ulpda_golden_both_orders():
    img, H, y = setup_problem()
    l2 = L2Data(op=H, b=y, sigma=1.0 / SIGMA_NOISE**2)
    l21 = L21Norm(sigma=0.3)
    G = Gradient2D()
    L = 1.0 / SIGMA_NOISE**2
    tau0, mu0 = 0.95 / L / 8.0, 1.0  # tau mu lmax(G^T G) < 1
    x0 = jnp.zeros((N, N), jnp.float64)

    for gfirst in (True, False):
        kern = ulpda(l2, l21, G, tau=tau0, mu=mu0, theta=1.0, gfirst=gfirst)
        res = run_chain(kern, x0, KEY, 15, collect="samples")
        got = np.asarray(res.samples)

        x = np.zeros((N, N))
        xbar = x.copy()
        yd = np.zeros((2, N, N))
        want = []
        for i in range(15):
            k = step_key(KEY, i)
            xi = np.asarray(jax.random.normal(k, (N, N), jnp.float64))
            xold = x.copy()
            if gfirst:
                yd = np.asarray(
                    l21.proxdual(jnp.asarray(yd + mu0 * np.asarray(G.matvec(jnp.asarray(xbar)))), mu0)
                )
                aty = np.asarray(G.rmatvec(jnp.asarray(yd)))
                x = np.asarray(
                    l2.prox(jnp.asarray(x - tau0 * aty), tau0)
                ) + np.sqrt(2 * tau0) * xi
                xbar = x + 1.0 * (x - xold)
            else:
                aty = np.asarray(G.rmatvec(jnp.asarray(yd)))
                x = np.asarray(
                    l2.prox(jnp.asarray(x - tau0 * aty), tau0)
                ) + np.sqrt(2 * tau0) * xi
                xbar = x + 1.0 * (x - xold)
                yd = np.asarray(
                    l21.proxdual(jnp.asarray(yd + mu0 * np.asarray(G.matvec(jnp.asarray(xbar)))), mu0)
                )
            want.append(x.copy())
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-8, atol=1e-10)


def test_pnp_ula_runs_and_stays_finite():
    img, H, y = setup_problem()
    l2 = L2Data(op=H, b=y, sigma=1.0 / 0.02**2)

    # analytic denoiser: small TV prox step
    from lmc_atomi_tpu.ops.tv import prox_tv_iso

    den = lambda x: prox_tv_iso(x, 0.02, niter=5)
    kern = pnp_ula(l2.grad, den, tau=1e-5, eps=0.01, alpha=1.0, box=(0.0, 1.0))
    res = run_chain(kern, H.rmatvec(y), KEY, 50, collect="stats")
    assert bool(jnp.isfinite(res.moments.mean).all())


def test_pdhg_map_recovers_image():
    """MAP deblurring: PDHG and adaptive PDHG should beat the blurred input
    PSNR by a clear margin (end-to-end imaging check, SURVEY.md §4(e))."""
    from lmc_atomi_tpu.eval.metrics import psnr

    img, H, y = setup_problem()
    # data weight 1/sigma_n^2 = 2500 => TV weight ~5 gives effective
    # regularization lambda = 5 * sigma_n^2 = 2e-3, appropriate for 2% noise
    l2 = L2Data(op=H, b=y, sigma=1.0 / 0.02**2)
    l21 = L21Norm(sigma=5.0)
    G = Gradient2D()
    lmax = 8.0
    tau = 0.9 / np.sqrt(lmax)
    mu = 0.9 / np.sqrt(lmax)
    x0 = jnp.zeros((N, N), jnp.float64)

    res = pdhg(l2, l21, G, x0, tau, mu, niter=300)
    p_blur = float(psnr(img, y))
    p_map = float(psnr(img, res.x))
    assert p_map > p_blur + 3.0, (p_blur, p_map)

    res_a = adaptive_pdhg(l2, l21, G, x0, tau, mu, niter=300)
    p_amap = float(psnr(img, res_a.x))
    assert p_amap > p_blur + 3.0, (p_blur, p_amap)


def test_fista_matches_pdhg_solution():
    from lmc_atomi_tpu.eval.metrics import psnr
    from lmc_atomi_tpu.ops.tv import prox_tv_iso

    img, H, y = setup_problem()
    l2 = L2Data(op=H, b=y, sigma=1.0 / 0.02**2)
    sig_tv = 5.0
    prox_g = lambda x, t: prox_tv_iso(x, t * sig_tv, niter=20)
    lips = float(H.max_gram_eig()) / 0.02**2
    x0 = jnp.zeros((N, N), jnp.float64)
    res = fista(l2.grad, prox_g, x0, tau=1.0 / lips, niter=150)

    l21 = L21Norm(sigma=sig_tv)
    G = Gradient2D()
    res_pd = pdhg(l2, l21, G, x0, 0.9 / np.sqrt(8.0), 0.9 / np.sqrt(8.0), niter=500)
    # both should land on similar objective / PSNR (different TV
    # discretization boundary handling -> small differences allowed)
    assert abs(float(psnr(img, res.x)) - float(psnr(img, res_pd.x))) < 1.0


class TestWaveletDualUlpda:
    """ULPDA with an orthogonal wavelet-domain dual (a_op = DaubechiesDWT2D,
    proxg = L1) — the reference's generic-operator ULPDA beyond gradient
    duals (algs.py:436-448; round-3 VERDICT item 8)."""

    def _setup(self, n=32):
        from lmc_atomi_tpu.ops.linops import Identity
        from lmc_atomi_tpu.ops.wavelet import make_dwt

        img = jnp.asarray(phantom(n, np.float64)) / 255.0
        noise = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float64)
        sigma = 0.1
        b = img + sigma * noise
        l2 = L2Data(op=Identity(), b=b, sigma=1.0 / sigma**2)
        W = make_dwt("d4", levels=3)
        return img, b, l2, W, sigma

    def test_deterministic_map_matches_closed_form(self):
        """noise_scale=0 reduces ULPDA to Chambolle-Pock; for A = W
        orthogonal and an identity data term, the minimizer of
        sigma/2 ||x - b||^2 + lam ||W x||_1 is the exact wavelet
        soft-threshold x* = W^T soft(W b, lam/sigma)."""
        from lmc_atomi_tpu.ops.functionals import L1Norm
        from lmc_atomi_tpu.ops.prox import prox_laplace

        img, b, l2, W, sigma = self._setup()
        lam = 2.0
        proxg = L1Norm(sigma=lam)
        want = W.rmatvec(prox_laplace(W.matvec(b), lam * sigma**2))

        tau = 0.5 * sigma**2  # tau * mu * lam_max(W^T W) = tau < 1
        kern = ulpda(l2, proxg, W, tau=tau, mu=1.0, noise_scale=0.0,
                     gfirst=False)
        res = run_chain(kern, b, KEY, 4000, collect="last")
        # Chambolle-Pock converges O(1/k); 4000 iterations reach ~1e-4
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(want),
            atol=2e-4,
        )

    def test_noisy_chain_posterior_mean_near_map(self):
        """With noise on, the posterior mean of the (log-concave) target
        stays within a noise-scale neighborhood of the MAP."""
        from lmc_atomi_tpu.ops.functionals import L1Norm
        from lmc_atomi_tpu.ops.prox import prox_laplace

        img, b, l2, W, sigma = self._setup()
        lam = 2.0
        kern = ulpda(l2, L1Norm(sigma=lam), W, tau=0.5 * sigma**2, mu=1.0,
                     gfirst=False)
        res = run_chain(kern, b, jax.random.PRNGKey(5), 2000,
                        collect="stats", burn_in=500)
        mapx = W.rmatvec(prox_laplace(W.matvec(b), lam * sigma**2))
        err = float(jnp.abs(res.moments.mean - mapx).mean())
        assert err < 0.5 * sigma, err
        assert bool(jnp.isfinite(res.moments.variance).all())


def test_adaptive_pdhg_segmented_equals_straight():
    """Host-chained segments must reproduce the single-scan run exactly —
    the full carry (x, y, tau_k, mu_k, alpha) crosses segment boundaries
    (the property that lets 256^2 CT MAP dodge the tunnel kill limit)."""
    from lmc_atomi_tpu.run.optimize import adaptive_pdhg_segmented

    img, H, y = setup_problem()
    l2 = L2Data(op=H, b=y, sigma=1.0 / 0.02**2)
    l21 = L21Norm(sigma=5.0)
    G = Gradient2D()
    tau = 0.9 / np.sqrt(8.0)
    x0 = jnp.zeros((N, N), jnp.float64)
    met = {"obj": lambda x: l2(x)}

    straight = adaptive_pdhg(l2, l21, G, x0, tau, 1.0, niter=120, metrics=met)
    seg = adaptive_pdhg_segmented(
        l2, l21, G, x0, tau, 1.0, niter=120, segment_steps=50, metrics=met
    )
    np.testing.assert_array_equal(np.asarray(straight.x), np.asarray(seg.x))
    np.testing.assert_array_equal(
        np.asarray(straight.metrics["obj"]), np.asarray(seg.metrics["obj"])
    )


def test_fista_segmented_equals_straight():
    from lmc_atomi_tpu.ops.tv import prox_tv_iso
    from lmc_atomi_tpu.run.optimize import fista, fista_segmented

    img, H, y = setup_problem()
    l2 = L2Data(op=H, b=y, sigma=1.0 / 0.02**2)
    prox_g = lambda x, t: prox_tv_iso(x, t * 5.0, niter=10)
    lips = float(H.max_gram_eig()) / 0.02**2
    x0 = jnp.zeros((N, N), jnp.float64)
    met = {"obj": lambda x: l2(x)}

    straight = fista(l2.grad, prox_g, x0, 1.0 / lips, 90, metrics=met)
    seg = fista_segmented(
        l2.grad, prox_g, x0, 1.0 / lips, 90, segment_steps=40, metrics=met
    )
    # chaining through init_state is bit-exact under one executable (the
    # segment jit); vs the UNjitted straight run only XLA fusion rounding
    # (~1e-15) differs
    np.testing.assert_allclose(
        np.asarray(straight.x), np.asarray(seg.x), atol=1e-12, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(straight.metrics["obj"]), np.asarray(seg.metrics["obj"]),
        rtol=1e-12,
    )
    r = fista(l2.grad, prox_g, x0, 1.0 / lips, 40)
    r = fista(l2.grad, prox_g, x0, 1.0 / lips, 50, init_state=r.state)
    np.testing.assert_array_equal(np.asarray(r.x), np.asarray(straight.x))
