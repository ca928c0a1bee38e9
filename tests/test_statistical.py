"""Statistical invariance tests (SURVEY.md §4 implication (d)): quantitative
moment and distribution checks against known stationary laws."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.eval import sliced_w2
from lmc_atomi_tpu.kernels import mala, myula_imaging, ula
from lmc_atomi_tpu.models import GaussianMixture, LaplaceMixture
from lmc_atomi_tpu.run.runner import run_chain, run_chains


def test_ula_ou_stationary_variance_exact():
    """ULA on U(x)=||x||^2/2 is an AR(1): x <- (1-g)x + sqrt(2g) xi with
    stationary variance 2g / (1 - (1-g)^2) = 1/(1 - g/2). A sharp
    quantitative golden for the whole scan/noise pipeline."""
    g = 0.2
    kern = ula(lambda x: x, g)
    res = run_chains(
        kern, jnp.zeros(2), jax.random.PRNGKey(0), 4000, n_chains=64,
        collect="samples",
    )
    s = np.asarray(res.samples)[:, 1000:, :].reshape(-1, 2)
    want_var = 1.0 / (1.0 - g / 2.0)
    np.testing.assert_allclose(s.var(0), want_var, rtol=0.05)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.05)


def test_mala_targets_exact_gaussian():
    """MALA is exact: moments of a correlated Gaussian must match."""
    mu = np.array([1.0, -2.0])
    cov = np.array([[1.0, 0.6], [0.6, 2.0]])
    gm = GaussianMixture.create(mu[None], cov[None], np.ones(1))
    kern = mala(gm.log_density, gm.grad_potential, 0.3)
    res = run_chains(
        kern, jnp.zeros(2), jax.random.PRNGKey(1), 5000, n_chains=32,
        collect="samples",
    )
    s = np.asarray(res.samples)[:, 1000:, :].reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.06)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.15)


def test_mala_mixture_sliced_w2_converges():
    mus = np.array([[0.0, 0.0], [-2.0, 3.0]])
    sigmas = np.array([[[1.0, -0.5], [-0.5, 1.0]], [[0.5, 0.2], [0.2, 0.7]]])
    gm = GaussianMixture.create(mus, sigmas, np.ones(2) / 2)
    kern = mala(gm.log_density, gm.grad_potential, 0.15)
    res = run_chains(
        kern, jnp.zeros(2), jax.random.PRNGKey(2), 6000, n_chains=16,
        collect="samples",
    )
    s = np.asarray(res.samples)[:, 2000:, :].reshape(-1, 2)
    true = np.asarray(gm.sample(jax.random.PRNGKey(3), s.shape[0]))
    w2 = float(sliced_w2(jnp.asarray(s), jnp.asarray(true), jax.random.PRNGKey(4)))
    # two independent truth draws give ~0; sampler must land close
    base = float(
        sliced_w2(
            jnp.asarray(true),
            jnp.asarray(np.asarray(gm.sample(jax.random.PRNGKey(5), s.shape[0]))),
            jax.random.PRNGKey(4),
        )
    )
    assert w2 < max(10 * base, 0.05), (w2, base)


def test_laplace_mixture_truth_sampler_moments():
    lm = LaplaceMixture.create(
        np.array([[1.0, -1.0]]), np.array([2.0]), np.ones(1), 0.1
    )
    s = np.asarray(lm.sample(jax.random.PRNGKey(6), 100_000))
    np.testing.assert_allclose(s.mean(0), [1.0, -1.0], atol=0.02)
    # density-consistent: Laplace(scale=1/alpha) => var = 2/alpha^2
    np.testing.assert_allclose(s.var(0), 2 / 2.0**2, rtol=0.05)


def test_laplace_mixture_sampler_matches_density():
    """The ancestral sampler and the density must describe the same law:
    compare empirical CDF at a point against the analytic Laplace CDF."""
    alpha = 0.1
    lm = LaplaceMixture.create(
        np.array([[0.0, 0.0]]), np.array([alpha]), np.ones(1), 0.1
    )
    s = np.asarray(lm.sample(jax.random.PRNGKey(7), 200_000))[:, 0]
    for t in (5.0, 15.0, 30.0):
        want = 1 - 0.5 * np.exp(-alpha * t)  # Laplace(1/alpha) CDF
        got = (s <= t).mean()
        assert abs(got - want) < 0.01, (t, got, want)


def test_myula_imaging_denoising_posterior_mean():
    """Pure-denoising posterior (H=I) with TV prior: posterior mean must be
    closer to truth than the observation, and variance must be positive."""
    from lmc_atomi_tpu.ops.functionals import L2Data, TVNorm
    from lmc_atomi_tpu.ops.linops import Identity
    from lmc_atomi_tpu.utils.images import phantom

    img = jnp.asarray(phantom(32, np.float64))
    sigma = 20.0
    y = img + sigma * jax.random.normal(jax.random.PRNGKey(7), img.shape, img.dtype)
    l2 = L2Data(op=Identity(), b=y, sigma=1 / sigma**2)
    tv = TVNorm(sigma=0.05, niter=10)
    g = sigma**2
    kern = myula_imaging(l2, tv, tau=0.2 * g, gamma=g)
    res = run_chain(kern, y, jax.random.PRNGKey(8), 2000, collect="stats",
                    burn_in=500)
    pm = np.asarray(res.moments.mean)
    err_obs = np.linalg.norm(np.asarray(y) - np.asarray(img))
    err_pm = np.linalg.norm(pm - np.asarray(img))
    assert err_pm < err_obs
    assert (np.asarray(res.moments.variance) > 0).all()


def test_prox_square_loss_parity():
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.ops.prox import prox_square_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 16)))
    y = jnp.asarray(rng.normal(size=(16, 16)))
    op = CirculantBlur2D.from_kernel((16, 16), uniform_kernel(3, jnp.float64))
    p = prox_square_loss(x, y, op, 0.7)
    # optimality: (I + g A^T A) p = x + g A^T y
    lhs = p + 0.7 * op.rmatvec(op.matvec(p))
    rhs = x + 0.7 * op.rmatvec(y)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)
