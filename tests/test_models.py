"""Model/target tests: densities vs independent NumPy formulas, analytic
derivatives vs autodiff and finite differences, sampling moments."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from lmc_atomi_tpu.models import (
    GaussianMixture,
    GridGaussianMixture,
    LaplaceMixture,
    LaplacePrior,
    MixtureWithLaplacePrior,
    MultivariateLaplace,
)

MUS = np.array([[0.0, 0.0], [-2.0, 3.0], [2.0, -3.0]])
SIGMAS = np.array(
    [
        [[1.0, -0.5], [-0.5, 1.0]],
        [[0.5, 0.2], [0.2, 0.7]],
        [[0.5, 0.1], [0.1, 0.9]],
    ]
)
W = np.ones(3) / 3


def make_gm():
    return GaussianMixture.create(MUS, SIGMAS, W)


def np_density(theta):
    return sum(
        W[i] * multivariate_normal(MUS[i], SIGMAS[i]).pdf(theta) for i in range(3)
    )


def test_gaussian_mixture_density_matches_scipy():
    gm = make_gm()
    pts = np.random.default_rng(0).normal(size=(50, 2)) * 2
    got = np.asarray(gm.density(jnp.asarray(pts)))
    np.testing.assert_allclose(got, np_density(pts), rtol=1e-10)


def test_gaussian_mixture_grad_hess_vs_autodiff():
    gm = make_gm()
    theta = jnp.asarray([0.3, -0.7])
    g_auto = jax.grad(gm.potential)(theta)
    np.testing.assert_allclose(
        np.asarray(gm.grad_potential(theta)), np.asarray(g_auto), rtol=1e-9
    )
    h_auto = jax.hessian(gm.potential)(theta)
    np.testing.assert_allclose(
        np.asarray(gm.hess_potential(theta)), np.asarray(h_auto), rtol=1e-8
    )


def test_gaussian_mixture_batched_grad():
    gm = make_gm()
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(7, 2)))
    batched = gm.grad_potential(pts)
    single = jnp.stack([gm.grad_potential(p) for p in pts])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-10)


def test_gaussian_mixture_sampling_moments():
    gm = make_gm()
    s = np.asarray(gm.sample(jax.random.PRNGKey(0), 40000))
    want_mean = (W[:, None] * MUS).sum(0)
    np.testing.assert_allclose(s.mean(0), want_mean, atol=0.05)
    # total covariance = E[Sigma] + Cov(mu)
    want_cov = (W[:, None, None] * SIGMAS).sum(0) + np.cov(
        MUS.T, aweights=W, ddof=0
    )
    np.testing.assert_allclose(np.cov(s.T), want_cov, atol=0.1)


def test_laplace_mixture_density_and_smoothing():
    mus = np.array([[0.0, 0.0], [-2.0, 3.0]])
    alphas = np.array([1.0, 0.5])
    w = np.array([0.5, 0.5])
    lam = 0.1
    lm = LaplaceMixture.create(mus, alphas, w, lam)
    pts = np.random.default_rng(2).normal(size=(20, 2)) * 2

    # independent NumPy formulas (reference lmc_laplace.py:43-68 semantics)
    def np_lap_density(theta):
        out = 0
        for i in range(2):
            l1 = np.abs(theta - mus[i]).sum(-1)
            out += w[i] * (alphas[i] / 2) ** 2 * np.exp(-alphas[i] * l1)
        return out

    def np_smooth_density(theta):
        out = 0
        for i in range(2):
            g = lam * alphas[i]
            dev = theta - mus[i]
            p = mus[i] + np.sign(dev) * np.maximum(np.abs(dev) - g, 0)
            env = alphas[i] * np.abs(p - mus[i]).sum(-1) + (
                (p - theta) ** 2
            ).sum(-1) / (2 * lam)
            out += w[i] * (alphas[i] / 2) ** 2 * np.exp(-env)
        return out

    np.testing.assert_allclose(
        np.asarray(lm.density(jnp.asarray(pts))), np_lap_density(pts), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lm.smooth_density(jnp.asarray(pts))),
        np_smooth_density(pts),
        rtol=1e-10,
    )


def test_laplace_mixture_grad_vs_autodiff():
    lm = LaplaceMixture.create(
        np.array([[0.0, 0.0], [-2.0, 3.0]]),
        np.array([1.0, 0.5]),
        np.array([0.5, 0.5]),
        0.1,
    )
    # away from prox kinks, the envelope-identity gradient == autodiff
    theta = jnp.asarray([0.31, -0.77])
    g = lm.grad_smooth_potential(theta)
    g_auto = jax.grad(lm.smooth_potential)(theta)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_auto), rtol=1e-8)


def test_multivariate_laplace():
    mean = np.array([1.0, -2.0, 0.5])
    cov = np.array([[2.0, 0.3, 0.0], [0.3, 1.0, 0.2], [0.0, 0.2, 1.5]])
    ml = MultivariateLaplace.create(mean, cov)
    x = np.random.default_rng(4).normal(size=(10, 3))
    # independent formula
    s, u = np.linalg.eigh(cov)
    prec_u = u / np.sqrt(s)
    maha = np.abs((x - mean) @ prec_u).sum(-1)
    want = -(3 * np.log(2) + 0.5 * np.log(s).sum() + maha)
    np.testing.assert_allclose(np.asarray(ml.logpdf(jnp.asarray(x))), want, rtol=1e-9)

    # entropy: 0.5 logdet(2 pi e cov)  (reference convention)
    _, logdet = np.linalg.slogdet(2 * np.pi * np.e * cov)
    np.testing.assert_allclose(float(ml.entropy()), 0.5 * logdet, rtol=1e-10)

    # rvs: mean and coloring sanity (standard Laplace variance is 2 =>
    # cov of draws = 2 * cov under the reference's coloring convention)
    draws = np.asarray(ml.rvs(jax.random.PRNGKey(0), 200_000))
    np.testing.assert_allclose(draws.mean(0), mean, atol=0.02)
    np.testing.assert_allclose(np.cov(draws.T), 2 * cov, atol=0.1)

    # cdf orientation is well-defined in 1-D (the whitening matrix has an
    # arbitrary sign in higher dimensions): standard scalar Laplace CDF
    ml1 = MultivariateLaplace.create(np.array([1.0]), np.array([[4.0]]))
    xs = np.linspace(-6, 8, 30)[:, None]
    b = 2.0  # scale = sqrt(cov)
    want_cdf = np.where(
        xs[:, 0] < 1.0,
        0.5 * np.exp((xs[:, 0] - 1.0) / b),
        1 - 0.5 * np.exp(-(xs[:, 0] - 1.0) / b),
    )
    got_cdf = np.asarray(ml1.cdf(jnp.asarray(xs)))
    if got_cdf[0] > 0.5:  # eigh sign flip: accept the mirrored orientation
        got_cdf = got_cdf[::-1]
    np.testing.assert_allclose(got_cdf, want_cdf, rtol=1e-9)


def test_grid_mixture_logprob():
    gm = GridGaussianMixture.create([-4.0, 0.0, 4.0], sigma=0.03, lam=1 / 25.0)
    x = np.array([0.1, -0.2])
    mus = np.array(
        [[a, b] for a in [-4.0, 0.0, 4.0] for b in [-4.0, 0.0, 4.0]]
    )
    logpdfs = [
        multivariate_normal(m, 0.03 * np.eye(2)).logpdf(x) for m in mus
    ]
    want = (1 / 25.0) * np.log(np.exp(logpdfs).sum())
    np.testing.assert_allclose(float(gm.log_prob(jnp.asarray(x))), want, rtol=1e-8)


def test_composite_target():
    gm = make_gm()
    prior = LaplacePrior.create(np.zeros(2), 0.5)
    tgt = MixtureWithLaplacePrior.create(gm, prior, lam=0.05)
    theta = jnp.asarray([0.4, -0.3])
    # density factorizes
    np.testing.assert_allclose(
        float(tgt.density(theta)),
        float(gm.density(theta)) * float(prior.density(theta)),
        rtol=1e-10,
    )
    # Moreau gradient identity
    g = tgt.grad_moreau_prior(theta)
    p = tgt.prior_prox(theta)
    np.testing.assert_allclose(
        np.asarray(g), (np.asarray(theta) - np.asarray(p)) / 0.05, rtol=1e-12
    )
