"""Unit tests for the prox library: every closed form is checked against
numerical minimization of the prox objective (SURVEY.md §4 implication (a))."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize_scalar

from lmc_atomi_tpu.ops import prox as P


def numeric_prox(f, x, gamma, bounds=(-50, 50)):
    obj = lambda y: f(y) + (y - x) ** 2 / (2 * gamma)
    res = minimize_scalar(obj, bounds=bounds, method="bounded")
    return res.x


XS = np.array([-3.2, -1.0, -0.2, 0.0, 0.4, 1.7, 4.1])
GAMMAS = [0.1, 0.5, 2.0]


@pytest.mark.parametrize("gamma", GAMMAS)
def test_prox_laplace(gamma):
    got = np.asarray(P.prox_laplace(jnp.asarray(XS), gamma))
    want = [numeric_prox(abs, x, gamma) for x in XS]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_prox_uncentered_laplace():
    mu = 0.7
    got = np.asarray(P.prox_uncentered_laplace(jnp.asarray(XS), 0.5, mu))
    want = [numeric_prox(lambda y: abs(y - mu), x, 0.5) for x in XS]
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("gamma", GAMMAS)
def test_prox_gaussian(gamma):
    got = np.asarray(P.prox_gaussian(jnp.asarray(XS), gamma))
    want = [numeric_prox(lambda y: y**2, x, gamma) for x in XS]
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("p", [4 / 3, 3 / 2, 3, 4])
def test_prox_gen_gaussian(p):
    gamma = 0.7
    got = np.asarray(P.prox_gen_gaussian(jnp.asarray(XS), gamma, p))
    want = [numeric_prox(lambda y: abs(y) ** p, x, gamma) for x in XS]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_prox_exp():
    gamma = 0.8
    # potential: exp distribution support y>=0: f(y)=y for y>=0 else +inf
    f = lambda y: y if y >= 0 else 1e9
    got = np.asarray(P.prox_exp(jnp.asarray(XS), gamma))
    want = [numeric_prox(f, x, gamma, bounds=(0, 50)) for x in XS]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_prox_gamma_chi():
    # gamma potential: omega*y - kappa*log(y) on y>0 (stationarity:
    # y^2 + (omega - x) y - kappa = 0 -> reference closed form prox.py:60-61
    # with gamma folded into omega/kappa).
    omega, kappa = 0.8, 0.6
    f = lambda y: omega * y - kappa * np.log(y) if y > 0 else 1e9
    got = np.asarray(P.prox_gamma(jnp.asarray(XS), omega, kappa))
    want = [numeric_prox(f, x, 1.0, bounds=(1e-9, 50)) for x in XS]
    np.testing.assert_allclose(got, want, atol=1e-4)

    # chi: stationarity 2y^2 - xy - kappa... reference form prox.py:64-65
    # corresponds to f(y) = y^2/2 - kappa log y? check: minimize y^2/2
    # - kappa*log(y) + (y-x)^2/2 -> 2y^2 - x y - kappa = 0 ->
    # y = (x + sqrt(x^2 + 8 kappa))/4. Yes.
    f2 = lambda y: y**2 / 2 - kappa * np.log(y) if y > 0 else 1e9
    got2 = np.asarray(P.prox_chi(jnp.asarray(XS), kappa))
    want2 = [numeric_prox(f2, x, 1.0, bounds=(1e-9, 50)) for x in XS]
    np.testing.assert_allclose(got2, want2, atol=1e-4)


def test_prox_uniform_triangular_huber_vectorized():
    # These are scalar-branch functions in the reference (prox.py:44-85);
    # verify the vectorized forms agree with the scalar branch logic.
    omega = 1.3
    got = np.asarray(P.prox_uniform(jnp.asarray(XS), omega))
    want = np.clip(XS, -omega, omega)
    np.testing.assert_allclose(got, want)

    o1, o2 = 0.5, 2.0
    got = np.asarray(P.prox_triangular(jnp.asarray(XS), o1, o2))
    for x, g in zip(XS, got):
        if x < 1 / o1:
            w = (x + o1 + np.sqrt((x - o1) ** 2 + 4)) / 2
        elif x > 1 / o2:
            w = (x + o2 + np.sqrt((x - o2) ** 2 + 4)) / 2
        else:
            w = 0.0
        np.testing.assert_allclose(g, w)

    gam, tau = 0.9, 0.7
    got = np.asarray(P.prox_huber(jnp.asarray(XS), gam, tau))
    for x, g in zip(XS, got):
        if abs(x) <= gam * (2 * tau + 1) / np.sqrt(2 * tau):
            w = x / (2 * tau + 1)
        else:
            w = x - gam * np.sqrt(2 * tau) * np.sign(x)
        np.testing.assert_allclose(g, w)


def test_prox_smoothed_laplace_matches_reference_formula():
    gamma = 1.5
    x = jnp.asarray(XS)
    a = gamma * jnp.abs(x) - gamma**2 - 1
    want = jnp.sign(x) * (a + jnp.sqrt(a**2 + 4 * gamma * jnp.abs(x))) / (2 * gamma)
    np.testing.assert_allclose(
        np.asarray(P.prox_smoothed_laplace(x, gamma)), np.asarray(want)
    )


def test_root_find_proxes():
    from scipy.optimize import brentq

    xs = np.array([0.3, 1.1, 2.5, 6.0])
    omega, kappa, p = 0.7, 0.9, 1.5
    got = np.asarray(P.prox_weibull(jnp.asarray(xs), omega, kappa, p))
    for x, g in zip(xs, got):
        f = lambda y: p * omega * y**p + y**2 - x * y - kappa
        want = brentq(f, 1e-9, 100.0)
        np.testing.assert_allclose(g, want, rtol=1e-6)

    omega, kappa, rho = 0.4, 0.8, 0.3
    got = np.asarray(P.prox_gen_inv_gaussian(jnp.asarray(xs), omega, kappa, rho))
    for x, g in zip(xs, got):
        f = lambda y: y**3 + (omega - x) * y**2 - kappa * y - rho
        want = brentq(f, 1e-9, 100.0)
        np.testing.assert_allclose(g, want, rtol=1e-6)

    k1, k2, o1, o2 = 0.5, 0.7, -1.0, 2.0
    got = np.asarray(P.prox_pearson_I(jnp.asarray(xs), k1, k2, o1, o2))
    for x, g in zip(xs, got):
        f = lambda y: (
            y**3
            - (o1 + o2 + x) * y**2
            + (o1 * o2 - k1 - k2 + (o1 + o2) * x) * y
            - o1 * o2 * x
            + o1 * k2
            + o2 * k1
        )
        want = brentq(f, o1 + 1e-9, o2 - 1e-9)
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-7)


def test_prox_conjugate_moreau_identity():
    # f = |.|: prox of gamma f* is the projection onto [-1, 1].
    gamma = 0.7
    got = np.asarray(P.prox_conjugate(jnp.asarray(XS), gamma, P.prox_laplace))
    np.testing.assert_allclose(got, np.clip(XS, -1, 1), atol=1e-12)


def test_prox_l21_pairs_group_shrink():
    z = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 5)))
    gamma = 0.3
    got = np.asarray(P.prox_l21_pairs(z, gamma))
    nrm = np.linalg.norm(np.asarray(z), axis=0)
    scale = np.maximum(1 - gamma / np.maximum(nrm, 1e-30), 0)
    np.testing.assert_allclose(got, np.asarray(z) * scale, atol=1e-12)


def test_prox_max_ent_composition():
    x = jnp.asarray(XS)
    got = P.prox_max_ent(x, 0.4, 0.6, 0.8, 3)
    inner = np.maximum(np.abs(XS) - 0.4, 0) / (2 * 0.6 + 1)
    want = np.sign(XS) * np.asarray(
        P.prox_gen_gaussian(jnp.asarray(inner), 0.8 / (2 * 0.6 + 1), 3)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)
