"""ESS / R-hat diagnostics: analytic AR(1) checks and converged-vs-stuck
chain discrimination."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.eval.diagnostics import (
    autocorrelation,
    effective_sample_size,
    split_rhat,
)


def ar1(n, phi, rng, d=1):
    x = np.zeros((n, d))
    e = rng.normal(size=(n, d))
    for i in range(1, n):
        x[i] = phi * x[i - 1] + e[i]
    return x


def test_autocorrelation_ar1():
    rng = np.random.default_rng(0)
    x = ar1(50_000, 0.7, rng)[:, 0]
    rho = np.asarray(autocorrelation(jnp.asarray(x), max_lag=5))[:, 0]
    for lag in range(1, 6):
        np.testing.assert_allclose(rho[lag], 0.7**lag, atol=0.03)


def test_ess_ar1_analytic():
    # AR(1): tau = (1+phi)/(1-phi); ESS = n / tau
    rng = np.random.default_rng(1)
    n, phi = 100_000, 0.6
    x = ar1(n, phi, rng)[:, 0]
    ess = float(effective_sample_size(jnp.asarray(x)))
    want = n * (1 - phi) / (1 + phi)
    assert abs(ess - want) / want < 0.15, (ess, want)


def test_ess_iid_near_n():
    rng = np.random.default_rng(2)
    x = rng.normal(size=20_000)
    ess = float(effective_sample_size(jnp.asarray(x)))
    assert ess > 0.8 * 20_000


def test_ess_vectorized_dims():
    rng = np.random.default_rng(3)
    x = np.stack([ar1(30_000, 0.5, rng)[:, 0], rng.normal(size=30_000)], -1)
    ess = np.asarray(effective_sample_size(jnp.asarray(x)))
    assert ess.shape == (2,)
    assert ess[1] > 2 * ess[0]


def test_split_rhat_converged_vs_separated():
    rng = np.random.default_rng(4)
    good = rng.normal(size=(4, 5000, 2))
    r_good = np.asarray(split_rhat(jnp.asarray(good)))
    assert (np.abs(r_good - 1.0) < 0.02).all()

    # chains stuck in different modes
    bad = good + np.array([0.0, 3.0, -3.0, 6.0])[:, None, None]
    r_bad = np.asarray(split_rhat(jnp.asarray(bad)))
    assert (r_bad > 1.5).all()
