"""Golden-trajectory tests (SURVEY.md §4 implication (c)).

Each kernel is run for K steps via the scan runner and compared against an
independent NumPy re-implementation of the reference update rules
(lmc.py:94-190, prox_lmc.py:99-255), fed the *identical* noise sequence
(reconstructed from the same folded threefry keys)."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from lmc_atomi_tpu.core.random import step_key
from lmc_atomi_tpu.kernels import imaging, langevin, proximal
from lmc_atomi_tpu.models import GaussianMixture, LaplacePrior, MixtureWithLaplacePrior
from lmc_atomi_tpu.run.runner import run_chain, run_chains

MUS = np.array([[0.0, 0.0], [-2.0, 3.0], [2.0, -3.0]])
SIGMAS = np.array(
    [
        [[1.0, -0.5], [-0.5, 1.0]],
        [[0.5, 0.2], [0.2, 0.7]],
        [[0.5, 0.1], [0.1, 0.9]],
    ]
)
W = np.ones(3) / 3
K = 150
GAMMA = 0.05
KEY = jax.random.PRNGKey(7)
X0 = np.array([0.4, -0.2])


def np_density(theta):
    return sum(
        W[i] * multivariate_normal(MUS[i], SIGMAS[i]).pdf(theta) for i in range(3)
    )


def np_grad_potential(theta):
    dens = np_density(theta)
    grad_d = sum(
        W[i]
        * multivariate_normal(MUS[i], SIGMAS[i]).pdf(theta)
        * (np.linalg.inv(SIGMAS[i]) @ (MUS[i] - theta))
        for i in range(3)
    )
    return -grad_d / dens


def np_hess_potential(theta):
    dens = np_density(theta)
    grad_d = sum(
        W[i]
        * multivariate_normal(MUS[i], SIGMAS[i]).pdf(theta)
        * (np.linalg.inv(SIGMAS[i]) @ (MUS[i] - theta))
        for i in range(3)
    )
    hess_d = 0
    for i in range(3):
        si = np.linalg.inv(SIGMAS[i])
        pdf = multivariate_normal(MUS[i], SIGMAS[i]).pdf(theta)
        hess_d = hess_d + W[i] * pdf * (
            si @ np.outer(theta - MUS[i], theta - MUS[i]) @ si - si
        )
    return np.outer(grad_d, grad_d) / dens**2 - hess_d / dens


def noise_at(i, shape=(2,), split=False):
    k = step_key(KEY, i)
    if split:
        k1, k2 = jax.random.split(k)
        return (
            np.asarray(jax.random.normal(k1, shape, jnp.float64)),
            float(jax.random.uniform(k2, dtype=jnp.float64)),
        )
    return np.asarray(jax.random.normal(k, shape, jnp.float64))


def make_gm():
    return GaussianMixture.create(MUS, SIGMAS, W)


def test_ula_golden():
    gm = make_gm()
    kern = langevin.ula(gm.grad_potential, GAMMA)
    res = jax.jit(
        lambda: run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    )()
    got = np.asarray(res.samples)

    x = X0.copy()
    want = []
    for i in range(K):
        xi = noise_at(i)
        x = x - GAMMA * np_grad_potential(x) + np.sqrt(2 * GAMMA) * xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-7, atol=1e-9)


def test_mala_golden_with_acceptance_mask():
    gm = make_gm()
    kern = langevin.mala(gm.log_density, gm.grad_potential, GAMMA)
    res = jax.jit(
        lambda: run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    )()
    got = np.asarray(res.samples)
    acc = np.asarray(res.infos.accepted)

    def q_pdf(x_to, x_from):
        mean = x_from - GAMMA * np_grad_potential(x_from)
        return multivariate_normal(mean, 2 * GAMMA * np.eye(2)).pdf(x_to)

    x = X0.copy()
    want, want_acc = [], []
    for i in range(K):
        xi, u = noise_at(i, split=True)
        prop = x - GAMMA * np_grad_potential(x) + np.sqrt(2 * GAMMA) * xi
        ratio = (np_density(prop) / np_density(x)) * (
            q_pdf(x, prop) / q_pdf(prop, x)
        )
        alpha = min(1.0, ratio)
        accept = u <= alpha  # reference lmc.py:128 uses <=; we use log form
        if accept:
            x = prop
        want.append(x.copy())
        want_acc.append(accept)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(acc, np.asarray(want_acc))
    # reference "effective samples" = accepted-only subset (lmc.py:128-131)
    eff = got[acc]
    assert eff.shape[0] == int(np.sum(want_acc))


def test_pula_golden():
    gm = make_gm()
    m = np.array([[1.0, 0.1], [0.1, 0.5]])
    kern = langevin.pula(gm.grad_potential, GAMMA, m)
    res = run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    got = np.asarray(res.samples)

    from scipy.linalg import sqrtm

    sm = np.real(sqrtm(m))
    x = X0.copy()
    want = []
    for i in range(K):
        xi = noise_at(i)
        x = x - GAMMA * m @ np_grad_potential(x) + np.sqrt(2 * GAMMA) * sm @ xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-7, atol=1e-9)


def test_ihpula_golden():
    gm = make_gm()
    kern = langevin.ihpula(gm.grad_potential, gm.hess_potential, GAMMA, shift=0.05)
    res = run_chain(kern, jnp.asarray(X0), KEY, 60, collect="samples")
    got = np.asarray(res.samples)

    from scipy.linalg import sqrtm

    x = X0.copy()
    want = []
    for i in range(60):
        xi = noise_at(i)
        h = np_hess_potential(x)
        e = np.linalg.eigvalsh(h)
        m = np.linalg.inv(h + (abs(e.min()) + 0.05) * np.eye(2))
        x = x - GAMMA * m @ np_grad_potential(x) + np.sqrt(2 * GAMMA) * np.real(
            sqrtm(m)
        ) @ xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)


def test_ihpula_no_divergence_gamma01_n2():
    """Regression for the RESULTS.md r1 nan cell: gamma=0.1, n=2, the
    experiment driver's exact key path (seed 0, x0 fold 999, kernel fold 3).
    The old eigvalsh+inv+sqrtm chain diverged at step ~3036 on TPU f32; the
    single-eigh HIGHEST-precision restructure is stable in f32 on both
    backends."""
    import jax

    from lmc_atomi_tpu.experiments.configs import gaussian_mixture_config
    from lmc_atomi_tpu.models import GaussianMixture

    mus, sigmas, omegas = gaussian_mixture_config(2)
    gm = GaussianMixture.create(
        np.asarray(mus, np.float32),
        np.asarray(sigmas, np.float32),
        np.asarray(omegas, np.float32),
    )
    kern = langevin.ihpula(gm.grad_potential, gm.hess_potential, 0.1)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(
        jax.random.fold_in(key, 999), (2,), jnp.float32
    )
    res = run_chain(kern, x0, jax.random.fold_in(key, 3), 10000,
                    collect="samples")
    assert bool(jnp.isfinite(res.samples).all())


def test_mla_golden():
    gm = make_gm()
    beta = np.array([0.7, 0.3])
    kern = langevin.mla(gm.grad_potential, GAMMA, beta)
    res = run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    got = np.asarray(res.samples)

    x = X0.copy()
    want = []
    for i in range(K):
        xi = noise_at(i)
        dual = (
            np.arcsinh(x / beta)
            - GAMMA * np_grad_potential(x)
            + np.sqrt(2 * GAMMA) * (x**2 + beta**2) ** (-0.25) * xi
        )
        x = beta * np.sinh(dual)
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-7, atol=1e-9)


# --- proximal suite on mixture x laplace prior target ----------------------

LAM, ALPHA = 0.01, 0.1


def make_composite():
    gm = make_gm()
    prior = LaplacePrior.create(np.zeros(2), ALPHA)
    return MixtureWithLaplacePrior.create(gm, prior, LAM)


def np_prox_laplace(x, g):
    return np.sign(x) * np.maximum(np.abs(x) - g, 0)


def test_pgld_golden():
    tgt = make_composite()
    kern = proximal.pgld(tgt, GAMMA)
    res = run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    got = np.asarray(res.samples)

    x = X0.copy()
    want = []
    for i in range(K):
        xi = noise_at(i)
        p = np_prox_laplace(x, LAM * ALPHA)
        x = p - GAMMA * np_grad_potential(p) + np.sqrt(2 * GAMMA) * xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-7, atol=1e-9)


def test_myula_golden():
    tgt = make_composite()
    kern = proximal.myula(tgt, GAMMA)
    res = run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    got = np.asarray(res.samples)

    x = X0.copy()
    want = []
    for i in range(K):
        xi = noise_at(i)
        moreau = (x - np_prox_laplace(x, LAM * ALPHA)) / LAM
        x = (
            x
            - GAMMA * np_grad_potential(x)
            - GAMMA * moreau
            + np.sqrt(2 * GAMMA) * xi
        )
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-7, atol=1e-9)


def test_mymala_golden():
    tgt = make_composite()
    kern = proximal.mymala(tgt, GAMMA)
    res = run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    got = np.asarray(res.samples)
    acc = np.asarray(res.infos.accepted)

    def np_laplace_density(t):
        return (ALPHA / 2) ** 2 * np.exp(-ALPHA * np.abs(t).sum())

    def drift(t):
        moreau = (t - np_prox_laplace(t, LAM * ALPHA)) / LAM
        return t - GAMMA * np_grad_potential(t) - GAMMA * moreau

    def q_pdf(x_to, x_from):
        return multivariate_normal(drift(x_from), 2 * GAMMA * np.eye(2)).pdf(x_to)

    x = X0.copy()
    want, want_acc = [], []
    for i in range(K):
        xi, u = noise_at(i, split=True)
        prop = drift(x) + np.sqrt(2 * GAMMA) * xi
        ratio = (
            np_density(prop)
            * np_laplace_density(prop)
            / (np_density(x) * np_laplace_density(x))
        ) * (q_pdf(x, prop) / q_pdf(prop, x))
        if u <= min(1.0, ratio):
            x = prop
            want_acc.append(True)
        else:
            want_acc.append(False)
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(acc, np.asarray(want_acc))


def test_ppula_golden():
    tgt = make_composite()
    m = np.array([[1.0, 0.1], [0.1, 0.5]])
    q = np.array([[1.0, 0.1], [0.1, 1.5]])
    t_inner = 50
    kern = proximal.ppula(tgt, GAMMA, m, q, t=t_inner)
    res = run_chain(kern, jnp.asarray(X0), KEY, 80, collect="samples")
    got = np.asarray(res.samples)

    from scipy.linalg import sqrtm

    rho = 1.0 / np.linalg.norm(q, ord=2)
    eps = max(min(1.0, rho) - 1e-5, 1e-9)
    eta = rho - eps
    sm = np.real(sqrtm(m))
    qinv = np.linalg.inv(q)

    def pprox(x, gam):
        w = np.zeros_like(x)
        u = np.zeros_like(x)
        for _ in range(t_inner):
            u = x - q @ w
            w = w + eta * u - eta * np_prox_laplace(w / eta + u, gam / eta)
        return u

    x = X0.copy()
    want = []
    for i in range(80):
        xi = noise_at(i)
        prox_term = -GAMMA * qinv @ (x - pprox(x, LAM)) / LAM
        x = (
            x
            - GAMMA * m @ np_grad_potential(x)
            + prox_term
            + np.sqrt(2 * GAMMA) * sm @ xi
        )
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)


def test_fbula_golden():
    tgt = make_composite()
    kern = proximal.fbula(tgt, GAMMA)
    res = run_chain(kern, jnp.asarray(X0), KEY, 80, collect="samples")
    got = np.asarray(res.samples)

    x = X0.copy()
    want = []
    for i in range(80):
        xi = noise_at(i)
        gd = x - LAM * np_grad_potential(x)
        inner = (x - np_prox_laplace(gd, LAM * ALPHA)) / LAM
        jac = np.eye(2) - LAM * np_hess_potential(x)
        x = x - GAMMA * jac @ inner + np.sqrt(2 * GAMMA) * xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)


def test_lbmumla_golden():
    tgt = make_composite()
    beta = np.array([0.7, 0.3])
    sig = np.array([0.8, 0.2])
    kern = proximal.lbmumla(tgt, GAMMA, beta, sig)
    res = run_chain(kern, jnp.asarray(X0), KEY, K, collect="samples")
    got = np.asarray(res.samples)

    def np_breg_prox(t, b, g):
        up = b * np.sinh(np.arcsinh(t / b) - g)
        dn = b * np.sinh(np.arcsinh(t / b) + g)
        mid = np.sqrt(t**2 + b**2) - b
        p = np.where(t > b * np.sinh(g), up, mid)
        return np.where(t < b * np.sinh(-g), dn, p)

    x = X0.copy()
    want = []
    for i in range(K):
        xi = noise_at(i)
        breg = (x - np_breg_prox(x, sig, LAM * ALPHA)) / (
            LAM * np.sqrt(x**2 + sig**2)
        )
        dual = (
            np.arcsinh(x / beta)
            - GAMMA * np_grad_potential(x)
            - GAMMA * breg
            + np.sqrt(2 * GAMMA) * (x**2 + beta**2) ** (-0.25) * xi
        )
        x = beta * np.sinh(dual)
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-8)


# --- runner features ---------------------------------------------------------


def test_thinning_preserves_noise_sequence():
    gm = make_gm()
    kern = langevin.ula(gm.grad_potential, GAMMA)
    dense = run_chain(kern, jnp.asarray(X0), KEY, 100, collect="samples")
    thinned = run_chain(kern, jnp.asarray(X0), KEY, 100, collect="samples", thin=10)
    np.testing.assert_allclose(
        np.asarray(thinned.samples), np.asarray(dense.samples)[9::10], rtol=1e-12
    )


def test_stats_mode_matches_samples_mode():
    gm = make_gm()
    kern = langevin.ula(gm.grad_potential, GAMMA)
    dense = run_chain(kern, jnp.asarray(X0), KEY, 200, collect="samples")
    stats = run_chain(
        kern, jnp.asarray(X0), KEY, 200, collect="stats", burn_in=50
    )
    s = np.asarray(dense.samples)[50:]
    np.testing.assert_allclose(np.asarray(stats.moments.mean), s.mean(0), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(stats.moments.variance), s.var(0, ddof=1), atol=1e-10
    )
    assert int(stats.moments.count) == 150


def test_metrics_mode():
    gm = make_gm()
    kern = langevin.ula(gm.grad_potential, GAMMA)
    res = run_chain(
        kern,
        jnp.asarray(X0),
        KEY,
        50,
        collect="samples",
        metrics={"potential": gm.potential},
    )
    want = [float(gm.potential(jnp.asarray(p))) for p in np.asarray(res.samples)]
    np.testing.assert_allclose(np.asarray(res.metrics["potential"]), want, rtol=1e-10)


def test_run_chains_vmap_independent():
    gm = make_gm()
    kern = langevin.ula(gm.grad_potential, GAMMA)
    res = run_chains(kern, jnp.asarray(X0), KEY, 50, n_chains=4, collect="samples")
    s = np.asarray(res.samples)
    assert s.shape == (4, 50, 2)
    # chains must differ (independent keys)
    assert np.abs(s[0] - s[1]).max() > 1e-3
    # and chain i must equal a solo run with the folded key
    solo = run_chain(
        kern,
        jnp.asarray(X0),
        jax.random.fold_in(jax.random.PRNGKey(7), 2),
        50,
        collect="samples",
    )
    np.testing.assert_allclose(s[2], np.asarray(solo.samples), rtol=1e-12)
