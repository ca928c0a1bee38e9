"""SGLD-family tests: golden updates, schedule semantics, CSGLD histogram
adaptation, minibatch gradient unbiasedness."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.core.random import step_key
from lmc_atomi_tpu.kernels import sgmcmc as S
from lmc_atomi_tpu.models import GridGaussianMixture
from lmc_atomi_tpu.run.runner import run_chain

KEY = jax.random.PRNGKey(5)
GM = GridGaussianMixture.create([-4.0, 0.0, 4.0], sigma=0.03, lam=1 / 9.0)
X0 = jnp.asarray(np.array([0.5, -0.5]))


def np_grad(x):
    return np.asarray(GM.grad_log_prob(jnp.asarray(x)))


def test_sgld_golden_with_schedule():
    sched = S.polynomial_schedule(0.05, -0.55)
    kern = S.sgld(GM.grad_log_prob, sched)
    res = run_chain(kern, X0, KEY, 100, collect="samples")
    got = np.asarray(res.samples)

    x = np.asarray(X0)
    want = []
    for i in range(100):
        k = step_key(KEY, i)
        _, k_noise = jax.random.split(k)
        xi = np.asarray(jax.random.normal(k_noise, (2,), jnp.float64))
        g = 0.05 * (i + 1) ** (-0.55)
        x = x + g * np_grad(x) + np.sqrt(2 * g) * xi
        want.append(x.copy())
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-7, atol=1e-9)


def test_msgld_acceptance():
    kern = S.msgld(GM.log_prob, GM.grad_log_prob, 0.01)
    res = run_chain(kern, X0, KEY, 300, collect="samples")
    acc = np.asarray(res.infos.accepted)
    assert 0.2 < acc.mean() <= 1.0
    # rejected steps keep the previous position
    s = np.asarray(res.samples)
    for i in range(1, 300):
        if not acc[i]:
            np.testing.assert_array_equal(s[i], s[i - 1])


def test_cyclical_schedule_and_phases():
    n, cycles, g0, ratio = 200, 4, 0.09, 0.25
    kern = S.cyclical_sgld(GM.grad_log_prob, n, cycles, g0, ratio)
    res = run_chain(kern, X0, KEY, n, collect="samples")
    flags = np.asarray(res.infos.accepted)
    cyc = n // cycles
    want_flags = np.array([((i % cyc) / cyc) >= ratio for i in range(n)])
    np.testing.assert_array_equal(flags, want_flags)

    # exploration steps are deterministic gradient ascent
    s = np.asarray(res.samples)
    x_prev = np.asarray(X0)
    for i in range(5):  # first few steps are exploration (ratio 0.25)
        g = 0.5 * (np.cos(np.pi * (i % cyc) / cyc) + 1) * g0
        want = x_prev + g * np_grad(x_prev)
        np.testing.assert_allclose(s[i], want, rtol=1e-6)
        x_prev = s[i]


def test_csgld_adapts_and_stays_finite():
    kern = S.csgld(
        GM.log_prob,
        num_partitions=64,
        energy_gap=0.5,
        min_energy=0.0,
        zeta=0.75,
        temperature=1.0,
        lr_schedule=1e-3,
    )
    res = run_chain(kern, X0, KEY, 500, collect="samples")
    pdf = np.asarray(res.final_state.extras.energy_pdf)
    np.testing.assert_allclose(pdf.sum(), 1.0, rtol=1e-6)
    assert (pdf > 0).all()
    # the visited-bin mass must have grown above uniform
    eidx = np.asarray(res.infos.energy)  # energies logged
    assert np.isfinite(np.asarray(res.samples)).all()
    assert np.isfinite(eidx).all()
    # resampler runs and returns a (possibly empty) array of 2-d points
    idx_series = np.clip(
        np.ceil(eidx / 0.5).astype(int), 1, 63
    )
    out = S.csgld_importance_resample(
        np.asarray(res.samples), idx_series, pdf, zeta=0.75
    )
    assert out.ndim == 2 and out.shape[-1] == 2 or out.size == 0


def test_csgld_mult_clip_engages():
    """The drift-multiplier clip (documented stabilization) bounds the
    amplified drift even when adjacent energy bins hold wildly different
    mass — the regime that NaN'd 50k-step contour-proximal chains at the
    reference hyperparameters before the clip."""
    kern = S.csgld(
        GM.log_prob, num_partitions=64, energy_gap=0.25, zeta=0.75,
        temperature=50.0, lr_schedule=1e-3, mult_clip=100.0,
    )
    st = kern.init(X0)
    # hand the kernel a maximally sharpened pdf: one bin holds all mass
    pdf = np.full(64, 1e-30)
    pdf[1] = 1.0
    st = st.replace(
        extras=st.extras._replace(energy_pdf=jnp.asarray(pdf, jnp.float64))
    )
    for i in range(20):
        st, _ = kern.step(st, jax.random.fold_in(KEY, i))
    assert np.isfinite(np.asarray(st.position)).all()


def test_prox_sgld_variants_golden():
    from lmc_atomi_tpu.ops.prox import prox_laplace

    lam_alpha = 0.05
    prox_fn = lambda x: prox_laplace(x, lam_alpha)
    sched = 0.01

    # SPGLD: prox after SGLD move
    kern = S.spgld(GM.grad_log_prob, prox_fn, sched)
    res = run_chain(kern, X0, KEY, 50, collect="samples")
    x = np.asarray(X0)
    want = []
    for i in range(50):
        k = step_key(KEY, i)
        _, k_noise = jax.random.split(k)
        xi = np.asarray(jax.random.normal(k_noise, (2,), jnp.float64))
        x = x + sched * np_grad(x) + np.sqrt(2 * sched) * xi
        x = np.sign(x) * np.maximum(np.abs(x) - lam_alpha, 0)
        want.append(x.copy())
    np.testing.assert_allclose(np.asarray(res.samples), want, rtol=1e-7)

    # SSGLD: Moreau gradient added to the score
    lam = 0.1
    moreau = lambda x: (x - prox_laplace(x, lam_alpha)) / lam
    kern = S.ssgld(GM.grad_log_prob, moreau, sched)
    res = run_chain(kern, X0, KEY, 50, collect="samples")
    x = np.asarray(X0)
    want = []
    for i in range(50):
        k = step_key(KEY, i)
        _, k_noise = jax.random.split(k)
        xi = np.asarray(jax.random.normal(k_noise, (2,), jnp.float64))
        mg = (x - np.sign(x) * np.maximum(np.abs(x) - lam_alpha, 0)) / lam
        x = x + sched * (np_grad(x) - mg) + np.sqrt(2 * sched) * xi
        want.append(x.copy())
    np.testing.assert_allclose(np.asarray(res.samples), want, rtol=1e-7)

    # MYSGLD
    kern = S.mysgld(GM.grad_log_prob, prox_fn, lam, sched)
    res = run_chain(kern, X0, KEY, 50, collect="samples")
    x = np.asarray(X0)
    want = []
    for i in range(50):
        k = step_key(KEY, i)
        _, k_noise = jax.random.split(k)
        xi = np.asarray(jax.random.normal(k_noise, (2,), jnp.float64))
        px = np.sign(x) * np.maximum(np.abs(x) - lam_alpha, 0)
        x = (
            (1 - sched / lam) * x
            + sched * np_grad(x)
            + (sched / lam) * px
            + np.sqrt(2 * sched) * xi
        )
        want.append(x.copy())
    np.testing.assert_allclose(np.asarray(res.samples), want, rtol=1e-7)


def test_minibatch_grad_estimator_unbiased():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(loc=1.5, size=(200, 2)))
    logprior = lambda x: -0.5 * jnp.sum(x * x)
    loglik = lambda x, d: -0.5 * jnp.sum((d - x) ** 2)

    gf = S.minibatch_grad_estimator(logprior, loglik, data, 200, batch_size=20)
    x = jnp.asarray([0.3, -0.4])
    grads = np.stack(
        [np.asarray(gf(x, jax.random.PRNGKey(i))) for i in range(400)]
    )
    full = np.asarray(
        jax.grad(lambda xx: logprior(xx) + jnp.sum(jax.vmap(
            lambda d: loglik(xx, d))(data)))(x)
    )
    np.testing.assert_allclose(grads.mean(0), full, rtol=0.05)


def test_spgld_step_scaled_prox_golden():
    """Two-arg proxes receive the CURRENT step size (the proximal-gradient
    prox_{g f} contract; a constant threshold over-regularizes as the
    schedule decays — scripts/diag_prox_sgld.py)."""
    from lmc_atomi_tpu.ops.prox import prox_laplace

    sched = S.polynomial_schedule(0.05, -0.55)
    kern = S.spgld(
        GM.grad_log_prob, lambda x, g: prox_laplace(x, g), sched
    )
    res = run_chain(kern, X0, KEY, 30, collect="samples")
    x = np.asarray(X0)
    want = []
    for i in range(30):
        g = 0.05 * (i + 1.0) ** (-0.55)
        k = step_key(KEY, i)
        _, k_noise = jax.random.split(k)
        xi = np.asarray(jax.random.normal(k_noise, (2,), jnp.float64))
        x = x + g * np_grad(x) + np.sqrt(2 * g) * xi
        x = np.sign(x) * np.maximum(np.abs(x) - g, 0)
        want.append(x.copy())
    np.testing.assert_allclose(np.asarray(res.samples), want, rtol=1e-7)
