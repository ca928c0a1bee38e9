"""Noise-conditional score prior (models/score.py) + score_ula kernel.

Beyond-reference component (learned priors; the reference has none): checks
are (a) DSM training actually learns (loss drop + noise-direction
recovery), (b) the fixed-level score_ula chain is EXACTLY the pnp_ula chain
through the Tweedie adapter, (c) annealed schedules are consumed per-step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmc_atomi_tpu.models.score import (
    ScoreNet,
    geometric_sigmas,
    make_score_fn,
    score_to_denoiser,
    train_score_net,
)


def test_geometric_sigmas():
    s = geometric_sigmas(0.5, 0.01, 8)
    assert s.shape == (8,)
    assert np.isclose(float(s[0]), 0.5) and np.isclose(float(s[-1]), 0.01)
    r = np.asarray(s[:-1] / s[1:])
    assert np.allclose(r, r[0], rtol=1e-5)  # geometric


def test_dsm_training_learns_noise_direction():
    # tiny net / tiny patches: enough to beat the zero-predictor
    params, apply_fn, sigmas = train_score_net(
        jax.random.PRNGKey(0), sigma_max=0.4, sigma_min=0.05, n_sigmas=4,
        patch=16, batch=8, steps=120, depth=4, features=16,
    )
    from lmc_atomi_tpu.utils.synthetic import random_phantom_batch

    clean = random_phantom_batch(jax.random.PRNGKey(5), 8, 16)
    z = jax.random.normal(jax.random.PRNGKey(6), clean.shape, clean.dtype)
    sig = jnp.full((8,), 0.4, clean.dtype)
    noisy = clean + 0.4 * z
    eps_hat = apply_fn(params, noisy, sig)
    # trained predictor must beat the trivial eps_hat=0 baseline (MSE < 1)
    mse = float(jnp.mean((eps_hat - z) ** 2))
    assert mse < 0.95, mse
    # and align with the true noise direction
    cos = float(
        jnp.vdot(eps_hat, z)
        / (jnp.linalg.norm(eps_hat.ravel()) * jnp.linalg.norm(z.ravel()))
    )
    assert cos > 0.2, cos


def test_score_fn_shapes_and_scaling():
    model = ScoreNet(depth=3, features=8)
    x = jnp.zeros((12, 12))
    params = model.init(jax.random.PRNGKey(0), x[None], jnp.ones((1,)))
    score = make_score_fn(params, model.apply)
    s = score(x, 0.3)
    assert s.shape == x.shape and np.isfinite(np.asarray(s)).all()
    # score = -eps_hat/sigma: halving sigma doubles the scale factor for
    # identical net output only if conditioning were inert; just check the
    # Tweedie adapter consistency instead, which is the used contract
    den = score_to_denoiser(score, 0.3)
    np.testing.assert_allclose(
        np.asarray(den(x)), np.asarray(x + 0.3**2 * score(x, 0.3)),
        rtol=1e-6,
    )


def test_fixed_sigma_score_ula_equals_pnp_ula():
    from lmc_atomi_tpu.core.random import step_key
    from lmc_atomi_tpu.kernels import pnp_ula, score_ula

    model = ScoreNet(depth=3, features=8)
    x0 = 0.5 * jnp.ones((10, 10))
    params = model.init(jax.random.PRNGKey(1), x0[None], jnp.ones((1,)))
    score = make_score_fn(params, model.apply)
    sigma, alpha, tau = 0.2, 0.8, 0.01
    grad_f = lambda x: 2.0 * (x - 0.5)

    k_a = score_ula(grad_f, score, sigma, tau, alpha=alpha,
                    box=(0.0, 1.0), box_weight=sigma**2)
    k_b = pnp_ula(grad_f, score_to_denoiser(score, sigma), tau,
                  eps=sigma**2, alpha=alpha, box=(0.0, 1.0))

    base = jax.random.PRNGKey(7)
    sa, sb = k_a.init(x0), k_b.init(x0)
    for i in range(5):
        sa, _ = k_a.step(sa, step_key(base, i))
        sb, _ = k_b.step(sb, step_key(base, i))
    np.testing.assert_allclose(
        np.asarray(sa.position), np.asarray(sb.position), rtol=1e-5,
        atol=1e-7,
    )


def test_annealed_schedule_consumed_per_step():
    from lmc_atomi_tpu.core.random import step_key
    from lmc_atomi_tpu.kernels import score_ula
    from lmc_atomi_tpu.run.runner import run_chain

    sig_sched = jnp.asarray([0.4, 0.2, 0.1, 0.05])
    tau_sched = 0.1 * sig_sched**2  # Song-Ermon tau_i ∝ sigma_i^2
    # fake score with a sigma-dependent signature we can reconstruct
    score = lambda x, s: -x * s
    kern = score_ula(lambda x: 0.0 * x, score, sig_sched, tau_sched,
                     alpha=1.0)
    x0 = jnp.ones((6, 6))
    base = jax.random.PRNGKey(3)

    st = kern.init(x0)
    x_ref = x0
    from lmc_atomi_tpu.core.random import normal_like

    for i in range(4):
        st, _ = kern.step(st, step_key(base, i))
        t, s = float(tau_sched[i]), float(sig_sched[i])
        xi = normal_like(step_key(base, i), x_ref)
        x_ref = x_ref + t * (-x_ref * s) + jnp.sqrt(2 * t) * xi
    np.testing.assert_allclose(
        np.asarray(st.position), np.asarray(x_ref), rtol=1e-6
    )

    # and under the scan-based runner: same endpoint
    res = run_chain(kern, x0, base, 4, collect="last")
    np.testing.assert_allclose(
        np.asarray(res.final_state.position), np.asarray(st.position),
        rtol=1e-6,
    )


def test_annealed_schedule_survives_segmentation():
    """run_chain_segmented carries the global step counter, so per-step
    sigma/tau schedules must NOT restart at segment boundaries — the
    segmented chain is bit-identical to the monolithic one."""
    from lmc_atomi_tpu.kernels import score_ula
    from lmc_atomi_tpu.run.runner import run_chain, run_chain_segmented

    n = 12
    sig_sched = jnp.linspace(0.5, 0.05, n)
    tau_sched = 0.1 * sig_sched**2
    score = lambda x, s: -x * s
    kern = score_ula(lambda x: 0.1 * x, score, sig_sched, tau_sched)
    x0 = jnp.ones((5, 5))
    key = jax.random.PRNGKey(11)

    mono = run_chain(kern, x0, key, n, collect="stats", burn_in=3)
    seg = run_chain_segmented(kern, x0, key, n, segment_steps=5, burn_in=3)
    np.testing.assert_array_equal(
        np.asarray(mono.final_state.position),
        np.asarray(seg.final_state.position),
    )
    np.testing.assert_allclose(
        np.asarray(mono.moments.mean), np.asarray(seg.moments.mean),
        rtol=1e-7,
    )


class TestPredictorCorrector:
    """kernels/imaging.py::score_ula_pc — Song-style PC annealed sampling."""

    def test_zero_correctors_equals_score_ula(self):
        from lmc_atomi_tpu.core.random import step_key
        from lmc_atomi_tpu.kernels import score_ula, score_ula_pc

        model = ScoreNet(depth=3, features=8)
        x0 = 0.5 * jnp.ones((10, 10))
        params = model.init(jax.random.PRNGKey(1), x0[None], jnp.ones((1,)))
        score = make_score_fn(params, model.apply)
        grad_f = lambda x: 2.0 * (x - 0.5)
        kw = dict(alpha=0.8, box=(0.0, 1.0), box_weight=0.04)
        k_a = score_ula(grad_f, score, 0.2, 0.01, **kw)
        k_b = score_ula_pc(grad_f, score, 0.2, 0.01, n_corrector=0, **kw)
        base = jax.random.PRNGKey(7)
        sa, sb = k_a.init(x0), k_b.init(x0)
        for i in range(5):
            sa, _ = k_a.step(sa, step_key(base, i))
            sb, _ = k_b.step(sb, step_key(base, i))
        np.testing.assert_allclose(
            np.asarray(sa.position), np.asarray(sb.position), rtol=1e-6,
        )

    def test_correctors_equilibrate_analytic_gaussian(self):
        """Analytic conditional score of N(0, v): s(x, sig) = -x/(v+sig^2).
        Annealed Langevin from a far-off init must land near the smoothed
        stationary N(0, v + sig_min^2); correctors close the remaining
        transient faster than predictor-only at the same ladder length."""
        from lmc_atomi_tpu.core.random import step_key
        from lmc_atomi_tpu.kernels import score_ula_pc
        from lmc_atomi_tpu.models.score import geometric_sigmas

        v = 0.25
        score = lambda x, s: -x / (v + s * s)
        grad_f = lambda x: jnp.zeros_like(x)
        n_levels, per = 12, 4
        ladder = jnp.repeat(
            geometric_sigmas(1.0, 0.05, n_levels, jnp.float32), per
        )
        tau = 0.5 * (v + ladder**2) / (v / ladder**2 + 1.0)  # ~stable
        x0 = 3.0 * jnp.ones((64, 64), jnp.float32)  # far off

        def run(n_corr, seed):
            kern = score_ula_pc(
                grad_f, score, ladder, tau, n_corrector=n_corr, snr=0.3,
            )
            st = kern.init(x0)
            base = jax.random.PRNGKey(seed)
            for i in range(n_levels * per):
                st, _ = kern.step(st, step_key(base, i))
            return np.var(np.asarray(st.position))

        target = v + 0.05**2
        err_pc = abs(run(3, 0) - target)
        err_p = abs(run(0, 0) - target)
        assert err_pc < err_p  # correctors equilibrate better
        assert err_pc < 0.25 * target

    def test_snr_clamp_keeps_data_term_stable(self):
        """eps is clamped to tau: with a stiff data term the corrector must
        not blow up even when 2(snr*sigma)^2 >> tau."""
        from lmc_atomi_tpu.core.random import step_key
        from lmc_atomi_tpu.kernels import score_ula_pc

        lips = 400.0
        grad_f = lambda x: lips * x
        score = lambda x, s: -x / (0.1 + s * s)
        tau = 0.5 / lips
        kern = score_ula_pc(grad_f, score, 2.0, tau, n_corrector=2, snr=1.0)
        st = kern.init(jnp.ones((16, 16), jnp.float32))
        base = jax.random.PRNGKey(0)
        for i in range(50):
            st, _ = kern.step(st, step_key(base, i))
        assert np.isfinite(np.asarray(st.position)).all()
        assert float(jnp.abs(st.position).max()) < 10.0


class TestScoreUNet:
    def test_shapes_and_divisibility(self):
        from lmc_atomi_tpu.models.score import ScoreUNet

        model = ScoreUNet(features=(8, 12, 16))
        x = jnp.zeros((2, 32, 32))
        params = model.init(jax.random.PRNGKey(0), x, jnp.ones((2,)))
        out = model.apply(params, x, 0.3 * jnp.ones((2,)))
        assert out.shape == (2, 32, 32)

    def test_unet_training_learns_noise_direction(self):
        """Short UNet DSM run: eps_hat correlates positively with the true
        noise on fresh samples (same gate as the flat net's test)."""
        from lmc_atomi_tpu.models.score import train_score_net
        from lmc_atomi_tpu.utils.synthetic import random_phantom_batch

        params, apply_fn, sigmas = train_score_net(
            jax.random.PRNGKey(0), steps=60, patch=24, batch=8,
            arch="unet", unet_features=(8, 12, 16),
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        clean = random_phantom_batch(k1, 4, 24)
        z = jax.random.normal(k2, clean.shape)
        sig = 0.3 * jnp.ones((4,))
        eps_hat = apply_fn(params, clean + 0.3 * z, sig)
        corr = jnp.sum(eps_hat * z) / (
            jnp.linalg.norm(eps_hat) * jnp.linalg.norm(z)
        )
        assert float(corr) > 0.35

    def test_terrain_class_trains(self):
        from lmc_atomi_tpu.models.score import train_score_net

        params, apply_fn, _ = train_score_net(
            jax.random.PRNGKey(1), steps=5, patch=16, batch=4,
            image_class="terrain", depth=3, features=8,
        )
        out = apply_fn(params, jnp.zeros((1, 16, 16)), jnp.ones((1,)))
        assert np.isfinite(np.asarray(out)).all()


def test_random_terrain_batch_statistics():
    from lmc_atomi_tpu.utils.synthetic import random_terrain_batch

    imgs = random_terrain_batch(jax.random.PRNGKey(0), 4, 32)
    a = np.asarray(imgs)
    assert a.shape == (4, 32, 32)
    assert (a >= 0.0).all() and (a <= 1.0).all()
    # distinct draws and non-constant texture
    assert np.std(a[0]) > 0.01
    assert not np.allclose(a[0], a[1])


def test_random_photo_batch_statistics():
    """Real-photograph training patches (bundled einstein + hopper) with
    dihedral augmentation: shape/range, determinism, distinct draws, and
    every patch is an exact crop-transform of one of the two sources."""
    from lmc_atomi_tpu.utils.synthetic import photo_bank, random_photo_batch

    imgs = random_photo_batch(jax.random.PRNGKey(3), 6, 24)
    a = np.asarray(imgs)
    assert a.shape == (6, 24, 24)
    assert (a >= 0.0).all() and (a <= 1.0).all()
    assert np.std(a[0]) > 0.005
    assert not np.allclose(a[0], a[1])
    np.testing.assert_array_equal(
        a, np.asarray(random_photo_batch(jax.random.PRNGKey(3), 6, 24))
    )
    # jits (the generator runs inside training steps)
    jitted = jax.jit(
        lambda k: random_photo_batch(k, 2, 24)
    )(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(jitted)).all()
    # brute-force provenance check for one patch: some crop of some source
    # under some dihedral transform matches exactly
    bank = np.asarray(photo_bank())
    target = a[0]
    found = False
    for src in bank:
        for t in (target, target[::-1], target[:, ::-1], target.T,
                  target[::-1, ::-1], target[::-1].T, target[:, ::-1].T,
                  target[::-1, ::-1].T):
            n = t.shape[0]
            # match via the top-left value then verify the full window
            ys, xs = np.nonzero(np.isclose(src[:512 - n + 1, :512 - n + 1],
                                           t[0, 0], atol=1e-7))
            for y, x in zip(ys, xs):
                if np.allclose(src[y:y + n, x:x + n], t, atol=1e-6):
                    found = True
                    break
            if found:
                break
        if found:
            break
    assert found


def test_photo_class_trains():
    from lmc_atomi_tpu.models.score import train_score_net

    params, apply_fn, _ = train_score_net(
        jax.random.PRNGKey(2), steps=5, patch=16, batch=4,
        image_class="photo", depth=3, features=8,
    )
    out = apply_fn(params, jnp.zeros((1, 16, 16)), jnp.ones((1,)))
    assert np.isfinite(np.asarray(out)).all()
