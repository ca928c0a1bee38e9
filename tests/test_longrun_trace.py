"""Resumable-run and observability tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.kernels import ula
from lmc_atomi_tpu.models import GaussianMixture
from lmc_atomi_tpu.run.longrun import run_resumable
from lmc_atomi_tpu.utils.trace import Timer, print_iteration_table, should_log

MUS = np.array([[0.0, 0.0], [-2.0, 3.0]])
SIGMAS = np.array([[[1.0, -0.5], [-0.5, 1.0]], [[0.5, 0.2], [0.2, 0.7]]])


def make_kernel():
    gm = GaussianMixture.create(MUS, SIGMAS, np.ones(2) / 2)
    return ula(gm.grad_potential, 0.05)


def test_resumable_matches_uninterrupted(tmp_path):
    kern = make_kernel()
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(2)

    straight = run_resumable(kern, x0, key, total_steps=120, segment_steps=40)

    # interrupted: run 1 segment, "crash", resume from checkpoint
    ckpt = str(tmp_path / "run.ckpt")
    partial = run_resumable(kern, x0, key, total_steps=40, segment_steps=40,
                            ckpt_path=ckpt)
    assert os.path.exists(ckpt)
    resumed = run_resumable(kern, x0, key, total_steps=120, segment_steps=40,
                            ckpt_path=ckpt)

    np.testing.assert_allclose(
        np.asarray(resumed["state"].position),
        np.asarray(straight["state"].position),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(resumed["moments"].mean),
        np.asarray(straight["moments"].mean),
        rtol=1e-10,
    )
    assert int(resumed["done"]) == 120


def test_resumable_fused_matches_uninterrupted(tmp_path):
    """Fused-segment long runs resume bit-identically (interpret mode)."""
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.run.longrun import run_resumable_fused
    from lmc_atomi_tpu.utils.images import phantom

    n = 32
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + 0.75 * jax.random.normal(k, (n, n), jnp.float32)
    )(img, jax.random.PRNGKey(0))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    gamma = 0.75**2
    tau = 0.2 * gamma
    kw = dict(noise_scale=0.0, interpret=True, block=4)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros((n, n), jnp.float32)

    straight = run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=24, segment_steps=8,
        burn_in=4, **kw
    )
    ckpt = str(tmp_path / "fused.ckpt")
    run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=8, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, **kw
    )
    assert os.path.exists(ckpt)
    resumed = run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=24, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(resumed["position"]), np.asarray(straight["position"])
    )
    np.testing.assert_allclose(
        np.asarray(resumed["moments"].mean),
        np.asarray(straight["moments"].mean), rtol=1e-6,
    )
    assert int(resumed["done"]) == 24
    assert int(resumed["moments"].count) == 20


def test_resumable_fused_segment_size_change_no_noise_replay(
    tmp_path, monkeypatch
):
    """Per-segment keys fold the ABSOLUTE start step: resuming a checkpoint
    with a different segment_steps must not reuse a fold index (round-2
    advisor: ``done // segment_steps`` replayed the same noise stream —
    a ckpt at done=4 from segment_steps=4 resumed with segment_steps=8
    consumed fold 4//8 = 0 twice). The on-core PRNG cannot run in interpret
    mode on CPU, so the fold indices are recorded via ``step_key``."""
    from lmc_atomi_tpu.core.random import step_key as real_step_key
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.run import longrun
    from lmc_atomi_tpu.utils.images import phantom

    n = 32
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + 0.75 * jax.random.normal(k, (n, n), jnp.float32)
    )(img, jax.random.PRNGKey(0))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    gamma = 0.75**2
    tau = 0.2 * gamma
    kw = dict(noise_scale=0.0, interpret=True, block=4)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros((n, n), jnp.float32)

    folds = []

    def recording_step_key(k, i):
        folds.append(int(i))
        return real_step_key(k, i)

    monkeypatch.setattr(longrun, "step_key", recording_step_key)

    ckpt = str(tmp_path / "seg.ckpt")
    longrun.run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=4, segment_steps=4,
        ckpt_path=ckpt, **kw
    )
    consumed = list(folds)
    assert consumed == [0]
    folds.clear()
    # resume with DOUBLE the segment size: the remaining 4 steps must fold
    # the base key by absolute start step 4 — never a fold the pre-crash
    # run already consumed
    longrun.run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=8, segment_steps=8,
        ckpt_path=ckpt, **kw
    )
    assert folds == [4]
    assert not set(folds) & set(consumed)


def test_should_log_policy():
    rows = [i for i in range(100) if should_log(i, 100)]
    assert set(range(10)).issubset(rows)  # first 10
    assert set(range(91, 100)).issubset(rows)  # last 10
    assert 50 in rows  # every n//10


def test_iteration_table_renders(capsys):
    out = print_iteration_table({"U": np.arange(30.0), "f": np.ones(30)})
    assert "Itn" in out and "U" in out
    assert out.count("\n") < 30  # thinned rows


def test_timer_reports_iters(capsys):
    with Timer("test", n_iters=100) as t:
        jnp.ones((64, 64)).sum().block_until_ready()
    assert t.elapsed > 0
    assert t.iters_per_sec > 0


def test_divergence_guard(tmp_path):
    import pytest

    # explosive "gradient": gamma far above stability -> divergence
    kern = ula(lambda x: -100.0 * x, 1.0)
    with pytest.raises(FloatingPointError, match="diverged"):
        run_resumable(kern, jnp.ones(2) * 1e30, jax.random.PRNGKey(0),
                      total_steps=200, segment_steps=50,
                      ckpt_path=str(tmp_path / "div.ckpt"))


def test_resumable_fused_wavelet_runner(tmp_path):
    """runner="wavelet": checkpointed fused wavelet-l1 inpainting resumes
    bit-identically and matches the direct runner (interpret mode)."""
    from lmc_atomi_tpu.kernels.wavelet_fused import run_myula_wavelet_fused
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import Mask
    from lmc_atomi_tpu.run.longrun import run_resumable_fused
    from lmc_atomi_tpu.utils.images import phantom

    n = 32
    img = jnp.asarray(phantom(n), jnp.float32) / 255.0
    km, kn = jax.random.split(jax.random.PRNGKey(0))
    mask = (jax.random.uniform(km, (n, n)) > 0.5).astype(jnp.float32)
    y = mask * img + 0.1 * mask * jax.random.normal(kn, (n, n), jnp.float32)
    l2 = L2Data(op=Mask(mask=mask), b=y, sigma=1.0 / 0.1**2)
    gamma = 0.1**2
    tau = 0.2 * gamma
    kw = dict(noise_scale=0.0, interpret=True, block=4, levels=2)
    key = jax.random.PRNGKey(1)

    straight = run_resumable_fused(
        l2, 0.25, tau, gamma, y, key, total_steps=24, segment_steps=8,
        burn_in=4, runner="wavelet", **kw
    )
    ckpt = str(tmp_path / "wav.ckpt")
    run_resumable_fused(
        l2, 0.25, tau, gamma, y, key, total_steps=8, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, runner="wavelet", **kw
    )
    resumed = run_resumable_fused(
        l2, 0.25, tau, gamma, y, key, total_steps=24, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, runner="wavelet", **kw
    )
    np.testing.assert_array_equal(
        np.asarray(resumed["position"]), np.asarray(straight["position"])
    )
    assert int(resumed["moments"].count) == 20
    # the segmented run equals ONE direct run of the same length
    # (noise off: the per-segment key folds are irrelevant here)
    direct = run_myula_wavelet_fused(
        l2, 0.25, tau, gamma, y, key, 24, burn_in=4, **kw
    )
    np.testing.assert_allclose(
        np.asarray(resumed["position"]),
        np.asarray(direct.final_state.position), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(resumed["moments"].mean),
        np.asarray(direct.moments.mean), rtol=1e-5, atol=1e-7,
    )
    # the in-kernel P^2 stream also rides through wavelet checkpoints
    wq = run_resumable_fused(
        l2, 0.25, tau, gamma, y, key, total_steps=16, segment_steps=8,
        burn_in=4, runner="wavelet", quantiles=(0.5,), **kw
    )
    assert np.isfinite(np.asarray(wq["quantiles"][0.5])).all()
    direct_q = run_myula_wavelet_fused(
        l2, 0.25, tau, gamma, y, key, 16, burn_in=4, quantiles=(0.5,), **kw
    )
    np.testing.assert_allclose(
        np.asarray(wq["quantiles"][0.5]),
        np.asarray(direct_q.quantiles[0.5]), atol=2e-5,
    )


def test_resumable_fused_tiled_runner(tmp_path):
    """runner="tiled": checkpointed row-band tiled MYULA resumes
    bit-identically, matches the direct tiled runner, and carries the
    HBM-paged P^2 stream through checkpoints (interpret mode)."""
    from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
    from lmc_atomi_tpu.run.longrun import run_resumable_fused
    from lmc_atomi_tpu.utils.images import phantom

    n = 128
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = blur.matvec(img)
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    gamma = 0.75**2
    tau = 0.2 * gamma
    kw = dict(noise_scale=0.0, interpret=True, block=4, band=32, halo=16)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros((n, n), jnp.float32)

    straight = run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=24, segment_steps=8,
        burn_in=4, runner="tiled", **kw
    )
    ckpt = str(tmp_path / "tiled.ckpt")
    run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=8, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, runner="tiled", **kw
    )
    resumed = run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=24, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, runner="tiled", **kw
    )
    np.testing.assert_array_equal(
        np.asarray(resumed["position"]), np.asarray(straight["position"])
    )
    assert int(resumed["moments"].count) == 20
    # the segmented run equals ONE direct run of the same length
    direct = run_myula_tv_tiled(
        l2, 0.3, tau, gamma, x0, key, 24, burn_in=4, **kw
    )
    np.testing.assert_allclose(
        np.asarray(resumed["position"]),
        np.asarray(direct.final_state.position), rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(resumed["moments"].mean),
        np.asarray(direct.moments.mean), rtol=1e-5, atol=1e-7,
    )
    # the HBM-paged P^2 stream rides through tiled checkpoints
    tq = run_resumable_fused(
        l2, 0.3, tau, gamma, x0, key, total_steps=16, segment_steps=8,
        burn_in=4, runner="tiled", quantiles=(0.5,), **kw
    )
    assert np.isfinite(np.asarray(tq["quantiles"][0.5])).all()
    direct_q = run_myula_tv_tiled(
        l2, 0.3, tau, gamma, x0, key, 16, burn_in=4, quantiles=(0.5,), **kw
    )
    # phantom is 0..255 scale here (the wavelet test above is 0..1):
    # marker state crossing segment boundaries costs ~1e-7 relative
    np.testing.assert_allclose(
        np.asarray(tq["quantiles"][0.5]),
        np.asarray(direct_q.quantiles[0.5]), rtol=2e-6, atol=2e-4,
    )


def test_resumable_fused_ulpda_tiled_runner(tmp_path):
    """runner="ulpda_tiled": the persistent primal-dual state (py/px +
    extrapolated iterate) rides the bundle, so a checkpointed run resumes
    bit-identically and a segmented run equals one direct tiled ULPDA run
    (noise off, interpret mode).

    Tolerance note (measured): run_seg jits AROUND the already-jitted
    kernel runner, and XLA CPU re-fuses the inlined program with
    different FMA/reassociation choices — a ~1-ulp wobble that the
    NON-CONTRACTIVE theta-extrapolated primal-dual iteration amplifies
    ~2.5-4x per step (f64: 5e-13 at 4 steps -> 8e-7 relative at 24;
    f32: ~3e-3). Exact-trajectory gates live where both sides share a
    compile context: the bit-identical resume below, and the eager
    tiled-vs-whole-image parity in tests/test_ulpda_tiled.py. The
    cross-context comparison here gates at the measured wobble ceiling
    (the xprev handoff keeps the segment boundary itself exact)."""
    from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled
    from lmc_atomi_tpu.ops.functionals import L21Norm, L2Data
    from lmc_atomi_tpu.ops.linops import (
        CirculantBlur2D,
        Gradient2D,
        uniform_kernel,
    )
    from lmc_atomi_tpu.run.longrun import run_resumable_fused
    from lmc_atomi_tpu.utils.images import phantom

    n = 128
    img = jnp.asarray(phantom(n), jnp.float64)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float64))
    y = blur.matvec(img)
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    tau = 0.95 / l2.sigma
    kw = dict(noise_scale=0.0, interpret=True, block=4, band=32, halo=16,
              niter_solve=3)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros((n, n), jnp.float64)

    straight = run_resumable_fused(
        l2, 0.3, tau, 1.0, x0, key, total_steps=24, segment_steps=8,
        burn_in=4, runner="ulpda_tiled", **kw
    )
    ckpt = str(tmp_path / "ulpda_tiled.ckpt")
    run_resumable_fused(
        l2, 0.3, tau, 1.0, x0, key, total_steps=8, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, runner="ulpda_tiled", **kw
    )
    resumed = run_resumable_fused(
        l2, 0.3, tau, 1.0, x0, key, total_steps=24, segment_steps=8,
        burn_in=4, ckpt_path=ckpt, runner="ulpda_tiled", **kw
    )
    np.testing.assert_array_equal(
        np.asarray(resumed["position"]), np.asarray(straight["position"])
    )
    np.testing.assert_array_equal(
        np.asarray(resumed["ulpda_extras"][0]),
        np.asarray(straight["ulpda_extras"][0]),
    )
    assert int(resumed["moments"].count) == 20
    # the segmented run equals ONE direct run of the same length (the
    # xbar -> x_prev inversion at each segment boundary costs roundoff)
    direct = run_ulpda_tv_tiled(
        l2, L21Norm(sigma=0.3), Gradient2D(), tau, 1.0, x0, key, 24,
        burn_in=4, **kw
    )
    np.testing.assert_allclose(
        np.asarray(resumed["position"]),
        np.asarray(direct.final_state.position), rtol=1e-5, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(resumed["moments"].mean),
        np.asarray(direct.moments.mean), rtol=1e-5, atol=2e-4,
    )
    # the HBM-paged P^2 stream rides through primal-dual checkpoints
    tq = run_resumable_fused(
        l2, 0.3, tau, 1.0, x0, key, total_steps=16, segment_steps=8,
        burn_in=4, runner="ulpda_tiled", quantiles=(0.5,), **kw
    )
    direct_q = run_ulpda_tv_tiled(
        l2, L21Norm(sigma=0.3), Gradient2D(), tau, 1.0, x0, key, 16,
        burn_in=4, quantiles=(0.5,), **kw
    )
    np.testing.assert_allclose(
        np.asarray(tq["quantiles"][0.5]),
        np.asarray(direct_q.quantiles[0.5]), rtol=1e-3, atol=0.5,
    )
