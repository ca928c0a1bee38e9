"""Evaluation-layer tests: Sinkhorn vs exact assignment EMD, sliced W2,
prefix curves, imaging metrics."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.eval import (
    exact_w2_assignment,
    psnr,
    sinkhorn_w2,
    sliced_w2,
    snr,
    w2_prefix_curve,
    mse,
)


def gaussian_clouds(n=256, shift=2.0):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 2))
    y = rng.normal(size=(n, 2)) + np.array([shift, 0.0])
    return jnp.asarray(x), jnp.asarray(y)


def test_sinkhorn_close_to_exact_emd():
    x, y = gaussian_clouds()
    exact = exact_w2_assignment(x, y)
    approx = float(sinkhorn_w2(x, y, eps=0.005, iters=500))
    # entropic bias at small eps should be a few percent
    assert abs(approx - exact) / exact < 0.1, (approx, exact)


def test_sinkhorn_identical_clouds_near_zero():
    x, _ = gaussian_clouds()
    val = float(sinkhorn_w2(x, x, eps=0.01, iters=300))
    assert val < 1e-3


def test_sliced_w2_detects_shift():
    x, y = gaussian_clouds(shift=2.0)
    key = jax.random.PRNGKey(0)
    far = float(sliced_w2(x, y, key))
    near = float(sliced_w2(x, x, key))
    # sliced W2^2 of a pure shift (2,0) averaged over unit dirs = 4*E[u1^2]=2
    assert near < 1e-6
    assert abs(far - 2.0) < 0.5, far


def test_w2_prefix_curve_decreases_for_matching_sampler():
    rng = np.random.default_rng(1)
    true = jnp.asarray(rng.normal(size=(400, 2)))
    samples = jnp.asarray(rng.normal(size=(400, 2)))
    ks, curve = w2_prefix_curve(true, samples, interval=100, eps=0.01, iters=200)
    curve = np.asarray(curve)
    assert curve.shape[0] == len(np.arange(1, 400, 100))
    # more samples -> better match (allow small noise)
    assert curve[-1] < curve[0]


def test_imaging_metrics():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, size=(32, 32)))
    noise = jnp.asarray(rng.normal(size=(32, 32)))
    xh = x + noise
    # snr: reference formula
    want_snr = 20 * np.log10(
        np.linalg.norm(np.asarray(x)) / np.linalg.norm(np.asarray(noise))
    )
    np.testing.assert_allclose(float(snr(x, xh)), want_snr, rtol=1e-10)
    # psnr with explicit data range
    want_psnr = 10 * np.log10(255.0**2 / np.mean(np.asarray(noise) ** 2))
    np.testing.assert_allclose(
        float(psnr(x, xh, data_range=255.0)), want_psnr, rtol=1e-10
    )
    np.testing.assert_allclose(
        float(mse(x, xh)), np.mean(np.asarray(noise) ** 2), rtol=1e-10
    )
