"""Tests for the DnCNN PnP stack and wavelet-l1 inpainting workload."""
import jax
import jax.numpy as jnp
import numpy as np


def test_dncnn_trains_and_denoises():
    from lmc_atomi_tpu.models.dncnn import make_denoiser, train_denoiser
    from lmc_atomi_tpu.utils.synthetic import random_phantom

    key = jax.random.PRNGKey(0)
    params, apply_fn = train_denoiser(key, noise_sigma=0.1, steps=150,
                                      patch=32, batch=8)
    den = make_denoiser(params, apply_fn)
    clean = random_phantom(jax.random.PRNGKey(5), 32)
    noisy = clean + 0.1 * jax.random.normal(jax.random.PRNGKey(6), clean.shape)
    out = den(noisy)
    err_noisy = float(jnp.mean((noisy - clean) ** 2))
    err_den = float(jnp.mean((out - clean) ** 2))
    assert err_den < err_noisy, (err_den, err_noisy)


def test_synthetic_phantoms_batch():
    from lmc_atomi_tpu.utils.synthetic import random_phantom_batch

    b = random_phantom_batch(jax.random.PRNGKey(1), 4, 24)
    assert b.shape == (4, 24, 24)
    assert float(b.min()) >= 0.0 and float(b.max()) <= 1.0
    # images differ across keys
    assert float(jnp.abs(b[0] - b[1]).max()) > 0.05


def test_pnp_workload_small(tmp_path):
    from lmc_atomi_tpu.experiments.pnp import pnp_ula_deblur

    mean, std, report = pnp_ula_deblur(
        size=32, train_steps=60, n_steps=100, burn_in=20, n_chains=2,
        outdir=str(tmp_path), make_plots=False,
    )
    assert mean.shape == (32, 32) and np.isfinite(mean).all()
    assert (std >= 0).all()
    assert report["chain_steps_per_sec"] > 0


def test_pnp_workload_score_baseline(tmp_path):
    """Score-ULA third-prior row on the identical observation (farm path,
    annealed schedules confined to segment 0)."""
    from lmc_atomi_tpu.experiments.pnp import pnp_ula_deblur

    mean, std, report = pnp_ula_deblur(
        size=32, train_steps=5, n_steps=60, burn_in=20, n_chains=2,
        tv_baseline=False, score_baseline=True, score_train_steps=5,
        outdir=str(tmp_path), make_plots=False,
    )
    assert np.isfinite(report["psnr_score_mean"])
    assert report["score_ci_width"] >= 0.0


def test_inpainting_workload_small(tmp_path):
    from lmc_atomi_tpu.experiments.inpainting import wavelet_inpainting

    results, summary = wavelet_inpainting(
        size=32, n_steps=600, burn_in=100, outdir=str(tmp_path),
        make_plots=False, fused=True,
    )
    assert set(results) == {
        "MYULA", "MALA", "ULPDA-wavelet", "MYULA-fused",
        "ULPDA-wavelet-fused",
    }
    # deterministic off-TPU fused chains still reconstruct
    assert (summary["report"]["MYULA-fused"]["psnr"]
            > summary["report"]["observed"]["psnr"])
    assert (summary["report"]["ULPDA-wavelet-fused"]["psnr"]
            > summary["report"]["observed"]["psnr"])
    # posterior means must beat the masked observation
    assert summary["report"]["MYULA"]["psnr"] > summary["report"]["observed"]["psnr"]
    assert summary["report"]["MALA"]["psnr"] > summary["report"]["observed"]["psnr"]
    assert 0.0 < summary["mala_acceptance"] <= 1.0
