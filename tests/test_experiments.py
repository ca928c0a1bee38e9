"""End-to-end smoke tests of the four experiment workloads (tiny configs) —
the integration layer the reference validated only by eye (SURVEY.md §4)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_mixtures_workload(tmp_path):
    from lmc_atomi_tpu.experiments.mixtures import lmc_gaussian_mixture

    samples, curves, summary = lmc_gaussian_mixture(
        n=2, k=400, outdir=str(tmp_path), make_plots=True, eval_w2=True,
        w2_interval=100,
    )
    assert set(samples) == {"ULA", "MALA", "PULA", "IHPULA", "MLA"}
    for s in samples.values():
        assert s.shape == (400, 2) and np.isfinite(s).all()
    assert all(np.isfinite(v[1]).all() for v in curves.values())
    pdfs = list(tmp_path.glob("*.pdf"))
    assert len(pdfs) >= 4


def test_laplace_mixtures_workload(tmp_path):
    from lmc_atomi_tpu.experiments.laplace_mixtures import lmc_laplacian_mixture

    samples, curves, summary = lmc_laplacian_mixture(
        n=2, k=300, outdir=str(tmp_path), make_plots=False, eval_w2=True,
        w2_interval=100,
    )
    for s in samples.values():
        assert s.shape == (300, 2) and np.isfinite(s).all()


def test_prox_mixtures_workload(tmp_path):
    from lmc_atomi_tpu.experiments.prox_mixtures import prox_lmc_gaussian_mixture

    samples, summary = prox_lmc_gaussian_mixture(
        n=2, k=300, t=20, outdir=str(tmp_path), make_plots=False,
    )
    assert set(samples) == {"PGLD", "MYULA", "MYMALA", "PP-ULA", "FBULA", "LBMUMLA"}
    for s in samples.values():
        assert np.isfinite(s).all()


@pytest.mark.parametrize("alg", ["ULPDA", "MYULA"])
def test_deconv_sampling_workload(tmp_path, alg):
    from lmc_atomi_tpu.experiments.deconv import prox_lmc_deconv

    results, series, summary = prox_lmc_deconv(
        size=32, n_steps=30, niter_tv=5, niter_map=30, alg=alg,
        outdir=str(tmp_path), make_plots=True,
    )
    assert len(results) == 9
    for est in results.values():
        assert est.shape == (32, 32) and np.isfinite(est).all()
    # metric series recorded per model
    assert len(series) == 9
    for met in series.values():
        assert set(met) == {"cost", "err", "snr", "psnr", "mse"}
        assert met["psnr"].shape == (30,)
    assert (tmp_path / f"fig_prox_lmc_deconv_phantom_{alg}_30_images.pdf").exists()


def test_deconv_map_workload(tmp_path):
    from lmc_atomi_tpu.experiments.deconv import prox_lmc_deconv
    from lmc_atomi_tpu.utils.images import phantom

    results, series, summary = prox_lmc_deconv(
        size=32, niter_map=150, niter_tv=5, compute_map=True,
        outdir=str(tmp_path), make_plots=False,
    )
    assert len(results) == 9
    # the convex-TV matched-kernel model must beat the blurred PSNR
    assert summary["report"]["M1 (k5-TV)"]["psnr"] > summary["psnr_blurred"]


def test_sgld_workload(tmp_path):
    from lmc_atomi_tpu.experiments.sgld_runs import sgld_grid_mixture

    samples, summary = sgld_grid_mixture(
        k=400, num_partitions=128, outdir=str(tmp_path), make_plots=False,
        include_prox=True,
    )
    assert set(samples) >= {
        "SGLD", "MSGLD", "cyclicalSGLD", "contourSGLD",
        "SPGLD", "SSGLD", "MYSGLD", "cyclicalSPGLD", "contourSPGLD",
    }
    for s in samples.values():
        assert np.isfinite(s).all()


def test_cli_entrypoint():
    """The auto-CLI must run a workload from the command line."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from lmc_atomi_tpu.experiments.mixtures import main; main()",
            "--n", "1", "--k", "100", "--make_plots", "false",
            "--eval_w2", "false",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["workload"] == "gaussian_mixture_lmc"


def test_ct_workload_all_branches(tmp_path):
    """CT: TV-MYULA sampling + TV-MAP (aPDHG) + learned PnP prior, tiny."""
    from lmc_atomi_tpu.experiments.ct import ct_tv_myula

    mean, std, report = ct_tv_myula(
        size=32, n_angles=12, n_steps=40, burn_in=10, niter_map=15,
        pnp_train_steps=5, make_plots=False,
    )
    assert mean.shape == (32, 32)
    for k in ("psnr_posterior_mean", "psnr_map_tv", "psnr_pnp_mean"):
        assert np.isfinite(report[k]), k


def test_ct_score_prior_branch(tmp_path):
    """Annealed score-ULA branch (models/score.py prior), tiny config."""
    from lmc_atomi_tpu.experiments.ct import ct_tv_myula

    mean, std, report = ct_tv_myula(
        size=32, n_angles=12, n_steps=40, burn_in=16,
        compute_map=False, pnp=False, score_prior=True,
        score_train_steps=5, make_plots=False,
    )
    assert np.isfinite(report["psnr_score_mean"])


def test_multichain_deblur_workload(tmp_path):
    """Lane-packed multi-chain UQ experiment: pooled stats + moments R-hat
    (deterministic off-TPU: identical chains -> B=0, rhat = sqrt((n-1)/n))."""
    import numpy as np

    from lmc_atomi_tpu.experiments.multichain import multichain_deblur

    pooled, rhat, rep = multichain_deblur(
        size=32, n_chains=4, n_steps=40, burn_in=10,
        outdir=str(tmp_path), make_plots=False,
    )
    assert rep["pack"] == 4  # 128 // 32
    assert rep["psnr_pooled_mean"] > rep["psnr_observed"]
    assert np.isfinite(np.asarray(rhat)).all()
    # deterministic equal chains: between-chain variance is exactly 0
    assert rep["rhat_max"] <= 1.0 + 1e-5


def test_rhat_from_moments_matches_direct_formula():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmc_atomi_tpu.core.stats import RunningMoments
    from lmc_atomi_tpu.eval.diagnostics import rhat_from_moments

    rng = np.random.default_rng(0)
    c, t, d = 4, 50, 6
    samples = rng.normal(size=(c, t, d)).astype(np.float32)
    mom = RunningMoments(
        count=jnp.full((c,), t, jnp.int32),
        mean=jnp.asarray(samples.mean(axis=1)),
        m2=jnp.asarray(samples.var(axis=1, ddof=1) * (t - 1)),
    )
    got = np.asarray(rhat_from_moments(mom))
    w = samples.var(axis=1, ddof=1).mean(axis=0)
    b = t * samples.mean(axis=1).var(axis=0, ddof=1)
    want = np.sqrt(((t - 1) / t * w + b / t) / w)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # iid same-distribution chains: rhat near 1
    assert (got < 1.2).all()


def test_deconv_wavelet_row(tmp_path):
    """--wavelet_row adds the k5-WL1 model (Haar-domain dual ULPDA /
    exact OrthogonalL1 prox MYULA) to the deconvolution grid."""
    from lmc_atomi_tpu.experiments.deconv import prox_lmc_deconv

    results, _, summary = prox_lmc_deconv(
        size=32, n_steps=40, alg="ULPDA", wavelet_row=True,
        wavelet_levels=3, make_plots=False, collect_metrics=False,
        outdir=str(tmp_path),
    )
    labels = list(summary["report"])
    assert any("WL1" in l for l in labels) and len(labels) == 10
    wl1 = next(l for l in labels if "WL1" in l)
    assert np.isfinite(summary["report"][wl1]["psnr"])
