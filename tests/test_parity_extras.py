"""Parity extras: ULPDA dual collection, exact W2 prefix curve, grid-mixture
optimization harness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_ulpda_dual_samples_collected():
    from lmc_atomi_tpu.kernels import ulpda
    from lmc_atomi_tpu.ops.functionals import L21Norm, L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
    from lmc_atomi_tpu.run.runner import run_chain
    from lmc_atomi_tpu.utils.images import phantom

    n = 16
    img = jnp.asarray(phantom(n, np.float64))
    H = CirculantBlur2D.from_kernel((n, n), uniform_kernel(3, jnp.float64))
    y = H.matvec(img)
    l2 = L2Data(op=H, b=y, sigma=1.0)
    l21 = L21Norm(sigma=0.3)
    G = Gradient2D()
    kern = ulpda(l2, l21, G, tau=0.05, mu=1.0)
    res = run_chain(kern, jnp.zeros((n, n), jnp.float64), jax.random.PRNGKey(0),
                    10, collect="samples", collect_extras=True)
    # dual samples: (steps, 2, n, n), the reference's returny (algs.py:429)
    assert res.extras.y.shape == (10, 2, n, n)
    assert np.isfinite(np.asarray(res.extras.y)).all()


def test_w2_prefix_curve_exact_matches_sinkhorn_trend():
    from lmc_atomi_tpu.eval import emd_native, w2_prefix_curve_exact

    if not emd_native.available():
        pytest.skip("native EMD unavailable")
    rng = np.random.default_rng(0)
    true = rng.normal(size=(300, 2))
    samples = rng.normal(size=(300, 2))
    ks, vals = w2_prefix_curve_exact(true, samples, interval=100)
    assert len(ks) == len(vals) == 3
    assert vals[-1] < vals[0]  # more samples -> closer


def test_optimize_grid_mixture_finds_modes():
    from lmc_atomi_tpu.experiments.sgld_runs import optimize_grid_mixture

    xs, logps, summary = optimize_grid_mixture(steps=400, n_restarts=32)
    assert summary["modes_found"] >= 3
    # every restart ends near some grid mode
    snapped = np.round(xs / 2.0) * 2.0
    assert np.abs(xs - snapped).max() < 0.3


def test_ct_workload_small(tmp_path):
    from lmc_atomi_tpu.experiments.ct import ct_tv_myula

    mean, std, report = ct_tv_myula(
        size=32, n_angles=16, n_steps=800, burn_in=100,
        compute_map=False, pnp=False,  # branches covered in test_experiments
        outdir=str(tmp_path), make_plots=False,
    )
    assert mean.shape == (32, 32) and np.isfinite(mean).all()
    assert report["psnr_posterior_mean"] > report["psnr_backprojection"]


def test_sharded_imaging_chain_farm():
    """MYULA imaging chains sharded over the device mesh must equal the
    vmap-only run (conv operator: the CPU fft thunk rejects sharded batched
    FFTs; TPU covers the spectral path)."""
    from lmc_atomi_tpu.kernels import myula_imaging
    from lmc_atomi_tpu.ops.functionals import L2Data, TVNorm
    from lmc_atomi_tpu.ops.linops import Convolve2D, uniform_kernel
    from lmc_atomi_tpu.parallel.mesh import run_chains_sharded
    from lmc_atomi_tpu.run.runner import run_chains
    from lmc_atomi_tpu.utils.images import phantom

    n = 24
    img = jnp.asarray(phantom(n, np.float64))
    H = Convolve2D.from_kernel(uniform_kernel(5, jnp.float64))
    y = H.matvec(img)
    l2 = L2Data(op=H, b=y, sigma=1.0)
    tv = TVNorm(sigma=0.3, niter=5)
    kern = myula_imaging(l2, tv, tau=0.1, gamma=0.5)
    x0 = jnp.zeros((n, n), jnp.float64)
    key = jax.random.PRNGKey(0)

    plain = run_chains(kern, x0, key, 15, n_chains=8, collect="stats")
    sharded = run_chains_sharded(kern, x0, key, 15, n_chains=8, collect="stats")
    np.testing.assert_allclose(
        np.asarray(sharded.moments.mean), np.asarray(plain.moments.mean),
        rtol=1e-12,
    )


def test_l1_denoise_workload(tmp_path):
    from lmc_atomi_tpu.experiments.denoise import l1_denoise_myula

    mean, report = l1_denoise_myula(
        size=48, n_steps=800, burn_in=100, outdir=str(tmp_path),
        make_plots=False,
    )
    assert report["psnr_posterior_mean"] > report["psnr_noisy"]


def test_collect_extras_projection():
    """collect_extras may be a projection fn (ADVICE r1: stacking CSGLD's
    full energy histogram per step OOMs at driver scale)."""
    import jax
    import jax.numpy as jnp

    from lmc_atomi_tpu.kernels import sgmcmc as S
    from lmc_atomi_tpu.models import GridGaussianMixture
    from lmc_atomi_tpu.run.runner import run_chain

    gm = GridGaussianMixture.create([-4.0, 0.0, 4.0], sigma=0.03, lam=1 / 9.0)
    kern = S.csgld(
        gm.log_prob, num_partitions=16, energy_gap=1.0, min_energy=0.0,
        zeta=0.75, temperature=1.0, lr_schedule=1e-3,
    )
    res = run_chain(
        kern, jnp.zeros(2), jax.random.PRNGKey(0), 20, collect="samples",
        collect_extras=lambda e: e.energy_idx,
    )
    assert np.asarray(res.extras).shape == (20,)  # scalars, not histograms
    full = run_chain(
        kern, jnp.zeros(2), jax.random.PRNGKey(0), 20, collect="samples",
        collect_extras=True,
    )
    np.testing.assert_array_equal(
        np.asarray(res.extras), np.asarray(full.extras.energy_idx)
    )
