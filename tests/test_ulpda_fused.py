"""Fused ULPDA block kernel: deterministic interpret-mode parity with the
reference recursion (kernels/imaging.py::ulpda update rule, noise off)
across dual norms, gfirst orders, and nonconvex data terms. The fused
f-prox is a fixed-trip Richardson gram solve rather than the exact
spectral inverse, so parity is to solver tolerance (the system has condition
~ 1 + tau*sigma at reference step sizes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmc_atomi_tpu.kernels import ulpda_fused_supported, ulpda_sep_fused
from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused
from lmc_atomi_tpu.ops.functionals import L1Norm, L21Norm, L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV
from lmc_atomi_tpu.utils.images import phantom

ON_TPU = jax.default_backend() == "tpu"


def _problem(n=64, seed=0):
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + 0.75 * jax.random.normal(k, (n, n), jnp.float32)
    )(img, jax.random.PRNGKey(seed))
    sigma = 1 / 0.75**2
    tau = 0.95 / sigma
    mu = 1.0
    return img, blur, y, sigma, tau, mu


def _terms(which, blur, y, sigma):
    if which == "tv":
        return L2Data.create(op=blur, b=y, sigma=sigma), L21Norm(sigma=0.3)
    op2 = Gradient2D() if which == "mctv" else None
    proxg = L1Norm(sigma=0.3) if which == "mctv" else L21Norm(sigma=0.3)
    return (
        L2NcvxTV(op=blur, b=y, op2=op2, sigma=sigma, lamda=0.3, gamma=15.0,
                 isotropic=True, niter_inner=10),
        proxg,
    )


def _reference_steps(proxf, proxg, a_op, x0, tau, mu, n, gfirst, theta=1.0):
    """The exact ulpda recursion (kernels/imaging.py:62-85), noise off."""
    x = x0
    yd = a_op.matvec(x0) * 0.0
    xbar = x0
    traj = []
    for _ in range(n):
        x_old = x
        if gfirst:
            yd = proxg.proxdual(yd + mu * a_op.matvec(xbar), mu)
            x = proxf.prox(x_old - tau * a_op.rmatvec(yd), tau)
            xbar = x + theta * (x - x_old)
        else:
            x = proxf.prox(x_old - tau * a_op.rmatvec(yd), tau)
            xbar = x + theta * (x - x_old)
            yd = proxg.proxdual(yd + mu * a_op.matvec(xbar), mu)
        traj.append(np.asarray(x))
    return x, yd, traj


class TestSupported:
    def test_gating(self):
        img, blur, y, sigma, tau, mu = _problem()
        for which in ("tv", "mctv", "metv"):
            proxf, proxg = _terms(which, blur, y, sigma)
            assert ulpda_fused_supported(
                proxf, proxg, Gradient2D(), img.shape, img.dtype
            ) == ON_TPU  # sep_fused_supported requires the TPU backend
        proxf, proxg = _terms("tv", blur, y, sigma)
        assert not ulpda_fused_supported(proxf, proxg, blur, img.shape,
                                         img.dtype)


class TestDeterministicParity:
    """noise off, interpret mode, solver sweeps cranked up: the fused step must
    track the exact-solve recursion to solver tolerance."""

    @pytest.mark.parametrize("which", ["tv", "mctv", "metv"])
    @pytest.mark.parametrize("gfirst", [False, True])
    def test_multi_step(self, which, gfirst):
        img, blur, y, sigma, tau, mu = _problem()
        proxf, proxg = _terms(which, blur, y, sigma)
        a_op = Gradient2D()
        x0 = y

        want_x, want_y, _ = _reference_steps(
            proxf, proxg, a_op, x0, tau, mu, 4, gfirst
        )
        fused = ulpda_sep_fused(
            proxf, proxg, a_op, tau=tau, mu=mu, theta=1.0, gfirst=gfirst,
            niter_solve=30, noise_scale=0.0, interpret=not ON_TPU,
        )
        st = fused.init(x0)
        for i in range(4):
            st, _ = fused.step(st, jax.random.PRNGKey(i))
        scale = max(1.0, float(jnp.abs(want_x).max()))
        np.testing.assert_allclose(
            np.asarray(st.position), np.asarray(want_x), atol=2e-4 * scale
        )
        # the pre-projection dual inherits the primal's absolute solver error
        # (image values are O(100)), so its tolerance scales with the primal
        np.testing.assert_allclose(
            np.asarray(st.extras.y), np.asarray(want_y),
            atol=2e-5 * scale,
        )

    def test_block_driver_matches_recursion_and_welford(self):
        img, blur, y, sigma, tau, mu = _problem()
        proxf, proxg = _terms("tv", blur, y, sigma)
        a_op = Gradient2D()
        x0 = y
        res = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 6,
            block=3, noise_scale=0.0, burn_in=2, niter_solve=30,
            interpret=not ON_TPU,
        )
        want_x, _, traj = _reference_steps(
            proxf, proxg, a_op, x0, tau, mu, 6, gfirst=False
        )
        scale = max(1.0, float(jnp.abs(want_x).max()))
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(want_x),
            atol=2e-4 * scale,
        )
        assert int(res.moments.count) == 4
        np.testing.assert_allclose(
            np.asarray(res.moments.mean), np.mean(traj[2:], axis=0),
            atol=2e-4 * scale,
        )

    @pytest.mark.parametrize("gfirst", [False, True])
    def test_final_xbar_is_true_extrapolation(self, gfirst):
        """The stored xbar must be the genuine extrapolated iterate
        x_K + theta (x_K - x_{K-1}) in BOTH orders — a gfirst=False result
        handed to a gfirst=True kernel depends on it (round-2 advisor)."""
        img, blur, y, sigma, tau, mu = _problem()
        proxf, proxg = _terms("tv", blur, y, sigma)
        a_op = Gradient2D()
        x0 = y
        res = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 4,
            block=2, noise_scale=0.0, niter_solve=30, gfirst=gfirst,
            interpret=not ON_TPU,
        )
        _, _, traj = _reference_steps(
            proxf, proxg, a_op, x0, tau, mu, 4, gfirst=gfirst
        )
        want_xbar = traj[-1] + 1.0 * (traj[-1] - traj[-2])
        scale = max(1.0, float(np.abs(want_xbar).max()))
        np.testing.assert_allclose(
            np.asarray(res.final_state.extras.xbar), want_xbar,
            atol=5e-4 * scale,
        )

    def test_env_warm_tracks_converged_envelope(self):
        """ME-TV envelope dual warm start (env_warm + 5 warm trips) must
        track the CONVERGED-envelope chain (100 cold trips) at least as
        closely as the data term's own cold 10-trip default does — the
        ULPDA analogue of myula_fused's tv_warm trade (VERDICT item 2).
        Warm accumulates dual convergence across steps, so it lands NEARER
        the converged trajectory than cold-10, not near cold-10 itself."""
        img, blur, y, sigma, tau, mu = _problem()
        proxf, proxg = _terms("metv", blur, y, sigma)
        a_op = Gradient2D()
        x0 = y
        kw = dict(block=16, noise_scale=0.0, niter_solve=20,
                  interpret=not ON_TPU)
        truth = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 16,
            niter_inner=100, **kw
        ).final_state.position
        cold10 = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 16, **kw
        ).final_state.position
        warm5 = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 16,
            env_warm=True, niter_inner=5, **kw
        ).final_state.position
        err_cold = float(jnp.abs(cold10 - truth).max())
        err_warm = float(jnp.abs(warm5 - truth).max())
        assert err_warm < max(err_cold, 1e-4), (err_warm, err_cold)

    def test_fgp_env_solver_tracks_converged_envelope(self):
        """tv_solver="fgp" on the ME-TV envelope prox: FGP-8 must track the
        converged-envelope chain at least as closely as cold Chambolle-10
        (it is a strictly more accurate solver per diag_tv_proj.py), i.e.
        the fused plumbing carries the projected-dual iteration intact."""
        img, blur, y, sigma, tau, mu = _problem()
        proxf, proxg = _terms("metv", blur, y, sigma)
        a_op = Gradient2D()
        x0 = y
        kw = dict(block=16, noise_scale=0.0, niter_solve=20,
                  interpret=not ON_TPU)
        truth = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 16,
            niter_inner=100, **kw
        ).final_state.position
        cold10 = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 16, **kw
        ).final_state.position
        fgp8 = run_ulpda_fused(
            proxf, proxg, a_op, tau, mu, x0, jax.random.PRNGKey(3), 16,
            tv_solver="fgp", niter_inner=8, **kw
        ).final_state.position
        err_cold = float(jnp.abs(cold10 - truth).max())
        err_fgp = float(jnp.abs(fgp8 - truth).max())
        assert err_fgp < max(err_cold * 1.1, 1e-4), (err_fgp, err_cold)

    def test_cg_solve_quality_at_production_trips(self):
        """At the production trip count the Richardson gram solve matches the
        exact spectral solve to f32 accuracy after one step."""
        img, blur, y, sigma, tau, mu = _problem()
        proxf, proxg = _terms("tv", blur, y, sigma)
        a_op = Gradient2D()
        want_x, _, _ = _reference_steps(
            proxf, proxg, a_op, y, tau, mu, 1, gfirst=False
        )
        fused = ulpda_sep_fused(
            proxf, proxg, a_op, tau=tau, mu=mu, niter_solve=12,
            noise_scale=0.0, interpret=not ON_TPU,
        )
        st, _ = fused.step(fused.init(y), jax.random.PRNGKey(0))
        err = float(
            jnp.abs(st.position - want_x).max() / jnp.abs(want_x).max()
        )
        assert err < 5e-5, err


@pytest.mark.skipif(not ON_TPU, reason="needs a real TPU")
def test_fused_kernels_run_at_1024():
    """Regression guard for the scoped-VMEM limit: both fused kernels must
    compile and run at 1024^2 (the ULPDA stack is ~68 MiB there)."""
    from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused

    img, blur, y, sigma, tau, mu = _problem(n=1024)
    proxf, proxg = _terms("tv", blur, y, sigma)
    x0 = jnp.zeros_like(img)
    res_u = jax.jit(
        lambda x, k: run_ulpda_fused(
            proxf, proxg, Gradient2D(), tau, mu, x, k, 50, block=50
        )
    )(x0, jax.random.PRNGKey(1))
    assert bool(jnp.isfinite(res_u.final_state.position).all())
    gamma = 0.75**2
    res_m = jax.jit(
        lambda x, k: run_myula_tv_fused(
            proxf, 0.3, 0.2 * gamma, gamma, x, k, 50, block=50,
        )
    )(x0, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(res_m.final_state.position).all())


@pytest.mark.skipif(not ON_TPU, reason="on-core PRNG needs a real TPU")
class TestFusedUlpdaNoiseTPU:
    def test_noise_statistics(self):
        """niter_solve=0 warm-starts at x=0 and the dual radius is 0, so the
        step output is exactly sqrt(2 tau) xi — KS vs N(0,1)."""
        from scipy import stats

        from lmc_atomi_tpu.kernels.ulpda_fused import ulpda_block_update

        n, tau = 256, 0.5
        zeros = jnp.zeros((n, n), jnp.float32)
        dummy = jnp.zeros((1, 1), jnp.float32)
        scal_f = jnp.asarray(
            [tau, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0], jnp.float32
        )
        scal_i = jnp.zeros((3,), jnp.int32)
        out, _, _, _, _, _ = ulpda_block_update(
            zeros, zeros, zeros, dummy, zeros, zeros, zeros,
            jnp.asarray([7, 3], jnp.int32), scal_f, scal_i,
            taps=(((1.0,), (1.0,)),), oy=0, ox=0, lam=1.0, n_steps=1,
            niter_solve=0, with_noise=True, with_stats=True,
        )
        xi = np.asarray(out).ravel() / np.sqrt(2 * tau)
        assert abs(xi.mean()) < 0.02
        assert abs(xi.std() - 1.0) < 0.02
        ks = stats.kstest(xi[::7][:8192], "norm")
        assert ks.pvalue > 1e-3, f"KS p={ks.pvalue}"

    def test_default_chebyshev_sweeps_psnr_gate(self):
        """The DEFAULT Chebyshev gram solve (3 sweeps as of round 5) must
        hold posterior-mean PSNR within 0.1 dB of a 20-sweep (effectively
        exact) fused chain on the SAME noise stream at 256^2 — the gate
        behind shipping 3 as the default (the measured 512^2 frontier,
        fig/r4_measurements/ulpda_frontier_rows.jsonl: Chebyshev-3 =
        33.9k iters/s at 40.245 dB vs Chebyshev-8's 40.256, -0.011 dB)."""
        from lmc_atomi_tpu.eval.metrics import psnr

        img, blur, y, sigma, tau, mu = _problem(n=256)
        proxf, proxg = _terms("tv", blur, y, sigma)
        a_op = Gradient2D()
        steps = 10000
        x0 = jnp.zeros_like(img)
        res_d = jax.jit(
            lambda x, k: run_ulpda_fused(
                proxf, proxg, a_op, tau, mu, x, k, steps, block=250,
                burn_in=1000,
            )
        )(x0, jax.random.PRNGKey(1))
        res20 = jax.jit(
            lambda x, k: run_ulpda_fused(
                proxf, proxg, a_op, tau, mu, x, k, steps, block=250,
                burn_in=1000, niter_solve=20,
            )
        )(x0, jax.random.PRNGKey(1))
        p_d = float(psnr(img, res_d.moments.mean))
        p20 = float(psnr(img, res20.moments.mean))
        assert abs(p_d - p20) < 0.1, (p_d, p20)

    def test_psnr_parity_with_threefry_path(self):
        """Posterior-mean PSNR of the fused noisy ULPDA chain within 0.15 dB
        of the unfused threefry path (equivalent-but-distinct streams)."""
        from lmc_atomi_tpu.eval.metrics import psnr
        from lmc_atomi_tpu.kernels import ulpda
        from lmc_atomi_tpu.run.runner import run_chain

        img, blur, y, sigma, tau_ref, mu = _problem(n=256)
        proxf, proxg = _terms("tv", blur, y, sigma)
        a_op = Gradient2D()
        steps = 10000
        x0 = jnp.zeros_like(img)
        res_f = jax.jit(
            lambda x, k: run_ulpda_fused(
                proxf, proxg, a_op, tau_ref, mu, x, k, steps, block=250,
                burn_in=1000,
            )
        )(x0, jax.random.PRNGKey(1))
        kern = ulpda(proxf, proxg, a_op, tau=tau_ref, mu=mu)
        res_u = jax.jit(
            lambda x, k: run_chain(
                kern, x, k, steps, collect="stats", burn_in=1000
            )
        )(x0, jax.random.PRNGKey(1))
        p_f = float(psnr(img, res_f.moments.mean))
        p_u = float(psnr(img, res_u.moments.mean))
        assert abs(p_f - p_u) < 0.15, (p_f, p_u)


class TestWaveletDualDeconv:
    """dual="wl1": the fused ULPDA with the in-kernel interleaved Haar dual
    against the Mallat-layout unfused recursion (the l-inf clip commutes
    with the interleaved permutation, so x-sequences agree to gram-solver
    tolerance)."""

    @pytest.mark.parametrize("gfirst", [False, True])
    def test_parity_vs_reference_recursion(self, gfirst):
        from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

        img, blur, y, sigma, tau, mu = _problem(n=32)
        proxf = L2Data.create(op=blur, b=y, sigma=sigma)
        proxg = L1Norm(sigma=0.3)
        wav = HaarDWT2D(levels=3)
        n = 7
        want, _, _ = _reference_steps(
            proxf, proxg, wav, y, tau, mu, n, gfirst
        )
        res = run_ulpda_fused(
            proxf, proxg, wav, tau, mu, y, jax.random.PRNGKey(0), n,
            block=n, gfirst=gfirst, noise_scale=0.0, niter_solve=8,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(want),
            rtol=2e-4, atol=2e-5,
        )
        # single-field interleaved dual state
        assert res.final_state.extras.y.shape == (1,) + img.shape

    def test_supported_gating(self):
        from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

        img, blur, y, sigma, tau, mu = _problem(n=32)
        proxf = L2Data.create(op=blur, b=y, sigma=sigma)
        assert ulpda_fused_supported(
            proxf, L1Norm(sigma=0.3), HaarDWT2D(levels=3), img.shape,
            img.dtype,
        ) == ON_TPU
        # isotropic L21 has no wavelet-domain meaning: rejected
        assert not ulpda_fused_supported(
            proxf, L21Norm(sigma=0.3), HaarDWT2D(levels=3), img.shape,
            img.dtype,
        )

    def test_kernel_protocol_wrapper_blocks_match(self):
        """ulpda_sep_fused (1 step/call) equals run_ulpda_fused blocks."""
        from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

        img, blur, y, sigma, tau, mu = _problem(n=32)
        proxf = L2Data.create(op=blur, b=y, sigma=sigma)
        proxg = L1Norm(sigma=0.3)
        wav = HaarDWT2D(levels=2)
        kern = ulpda_sep_fused(
            proxf, proxg, wav, tau, mu, noise_scale=0.0, interpret=True,
        )
        st = kern.init(y)
        for i in range(4):
            st, _ = kern.step(st, jax.random.PRNGKey(i))
        res = run_ulpda_fused(
            proxf, proxg, wav, tau, mu, y, jax.random.PRNGKey(0), 4,
            block=2, noise_scale=0.0, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(st.position),
            np.asarray(res.final_state.position), rtol=1e-5, atol=1e-6,
        )


class TestLanePackedUlpda:
    """run_ulpda_fused_packed: deterministic per-chain parity with solo
    fused runs (cf. tests/test_myula_fused.py::TestLanePackedChains)."""

    @pytest.mark.parametrize("which", ["tv", "metv"])
    def test_parity(self, which):
        from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused_packed

        img, blur, y, sigma, tau, mu = _problem(n=32)
        proxf, proxg = _terms(which, blur, y, sigma)
        rng = np.random.default_rng(4)
        c = 4
        x0 = jnp.asarray(rng.normal(size=(c, 32, 32)).astype(np.float32))
        kw = dict(block=3, noise_scale=0.0, burn_in=1, interpret=True,
                  niter_solve=4)
        solo = [
            run_ulpda_fused(
                proxf, proxg, Gradient2D(), tau, mu, x0[i],
                jax.random.PRNGKey(9), 6, **kw,
            )
            for i in range(c)
        ]
        packed = run_ulpda_fused_packed(
            proxf, proxg, Gradient2D(), tau, mu, x0,
            jax.random.PRNGKey(9), 6, **kw,
        )
        for i in range(c):
            np.testing.assert_allclose(
                np.asarray(packed.final_state.position[i]),
                np.asarray(solo[i].final_state.position),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(packed.moments.mean[i]),
                np.asarray(solo[i].moments.mean),
                rtol=1e-5, atol=1e-6,
            )

    def test_wavelet_dual_rejected(self):
        from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused_packed
        from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

        img, blur, y, sigma, tau, mu = _problem(n=32)
        proxf = L2Data.create(op=blur, b=y, sigma=sigma)
        with pytest.raises(ValueError, match="lane packing"):
            run_ulpda_fused_packed(
                proxf, L1Norm(sigma=0.3), HaarDWT2D(levels=2), tau, mu,
                jnp.zeros((2, 32, 32)), jax.random.PRNGKey(0), 4,
                noise_scale=0.0, interpret=True,
            )
