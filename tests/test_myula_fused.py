"""Fully fused MYULA block kernel: separable-gram factorization, interpret-
mode parity with the unfused spectral path, in-kernel Welford equivalence,
and (TPU-only) on-core noise statistics + PSNR parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmc_atomi_tpu.kernels import myula_imaging
from lmc_atomi_tpu.kernels.myula_fused import (
    myula_imaging_sep_fused,
    run_myula_tv_fused,
    separable_gram_taps,
)
from lmc_atomi_tpu.ops.functionals import L2Data, TVNorm
from lmc_atomi_tpu.ops.linops import (
    CirculantBlur2D,
    gaussian_kernel,
    uniform_kernel,
)
from lmc_atomi_tpu.utils.images import phantom

ON_TPU = jax.default_backend() == "tpu"


def _problem(n=64, ksize=5, kind="uniform", seed=0):
    img = jnp.asarray(phantom(n), jnp.float32)
    h = (
        uniform_kernel(ksize, jnp.float32)
        if kind == "uniform"
        else gaussian_kernel(ksize, 1.0, jnp.float32)
    )
    blur = CirculantBlur2D.from_kernel((n, n), h)
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + 0.75 * jax.random.normal(k, (n, n), jnp.float32)
    )(img, jax.random.PRNGKey(seed))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    gamma = 0.75**2
    tau = 0.2 * gamma
    return img, blur, y, l2, tau, gamma


class TestSeparableTaps:
    def test_uniform_rank1(self):
        blur = CirculantBlur2D.from_kernel((32, 32), uniform_kernel(5))
        taps = separable_gram_taps(blur.hh)
        assert len(taps) == 1
        rec = sum(np.outer(wy, wx) for wy, wx in taps)
        np.testing.assert_allclose(rec, np.asarray(blur.hh), atol=1e-7)

    def test_gaussian_rank1(self):
        blur = CirculantBlur2D.from_kernel((32, 32), gaussian_kernel(7, 1.3))
        taps = separable_gram_taps(blur.hh)
        assert len(taps) == 1
        rec = sum(np.outer(wy, wx) for wy, wx in taps)
        np.testing.assert_allclose(rec, np.asarray(blur.hh), atol=1e-7)

    def test_nonseparable_full_rank_reconstructs(self):
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.uniform(0.1, 1.0, (3, 3)).astype(np.float32))
        blur = CirculantBlur2D.from_kernel((16, 16), h / h.sum())
        taps = separable_gram_taps(blur.hh)
        assert len(taps) >= 2  # generic kernels are not rank-1
        rec = sum(np.outer(wy, wx) for wy, wx in taps)
        np.testing.assert_allclose(rec, np.asarray(blur.hh), atol=1e-6)


class TestDeterministicParity:
    """noise off, interpret mode: the fused step must match the unfused
    spectral-gradient + XLA-Chambolle step to f32 tolerance."""

    @pytest.mark.parametrize("kind", ["uniform", "gaussian"])
    def test_single_step(self, kind):
        img, blur, y, l2, tau, gamma = _problem(kind=kind)
        tv = TVNorm(sigma=0.3, niter=10)
        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=img.shape).astype(np.float32)
        )
        want = (
            (1 - tau / gamma) * x0
            - tau * l2.grad(x0)
            + (tau / gamma) * tv.prox(x0, gamma)
        )
        kern = myula_imaging_sep_fused(
            l2, 0.3, tau, gamma, noise_scale=0.0, interpret=not ON_TPU
        )
        st, _ = kern.step(kern.init(x0), jax.random.PRNGKey(2))
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(
            np.asarray(st.position), np.asarray(want),
            atol=3e-5 * max(scale, 1.0),
        )

    def test_block_driver_matches_stepwise_and_welford(self):
        img, blur, y, l2, tau, gamma = _problem()
        tv = TVNorm(sigma=0.3, niter=10)
        x0 = jnp.zeros_like(img)
        res = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(3), 9,
            block=4, noise_scale=0.0, burn_in=2, interpret=not ON_TPU,
        )
        xs = x0
        means = []
        for i in range(9):
            xs = (
                (1 - tau / gamma) * xs
                - tau * l2.grad(xs)
                + (tau / gamma) * tv.prox(xs, gamma)
            )
            if i >= 2:
                means.append(np.asarray(xs))
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(xs), atol=3e-3
        )
        assert int(res.moments.count) == 7
        m = np.mean(means, axis=0)
        v = np.var(means, axis=0, ddof=1)
        np.testing.assert_allclose(
            np.asarray(res.moments.mean), m, atol=2e-3 * max(1, abs(m).max())
        )
        np.testing.assert_allclose(
            np.asarray(res.moments.variance), v,
            atol=1e-2 * max(1.0, v.max()),
        )


class TestFgpSolver:
    """tv_solver="fgp": the fused projected-dual FGP prox must equal the
    unfused ops/tv.py::prox_tv_iso_proj recursion step-for-step (noise
    off, interpret mode), at the production FGP-8 trip count."""

    def test_deterministic_parity_vs_unfused_proj(self):
        from lmc_atomi_tpu.ops.tv import prox_tv_iso_proj

        img, blur, y, l2, tau, gamma = _problem()
        tvg = 0.3 * gamma
        x_ref = jnp.zeros_like(img)
        for _ in range(6):
            p = prox_tv_iso_proj(x_ref, tvg, niter=8, step=0.125)
            x_ref = (
                (1 - tau / gamma) * x_ref
                - tau * l2.grad(x_ref)
                + (tau / gamma) * p
            )
        res = run_myula_tv_fused(
            l2, 0.3, tau, gamma, jnp.zeros_like(img), jax.random.PRNGKey(0),
            6, block=3, noise_scale=0.0, niter_tv=8, tv_solver="fgp",
            interpret=not ON_TPU,
        )
        scale = float(jnp.abs(x_ref).max())
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(x_ref),
            atol=3e-5 * max(scale, 1.0),
        )

    def test_fgp8_posterior_step_close_to_chambolle10(self):
        """One FGP-8 MYULA step stays within prox-error distance of the
        cold Chambolle-10 step (same argument, solvers agree to ~relerr)."""
        img, blur, y, l2, tau, gamma = _problem()
        x0 = jnp.asarray(
            np.random.default_rng(7).normal(size=img.shape).astype(np.float32)
        )
        a = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(0), 1, block=1,
            noise_scale=0.0, niter_tv=8, tv_solver="fgp",
            interpret=not ON_TPU,
        ).final_state.position
        b = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(0), 1, block=1,
            noise_scale=0.0, niter_tv=10, interpret=not ON_TPU,
        ).final_state.position
        # the two one-step states differ only by (tau/gamma) * prox gap
        gap = float(jnp.linalg.norm(a - b)) / float(jnp.linalg.norm(b))
        assert gap < 2e-3, gap


class TestWarmTV:
    """tv_warm carries the Chambolle dual across steps: the fused chain must
    match a NumPy replica of the warm recursion (noise off), and warm-5 must
    land within prox-error distance of the cold-10 chain."""

    def test_matches_numpy_warm_recursion(self):
        img, blur, y, l2, tau, gamma = _problem()
        tvg = 0.3 * gamma
        x0 = jnp.zeros_like(img)
        res = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(3), 6,
            block=6, niter_tv=3, noise_scale=0.0, tv_warm=True,
            interpret=not ON_TPU,
        )

        def grad2d(a):
            dy = np.zeros_like(a); dy[:-1] = a[1:] - a[:-1]
            dx = np.zeros_like(a); dx[:, :-1] = a[:, 1:] - a[:, :-1]
            return dy, dx

        def div2d(py, px):
            o = py - np.roll(py, 1, 0); o[0] = py[0]; o[-1] = -py[-2]
            b = px - np.roll(px, 1, 1); b[:, 0] = px[:, 0]
            b[:, -1] = -px[:, -2]
            return o + b

        def prox_tv_warm(a, g, niter, p0):
            py, px = p0
            for _ in range(niter):
                u = div2d(py, px) - a / g
                gy, gx = grad2d(u)
                mag = np.sqrt(gy * gy + gx * gx)
                py = (py + 0.25 * gy) / (1 + 0.25 * mag)
                px = (px + 0.25 * gx) / (1 + 0.25 * mag)
            return a - g * div2d(py, px), (py, px)

        x = np.zeros(img.shape, np.float64)
        dual = (np.zeros_like(x), np.zeros_like(x))
        for _ in range(6):
            p, dual = prox_tv_warm(x, tvg, 3, dual)
            x = (
                (1 - tau / gamma) * x
                - tau * np.asarray(l2.grad(jnp.asarray(x, jnp.float32)),
                                   np.float64)
                + (tau / gamma) * p
            )
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), x,
            atol=3e-4 * max(1.0, np.abs(x).max()),
        )

    def test_warm5_close_to_cold10(self):
        img, blur, y, l2, tau, gamma = _problem()
        x0 = jnp.zeros_like(img)
        cold = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(3), 20,
            block=10, niter_tv=10, noise_scale=0.0, interpret=not ON_TPU,
        )
        warm = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(3), 20,
            block=10, niter_tv=5, noise_scale=0.0, tv_warm=True,
            interpret=not ON_TPU,
        )
        scale = max(1.0, float(jnp.abs(cold.final_state.position).max()))
        err = float(
            jnp.abs(warm.final_state.position - cold.final_state.position)
            .max()
        )
        assert err < 2e-3 * scale, err


class TestNonconvexParity:
    """Fused MC-TV / ME-TV data-term gradients (isotropic L2NcvxTV) must
    match the unfused XLA kernel step exactly (noise off, interpret mode)."""

    def _ncvx(self, which, blur, y):
        from lmc_atomi_tpu.ops.linops import Gradient2D
        from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV

        return L2NcvxTV(
            op=blur, b=y, op2=Gradient2D() if which == "mctv" else None,
            sigma=1 / 0.75**2, lamda=0.3, gamma=15.0, isotropic=True,
            niter_inner=10,
        )

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_single_step(self, which):
        img, blur, y, l2, tau, gamma = _problem()
        nc = self._ncvx(which, blur, y)
        tv = TVNorm(sigma=0.3, niter=10)
        x0 = jnp.asarray(
            np.random.default_rng(4).normal(size=img.shape).astype(np.float32)
        )
        want = (
            (1 - tau / gamma) * x0
            - tau * nc.grad(x0)
            + (tau / gamma) * tv.prox(x0, gamma)
        )
        kern = myula_imaging_sep_fused(
            nc, 0.3, tau, gamma, noise_scale=0.0, interpret=not ON_TPU
        )
        st, _ = kern.step(kern.init(x0), jax.random.PRNGKey(5))
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(
            np.asarray(st.position), np.asarray(want),
            atol=3e-5 * max(scale, 1.0),
        )

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_block_driver_multistep(self, which):
        img, blur, y, l2, tau, gamma = _problem()
        nc = self._ncvx(which, blur, y)
        tv = TVNorm(sigma=0.3, niter=10)
        x0 = jnp.zeros_like(img)
        res = run_myula_tv_fused(
            nc, 0.3, tau, gamma, x0, jax.random.PRNGKey(6), 6,
            block=3, noise_scale=0.0, interpret=not ON_TPU,
        )
        xs = x0
        for _ in range(6):
            xs = (
                (1 - tau / gamma) * xs
                - tau * nc.grad(xs)
                + (tau / gamma) * tv.prox(xs, gamma)
            )
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(xs), atol=3e-3
        )

    def test_anisotropic_rejected(self):
        img, blur, y, l2, tau, gamma = _problem()
        from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV

        nc = L2NcvxTV(op=blur, b=y, op2=None, sigma=1.0, lamda=0.3,
                      gamma=15.0, isotropic=False)
        with pytest.raises(ValueError, match="isotropic"):
            myula_imaging_sep_fused(nc, 0.3, tau, gamma, noise_scale=0.0)


@pytest.mark.skipif(not ON_TPU, reason="on-core PRNG needs a real TPU")
class TestFusedNoiseTPU:
    def test_noise_statistics(self):
        """x=0, atbs=0, tv off: output = sqrt(2 tau) xi — KS vs N(0,1)."""
        from scipy import stats

        from lmc_atomi_tpu.kernels.myula_fused import myula_tv_block_update

        n, tau = 256, 0.5
        zeros = jnp.zeros((n, n), jnp.float32)
        scal_f = jnp.asarray([tau, 1.0, 0.3, 1.0, 1.0], jnp.float32)
        scal_i = jnp.zeros((3,), jnp.int32)
        out, _, _, _, _ = myula_tv_block_update(
            zeros, zeros, zeros, zeros, jnp.asarray([11, 5], jnp.int32),
            scal_f, scal_i, taps=(((1.0,), (1.0,)),), oy=0, ox=0,
            n_steps=1, niter_tv=0, with_noise=True, with_stats=True,
        )
        xi = np.asarray(out).ravel() / np.sqrt(2 * tau)
        assert abs(xi.mean()) < 0.02
        assert abs(xi.std() - 1.0) < 0.02
        # KS test on a subsample (full 65536 points over-powers KS)
        ks = stats.kstest(xi[::7][:8192], "norm")
        assert ks.pvalue > 1e-3, f"KS p={ks.pvalue}"

    def test_warm5_vs_cold10_psnr_512(self):
        """Warm-started 5-trip TV dual vs the reference's cold 10-trip prox
        at the 512^2 flagship scale: posterior-mean PSNR must agree within
        0.05 dB (the bench reports warm5 as a labelled extra row on this
        guarantee; reference prox semantics: prox_lmc_deconv.py:122)."""
        from lmc_atomi_tpu.eval.metrics import psnr

        img, blur, y, l2, tau, gamma = _problem(n=512)
        steps = 20000
        x0 = jnp.zeros_like(img)
        cold = jax.jit(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, steps, block=500, niter_tv=10
            )
        )(x0, jax.random.PRNGKey(1))
        warm = jax.jit(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, steps, block=500, niter_tv=5,
                tv_warm=True,
            )
        )(x0, jax.random.PRNGKey(1))
        p_c = float(psnr(img, cold.moments.mean))
        p_w = float(psnr(img, warm.moments.mean))
        assert abs(p_c - p_w) < 0.05, (p_c, p_w)

    def test_psnr_parity_with_threefry_path(self):
        """Posterior-mean PSNR of the fused path within 0.1 dB of the
        unfused threefry path (different-but-equivalent noise streams)."""
        from lmc_atomi_tpu.eval.metrics import psnr
        from lmc_atomi_tpu.run.runner import run_chain

        img, blur, y, l2, tau, gamma = _problem(n=256)
        steps = 10000  # enough samples that stream-to-stream MC error < gate
        x0 = jnp.zeros_like(img)
        res_f = jax.jit(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, steps, block=250
            )
        )(x0, jax.random.PRNGKey(1))
        kern = myula_imaging(
            l2, TVNorm(sigma=0.3, niter=10), tau=tau, gamma=gamma
        )
        res_u = jax.jit(
            lambda x, k: run_chain(kern, x, k, steps, collect="stats")
        )(x0, jax.random.PRNGKey(1))
        p_f = float(psnr(img, res_f.moments.mean))
        p_u = float(psnr(img, res_u.moments.mean))
        assert abs(p_f - p_u) < 0.1, (p_f, p_u)


class TestLanePackedChains:
    """run_myula_tv_fused_packed: C chains side-by-side along the lane axis
    in ONE kernel instance. Deterministic parity: each packed chain's
    recursion equals its solo single-chain fused run exactly (the periodic
    column masks keep the TV stencils chain-local; the dual-roll select
    keeps the gram circulant per chain)."""

    def _solo_and_packed(self, n=32, c=2, n_steps=6, mode="tv",
                         quantiles=(), tv_warm=False):
        from lmc_atomi_tpu.kernels.myula_fused import (
            run_myula_tv_fused_packed,
        )

        img, blur, y, l2, tau, gamma = _problem(n=n)
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.normal(size=(c, n, n)).astype(np.float32))
        kw = dict(
            niter_tv=5, block=3, noise_scale=0.0, burn_in=1,
            interpret=not ON_TPU, quantiles=quantiles, tv_warm=tv_warm,
        )
        solo = [
            run_myula_tv_fused(
                l2, 0.3, tau, gamma, x0[i], jax.random.PRNGKey(7), n_steps,
                **kw,
            )
            for i in range(c)
        ]
        packed = run_myula_tv_fused_packed(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(7), n_steps, **kw
        )
        return solo, packed

    @pytest.mark.parametrize("c", [2, 4])
    def test_deterministic_parity_positions_and_moments(self, c):
        solo, packed = self._solo_and_packed(c=c)
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
        assert int(packed.moments.count) == int(solo[0].moments.count)

    def test_parity_with_warm_dual_and_quantiles(self):
        solo, packed = self._solo_and_packed(
            c=2, quantiles=(0.5,), tv_warm=True
        )
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(packed.final_state.position[i]),
                np.asarray(solo[i].final_state.position),
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(packed.quantiles[0.5][i]),
                np.asarray(solo[i].quantiles[0.5]),
                rtol=1e-5, atol=1e-6,
            )

    def test_packed_gram_matches_spectral(self):
        """The dual-roll packed gram equals CirculantBlur2D.gram_matvec on
        each chain (pure-jnp _sep_gram via the interpret-free path)."""
        from lmc_atomi_tpu.kernels.myula_fused import _sep_gram

        class _Roll:
            @staticmethod
            def roll(v, s, axis):
                return jnp.roll(v, s, axis)

        n, c = 32, 4
        _, blur, *_ = _problem(n=n)
        taps = separable_gram_taps(blur.hh)
        oy, ox = blur.hh.shape[0] // 2, blur.hh.shape[1] // 2
        rng = np.random.default_rng(3)
        xs = jnp.asarray(rng.normal(size=(c, n, n)).astype(np.float32))
        packed = jnp.concatenate([xs[i] for i in range(c)], axis=1)
        got = _sep_gram(packed, taps, oy, ox, _Roll, chain_nx=n)
        for i in range(c):
            want = blur.gram_matvec(xs[i])
            np.testing.assert_allclose(
                np.asarray(got[:, i * n:(i + 1) * n]), np.asarray(want),
                rtol=2e-4, atol=2e-5,
            )

    def test_non_power_of_two_chain_width(self):
        """Packing is mask-based (true modulo, not bit tricks): 3 chains of
        width 24 (72 lanes) still match solo runs."""
        from lmc_atomi_tpu.kernels.myula_fused import (
            run_myula_tv_fused_packed,
        )

        img, blur, y, l2, tau, gamma = _problem(n=24)
        rng = np.random.default_rng(6)
        x0 = jnp.asarray(rng.normal(size=(3, 24, 24)).astype(np.float32))
        kw = dict(niter_tv=4, block=5, noise_scale=0.0, interpret=True)
        solo = [
            run_myula_tv_fused(
                l2, 0.3, tau, gamma, x0[i], jax.random.PRNGKey(7), 5, **kw
            )
            for i in range(3)
        ]
        packed = run_myula_tv_fused_packed(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(7), 5, **kw
        )
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(packed.final_state.position[i]),
                np.asarray(solo[i].final_state.position),
                rtol=1e-5, atol=1e-6,
            )


class TestMarkerHBM:
    """HBM-paged P^2 marker state (``marker_hbm=True``): the quantile
    markers stream through double-buffered VMEM row bands instead of
    living whole in VMEM — required past 512^2 where the in-VMEM marker
    windows exceed the core. The recurrence must be EXACTLY the in-VMEM
    kernel's (same observations, same parabolic updates)."""

    def _run(self, marker_hbm, thin=1, n_steps=24, resume_at=None, n=32):
        img, blur, y, l2, tau, gamma = _problem(n=n)
        kw = dict(
            niter_tv=4, block=8, burn_in=4, noise_scale=0.0,
            interpret=not ON_TPU, quantiles=(0.025, 0.5, 0.975),
            quantile_thin=thin, marker_hbm=marker_hbm,
        )
        if resume_at is None:
            return run_myula_tv_fused(
                l2, 0.3, tau, gamma, jnp.zeros((n, n)),
                jax.random.PRNGKey(3), n_steps, **kw
            )
        r1 = run_myula_tv_fused(
            l2, 0.3, tau, gamma, jnp.zeros((n, n)),
            jax.random.PRNGKey(3), resume_at, **kw
        )
        return run_myula_tv_fused(
            l2, 0.3, tau, gamma, r1.final_state.position,
            jax.random.PRNGKey(3), n_steps - resume_at,
            quantile_state=r1.quantile_state, step_offset=resume_at, **kw
        )

    @pytest.mark.parametrize("thin", [1, 4])
    def test_exact_parity_with_in_vmem_markers(self, thin):
        r_v = self._run(False, thin=thin)
        r_h = self._run(True, thin=thin)
        for p, q in r_v.quantiles.items():
            np.testing.assert_array_equal(
                np.asarray(q), np.asarray(r_h.quantiles[p])
            )
        np.testing.assert_array_equal(
            np.asarray(r_v.moments.mean), np.asarray(r_h.moments.mean)
        )
        np.testing.assert_array_equal(
            np.asarray(r_v.quantile_state[1]),
            np.asarray(r_h.quantile_state[1]),
        )

    def test_segmented_resume_matches_single_run(self):
        whole = self._run(True, thin=4, n_steps=24)
        seg = self._run(True, thin=4, n_steps=24, resume_at=8)
        for p, q in whole.quantiles.items():
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(seg.quantiles[p]),
                rtol=1e-6, atol=1e-7,
            )

    def test_multiband_image_uses_multiple_bands(self):
        # 256 rows -> band 128, two bands: exercises the double-buffer
        # slot hand-off (in/out DMA overlap across bands)
        r_v = self._run(False, thin=4, n=256, n_steps=8)
        r_h = self._run(True, thin=4, n=256, n_steps=8)
        np.testing.assert_array_equal(
            np.asarray(r_v.quantiles[0.5]), np.asarray(r_h.quantiles[0.5])
        )
