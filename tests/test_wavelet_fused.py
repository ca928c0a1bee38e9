"""Fused wavelet-l1 MYULA kernel (kernels/wavelet_fused.py), interpret mode.

Checks: the interleaved in-kernel Haar DWT is orthogonal and its prox is
EXACTLY the Mallat-layout prox (layout invariance through the elementwise
soft-threshold); the fused chain matches the unfused
``myula_imaging(L2Data(Mask), OrthogonalL1(HaarDWT2D))`` step-for-step in
the deterministic (noise_scale=0) setting; Welford moments and burn-in
masking agree with the runner.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

ON_TPU = jax.default_backend() == "tpu"

from lmc_atomi_tpu.kernels.wavelet_fused import (
    haar_interleaved,
    haar_interleaved_inv,
    run_myula_wavelet_fused,
    run_ulpda_wavelet_fused,
)
from lmc_atomi_tpu.ops.functionals import L1Norm, L2Data, OrthogonalL1
from lmc_atomi_tpu.ops.linops import Mask
from lmc_atomi_tpu.ops.wavelet import HaarDWT2D


def _problem(n=32, levels=3, seed=0, lam=0.25, sigma=0.1):
    key = jax.random.PRNGKey(seed)
    km, kn, ki = jax.random.split(key, 3)
    img = jax.random.uniform(ki, (n, n), jnp.float32)
    mask = (jax.random.uniform(km, (n, n)) > 0.5).astype(jnp.float32)
    y = mask * img + sigma * mask * jax.random.normal(kn, (n, n), jnp.float32)
    l2 = L2Data(op=Mask(mask=mask), b=y, sigma=1.0 / sigma**2)
    wav = OrthogonalL1(op=HaarDWT2D(levels=levels), sigma=lam)
    return l2, wav, img


class TestInterleavedHaar:
    def test_roundtrip_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
        for levels in (1, 2, 3, 4):
            c = haar_interleaved(x, levels)
            back = haar_interleaved_inv(c, levels)
            np.testing.assert_allclose(
                np.asarray(back), np.asarray(x), atol=1e-5
            )

    def test_orthogonal_norm_preserved(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (32, 32))
        c = haar_interleaved(x, 3)
        np.testing.assert_allclose(
            float(jnp.sum(c * c)), float(jnp.sum(x * x)), rtol=1e-6
        )

    def test_matches_mallat_up_to_permutation(self):
        """Interleaved W = P @ W_mallat: the coefficient MULTISET equals
        HaarDWT2D's (sorted values agree)."""
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 16))
        for levels in (1, 2, 3):
            ci = np.sort(np.asarray(haar_interleaved(x, levels)).ravel())
            cm = np.sort(
                np.asarray(HaarDWT2D(levels=levels).matvec(x)).ravel()
            )
            np.testing.assert_allclose(ci, cm, atol=1e-5)

    def test_prox_layout_invariance(self):
        """W^T soft(W x) is identical for the interleaved and Mallat
        transforms (soft-threshold commutes with the permutation)."""
        x = jax.random.normal(jax.random.PRNGKey(4), (32, 32))
        wav = OrthogonalL1(op=HaarDWT2D(levels=3), sigma=0.3)
        want = wav.prox(x, 0.7)
        thr = 0.7 * 0.3
        c = haar_interleaved(x, 3)
        got = haar_interleaved_inv(
            jnp.sign(c) * jnp.maximum(jnp.abs(c) - thr, 0.0), 3
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )

    def test_odd_sized_levels_skip(self):
        # 24 = 8*3: only 3 halvings possible; deeper requests must not break
        x = jax.random.normal(jax.random.PRNGKey(5), (24, 24))
        c = haar_interleaved(x, 5)
        back = haar_interleaved_inv(c, 5)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=1e-5)


class TestFusedWaveletMyula:
    def test_deterministic_parity_vs_unfused(self):
        """noise_scale=0: the fused block chain equals the unfused
        myula_imaging chain step-for-step."""
        l2, wav, _ = _problem(n=32, levels=3)
        gamma = 0.1**2
        tau = 0.2 * gamma
        base = jax.random.PRNGKey(9)
        n = 6
        # deterministic reference: the myula_imaging recursion at xi=0
        x_ref = l2.b
        for i in range(n):
            p = wav.prox(x_ref, gamma)
            x_ref = (
                (1 - tau / gamma) * x_ref - tau * l2.grad(x_ref)
                + (tau / gamma) * p
            )
        res = run_myula_wavelet_fused(
            l2, wav.sigma, tau, gamma, l2.b, base, n,
            block=3, noise_scale=0.0, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(x_ref),
            rtol=2e-5, atol=2e-6,
        )

    def test_welford_moments_match_runner_semantics(self):
        """Fused in-kernel Welford (with burn-in) equals NumPy moments of
        the deterministic trajectory."""
        l2, wav, _ = _problem(n=16, levels=2)
        gamma, burn = 0.05, 3
        tau = 0.2 * gamma
        n = 8
        xs = []
        x = l2.b
        for i in range(n):
            p = wav.prox(x, gamma)
            x = (
                (1 - tau / gamma) * x - tau * l2.grad(x)
                + (tau / gamma) * p
            )
            xs.append(np.asarray(x))
        res = run_myula_wavelet_fused(
            l2, wav.sigma, tau, gamma, l2.b, jax.random.PRNGKey(0), n,
            levels=2, block=4, burn_in=burn, noise_scale=0.0,
            interpret=True,
        )
        kept = np.stack(xs[burn:])
        np.testing.assert_allclose(
            np.asarray(res.moments.mean), kept.mean(0), rtol=1e-5,
            atol=1e-6,
        )
        assert int(res.moments.count) == n - burn

    @pytest.mark.skipif(not ON_TPU, reason="on-core PRNG needs a real TPU")
    def test_noise_chain_is_finite_and_contracts(self):
        """With noise: chain stays finite and the posterior mean improves
        on the masked observation (PSNR up).

        Needs the experiment-scale prior weight (inpainting.py tau_w=5.0):
        at the _problem default lam=0.25 the masked pixels are nearly
        unconstrained (data weight 100 vs prior 0.25) and the TRUE posterior
        marginal std is ~0.5, so even the exact (unfused, jax.random) chain's
        400-step mean sits below the observation PSNR — verified against
        kernels/imaging.py::ulpda at identical settings."""
        from lmc_atomi_tpu.eval.metrics import psnr

        l2, wav, img = _problem(n=32, levels=3, lam=5.0)
        gamma = 0.1**2
        tau = 0.2 * gamma
        res = run_myula_wavelet_fused(
            l2, wav.sigma, tau, gamma, l2.b, jax.random.PRNGKey(1), 400,
            block=100, burn_in=100, interpret=not ON_TPU,
        )
        mean = res.moments.mean
        assert np.isfinite(np.asarray(mean)).all()
        assert float(psnr(img, mean)) > float(psnr(img, l2.b))


class TestFusedWaveletUlpda:
    """run_ulpda_wavelet_fused vs the unfused generic-operator ULPDA
    (kernels/imaging.py::ulpda) on the Mallat-layout HaarDWT2D — the
    x-sequence is layout-independent (clip commutes with the interleaved
    permutation), so deterministic parity is to fp tolerance."""

    def _unfused_traj(self, l2, lam, levels, tau, mu, x0, n, gfirst):
        from lmc_atomi_tpu.kernels.imaging import ulpda
        from lmc_atomi_tpu.run.runner import run_chain

        kern = ulpda(
            l2, L1Norm(sigma=lam), HaarDWT2D(levels=levels), tau, mu,
            gfirst=gfirst, noise_scale=0.0,
        )
        return run_chain(
            kern, x0, jax.random.PRNGKey(0), n, collect="samples"
        )

    @pytest.mark.parametrize("gfirst", [False, True])
    def test_deterministic_parity_vs_unfused(self, gfirst):
        l2, wav, _ = _problem(n=32, levels=3)
        lips = l2.sigma
        tau, mu = 0.95 / lips, 1.0
        n = 7  # odd: exercises the per-step (non-paired) body
        res_u = self._unfused_traj(
            l2, wav.sigma, 3, tau, mu, l2.b, n, gfirst
        )
        res_f = run_ulpda_wavelet_fused(
            l2, wav.sigma, tau, mu, l2.b, jax.random.PRNGKey(0), n,
            levels=3, block=n, gfirst=gfirst, noise_scale=0.0,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(res_f.final_state.position),
            np.asarray(res_u.samples[-1]),
            rtol=2e-5, atol=2e-6,
        )

    def test_block_boundaries_are_seamless(self):
        """Splitting the same deterministic chain across blocks changes
        nothing (dual + xbar carried through block boundaries)."""
        l2, wav, _ = _problem(n=16, levels=2)
        tau, mu = 0.95 / l2.sigma, 1.0
        one = run_ulpda_wavelet_fused(
            l2, wav.sigma, tau, mu, l2.b, jax.random.PRNGKey(0), 8,
            levels=2, block=8, noise_scale=0.0, interpret=True,
        )
        split = run_ulpda_wavelet_fused(
            l2, wav.sigma, tau, mu, l2.b, jax.random.PRNGKey(0), 8,
            levels=2, block=2, noise_scale=0.0, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(split.final_state.position),
            np.asarray(one.final_state.position), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(split.moments.mean), np.asarray(one.moments.mean),
            rtol=1e-6,
        )

    def test_welford_moments_match_trajectory(self):
        l2, wav, _ = _problem(n=16, levels=2)
        tau, mu = 0.95 / l2.sigma, 1.0
        n, burn = 8, 3
        res_u = self._unfused_traj(l2, wav.sigma, 2, tau, mu, l2.b, n, False)
        res_f = run_ulpda_wavelet_fused(
            l2, wav.sigma, tau, mu, l2.b, jax.random.PRNGKey(0), n,
            levels=2, block=4, burn_in=burn, noise_scale=0.0,
            interpret=True,
        )
        kept = np.asarray(res_u.samples)[burn:]
        np.testing.assert_allclose(
            np.asarray(res_f.moments.mean), kept.mean(0), rtol=1e-5,
            atol=1e-6,
        )
        assert int(res_f.moments.count) == n - burn

    @pytest.mark.skipif(not ON_TPU, reason="on-core PRNG needs a real TPU")
    def test_noise_chain_is_finite_and_contracts(self):
        """With noise: chain stays finite and the posterior mean improves
        on the masked observation (PSNR up). Experiment-scale prior weight
        (lam=5.0) — see the MYULA twin's docstring for why the _problem
        default is statistically unwinnable for ANY correct chain."""
        from lmc_atomi_tpu.eval.metrics import psnr

        l2, wav, img = _problem(n=32, levels=3, lam=5.0)
        res = run_ulpda_wavelet_fused(
            l2, wav.sigma, 0.95 / l2.sigma, 1.0, l2.b,
            jax.random.PRNGKey(1), 400, block=100, burn_in=100,
            interpret=not ON_TPU,
        )
        mean = res.moments.mean
        assert np.isfinite(np.asarray(mean)).all()
        assert float(psnr(img, mean)) > float(psnr(img, l2.b))


class TestInterleavedDaubechies:
    """dwt_interleaved: the general-tap (D4/D8) periodic filter bank in
    interleaved layout — coefficient VALUES equal the Mallat transform's
    (multiset identity), roundtrip exact, Haar special case consistent."""

    @pytest.mark.parametrize("taps", [4, 8])
    def test_multiset_equals_mallat_and_roundtrip(self, taps):
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            dwt_interleaved,
            dwt_interleaved_inv,
        )
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D

        x = jax.random.normal(jax.random.PRNGKey(2), (32, 32))
        for levels in (1, 2, 3):
            ci = dwt_interleaved(x, taps, levels)
            cm = DaubechiesDWT2D(taps=taps, levels=levels).matvec(x)
            np.testing.assert_allclose(
                np.sort(np.asarray(ci).ravel()),
                np.sort(np.asarray(cm).ravel()), atol=1e-5,
            )
            back = dwt_interleaved_inv(ci, taps, levels)
            np.testing.assert_allclose(
                np.asarray(back), np.asarray(x), atol=1e-5
            )

    def test_haar_taps2_dispatch(self):
        from lmc_atomi_tpu.kernels.wavelet_fused import dwt_interleaved

        x = jax.random.normal(jax.random.PRNGKey(3), (16, 16))
        np.testing.assert_allclose(
            np.asarray(dwt_interleaved(x, 2, 2)),
            np.asarray(haar_interleaved(x, 2)), atol=1e-6,
        )

    @pytest.mark.parametrize("taps", [4, 8])
    def test_prox_layout_invariance(self, taps):
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            dwt_interleaved,
            dwt_interleaved_inv,
        )
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D

        x = jax.random.normal(jax.random.PRNGKey(4), (32, 32))
        wav = OrthogonalL1(op=DaubechiesDWT2D(taps=taps, levels=3),
                           sigma=0.3)
        want = wav.prox(x, 0.7)
        thr = 0.7 * 0.3
        c = dwt_interleaved(x, taps, 3)
        got = dwt_interleaved_inv(
            jnp.sign(c) * jnp.maximum(jnp.abs(c) - thr, 0.0), taps, 3
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6
        )

    @pytest.mark.parametrize("taps", [4, 8])
    def test_fused_myula_parity_d4_d8(self, taps):
        """Deterministic fused MYULA with the D4/D8 prior equals the
        unfused myula_imaging recursion."""
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D

        l2, _, _ = _problem(n=32, levels=2)
        wav = OrthogonalL1(op=DaubechiesDWT2D(taps=taps, levels=2),
                           sigma=0.25)
        gamma = 0.1**2
        tau = 0.2 * gamma
        n = 5
        x_ref = l2.b
        for _ in range(n):
            p = wav.prox(x_ref, gamma)
            x_ref = (
                (1 - tau / gamma) * x_ref - tau * l2.grad(x_ref)
                + (tau / gamma) * p
            )
        res = run_myula_wavelet_fused(
            l2, wav.sigma, tau, gamma, l2.b, jax.random.PRNGKey(0), n,
            levels=2, taps=taps, block=n, noise_scale=0.0, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(res.final_state.position), np.asarray(x_ref),
            rtol=2e-5, atol=2e-6,
        )

    def test_fused_ulpda_parity_d4(self):
        """Deterministic fused wavelet-dual ULPDA with D4 equals the
        unfused generic-operator ULPDA."""
        from lmc_atomi_tpu.kernels.imaging import ulpda
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D
        from lmc_atomi_tpu.run.runner import run_chain

        l2, wav, _ = _problem(n=32, levels=2)
        d4 = DaubechiesDWT2D(taps=4, levels=2)
        tau, mu = 0.95 / l2.sigma, 1.0
        n = 6
        kern = ulpda(
            l2, L1Norm(sigma=wav.sigma), d4, tau, mu, gfirst=False,
            noise_scale=0.0,
        )
        res_u = run_chain(
            kern, l2.b, jax.random.PRNGKey(0), n, collect="samples"
        )
        res_f = run_ulpda_wavelet_fused(
            l2, wav.sigma, tau, mu, l2.b, jax.random.PRNGKey(0), n,
            levels=2, taps=4, block=n, noise_scale=0.0, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(res_f.final_state.position),
            np.asarray(res_u.samples[-1]), rtol=2e-5, atol=2e-6,
        )
