"""In-kernel P^2 streaming quantiles on the fused MYULA path.

Three layers of checks:
  1. the vectorized no-dynamic-indexing P^2 restatement
     (`kernels.myula_fused._p2_update`) reproduces
     `core.stats.RunningQuantile` exactly on random streams;
  2. the fused block kernel's quantile maps (interpret mode, noise off)
     match a RunningQuantile driven by the SAME trajectory, across block
     boundaries and segmented continuation (quantile_state + step_offset);
  3. (TPU) at 256^2 with real noise the fused 95% CI agrees statistically
     with the unfused threefry-path P^2 quantiles (round-3 VERDICT gate).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmc_atomi_tpu.core.stats import RunningQuantile
from lmc_atomi_tpu.kernels.myula_fused import _p2_update, run_myula_tv_fused
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom

ON_TPU = jax.default_backend() == "tpu"


@jax.jit
def _ref_stream(q0, xs):
    """Drive RunningQuantile over a stream under one jitted scan."""
    def body(q, x):
        return q.update(x), None

    q, _ = jax.lax.scan(body, q0, xs)
    return q


def _drive_p2(xs, p, dtype, ws=None):
    """Run the kernel-side recurrence on a stream of fields (jitted scan)."""
    xs = jnp.asarray(np.stack(xs), dtype)
    ws = (
        jnp.ones((xs.shape[0],), jnp.int32)
        if ws is None else jnp.asarray(ws, jnp.int32)
    )
    shape = xs.shape[1:]

    @jax.jit
    def run(xs, ws):
        qs = tuple(jnp.zeros(shape, dtype) for _ in range(5))
        ns = tuple(jnp.full(shape, float(i + 2), dtype) for i in range(3))

        def body(carry, xw):
            qs, ns, c = carry
            x, w = xw
            qs, ns = _p2_update(x, qs, ns, c, w, p)
            return (qs, ns, c + w), None

        (qs, ns, _), _ = jax.lax.scan(
            body, (qs, ns, jnp.zeros((), jnp.int32)), (xs, ws)
        )
        return qs[2]

    return run(xs, ws)


class TestP2Update:
    @pytest.mark.parametrize("p", [0.025, 0.25, 0.5, 0.9, 0.975])
    def test_matches_running_quantile(self, p, rng):
        xs = rng.normal(size=(120, 4, 8))
        dtype = jnp.float64
        got = _drive_p2(xs, p, dtype)
        ref = _ref_stream(
            RunningQuantile.init((4, 8), p, dtype), jnp.asarray(xs, dtype)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref.value), rtol=1e-12
        )

    def test_masked_observations_ignored(self, rng):
        xs = rng.normal(size=(30, 3, 3))
        dtype = jnp.float64
        ws = np.array([0] * 10 + [1] * 20)
        got = _drive_p2(xs, 0.5, dtype, ws=ws)
        ref = _ref_stream(
            RunningQuantile.init((3, 3), 0.5, dtype),
            jnp.asarray(xs[10:], dtype),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref.value), rtol=1e-12
        )

    def test_approximates_true_quantile(self, rng):
        xs = rng.normal(size=(4000, 2, 2))
        got = np.asarray(_drive_p2(xs, 0.9, jnp.float64))
        true = np.quantile(xs, 0.9, axis=0)
        np.testing.assert_allclose(got, true, atol=0.08)


def _problem(n=16, seed=0):
    img = jnp.asarray(phantom(n), jnp.float32)
    blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
    y = jax.jit(
        lambda im, k: blur.matvec(im)
        + 0.75 * jax.random.normal(k, (n, n), jnp.float32)
    )(img, jax.random.PRNGKey(seed))
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    gamma = 0.75**2
    tau = 0.2 * gamma
    return img, l2, tau, gamma


class TestFusedQuantiles:
    PS = (0.3, 0.8)

    def test_matches_running_quantile_on_same_trajectory(self):
        """Noise off: feed the fused chain's own per-step positions into
        RunningQuantile; the in-kernel maps must agree."""
        img, l2, tau, gamma = _problem()
        x0 = jnp.zeros_like(img)
        steps, burn = 14, 3
        res = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1), steps,
            block=7, burn_in=burn, noise_scale=0.0, quantiles=self.PS,
            interpret=not ON_TPU,
        )
        # replicate positions stepwise through the same fused kernel
        refs = {p: RunningQuantile.init(img.shape, p, jnp.float32)
                for p in self.PS}
        x = x0
        for i in range(steps):
            one = run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, jax.random.PRNGKey(1), 1,
                block=1, noise_scale=0.0, interpret=not ON_TPU,
            )
            x = one.final_state.position
            if i >= burn:
                refs = {p: q.update(x) for p, q in refs.items()}
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(res.quantiles[p]), np.asarray(refs[p].value),
                atol=2e-5,
            )
            assert int(refs[p].count) == steps - burn

    @pytest.mark.parametrize("thin", [2, 3])
    def test_thinned_quantiles_match_thinned_reference(self, thin):
        """quantile_thin=k records only every k-th post-burn step (static
        sub-step positions); the maps must equal a RunningQuantile driven
        by exactly those positions of the SAME trajectory."""
        img, l2, tau, gamma = _problem()
        x0 = jnp.zeros_like(img)
        steps, burn = 18 if thin == 3 else 16, 3
        res = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1), steps,
            block=6 if thin == 3 else 8, burn_in=burn, noise_scale=0.0,
            quantiles=self.PS, quantile_thin=thin, interpret=not ON_TPU,
        )
        refs = {p: RunningQuantile.init(img.shape, p, jnp.float32)
                for p in self.PS}
        x = x0
        for i in range(steps):
            one = run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, jax.random.PRNGKey(1), 1,
                block=1, noise_scale=0.0, interpret=not ON_TPU,
            )
            x = one.final_state.position
            if i >= burn and (i + 1) % thin == 0:
                refs = {p: q.update(x) for p, q in refs.items()}
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(res.quantiles[p]), np.asarray(refs[p].value),
                atol=2e-5,
            )

    def test_thin_misalignment_rejected(self):
        img, l2, tau, gamma = _problem()
        with pytest.raises(ValueError, match="multiple of the quantile"):
            run_myula_tv_fused(
                l2, 0.3, tau, gamma, jnp.zeros_like(img),
                jax.random.PRNGKey(1), 10, quantiles=self.PS,
                quantile_thin=4, noise_scale=0.0, interpret=not ON_TPU,
            )

    def test_segmented_continuation_matches_straight(self):
        """quantile_state + step_offset continue the P^2 stream across run
        calls exactly (noise off -> bit-comparable)."""
        img, l2, tau, gamma = _problem()
        x0 = jnp.zeros_like(img)
        kw = dict(noise_scale=0.0, quantiles=self.PS, interpret=not ON_TPU)
        straight = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1), 12,
            block=4, burn_in=2, **kw
        )
        a = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1), 8,
            block=4, burn_in=2, **kw
        )
        b = run_myula_tv_fused(
            l2, 0.3, tau, gamma, a.final_state.position,
            jax.random.PRNGKey(1), 4, block=4, burn_in=2,
            quantile_state=a.quantile_state, step_offset=8, **kw
        )
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(b.quantiles[p]),
                np.asarray(straight.quantiles[p]), atol=1e-6,
            )

    def test_resumable_fused_quantiles(self, tmp_path):
        """run_resumable_fused carries the P^2 stream through checkpointed
        segments and exposes the final CI maps."""
        from lmc_atomi_tpu.run.longrun import run_resumable_fused

        img, l2, tau, gamma = _problem()
        x0 = jnp.zeros_like(img)
        kw = dict(noise_scale=0.0, interpret=not ON_TPU, block=4,
                  quantiles=self.PS)
        straight = run_myula_tv_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1), 12, block=4,
            burn_in=2, noise_scale=0.0, quantiles=self.PS,
            interpret=not ON_TPU,
        )
        bundle = run_resumable_fused(
            l2, 0.3, tau, gamma, x0, jax.random.PRNGKey(1),
            total_steps=12, segment_steps=4, burn_in=2,
            ckpt_path=str(tmp_path / "q.ckpt"), **kw
        )
        for p in self.PS:
            # segments compile as separate XLA programs -> ulp-level f32
            # trajectory drift vs the single-program straight run; the
            # markers inherit it (values are O(100) image intensities)
            np.testing.assert_allclose(
                np.asarray(bundle["quantiles"][p]),
                np.asarray(straight.quantiles[p]), rtol=1e-6, atol=1e-4,
            )


@pytest.mark.skipif(not ON_TPU, reason="needs a real TPU")
class TestFusedQuantilesTPU:
    def test_ci_agrees_with_unfused_p2_256(self):
        """95% CI maps from the fused in-kernel P^2 vs the unfused threefry
        path at 256^2 (distinct-but-equivalent noise streams): the CI
        widths must agree within MC error."""
        from lmc_atomi_tpu.kernels import myula_imaging
        from lmc_atomi_tpu.ops.functionals import TVNorm
        from lmc_atomi_tpu.run.runner import run_chain

        img, l2, tau, gamma = _problem(n=256)
        steps, burn = 10000, 1000
        ps = (0.025, 0.975)
        x0 = jnp.zeros_like(img)
        res_f = jax.jit(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, tau, gamma, x, k, steps, block=250, burn_in=burn,
                quantiles=ps,
            )
        )(x0, jax.random.PRNGKey(1))
        kern = myula_imaging(
            l2, TVNorm(sigma=0.3, niter=10), tau=tau, gamma=gamma
        )
        res_u = jax.jit(
            lambda x, k: run_chain(
                kern, x, k, steps, collect="stats", quantile_ps=ps,
                burn_in=burn,
            )
        )(x0, jax.random.PRNGKey(1))
        w_f = np.asarray(res_f.quantiles[0.975] - res_f.quantiles[0.025])
        w_u = np.asarray(
            res_u.quantiles[0.975].value - res_u.quantiles[0.025].value
        )
        # CI widths are O(posterior std); mean widths must agree to a few %
        assert abs(w_f.mean() - w_u.mean()) < 0.05 * w_u.mean(), (
            w_f.mean(), w_u.mean()
        )
        # and pixelwise agreement within MC error of the width itself
        med = np.median(np.abs(w_f - w_u))
        assert med < 0.2 * w_u.mean(), (med, w_u.mean())


class TestWaveletFusedQuantiles:
    """In-kernel P^2 stream on the fused wavelet-l1 MYULA kernel
    (kernels/wavelet_fused.py), same contract as the TV kernel's."""

    PS = (0.25, 0.75)

    def _problem(self, n=16, levels=2):
        from lmc_atomi_tpu.ops.linops import Mask

        key = jax.random.PRNGKey(0)
        km, kn, ki = jax.random.split(key, 3)
        img = jax.random.uniform(ki, (n, n), jnp.float32)
        mask = (jax.random.uniform(km, (n, n)) > 0.5).astype(jnp.float32)
        y = mask * img + 0.1 * mask * jax.random.normal(
            kn, (n, n), jnp.float32
        )
        l2 = L2Data(op=Mask(mask=mask), b=y, sigma=1.0 / 0.1**2)
        return l2, levels

    def test_matches_running_quantile_on_same_trajectory(self):
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            run_myula_wavelet_fused,
        )

        l2, levels = self._problem()
        gamma = 0.1**2
        tau = 0.2 * gamma
        steps, burn = 12, 3
        res = run_myula_wavelet_fused(
            l2, 0.25, tau, gamma, l2.b, jax.random.PRNGKey(1), steps,
            levels=levels, block=6, burn_in=burn, noise_scale=0.0,
            quantiles=self.PS, interpret=not ON_TPU,
        )
        refs = {p: RunningQuantile.init(l2.b.shape, p, jnp.float32)
                for p in self.PS}
        x = l2.b
        for i in range(steps):
            one = run_myula_wavelet_fused(
                l2, 0.25, tau, gamma, x, jax.random.PRNGKey(1), 1,
                levels=levels, block=1, noise_scale=0.0,
                interpret=not ON_TPU,
            )
            x = one.final_state.position
            if i >= burn:
                refs = {p: q.update(x) for p, q in refs.items()}
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(res.quantiles[p]), np.asarray(refs[p].value),
                atol=2e-5,
            )

    def test_segmented_continuation_matches_straight(self):
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            run_myula_wavelet_fused,
        )

        l2, levels = self._problem()
        gamma = 0.1**2
        tau = 0.2 * gamma
        kw = dict(levels=levels, noise_scale=0.0, quantiles=self.PS,
                  interpret=not ON_TPU)
        straight = run_myula_wavelet_fused(
            l2, 0.25, tau, gamma, l2.b, jax.random.PRNGKey(1), 12,
            block=6, burn_in=2, **kw
        )
        a = run_myula_wavelet_fused(
            l2, 0.25, tau, gamma, l2.b, jax.random.PRNGKey(1), 7,
            block=7, burn_in=2, **kw
        )
        b = run_myula_wavelet_fused(
            l2, 0.25, tau, gamma, a.final_state.position,
            jax.random.PRNGKey(1), 5, block=5, burn_in=2,
            step_offset=7, quantile_state=a.quantile_state, **kw
        )
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(b.quantiles[p]),
                np.asarray(straight.quantiles[p]), atol=2e-5,
            )

    def test_ulpda_wavelet_quantiles_match_trajectory(self):
        """Same P^2 contract on the fused wavelet-DUAL ULPDA kernel: the
        in-kernel maps equal RunningQuantile driven by the UNFUSED ulpda
        chain's positions (deterministic x-sequences agree by the
        layout-invariance parity), and are block-size invariant."""
        from lmc_atomi_tpu.kernels.imaging import ulpda
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            run_ulpda_wavelet_fused,
        )
        from lmc_atomi_tpu.ops.functionals import L1Norm
        from lmc_atomi_tpu.ops.wavelet import HaarDWT2D
        from lmc_atomi_tpu.run.runner import run_chain

        l2, levels = self._problem()
        tau, mu = 0.95 / l2.sigma, 1.0
        steps, burn = 10, 2
        res = run_ulpda_wavelet_fused(
            l2, 0.25, tau, mu, l2.b, jax.random.PRNGKey(1), steps,
            levels=levels, block=5, burn_in=burn, noise_scale=0.0,
            quantiles=self.PS, interpret=not ON_TPU,
        )
        kern = ulpda(
            l2, L1Norm(sigma=0.25), HaarDWT2D(levels=levels), tau, mu,
            gfirst=False, noise_scale=0.0,
        )
        traj = run_chain(
            kern, l2.b, jax.random.PRNGKey(0), steps, collect="samples"
        ).samples
        refs = {p: RunningQuantile.init(l2.b.shape, p, jnp.float32)
                for p in self.PS}
        for i in range(steps):
            if i >= burn:
                refs = {p: q.update(traj[i]) for p, q in refs.items()}
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(res.quantiles[p]), np.asarray(refs[p].value),
                atol=2e-4,
            )
        # block-size invariance
        grow = run_ulpda_wavelet_fused(
            l2, 0.25, tau, mu, l2.b, jax.random.PRNGKey(1), steps,
            levels=levels, block=1, burn_in=burn, noise_scale=0.0,
            quantiles=self.PS, interpret=not ON_TPU,
        )
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(res.quantiles[p]), np.asarray(grow.quantiles[p]),
                atol=2e-5,
            )
