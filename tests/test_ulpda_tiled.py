"""Row-band tiled fused ULPDA (kernels/ulpda_tiled.py) vs the whole-image
fused kernel: with noise off the two are the same deterministic
primal-dual map, so trajectories, duals, extrapolated iterates, and
Welford moments must agree to accumulation roundoff — this gates the
persistent-dual in-place band updates, the stored-zeros Neumann
invariant behind the plain periodic divergence, and the Chebyshev halo
width all at once. In float64 the agreement is ~1e-11: the tiling is
EXACT, not approximate."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmc_atomi_tpu.core.stats import RunningQuantile
from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused
from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled
from lmc_atomi_tpu.ops.functionals import L1Norm, L21Norm, L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom

N = 64
NITER_SOLVE = 3  # halo >= 3 * 4 + 1 -> 16, so 64^2 fits two 32-row bands


def _problem(dtype):
    img = jnp.asarray(phantom(N), dtype)
    blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, dtype))
    y = blur.matvec(img)
    sigma = 1 / 0.75**2
    tau = 0.95 / sigma
    proxf = L2Data.create(op=blur, b=y, sigma=sigma)
    return img, proxf, tau, 1.0


def _run(fn, proxf, proxg, dtype, tau, mu, **kw):
    return fn(
        proxf, proxg, Gradient2D(), tau, mu, jnp.zeros((N, N), dtype),
        jax.random.PRNGKey(1), 12, niter_solve=NITER_SOLVE, block=6,
        burn_in=4, noise_scale=0.0, interpret=True, **kw,
    )


class TestTiledEquality:
    @pytest.mark.parametrize("gfirst", [False, True])
    @pytest.mark.parametrize("dual_norm", ["l21", "l1"])
    def test_matches_whole_image_f32(self, gfirst, dual_norm):
        img, proxf, tau, mu = _problem(jnp.float32)
        proxg = (L21Norm(sigma=0.3) if dual_norm == "l21"
                 else L1Norm(sigma=0.3))
        ref = _run(run_ulpda_fused, proxf, proxg, jnp.float32, tau, mu,
                   gfirst=gfirst)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float32, tau, mu,
                   gfirst=gfirst, band=32, halo=16)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=5e-4
        )
        assert jnp.allclose(
            out.final_state.extras.xbar, ref.final_state.extras.xbar,
            atol=2e-3,
        )
        assert jnp.allclose(
            out.final_state.extras.y, ref.final_state.extras.y, atol=5e-5
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=5e-4)
        assert int(out.moments.count) == int(ref.moments.count)
        assert jnp.allclose(out.moments.m2, ref.moments.m2, atol=5e-2)

    @pytest.mark.parametrize("gfirst", [False, True])
    def test_exact_in_f64(self, gfirst):
        img, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        ref = _run(run_ulpda_fused, proxf, proxg, jnp.float64, tau, mu,
                   gfirst=gfirst)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   gfirst=gfirst, band=32, halo=16)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=1e-11
        )
        assert jnp.allclose(
            out.final_state.extras.y, ref.final_state.extras.y, atol=1e-12
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=1e-11)
        assert jnp.allclose(out.moments.m2, ref.moments.m2, atol=1e-9)

    def test_block_segmentation_invariant(self):
        img, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        a = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                 band=32, halo=16)
        b = run_ulpda_tv_tiled(
            proxf, proxg, Gradient2D(), tau, mu, jnp.zeros((N, N),
            jnp.float64), jax.random.PRNGKey(1), 12,
            niter_solve=NITER_SOLVE, block=2, burn_in=4, noise_scale=0.0,
            interpret=True, band=32, halo=16,
        )
        assert jnp.allclose(
            a.final_state.position, b.final_state.position, atol=1e-12
        )
        assert jnp.allclose(a.moments.mean, b.moments.mean, atol=1e-12)
        assert jnp.allclose(
            a.final_state.extras.y, b.final_state.extras.y, atol=1e-12
        )


class TestTiledQuantiles:
    PS = (0.3, 0.8)

    def test_matches_running_quantile_on_same_trajectory(self):
        """Noise off, f64, quantile_thin=2: the in-kernel P^2 maps must
        equal RunningQuantile fed the chain's own recorded positions.
        With thin=2 the record steps are the odd global steps g (x after
        2, 4, ... chain steps), which are exactly the boundary positions
        of a 2-step-segment resume of the same deterministic chain — so
        the reference stream is available without storing sub-block
        iterates."""
        img, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        steps, burn, thin = 14, 3, 2
        x0 = jnp.zeros((N, N), jnp.float64)
        res = run_ulpda_tv_tiled(
            proxf, proxg, Gradient2D(), tau, mu, x0, jax.random.PRNGKey(1),
            steps, niter_solve=NITER_SOLVE, block=14, burn_in=burn,
            noise_scale=0.0, interpret=True, band=32, halo=16,
            quantiles=self.PS, quantile_thin=thin,
        )
        refs = {p: RunningQuantile.init(img.shape, p, jnp.float64)
                for p in self.PS}
        x, y, xbar = x0, None, None
        for k in range(steps // 2):
            seg = run_ulpda_tv_tiled(
                proxf, proxg, Gradient2D(), tau, mu, x,
                jax.random.PRNGKey(1), 2, niter_solve=NITER_SOLVE,
                block=2, burn_in=burn, noise_scale=0.0, interpret=True,
                band=32, halo=16, y0=y, xbar0=xbar, step_offset=2 * k,
            )
            x = seg.final_state.position
            y = seg.final_state.extras.y
            xbar = seg.final_state.extras.xbar
            if 2 * k + 1 >= burn:  # weight of the segment's last step
                refs = {p: q.update(x) for p, q in refs.items()}
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(res.quantiles[p]), np.asarray(refs[p].value),
                atol=1e-10,
            )

    def test_thinned_and_segmented_quantiles_consistent(self):
        """Marker state rides the block carry: one 14-step block equals
        7 x 2-step blocks exactly (f64)."""
        img, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        x0 = jnp.zeros((N, N), jnp.float64)
        kw = dict(niter_solve=NITER_SOLVE, burn_in=3, noise_scale=0.0,
                  interpret=True, band=32, halo=16, quantiles=self.PS)
        a = run_ulpda_tv_tiled(
            proxf, proxg, Gradient2D(), tau, mu, x0, jax.random.PRNGKey(1),
            14, block=14, **kw,
        )
        b = run_ulpda_tv_tiled(
            proxf, proxg, Gradient2D(), tau, mu, x0, jax.random.PRNGKey(1),
            14, block=2, **kw,
        )
        for p in self.PS:
            np.testing.assert_allclose(
                np.asarray(a.quantiles[p]), np.asarray(b.quantiles[p]),
                atol=1e-12,
            )


class TestTiledNcvx:
    """Tiled MC-TV / ME-TV data terms (round-5 extension): the concave
    correction composes with the divergence roll BEFORE the Chebyshev
    solve, so its seam depth adds to the solver's (_ulpda_halo_need);
    noise-free parity with the whole-image fused kernel gates that
    accounting."""

    @staticmethod
    def _ncvx(which, dtype):
        from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV

        img = jnp.asarray(phantom(N), dtype)
        blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, dtype))
        y = blur.matvec(img)
        op2 = Gradient2D() if which == "mctv" else None
        proxg = L1Norm(sigma=0.3) if which == "mctv" else L21Norm(sigma=0.3)
        proxf = L2NcvxTV(op=blur, b=y, op2=op2, sigma=1 / 0.75**2,
                         lamda=0.3, gamma=15.0, isotropic=True,
                         niter_inner=10)
        tau = 0.95 * 0.75**2
        return proxf, proxg, tau, 1.0

    @pytest.mark.parametrize("which,band,halo", [
        ("mctv", 32, 16),   # need 3*2 + 1 + 2 = 9
        ("metv", 16, 24),   # need 3*2 + 1 + 11 = 18
    ])
    def test_matches_whole_image_f32(self, which, band, halo):
        proxf, proxg, tau, mu = self._ncvx(which, jnp.float32)
        ref = _run(run_ulpda_fused, proxf, proxg, jnp.float32, tau, mu)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float32, tau, mu,
                   band=band, halo=halo)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=5e-4
        )
        assert jnp.allclose(
            out.final_state.extras.y, ref.final_state.extras.y, atol=5e-5
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=5e-4)

    @pytest.mark.parametrize("which,band,halo", [
        ("mctv", 32, 16),
        ("metv", 16, 24),
    ])
    def test_exact_in_f64(self, which, band, halo):
        proxf, proxg, tau, mu = self._ncvx(which, jnp.float64)
        ref = _run(run_ulpda_fused, proxf, proxg, jnp.float64, tau, mu)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=band, halo=halo)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=1e-11
        )
        assert jnp.allclose(
            out.final_state.extras.y, ref.final_state.extras.y, atol=1e-12
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=1e-11)

    def test_metv_halo_validation(self):
        """ME-TV's inner prox raises the halo floor past the solver's."""
        proxf, proxg, tau, mu = self._ncvx("metv", jnp.float32)
        with pytest.raises(ValueError, match="halo"):
            _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float32, tau, mu,
                 band=32, halo=16)


class TestStreamedX:
    """HBM-streamed state layout (stream_x=True, the 2048^2+ path — the
    resident layout's 9 whole-image VMEM windows measured 176-191M at
    2048^2, over the core for every band): same chain as the resident
    kernel. The parity tolerance is the documented cross-compile-context
    bound, NOT roundoff: XLA re-fuses the two kernel bodies differently
    at ~1 ulp and the non-contractive theta-extrapolated iteration
    amplifies it (CLAUDE.md round-5 notes) — streamed-vs-streamed at
    different block sizes IS bitwise equal (gated below), so the layout
    itself is exact."""

    @pytest.mark.parametrize("gfirst", [False, True])
    @pytest.mark.parametrize("dual_norm", ["l21", "l1"])
    def test_matches_resident_f64(self, gfirst, dual_norm):
        _, proxf, tau, mu = _problem(jnp.float64)
        proxg = (L21Norm(sigma=0.3) if dual_norm == "l21"
                 else L1Norm(sigma=0.3))
        res = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=16, halo=16, gfirst=gfirst, stream_x=False)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=16, halo=16, gfirst=gfirst, stream_x=True)
        assert jnp.allclose(
            out.final_state.position, res.final_state.position, atol=1e-9
        )
        assert jnp.allclose(
            out.final_state.extras.y, res.final_state.extras.y, atol=1e-9
        )
        assert jnp.allclose(out.moments.mean, res.moments.mean, atol=1e-9)
        assert int(out.moments.count) == int(res.moments.count)

    def test_streamed_block_invariance_bitwise(self):
        """Within the streamed program family the chain is EXACT: block=6
        and block=12 (different scan/fori splits of the same 12 steps)
        must agree bitwise — this isolates the layout from the
        compile-context noise the resident comparison is subject to."""
        _, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        a = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                 band=16, halo=16, stream_x=True)
        b = run_ulpda_tv_tiled(
            proxf, proxg, Gradient2D(), tau, mu,
            jnp.zeros((N, N), jnp.float64), jax.random.PRNGKey(1), 12,
            niter_solve=NITER_SOLVE, block=12, burn_in=4, noise_scale=0.0,
            interpret=True, band=16, halo=16, stream_x=True,
        )
        assert float(jnp.max(jnp.abs(
            a.final_state.position - b.final_state.position))) == 0.0
        assert float(jnp.max(jnp.abs(
            a.final_state.extras.y - b.final_state.extras.y))) == 0.0

    def test_wrap_segment_geometry(self):
        """band + 2*halo == ny: every tile wraps — both DMA segment
        branches exercised in both passes."""
        _, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        res = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=32, halo=16, stream_x=False)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=32, halo=16, stream_x=True)
        assert jnp.allclose(
            out.final_state.position, res.final_state.position, atol=1e-9
        )

    def test_quantiles_match_resident_f64(self):
        """Streamed P^2 markers: sample bands ride the marker DMA slots
        from the HBM parity buffer; maps must match the resident kernel
        to the chains' cross-compile tolerance."""
        _, proxf, tau, mu = _problem(jnp.float64)
        proxg = L21Norm(sigma=0.3)
        res = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=16, halo=16, stream_x=False,
                   quantiles=(0.1, 0.9), quantile_thin=2)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=16, halo=16, stream_x=True,
                   quantiles=(0.1, 0.9), quantile_thin=2)
        for p in (0.1, 0.9):
            assert jnp.allclose(out.quantiles[p], res.quantiles[p],
                                atol=1e-9)
        assert jnp.allclose(out.quantile_state[0], res.quantile_state[0],
                            atol=1e-9)

    @pytest.mark.parametrize("which,band,halo", [
        ("mctv", 16, 16),
        ("metv", 16, 24),  # metv halo floor: 3*2 + 1 + (10+1) -> 24
    ])
    def test_ncvx_matches_resident_f64(self, which, band, halo):
        proxf, proxg, tau, mu = TestTiledNcvx._ncvx(which, jnp.float64)
        res = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=band, halo=halo, stream_x=False)
        out = _run(run_ulpda_tv_tiled, proxf, proxg, jnp.float64, tau, mu,
                   band=band, halo=halo, stream_x=True)
        assert jnp.allclose(
            out.final_state.position, res.final_state.position, atol=1e-9
        )
        assert jnp.allclose(
            out.final_state.extras.y, res.final_state.extras.y, atol=1e-9
        )
