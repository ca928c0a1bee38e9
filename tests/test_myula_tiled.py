"""Row-band tiled fused MYULA (kernels/myula_tiled.py) vs the whole-image
fused kernel: with noise off the two are the same deterministic map, so
trajectories and Welford moments must agree to accumulation roundoff —
this gates the halo width, the periodic wrap slicing, and the per-band
Neumann TV masks all at once (any of them wrong shows up as O(1) error
at a band seam, not 1e-4). In float64 the agreement is ~1e-13: the
tiling is EXACT, not approximate."""
import jax
import jax.numpy as jnp
import pytest

from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.kernels.myula_tiled import pick_band, run_myula_tv_tiled
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.utils.images import phantom

N = 128
TAU, GAMMA = 0.2 * 0.75**2, 0.75**2


def _problem(dtype):
    img = jnp.asarray(phantom(N), dtype)
    blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, dtype))
    y = blur.matvec(img)
    return L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)


def _run(fn, l2, dtype, **kw):
    return fn(
        l2, 0.3, TAU, GAMMA, jnp.zeros((N, N), dtype), jax.random.PRNGKey(1),
        12, block=6, burn_in=4, noise_scale=0.0, interpret=True, **kw,
    )


class TestTiledEquality:
    @pytest.mark.parametrize(
        "band,halo,solver,nt",
        [
            (32, 16, "chambolle", 10),
            (64, 16, "chambolle", 10),
            (32, 16, "fgp", 8),
            (64, 32, "fgp", 8),
        ],
    )
    def test_matches_whole_image_f32(self, band, halo, solver, nt):
        l2 = _problem(jnp.float32)
        ref = _run(run_myula_tv_fused, l2, jnp.float32,
                   tv_solver=solver, niter_tv=nt)
        out = _run(run_myula_tv_tiled, l2, jnp.float32, band=band, halo=halo,
                   tv_solver=solver, niter_tv=nt)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=5e-4
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=5e-4)
        assert int(out.moments.count) == int(ref.moments.count)
        assert jnp.allclose(out.moments.m2, ref.moments.m2, atol=5e-2)

    def test_exact_in_f64(self):
        l2 = _problem(jnp.float64)
        ref = _run(run_myula_tv_fused, l2, jnp.float64)
        out = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=1e-11
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=1e-11)
        assert jnp.allclose(out.moments.m2, ref.moments.m2, atol=1e-9)

    def test_exact_in_f64_halo_ge_band(self):
        """Regression (round-5 advisor finding): with halo >= band the
        image's Neumann boundary row lands inside an interior band's
        wrapped halo; the pre-fix _band_masks left its dual live there
        (3.2e-10 drift after 8 steps at ny=64, band=16, halo=24). The
        image-row mask must keep the tiling exact in this geometry."""
        N2 = 64
        img = jnp.asarray(phantom(N2), jnp.float64)
        blur = CirculantBlur2D.from_kernel(
            (N2, N2), uniform_kernel(5, jnp.float64))
        l2 = L2Data.create(op=blur, b=blur.matvec(img), sigma=1 / 0.75**2)
        kw = dict(niter_tv=16, burn_in=2, noise_scale=0.0, interpret=True)
        x0 = jnp.zeros((N2, N2), jnp.float64)
        ref = run_myula_tv_fused(
            l2, 0.3, TAU, GAMMA, x0, jax.random.PRNGKey(1), 8, block=4, **kw)
        out = run_myula_tv_tiled(
            l2, 0.3, TAU, GAMMA, x0, jax.random.PRNGKey(1), 8, block=4,
            band=16, halo=24, **kw)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=1e-12
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=1e-12)

    def test_block_segmentation_invariant(self):
        l2 = _problem(jnp.float64)
        a = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16)
        b = run_myula_tv_tiled(
            l2, 0.3, TAU, GAMMA, jnp.zeros((N, N), jnp.float64),
            jax.random.PRNGKey(1), 12, block=2, burn_in=4, noise_scale=0.0,
            interpret=True, band=32, halo=16,
        )
        assert jnp.allclose(
            a.final_state.position, b.final_state.position, atol=1e-12
        )
        assert jnp.allclose(a.moments.mean, b.moments.mean, atol=1e-12)
        assert jnp.allclose(a.moments.m2, b.moments.m2, atol=1e-10)

    def test_auto_band_halo(self):
        # defaults must produce a valid configuration at every size
        for ny in (128, 256, 512, 1024, 2048):
            band = pick_band(ny, 16)
            assert ny % band == 0 and ny // band >= 2
            assert band + 32 <= ny
        l2 = _problem(jnp.float32)
        out = _run(run_myula_tv_tiled, l2, jnp.float32)
        assert jnp.isfinite(out.moments.mean).all()

    @pytest.mark.parametrize("thin", [1, 2, 4])
    def test_quantiles_match_whole_image(self, thin):
        # HBM-streamed P^2 markers under the dynamic record guard: the
        # integer marker POSITIONS must match the whole-image kernel
        # exactly (same record steps, same P^2 branches); heights to x's
        # f32 accumulation roundoff
        l2 = _problem(jnp.float32)
        kw = dict(quantiles=(0.25, 0.75), quantile_thin=thin)
        ref = run_myula_tv_fused(
            l2, 0.3, TAU, GAMMA, jnp.zeros((N, N), jnp.float32),
            jax.random.PRNGKey(1), 16, block=8, burn_in=4, noise_scale=0.0,
            interpret=True, **kw,
        )
        out = run_myula_tv_tiled(
            l2, 0.3, TAU, GAMMA, jnp.zeros((N, N), jnp.float32),
            jax.random.PRNGKey(1), 16, block=8, burn_in=4, noise_scale=0.0,
            interpret=True, band=32, halo=16, **kw,
        )
        for p in (0.25, 0.75):
            assert jnp.allclose(out.quantiles[p], ref.quantiles[p],
                                atol=5e-4)
        assert jnp.array_equal(out.quantile_state[1], ref.quantile_state[1])
        assert jnp.allclose(out.quantile_state[0], ref.quantile_state[0],
                            atol=5e-4)

    def test_quantile_resume(self):
        # 8 + 8 steps with carried quantile_state == 16 straight
        l2 = _problem(jnp.float32)
        kw = dict(band=32, halo=16, burn_in=4, noise_scale=0.0,
                  interpret=True, quantiles=(0.5,))
        full = run_myula_tv_tiled(
            l2, 0.3, TAU, GAMMA, jnp.zeros((N, N), jnp.float32),
            jax.random.PRNGKey(1), 16, block=8, **kw,
        )
        a = run_myula_tv_tiled(
            l2, 0.3, TAU, GAMMA, jnp.zeros((N, N), jnp.float32),
            jax.random.PRNGKey(1), 8, block=8, **kw,
        )
        b = run_myula_tv_tiled(
            l2, 0.3, TAU, GAMMA, a.final_state.position,
            jax.random.PRNGKey(1), 8, block=8, step_offset=8,
            quantile_state=a.quantile_state, **kw,
        )
        assert jnp.array_equal(
            b.quantile_state[1], full.quantile_state[1]
        )
        assert jnp.allclose(
            b.quantile_state[0], full.quantile_state[0], atol=5e-4
        )

    def test_validation(self):
        l2 = _problem(jnp.float32)
        x0 = jnp.zeros((N, N), jnp.float32)
        key = jax.random.PRNGKey(0)
        with pytest.raises(ValueError, match="even"):
            run_myula_tv_tiled(l2, 0.3, TAU, GAMMA, x0, key, 13,
                               noise_scale=0.0, interpret=True)
        with pytest.raises(ValueError, match="halo"):
            run_myula_tv_tiled(l2, 0.3, TAU, GAMMA, x0, key, 12, halo=8,
                               noise_scale=0.0, interpret=True)
        with pytest.raises(ValueError, match="band"):
            run_myula_tv_tiled(l2, 0.3, TAU, GAMMA, x0, key, 12, band=100,
                               noise_scale=0.0, interpret=True)


class TestTiledNcvx:
    """Tiled MC-TV / ME-TV data terms (round-5 extension): with noise off
    the tiled kernel must reproduce the whole-image fused kernel's
    nonconvex trajectories exactly — this gates the per-band concave
    correction (2-row MC-TV stencil / cold ME-TV envelope prox) against
    the halo budget of _halo_need."""

    @staticmethod
    def _ncvx(which, dtype):
        from lmc_atomi_tpu.ops.linops import Gradient2D
        from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV

        img = jnp.asarray(phantom(N), dtype)
        blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, dtype))
        y = blur.matvec(img)
        op2 = Gradient2D() if which == "mctv" else None
        return L2NcvxTV(op=blur, b=y, op2=op2, sigma=1 / 0.75**2,
                        lamda=0.3, gamma=15.0, isotropic=True,
                        niter_inner=10)

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_matches_whole_image_f32(self, which):
        l2 = self._ncvx(which, jnp.float32)
        ref = _run(run_myula_tv_fused, l2, jnp.float32)
        out = _run(run_myula_tv_tiled, l2, jnp.float32, band=32, halo=16)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=5e-4
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=5e-4)
        assert int(out.moments.count) == int(ref.moments.count)

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_exact_in_f64(self, which):
        l2 = self._ncvx(which, jnp.float64)
        ref = _run(run_myula_tv_fused, l2, jnp.float64)
        out = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=1e-11
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=1e-11)
        assert jnp.allclose(out.moments.m2, ref.moments.m2, atol=1e-9)

    def test_metv_halo_validation(self):
        """ME-TV raises the halo floor to niter_inner + 1."""
        l2 = self._ncvx("metv", jnp.float32)
        x0 = jnp.zeros((N, N), jnp.float32)
        with pytest.raises(ValueError, match="halo"):
            run_myula_tv_tiled(
                l2, 0.3, TAU, GAMMA, x0, jax.random.PRNGKey(0), 12,
                niter_tv=4, halo=8, noise_scale=0.0, interpret=True,
            )


class TestStreamedX:
    """HBM-streamed x/atbs layout (stream_x=True) vs the resident tiled
    kernel: the band loop draws noise and applies updates in the same
    order, so the two layouts are the SAME chain — f64 agreement to
    accumulation roundoff gates the tile DMA (wrap segments), the atbs
    band slots, and the parity-buffer staging all at once."""

    def test_exact_in_f64(self):
        l2 = _problem(jnp.float64)
        res = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16,
                   stream_x=False)
        out = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16,
                   stream_x=True)
        assert jnp.allclose(
            out.final_state.position, res.final_state.position, atol=1e-12
        )
        assert jnp.allclose(out.moments.mean, res.moments.mean, atol=1e-12)
        assert jnp.allclose(out.moments.m2, res.moments.m2, atol=1e-10)
        assert int(out.moments.count) == int(res.moments.count)

    def test_matches_whole_image_f32(self):
        """Transitively: streamed == resident == whole-image kernel."""
        l2 = _problem(jnp.float32)
        ref = _run(run_myula_tv_fused, l2, jnp.float32)
        out = _run(run_myula_tv_tiled, l2, jnp.float32, band=32, halo=16,
                   stream_x=True)
        assert jnp.allclose(
            out.final_state.position, ref.final_state.position, atol=5e-4
        )
        assert jnp.allclose(out.moments.mean, ref.moments.mean, atol=5e-4)

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_ncvx_exact_in_f64(self, which):
        l2 = TestTiledNcvx._ncvx(which, jnp.float64)
        res = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16,
                   stream_x=False)
        out = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16,
                   stream_x=True)
        assert jnp.allclose(
            out.final_state.position, res.final_state.position, atol=1e-12
        )

    def test_wrap_segment_geometry(self):
        """band + 2*halo == ny: every tile wraps — both DMA segment
        branches (lo < 0 and lo + tile > ny) are exercised."""
        l2 = _problem(jnp.float64)
        res = _run(run_myula_tv_tiled, l2, jnp.float64, band=64, halo=32,
                   stream_x=False)
        out = _run(run_myula_tv_tiled, l2, jnp.float64, band=64, halo=32,
                   stream_x=True)
        assert jnp.allclose(
            out.final_state.position, res.final_state.position, atol=1e-12
        )

    def test_quantiles_match_resident_f64(self):
        """Streamed P^2 markers: the sample's bands ride the marker DMA
        slots from the HBM parity buffer (myula_fused._p2_hbm_pass
        x_ref/xq_s mode) — quantile maps and marker state must match the
        resident kernel to the chains' own program-level tolerance."""
        l2 = _problem(jnp.float64)
        res = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16,
                   stream_x=False, quantiles=(0.1, 0.9), quantile_thin=2)
        out = _run(run_myula_tv_tiled, l2, jnp.float64, band=32, halo=16,
                   stream_x=True, quantiles=(0.1, 0.9), quantile_thin=2)
        for p in (0.1, 0.9):
            assert jnp.allclose(out.quantiles[p], res.quantiles[p],
                                atol=1e-11)
        assert jnp.allclose(out.quantile_state[0], res.quantile_state[0],
                            atol=1e-11)
        assert jnp.allclose(out.quantile_state[1], res.quantile_state[1],
                            atol=1e-11)
