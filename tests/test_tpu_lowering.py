"""AOT Mosaic lowering checks for every fused Pallas entry point.

Interpret-mode tests (the rest of the suite) exercise kernel SEMANTICS but
never the Mosaic TPU lowering pipeline, so a kernel can pass the whole CPU
suite and still fail to compile on the real chip (round 4 found exactly
that: `dynamic_slice` has no Mosaic TC lowering rule, and the HBM-paged P^2
pass used `lax.dynamic_slice_in_dim` with a static start — fine
interpreted, fatal on device). `jax.export` runs the full StableHLO +
Mosaic MLIR pipeline for platform "tpu" ON THE CPU HOST, so these tests
catch lowering regressions without needing hardware.

Shapes are small (64^2) — lowering cost is per-program, not per-element.
"""
import sys

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module", autouse=True)
def _deep_recursion():
    """jax.export recurses deeply over the scan-of-pallas_call jaxpr;
    pytest's own frames push that past the default 1000-frame limit.

    SCOPED, not module-global: a process-wide setrecursionlimit(20_000)
    let LATER deep-tracing tests (alphabetically after this file:
    test_ulpda_tiled, test_wavelet_fused — the two observed crash sites)
    recurse past the 8 MiB C stack and SIGSEGV the whole suite ~20 min
    in (round-4 verdict weak #1). Restoring the default re-arms Python's
    RecursionError guard for the rest of the run."""
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(20_000)
    yield
    sys.setrecursionlimit(old)

from lmc_atomi_tpu.ops.functionals import L1Norm, L21Norm, L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
from lmc_atomi_tpu.ops.ncvx_tv import L2NcvxTV
from lmc_atomi_tpu.utils.images import phantom

N = 64


def _lower_tpu(fn, *args):
    """Export `fn` for platform tpu — full Mosaic lowering, no device.

    x64 must be OFF here: TPUs have no f64, and under the suite's global
    x64 the export-time jaxpr cache keys nest deeply enough to blow the
    recursion limit (weak-type convert chains).
    """
    with jax.enable_x64(False):
        exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exported.mlir_module() is not None


@pytest.fixture(scope="module")
def deblur():
    img = jnp.asarray(phantom(N), jnp.float32)
    blur = CirculantBlur2D.from_kernel((N, N), uniform_kernel(5, jnp.float32))
    y = blur.matvec(img)
    l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
    return img, blur, y, l2


@pytest.fixture(scope="module")
def x0():
    return jnp.zeros((N, N), jnp.float32)


KEY = jax.random.PRNGKey(0)
GAMMA = 0.75**2
TAU = 0.2 * GAMMA


class TestFusedMyulaLowering:
    def test_tv_moments(self, deblur, x0):
        from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2
            ),
            x0, KEY,
        )

    def test_tv_warm_quantiles_vmem(self, deblur, x0):
        from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2,
                tv_warm=True, quantiles=(0.025, 0.975),
            ),
            x0, KEY,
        )

    def test_quantiles_marker_hbm(self, deblur, x0):
        """The HBM-paged P^2 marker path (round-4 regression: dynamic_slice
        in the band loop has no Mosaic lowering; must stay a static
        lax.slice)."""
        from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, TAU, GAMMA, x, k, 16, block=8, burn_in=4,
                quantiles=(0.025, 0.975), quantile_thin=2, marker_hbm=True,
            ),
            x0, KEY,
        )

    def test_fgp_solver(self, deblur, x0):
        from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_fused(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, niter_tv=8,
                tv_solver="fgp",
            ),
            x0, KEY,
        )

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_ncvx_modes(self, deblur, x0, which):
        from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused

        _, blur, y, _ = deblur
        nc = L2NcvxTV(
            op=blur, b=y, op2=Gradient2D() if which == "mctv" else None,
            sigma=1 / 0.75**2, lamda=0.3, gamma=2.0, niter_inner=4,
            isotropic=True,
        )
        _lower_tpu(
            lambda x, k: run_myula_tv_fused(
                nc, 0.3, TAU, GAMMA, x, k, 8, block=4,
                tv_warm=(which == "metv"),
            ),
            x0, KEY,
        )

    def test_packed(self, deblur):
        from lmc_atomi_tpu.kernels.myula_fused import (
            run_myula_tv_fused_packed,
        )

        _, _, _, l2 = deblur
        xp = jnp.zeros((2, N, N), jnp.float32)
        _lower_tpu(
            lambda x, k: run_myula_tv_fused_packed(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4
            ).moments.mean,
            xp, KEY,
        )


class TestTiledMyulaLowering:
    def test_tiled_moments(self, deblur, x0):
        from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_tiled(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2,
                band=16, halo=16, tv_solver="fgp", niter_tv=8,
            ).moments.mean,
            x0, KEY,
        )

    def test_tiled_quantiles(self, deblur, x0):
        """HBM-streamed markers under the DYNAMIC pl.when record guard —
        the lowering risk is conditional DMA, which interpret mode never
        exercises."""
        from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_tiled(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2,
                band=16, halo=16, quantiles=(0.025, 0.975),
                quantile_thin=2,
            ).moments.mean,
            x0, KEY,
        )

    def test_tiled_streamed(self, deblur, x0):
        """HBM-streamed x layout (stream_x=True, the 4096^2 path): the
        lowering risks are the tile DMA's <=2 wrap segments per band and
        the staged band write-back to the HBM parity buffer."""
        from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_tiled(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2,
                band=16, halo=16, tv_solver="fgp", niter_tv=8,
                stream_x=True,
            ).moments.mean,
            x0, KEY,
        )

    def test_tiled_streamed_quantiles(self, deblur, x0):
        """Streamed P^2 markers (x bands paged from the HBM parity
        buffer inside the marker pass) under the dynamic pl.when record
        guard — conditional DMA through the full Mosaic pipeline."""
        from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_myula_tv_tiled(
                l2, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2,
                band=16, halo=16, quantiles=(0.025, 0.975),
                quantile_thin=2, stream_x=True,
            ).moments.mean,
            x0, KEY,
        )

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_tiled_ncvx(self, deblur, x0, which):
        """Per-band concave corrections (round-5 extension) through the
        full Mosaic pipeline."""
        from lmc_atomi_tpu.kernels.myula_tiled import run_myula_tv_tiled

        _, blur, y, _ = deblur
        nc = L2NcvxTV(
            op=blur, b=y, op2=Gradient2D() if which == "mctv" else None,
            sigma=1 / 0.75**2, lamda=0.3, gamma=2.0, niter_inner=4,
            isotropic=True,
        )
        _lower_tpu(
            lambda x, k: run_myula_tv_tiled(
                nc, 0.3, TAU, GAMMA, x, k, 8, block=4, burn_in=2,
                band=16, halo=16, niter_tv=8,
            ).moments.mean,
            x0, KEY,
        )


class TestTiledUlpdaLowering:
    def test_tiled_moments(self, deblur, x0):
        from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_ulpda_tv_tiled(
                l2, L21Norm(sigma=0.3), Gradient2D(), 0.95 / l2.sigma, 1.0,
                x, k, 8, block=4, burn_in=2, niter_solve=3, band=16,
                halo=16,
            ).moments.mean,
            x0, KEY,
        )

    def test_tiled_streamed(self, deblur, x0):
        """HBM-streamed state layout (stream_x=True, the 2048^2+ path):
        lowering risks are the five-field tile DMA sets in the primal
        pass and the dual bands' read-modify-write staging."""
        from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_ulpda_tv_tiled(
                l2, L21Norm(sigma=0.3), Gradient2D(), 0.95 / l2.sigma, 1.0,
                x, k, 8, block=4, burn_in=2, niter_solve=3, band=16,
                halo=16, stream_x=True,
            ).moments.mean,
            x0, KEY,
        )

    def test_tiled_streamed_quantiles(self, deblur, x0):
        """Streamed markers + streamed state: conditional x-band DMA from
        the HBM parity buffer through the full Mosaic pipeline."""
        from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_ulpda_tv_tiled(
                l2, L21Norm(sigma=0.3), Gradient2D(), 0.95 / l2.sigma, 1.0,
                x, k, 8, block=4, burn_in=2, niter_solve=3, band=16,
                halo=16, quantiles=(0.025, 0.975), quantile_thin=2,
                stream_x=True,
            ).moments.mean,
            x0, KEY,
        )

    def test_tiled_quantiles(self, deblur, x0):
        """Persistent-dual band updates + HBM-streamed markers under the
        dynamic pl.when record guard, through the full Mosaic pipeline."""
        from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_ulpda_tv_tiled(
                l2, L21Norm(sigma=0.3), Gradient2D(), 0.95 / l2.sigma, 1.0,
                x, k, 8, block=4, burn_in=2, niter_solve=3, band=16,
                halo=16, quantiles=(0.025, 0.975), quantile_thin=2,
            ).moments.mean,
            x0, KEY,
        )

    @pytest.mark.parametrize("which", ["mctv", "metv"])
    def test_tiled_ncvx(self, deblur, x0, which):
        """Pre-solve concave corrections composed with the Chebyshev
        primal pass (round-5 extension), full Mosaic pipeline."""
        from lmc_atomi_tpu.kernels.ulpda_tiled import run_ulpda_tv_tiled

        _, blur, y, _ = deblur
        nc = L2NcvxTV(
            op=blur, b=y, op2=Gradient2D() if which == "mctv" else None,
            sigma=1 / 0.75**2, lamda=0.3, gamma=2.0, niter_inner=4,
            isotropic=True,
        )
        proxg = (L1Norm(sigma=0.3) if which == "mctv"
                 else L21Norm(sigma=0.3))
        # metv seam depth = niter_solve * oy + 1 + niter_inner + 1 = 18
        _lower_tpu(
            lambda x, k: run_ulpda_tv_tiled(
                nc, proxg, Gradient2D(), 0.95 / nc.sigma, 1.0,
                x, k, 8, block=4, burn_in=2, niter_solve=3, band=16,
                halo=16 if which == "mctv" else 24,
            ).moments.mean,
            x0, KEY,
        )


class TestFusedUlpdaLowering:
    def test_tv_dual(self, deblur, x0):
        from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused

        _, _, _, l2 = deblur
        _lower_tpu(
            lambda x, k: run_ulpda_fused(
                l2, L21Norm(sigma=0.3), Gradient2D(), 0.95 * 0.75**2, 1.0,
                x, k, 8, block=4, burn_in=2,
            ).moments.mean,
            x0, KEY,
        )

    def test_metv_env_warm(self, deblur, x0):
        from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused

        _, blur, y, _ = deblur
        nc = L2NcvxTV(
            op=blur, b=y, op2=None, sigma=1 / 0.75**2, lamda=0.3,
            gamma=2.0, niter_inner=4, isotropic=True,
        )
        _lower_tpu(
            lambda x, k: run_ulpda_fused(
                nc, L21Norm(sigma=0.3), Gradient2D(), 0.95 * 0.75**2, 1.0,
                x, k, 8, block=4, env_warm=True,
            ).final_state.position,
            x0, KEY,
        )

    def test_packed(self, deblur):
        from lmc_atomi_tpu.kernels.ulpda_fused import run_ulpda_fused_packed

        _, _, _, l2 = deblur
        xp = jnp.zeros((2, N, N), jnp.float32)
        _lower_tpu(
            lambda x, k: run_ulpda_fused_packed(
                l2, L21Norm(sigma=0.3), Gradient2D(), 0.95 * 0.75**2, 1.0,
                x, k, 8, block=4,
            ).moments.mean,
            xp, KEY,
        )


@pytest.fixture(scope="module")
def inpaint():
    from lmc_atomi_tpu.ops.linops import Mask

    key = jax.random.PRNGKey(5)
    km, ki = jax.random.split(key)
    img = jax.random.uniform(ki, (N, N), jnp.float32)
    mask = (jax.random.uniform(km, (N, N)) > 0.5).astype(jnp.float32)
    return L2Data(op=Mask(mask=mask), b=mask * img, sigma=100.0)


class TestFusedWaveletLowering:
    def test_myula_wavelet(self, inpaint, x0):
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            run_myula_wavelet_fused,
        )

        _lower_tpu(
            lambda x, k: run_myula_wavelet_fused(
                inpaint, 0.25, TAU, GAMMA, x, k, 8, levels=2, block=4,
                quantiles=(0.5,),
            ).moments.mean,
            x0, KEY,
        )

    @pytest.mark.parametrize("taps", [2, 4])
    def test_ulpda_wavelet(self, inpaint, x0, taps):
        from lmc_atomi_tpu.kernels.wavelet_fused import (
            run_ulpda_wavelet_fused,
        )

        _lower_tpu(
            lambda x, k: run_ulpda_wavelet_fused(
                inpaint, 0.25, 0.95 / inpaint.sigma, 1.0, x, k, 8,
                levels=2, block=4, taps=taps,
            ).final_state.position,
            x0, KEY,
        )
