"""Wavelet and Radon operator tests: orthogonality, adjointness, inversion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmc_atomi_tpu.ops.linops import dot_test
from lmc_atomi_tpu.ops.radon import Radon2D
from lmc_atomi_tpu.ops.wavelet import HaarDWT2D

KEY = jax.random.PRNGKey(0)


def test_haar_orthogonal_roundtrip():
    op = HaarDWT2D(levels=3)
    x = jax.random.normal(KEY, (32, 32), jnp.float64)
    c = op.matvec(x)
    # Parseval: energy preserved
    np.testing.assert_allclose(
        float(jnp.sum(c * c)), float(jnp.sum(x * x)), rtol=1e-10
    )
    # perfect reconstruction
    np.testing.assert_allclose(np.asarray(op.rmatvec(c)), np.asarray(x), atol=1e-12)
    # adjoint == inverse for an orthogonal transform
    lhs, rhs = dot_test(op, KEY, (32, 32))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_haar_sparsifies_piecewise_constant():
    op = HaarDWT2D(levels=3)
    x = jnp.zeros((32, 32), jnp.float64).at[8:24, 8:24].set(1.0)
    c = np.asarray(op.matvec(x))
    frac_small = np.mean(np.abs(c) < 1e-10)
    assert frac_small > 0.8  # most coefficients exactly zero


def test_haar_constant_image_single_coeff():
    op = HaarDWT2D(levels=2)
    x = jnp.full((16, 16), 3.0, jnp.float64)
    c = np.asarray(op.matvec(x))
    # all energy in the approximation corner; each 2-D level scales the
    # approximation by 2, so sum(LL) = 3 * 2^L * (n/2^L)^2 = 192
    assert abs(c[:4, :4].sum() - 192.0) < 1e-9
    assert np.abs(c[4:, :]).max() < 1e-10
    assert np.abs(c[:, 4:]).max() < 1e-10


def test_radon_adjoint_exact():
    op = Radon2D.create((24, 24), n_angles=12, dtype=jnp.float64)
    x = jax.random.normal(KEY, (24, 24), jnp.float64)
    sino = op.matvec(x)
    y = jax.random.normal(jax.random.PRNGKey(1), sino.shape, jnp.float64)
    lhs = jnp.vdot(sino, y)
    rhs = jnp.vdot(x, op.rmatvec(y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10)


def test_radon_dense_matches_gather():
    """The precomputed bilinear-footprint matrix is the exact linear
    representation of the map_coordinates projector (both directions)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(24, 24)))
    dense = Radon2D.create((24, 24), n_angles=12, dtype=jnp.float64,
                           dense=True)
    gather = Radon2D.create((24, 24), n_angles=12, dtype=jnp.float64,
                            dense=False)
    assert dense.dense is not None and gather.dense is None
    np.testing.assert_allclose(
        np.asarray(dense.matvec(x)), np.asarray(gather.matvec(x)),
        atol=1e-10,
    )
    sino = jnp.asarray(rng.normal(size=(12, 24)))
    np.testing.assert_allclose(
        np.asarray(dense.rmatvec(sino)), np.asarray(gather.rmatvec(sino)),
        atol=1e-10,
    )


def test_radon_mass_preservation():
    # each projection of a centered blob integrates to (about) the blob mass
    op = Radon2D.create((33, 33), n_angles=8, dtype=jnp.float64)
    yy, xx = np.mgrid[0:33, 0:33]
    x = jnp.asarray(((yy - 16) ** 2 + (xx - 16) ** 2 < 36).astype(np.float64))
    sino = np.asarray(op.matvec(x))
    mass = float(x.sum())
    np.testing.assert_allclose(sino.sum(axis=1), mass, rtol=0.02)


class TestDaubechiesDWT:
    """D4/D8 periodic orthogonal DWT (round-2, VERDICT next-step #10)."""

    @pytest.mark.parametrize("taps", [4, 8])
    def test_perfect_reconstruction_and_orthogonality(self, taps):
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D

        rng = np.random.default_rng(taps)
        w = DaubechiesDWT2D(taps=taps, levels=3)
        x = jnp.asarray(rng.normal(size=(64, 64)))
        c = w.matvec(x)
        np.testing.assert_allclose(np.asarray(w.rmatvec(c)), np.asarray(x),
                                   atol=1e-10)
        # Parseval: orthogonal transform preserves energy
        np.testing.assert_allclose(
            float(jnp.sum(c * c)), float(jnp.sum(x * x)), rtol=1e-10
        )

    @pytest.mark.parametrize("taps", [4, 8])
    def test_adjoint(self, taps):
        from lmc_atomi_tpu.ops.linops import dot_test
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D

        w = DaubechiesDWT2D(taps=taps, levels=2)
        lhs, rhs = dot_test(w, jax.random.PRNGKey(0), (32, 32))
        np.testing.assert_allclose(complex(lhs), complex(rhs), rtol=1e-12)

    def test_vanishing_moments_d4(self):
        """D4 has 2 vanishing moments: detail bands annihilate signals that
        are locally linear (checked on a periodic-safe bilinear patch away
        from the wrap seam)."""
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D, HaarDWT2D

        n = 64
        yy, xx = np.mgrid[0:n, 0:n] / n
        # smooth periodic signal: low-frequency sinusoid (locally ~linear)
        sig = jnp.asarray(np.sin(2 * np.pi * yy) + np.cos(2 * np.pi * xx))
        d4 = DaubechiesDWT2D(taps=4, levels=1).matvec(sig)
        haar = HaarDWT2D(levels=1).matvec(sig)
        # finest detail blocks (everything outside the top-left quadrant)
        def detail_energy(c):
            c = np.asarray(c)
            e = (c**2).sum() - (c[: n // 2, : n // 2] ** 2).sum()
            return float(e)

        assert detail_energy(d4) < 0.2 * detail_energy(haar)

    def test_make_dwt_names(self):
        from lmc_atomi_tpu.ops.wavelet import (
            DaubechiesDWT2D,
            HaarDWT2D,
            make_dwt,
        )

        assert isinstance(make_dwt("haar"), HaarDWT2D)
        assert make_dwt("d4").taps == 4
        assert make_dwt("d8").taps == 8
        with pytest.raises(ValueError):
            make_dwt("sym5")

    def test_orthogonal_l1_prox_with_d4(self):
        """OrthogonalL1 exact prox identity holds for any orthogonal W."""
        from lmc_atomi_tpu.ops.functionals import OrthogonalL1
        from lmc_atomi_tpu.ops.wavelet import DaubechiesDWT2D

        rng = np.random.default_rng(5)
        w = DaubechiesDWT2D(taps=4, levels=2)
        f = OrthogonalL1(op=w, sigma=0.7)
        x = jnp.asarray(rng.normal(size=(32, 32)))
        p = f.prox(x, 0.3)
        # prox objective: 0.21*||Wz||_1 + ||z-x||^2/2 must be minimized;
        # compare against perturbations
        def obj(z):
            return float(0.3 * f(z) + 0.5 * jnp.sum((z - x) ** 2))

        base = obj(p)
        for s in range(3):
            dz = 0.01 * jnp.asarray(
                np.random.default_rng(s).normal(size=(32, 32))
            )
            assert obj(p + dz) >= base - 1e-9


class TestShearRadon:
    """Shear-FFT Radon (reference-scale CT path, ops/radon.py mode="shear"):
    exact adjoint by construction, spectral-vs-bilinear agreement on smooth
    images, exact match at the rot90 angles, and auto-selection above the
    dense budget."""

    def _smooth(self, n):
        yy, xx = np.mgrid[0:n, 0:n]
        c = (n - 1) / 2
        img = np.exp(-(((yy - c - 6) / 9) ** 2 + ((xx - c + 4) / 7) ** 2))
        img += 0.5 * np.exp(
            -(((yy - c + 10) / 5) ** 2 + ((xx - c - 8) / 6) ** 2)
        )
        return jnp.asarray(img, jnp.float64)

    def test_adjoint_exact(self):
        from lmc_atomi_tpu.ops.radon import Radon2D

        n = 32
        op = Radon2D.create((n, n), n_angles=7, dtype=jnp.float64,
                            mode="shear")
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.normal(size=(n, n)))
        v = jnp.asarray(rng.normal(size=(7, n)))
        lhs = float(jnp.vdot(jax.jit(op.matvec)(u), v))
        rhs = float(jnp.vdot(u, jax.jit(op.rmatvec)(v)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)

    def test_matches_bilinear_on_smooth_image(self):
        from lmc_atomi_tpu.ops.radon import Radon2D

        n, angles = 64, 12
        img = self._smooth(n)
        pg = jax.jit(
            Radon2D.create((n, n), n_angles=angles, dtype=jnp.float64,
                           mode="gather").matvec
        )(img)
        ps = jax.jit(
            Radon2D.create((n, n), n_angles=angles, dtype=jnp.float64,
                           mode="shear").matvec
        )(img)
        # different discretizations of the same continuous operator:
        # sub-percent agreement on smooth images, exact at 0/90 degrees
        scale = float(jnp.abs(pg).max())
        assert float(jnp.abs(ps - pg).max()) < 5e-3 * scale
        np.testing.assert_allclose(np.asarray(ps[0]), np.asarray(pg[0]),
                                   atol=1e-9 * scale)
        np.testing.assert_allclose(
            np.asarray(ps[angles // 2]), np.asarray(pg[angles // 2]),
            atol=1e-9 * scale,
        )

    def test_auto_selects_shear_above_dense_budget(self):
        from lmc_atomi_tpu.ops.radon import Radon2D

        op = Radon2D.create((256, 256), n_angles=90, dtype=jnp.float32)
        assert op.mode == "shear"
        assert op.dense is None
        op_small = Radon2D.create((64, 64), n_angles=10, dtype=jnp.float32)
        assert op_small.mode == "dense"

    def test_mass_preservation_shear(self):
        from lmc_atomi_tpu.ops.radon import Radon2D

        n = 48
        img = self._smooth(n)
        op = Radon2D.create((n, n), n_angles=9, dtype=jnp.float64,
                            mode="shear")
        sino = jax.jit(op.matvec)(img)
        total = float(img.sum())
        # every projection integrates the image up to detector truncation
        # (n_det = n central bins; Gaussian tails rotated past the edge
        # bins account for <= ~0.1%)
        for a in range(9):
            np.testing.assert_allclose(float(sino[a].sum()), total,
                                       rtol=2e-3)


class TestFBP:
    """ops/radon.py::fbp — analytic filtered-backprojection inverse."""

    def _problem(self, n=64, n_angles=60, sigma=0.0, mode=None, seed=0):
        import jax

        from lmc_atomi_tpu.utils.images import phantom

        img = jnp.asarray(phantom(n), jnp.float32) / 255.0
        op = Radon2D.create((n, n), n_angles=n_angles, mode=mode)
        sino = op.matvec(img)
        if sigma:
            sino = sino + sigma * jax.random.normal(
                jax.random.PRNGKey(seed), sino.shape, jnp.float32
            )
        return img, op, sino

    def test_reconstructs_much_better_than_backprojection(self):
        from lmc_atomi_tpu.eval.metrics import psnr
        from lmc_atomi_tpu.ops.linops import LinOp
        from lmc_atomi_tpu.ops.radon import fbp

        img, op, sino = self._problem()
        bp = op.rmatvec(sino)
        bp = bp / jnp.maximum(LinOp.max_gram_eig(op, probe=bp, iters=20), 1.0)
        rec = fbp(op, sino, filter_name="hann")
        assert float(psnr(img, rec)) > float(psnr(img, bp)) + 3.5
        assert float(psnr(img, rec)) > 16.0

    def test_hann_beats_ramp_under_noise(self):
        from lmc_atomi_tpu.eval.metrics import psnr
        from lmc_atomi_tpu.ops.radon import fbp

        img, op, sino = self._problem(sigma=2.0)
        ramp = fbp(op, sino, filter_name="ramp")
        hann = fbp(op, sino, filter_name="hann")
        assert float(psnr(img, hann)) > float(psnr(img, ramp))

    def test_calibration_fixes_scale(self):
        """Calibrated FBP residual ||A x - y|| can only shrink vs raw."""
        from lmc_atomi_tpu.ops.radon import fbp

        _, op, sino = self._problem()
        raw = fbp(op, sino, calibrate=False)
        cal = fbp(op, sino, calibrate=True)
        r_raw = float(jnp.linalg.norm(op.matvec(raw) - sino))
        r_cal = float(jnp.linalg.norm(op.matvec(cal) - sino))
        assert r_cal <= r_raw + 1e-4

    def test_works_in_shear_mode(self):
        from lmc_atomi_tpu.eval.metrics import psnr
        from lmc_atomi_tpu.ops.radon import fbp

        img, op, sino = self._problem(n=64, n_angles=45, mode="shear")
        rec = fbp(op, sino, filter_name="hann")
        assert np.isfinite(np.asarray(rec)).all()
        assert float(psnr(img, rec)) > 14.0
