"""Wavelet and Radon operator tests: orthogonality, adjointness, inversion."""
import jax
import jax.numpy as jnp
import numpy as np

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
        float(jnp.sum(c * c)), float(jnp.sum(x * x)), rtol=1e-12
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


def test_radon_mass_preservation():
    # each projection of a centered blob integrates to (about) the blob mass
    op = Radon2D.create((33, 33), n_angles=8, dtype=jnp.float64)
    yy, xx = np.mgrid[0:33, 0:33]
    x = jnp.asarray(((yy - 16) ** 2 + (xx - 16) ** 2 < 36).astype(np.float64))
    sino = np.asarray(op.matvec(x))
    mass = float(x.sum())
    np.testing.assert_allclose(sino.sum(axis=1), mass, rtol=0.02)
