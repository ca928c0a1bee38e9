"""Adjoint (dot-product) and exact-solve tests for every linear operator
(SURVEY.md §4 implication (b))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import convolve2d

from lmc_atomi_tpu.ops import linops as L


KEY = jax.random.PRNGKey(0)


def assert_adjoint(op, x_shape):
    lhs, rhs = L.dot_test(op, KEY, x_shape)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10)


def test_identity_diag_matrix_adjoints():
    assert_adjoint(L.Identity(), (12,))
    assert_adjoint(L.Diagonal(diag=jnp.linspace(0.5, 2.0, 12)), (12,))
    a = jax.random.normal(KEY, (7, 5), jnp.float64)
    assert_adjoint(L.Matrix(a=a), (5,))


def test_circulant_blur_adjoint_and_gram_solve():
    h = L.uniform_kernel(5, jnp.float64)
    op = L.CirculantBlur2D.from_kernel((16, 16), h)
    assert_adjoint(op, (16, 16))
    # exact gram solve: (I + rho A^T A) x = y
    y = jax.random.normal(KEY, (16, 16), jnp.float64)
    rho = 1.7
    x = op.gram_solve(rho, y)
    lhs = x + rho * op.rmatvec(op.matvec(x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(y), atol=1e-10)


def test_circulant_matches_scipy_wrap_convolution():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 12))
    h = np.ones((5, 5)) / 25.0
    op = L.CirculantBlur2D.from_kernel((12, 12), jnp.asarray(h))
    got = np.asarray(op.matvec(jnp.asarray(x)))
    want = convolve2d(x, h, mode="same", boundary="wrap")
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("k,offset", [(5, None), (6, None), (7, None), (4, (1, 2))])
def test_convolve2d_matches_scipy_zero_padded(k, offset):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(14, 13))
    h = rng.normal(size=(k, k))
    op = L.Convolve2D.from_kernel(jnp.asarray(h), offset)
    got = np.asarray(op.matvec(jnp.asarray(x)))
    oy, ox = op.offset
    # y[i,j] = full[i + oy, j + ox]: the kernel tap at ``offset`` is the origin
    full = convolve2d(x, h, mode="full", boundary="fill")
    want = full[oy : oy + 14, ox : ox + 13]
    np.testing.assert_allclose(got, want, atol=1e-10)
    assert_adjoint(op, (14, 13))


def test_gradient2d_adjoint_and_forward_semantics():
    op = L.Gradient2D()
    assert_adjoint(op, (9, 11))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(6, 5)))
    g = np.asarray(op.matvec(x))
    xn = np.asarray(x)
    # forward differences; last row/col zero (pylops edge=False semantics)
    np.testing.assert_allclose(g[0, :-1], xn[1:] - xn[:-1])
    np.testing.assert_allclose(g[0, -1], 0)
    np.testing.assert_allclose(g[1, :, :-1], xn[:, 1:] - xn[:, :-1])
    np.testing.assert_allclose(g[1, :, -1], 0)


def test_mask_adjoint_and_gram():
    mask = (jax.random.uniform(KEY, (8, 8)) > 0.5).astype(jnp.float64)
    op = L.Mask(mask=mask)
    assert_adjoint(op, (8, 8))
    y = jax.random.normal(KEY, (8, 8), jnp.float64)
    x = op.gram_solve(0.9, y)
    lhs = x + 0.9 * op.rmatvec(op.matvec(x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(y), atol=1e-12)


def test_cg_gram_solve_matches_dense():
    a = jax.random.normal(KEY, (10, 10), jnp.float64) / 3.0
    op = L.Matrix(a=a)
    y = jax.random.normal(jax.random.PRNGKey(3), (10,), jnp.float64)
    rho = 0.8
    x_cg = L.cg_gram_solve(op, rho, y, niter=60)
    an = np.asarray(a)
    want = np.linalg.solve(np.eye(10) + rho * an.T @ an, np.asarray(y))
    np.testing.assert_allclose(np.asarray(x_cg), want, atol=1e-9)


def test_max_gram_eig_circulant_and_gradient():
    h = L.uniform_kernel(5, jnp.float64)
    op = L.CirculantBlur2D.from_kernel((16, 16), h)
    # uniform kernel: DC gain 1 -> lambda_max(A^T A) = 1
    np.testing.assert_allclose(float(op.max_gram_eig()), 1.0, rtol=1e-12)
    g = L.Gradient2D()
    probe = jax.random.normal(KEY, (16, 16), jnp.float64)
    pm = L.LinOp.max_gram_eig(g, probe=probe, iters=200)
    assert float(pm) <= 8.0 + 1e-9


def test_stencil_gram_path_matches_spectral():
    """Regression for the rectangular-PSF stencil-gram center bug: the
    opt-in prefer_stencil gram must equal the spectral A^T A for square and
    rectangular kernels and non-default offsets."""
    import dataclasses

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(20, 24)))
    for h, off in [
        (np.ones((5, 5)) / 25, None),
        (rng.normal(size=(3, 5)), None),
        (rng.normal(size=(4, 3)), (1, 2)),
    ]:
        base = L.CirculantBlur2D.from_kernel((20, 24), jnp.asarray(h), off)
        op = dataclasses.replace(base, prefer_stencil=True)
        want = jnp.fft.ifft2(jnp.fft.fft2(x) * jnp.abs(base.eigs) ** 2).real
        got = op.gram_matvec(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
        # matvec/rmatvec stencil forms too
        np.testing.assert_allclose(
            np.asarray(op.matvec(x)), np.asarray(base.matvec(x)), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(op.rmatvec(x)), np.asarray(base.rmatvec(x)), atol=1e-12
        )
