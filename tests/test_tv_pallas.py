"""Pallas TV kernel: interpret-mode parity with the XLA implementation."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.ops.tv import prox_tv_iso
from lmc_atomi_tpu.ops.tv_pallas import pallas_tv_supported, prox_tv_iso_pallas


def test_interpret_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
    want = prox_tv_iso(x, 0.4, niter=10, backend="xla")
    got = prox_tv_iso_pallas(x, 0.4, niter=10, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_supported_gate():
    # CPU backend: never claims support; dispatch stays on XLA
    assert not pallas_tv_supported((512, 512), jnp.float32)
    x = jnp.zeros((16, 16), jnp.float32)
    out = prox_tv_iso(x, 0.3, niter=5)  # auto -> xla on CPU, must not raise
    assert out.shape == x.shape


def test_normal_grad_fusion_matches_composition():
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(24, 24)))
    b = jnp.asarray(rng.normal(size=(24, 24)))
    op = CirculantBlur2D.from_kernel((24, 24), uniform_kernel(5, jnp.float64))
    want = op.rmatvec(op.matvec(x) - b)
    got = op.normal_grad(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-11)
