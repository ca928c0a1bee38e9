"""Fused MYULA Pallas kernel: deterministic-part parity (interpret mode) and
noise statistics."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.kernels.myula_pallas import myula_tv_fused_update
from lmc_atomi_tpu.ops.tv import prox_tv_iso


def test_deterministic_part_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32)) * 10
    g = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
    tau, gamma, tvg = 0.1125, 0.5625, 0.3 * 0.5625
    got = myula_tv_fused_update(
        x, g, jnp.zeros(2, jnp.int32), tau, gamma, tvg, noise_scale=0.0,
        niter=10, interpret=True, with_noise=False,
    )
    want = (
        (1 - tau / gamma) * x
        - tau * g
        + (tau / gamma) * prox_tv_iso(x, tvg, niter=10, backend="xla")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_noise_statistics():
    import jax as _jax
    import pytest

    if _jax.default_backend() != "tpu":
        pytest.skip("pltpu PRNG primitives have no CPU interpret lowering")
    # x = 0, g = 0, (1 - tau/gamma)=0 path off: isolate sqrt(2 tau) xi by
    # using x=0,g=0 -> output = (tau/gamma)*tvprox(0) + sqrt(2 tau) xi
    # tvprox(0)=0, so output/sqrt(2 tau) is the generated noise field.
    tau = 0.5
    out = myula_tv_fused_update(
        jnp.zeros((64, 64), jnp.float32), jnp.zeros((64, 64), jnp.float32),
        jnp.asarray([7, 3], jnp.int32), tau, 1.0, 0.1, noise_scale=1.0,
        niter=2,
    )
    xi = np.asarray(out) / np.sqrt(2 * tau)
    assert abs(xi.mean()) < 0.05
    assert abs(xi.std() - 1.0) < 0.05
    # different seeds -> different noise
    out2 = myula_tv_fused_update(
        jnp.zeros((64, 64), jnp.float32), jnp.zeros((64, 64), jnp.float32),
        jnp.asarray([7, 4], jnp.int32), tau, 1.0, 0.1, noise_scale=1.0,
        niter=2,
    )
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0.1
