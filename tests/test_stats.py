"""Online statistics tests: Welford vs numpy, merge law, P^2 quantiles."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.core.stats import RunningMoments, RunningQuantile


def test_running_moments_matches_numpy():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(200, 4, 3))
    st = RunningMoments.init(jnp.zeros((4, 3), jnp.float64))

    @jax.jit
    def push(st, x):
        return st.update(x)

    for x in xs:
        st = push(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(st.mean), xs.mean(0), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(st.variance), xs.var(0, ddof=1), atol=1e-12
    )
    assert int(st.count) == 200


def test_running_moments_merge():
    rng = np.random.default_rng(1)
    xs = rng.normal(size=(100, 5))
    a = RunningMoments.init(jnp.zeros(5, jnp.float64))
    b = RunningMoments.init(jnp.zeros(5, jnp.float64))
    for x in xs[:30]:
        a = a.update(jnp.asarray(x))
    for x in xs[30:]:
        b = b.update(jnp.asarray(x))
    m = a.merge(b)
    np.testing.assert_allclose(np.asarray(m.mean), xs.mean(0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.variance), xs.var(0, ddof=1), atol=1e-12)


def test_running_moments_masked_updates():
    st = RunningMoments.init(jnp.zeros((), jnp.float64))
    for v, w in [(1.0, 1), (100.0, 0), (3.0, 1)]:
        st = st.update(jnp.asarray(v), weight=jnp.asarray(w))
    np.testing.assert_allclose(float(st.mean), 2.0)
    assert int(st.count) == 2


def test_p2_quantile_close_to_numpy():
    rng = np.random.default_rng(2)
    xs = rng.normal(size=5000)
    for p in (0.05, 0.5, 0.95):
        q = RunningQuantile.init((), p, jnp.float64)

        @jax.jit
        def push(q, x):
            return q.update(x)

        for x in xs:
            q = push(q, jnp.asarray(x))
        want = np.quantile(xs, p)
        assert abs(float(q.value) - want) < 0.05, (p, float(q.value), want)


def test_p2_quantile_vectorized():
    rng = np.random.default_rng(3)
    xs = rng.normal(size=(3000, 4)) * np.array([1.0, 2.0, 0.5, 3.0])
    q = RunningQuantile.init((4,), 0.9, jnp.float64)

    @jax.jit
    def push(q, x):
        return q.update(x)

    for x in xs:
        q = push(q, jnp.asarray(x))
    want = np.quantile(xs, 0.9, axis=0)
    np.testing.assert_allclose(np.asarray(q.value), want, atol=0.15)
