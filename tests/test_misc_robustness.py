"""Robustness extras: CLI parsing, ULPDA-state checkpointing, per-chain
initial positions."""
import jax
import jax.numpy as jnp
import numpy as np


def test_auto_cli_parsing():
    from lmc_atomi_tpu.utils.cli import auto_cli

    captured = {}

    def fn(a: int = 1, b: float = 0.5, c: bool = False, d: str = "x",
           e=None, f=(1, 2)):
        captured.update(dict(a=a, b=b, c=c, d=d, e=e, f=f))
        return captured

    auto_cli(fn, argv=["--a", "3", "--b", "2.5", "--c", "true",
                       "--d", "hello", "--e", "[1,2,3]", "--f", "(4,5)"])
    assert captured == {
        "a": 3, "b": 2.5, "c": True, "d": "hello", "e": [1, 2, 3], "f": (4, 5)
    }


def test_ulpda_state_checkpoint_roundtrip(tmp_path):
    from lmc_atomi_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
    from lmc_atomi_tpu.kernels import ulpda
    from lmc_atomi_tpu.ops.functionals import L21Norm, L2Data
    from lmc_atomi_tpu.ops.linops import CirculantBlur2D, Gradient2D, uniform_kernel
    from lmc_atomi_tpu.run.runner import run_chain
    from lmc_atomi_tpu.utils.images import phantom

    n = 12
    img = jnp.asarray(phantom(n, np.float64))
    H = CirculantBlur2D.from_kernel((n, n), uniform_kernel(3, jnp.float64))
    l2 = L2Data.create(op=H, b=H.matvec(img), sigma=1.0)
    kern = ulpda(l2, L21Norm(sigma=0.3), Gradient2D(), tau=0.05, mu=1.0)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((n, n), jnp.float64)

    first = run_chain(kern, x0, key, 7, collect="last")
    path = str(tmp_path / "ulpda.ckpt")
    save_checkpoint(path, {"state": first.final_state})
    template = {"state": kern.init(x0)}
    restored = restore_checkpoint(path, template)

    # extras (dual y + xbar) survive the round trip exactly
    np.testing.assert_array_equal(
        np.asarray(restored["state"].extras.y),
        np.asarray(first.final_state.extras.y),
    )
    np.testing.assert_array_equal(
        np.asarray(restored["state"].extras.xbar),
        np.asarray(first.final_state.extras.xbar),
    )
    assert int(restored["state"].step) == 7


def test_run_chain_segmented_bit_identical():
    """Segmented executions (bounded per-execution runtime) must reproduce
    the monolithic scan exactly: keys fold the global state.step carried
    across segments, and burn-in weights use the global index."""
    from lmc_atomi_tpu.kernels import ula
    from lmc_atomi_tpu.models import GaussianMixture
    from lmc_atomi_tpu.run.runner import run_chain, run_chain_segmented

    mus = np.array([[0.0, 0.0], [3.0, 3.0]])
    sig = np.stack([np.eye(2)] * 2)
    gm = GaussianMixture.create(mus, sig, np.ones(2) / 2)
    kern = ula(gm.grad_potential, 0.05)
    x0 = jnp.zeros(2)
    key = jax.random.PRNGKey(0)
    a = run_chain(kern, x0, key, 60, collect="stats", burn_in=13)
    b = run_chain_segmented(kern, x0, key, 60, segment_steps=17, burn_in=13)
    np.testing.assert_array_equal(
        np.asarray(a.final_state.position), np.asarray(b.final_state.position)
    )
    np.testing.assert_array_equal(
        np.asarray(a.moments.mean), np.asarray(b.moments.mean)
    )
    assert int(a.moments.count) == int(b.moments.count)


def test_run_chains_batched_initial_positions():
    from lmc_atomi_tpu.kernels import ula
    from lmc_atomi_tpu.run.runner import run_chains

    kern = ula(lambda x: x, 0.1)
    x0 = jnp.asarray(np.arange(8.0).reshape(4, 2))  # distinct starts
    res = run_chains(kern, x0, jax.random.PRNGKey(0), 1, n_chains=4)
    s = np.asarray(res.samples)[:, 0]
    # after one step, chains reflect their distinct starting points
    drift = np.asarray(x0) * (1 - 0.1)
    assert np.abs(s - drift).max() < 2.0  # noise-bounded
    assert np.abs((s - drift)[0] - (s - drift)[1]).max() > 1e-3


def test_p2_linear_fallback_moves_down():
    """Regression: the P^2 linear fallback for downward moves must decrease
    the marker (Jain & Chlamtac formula); track a 0.5 quantile through a
    heavy-tailed stream and require sane ordering and accuracy."""
    from lmc_atomi_tpu.core.stats import RunningQuantile

    rng = np.random.default_rng(0)
    xs = rng.standard_cauchy(4000)  # heavy tails exercise the fallback
    q = RunningQuantile.init((), 0.5, jnp.float64)
    push = jax.jit(lambda q, x: q.update(x))
    for x in xs:
        q = push(q, jnp.asarray(x))
    med = float(q.value)
    want = np.median(xs)
    assert abs(med - want) < 0.25, (med, want)
    # marker heights stay ordered
    h = np.asarray(q.heights)
    assert (np.diff(h) >= -1e-9).all(), h


def test_run_resumable_exact_step_count(tmp_path):
    from lmc_atomi_tpu.kernels import ula
    from lmc_atomi_tpu.run.longrun import run_resumable

    kern = ula(lambda x: x, 0.1)
    bundle = run_resumable(kern, jnp.zeros(2), jax.random.PRNGKey(0),
                           total_steps=1000, segment_steps=300)
    assert int(bundle["done"]) == 1000
    assert int(bundle["state"].step) == 1000


def test_run_chains_explicit_batched_flag():
    from lmc_atomi_tpu.kernels import ula
    from lmc_atomi_tpu.run.runner import run_chains

    kern = ula(lambda x: x, 0.1)
    # 4-dim single position with 4 chains: the ambiguous case
    x0 = jnp.arange(4.0)
    res = run_chains(kern, x0, jax.random.PRNGKey(0), 3, n_chains=4,
                     batched=False)
    assert np.asarray(res.samples).shape == (4, 3, 4)


def test_fused_myula_distinct_chain_noise():
    import jax as _jax
    import pytest

    if _jax.default_backend() != "tpu":
        pytest.skip("Pallas PRNG needs TPU")
    from lmc_atomi_tpu.kernels import myula_imaging_fused
    from lmc_atomi_tpu.ops.functionals import L2Data
    from lmc_atomi_tpu.ops.linops import Identity
    from lmc_atomi_tpu.run.runner import run_chains

    l2 = L2Data(op=Identity(), b=jnp.zeros((32, 32), jnp.float32), sigma=0.0)
    kern = myula_imaging_fused(l2, 1e-6, tau=0.5, gamma=1.0)
    res = run_chains(kern, jnp.zeros((32, 32), jnp.float32),
                     jax.random.PRNGKey(0), 1, n_chains=2)
    s = np.asarray(res.samples)
    assert np.abs(s[0] - s[1]).max() > 1e-3  # chains see different noise


def test_collect_both_mode():
    from lmc_atomi_tpu.kernels import ula
    from lmc_atomi_tpu.run.runner import run_chain

    kern = ula(lambda x: x, 0.1)
    res = run_chain(kern, jnp.zeros(3), jax.random.PRNGKey(0), 100,
                    collect="both", burn_in=20)
    assert res.samples.shape == (100, 3)
    s = np.asarray(res.samples)[20:]
    np.testing.assert_allclose(np.asarray(res.moments.mean), s.mean(0),
                               atol=1e-10)
    assert int(res.moments.count) == 80

    import pytest
    with pytest.raises(ValueError, match="unknown collect"):
        run_chain(kern, jnp.zeros(3), jax.random.PRNGKey(0), 10,
                  collect="bogus")
