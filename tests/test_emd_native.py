"""Native exact-EMD solver tests: against the Hungarian assignment (equal
sizes), scipy linprog (tiny general problems), and marginal feasibility."""
import numpy as np
import pytest

from lmc_atomi_tpu.eval import emd_native

pytestmark = pytest.mark.skipif(
    not emd_native.available(), reason="no C++ toolchain / libemd.so"
)


def test_matches_hungarian_equal_sizes():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(80, 2))
    y = rng.normal(size=(80, 2)) + 1.0
    from lmc_atomi_tpu.eval.wasserstein import exact_w2_assignment

    want = exact_w2_assignment(x, y)
    got = emd_native.exact_w2(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_matches_linprog_general_weights():
    from scipy.optimize import linprog

    rng = np.random.default_rng(1)
    n, m = 6, 9
    a = rng.random(n); a /= a.sum()
    b = rng.random(m); b /= b.sum()
    c = rng.random((n, m))

    # LP formulation
    a_eq = []
    for i in range(n):
        row = np.zeros(n * m); row[i * m : (i + 1) * m] = 1; a_eq.append(row)
    for j in range(m):
        row = np.zeros(n * m); row[j::m] = 1; a_eq.append(row)
    res = linprog(
        c.ravel(), A_eq=np.array(a_eq), b_eq=np.concatenate([a, b]),
        bounds=(0, None), method="highs",
    )
    want = res.fun

    got, flow = emd_native.emd2(a, b, c, return_flow=True)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    np.testing.assert_allclose(flow.sum(1), a, atol=1e-12)
    np.testing.assert_allclose(flow.sum(0), b, atol=1e-12)


def test_unequal_sample_counts():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 2))
    y = rng.normal(size=(70, 2))
    val = emd_native.exact_w2(x, y)
    assert np.isfinite(val) and val >= 0

    # self-distance is ~0
    self_val = emd_native.exact_w2(x, x)
    assert self_val < 1e-12


def test_identity_cost_structure():
    # transporting a distribution to itself over a metric cost: zero
    a = np.array([0.25, 0.25, 0.5])
    pts = np.array([[0.0], [1.0], [2.0]])
    c = np.abs(pts[:, None, 0] - pts[None, :, 0]) ** 2
    val, flow = emd_native.emd2(a, a, c, return_flow=True)
    np.testing.assert_allclose(val, 0.0, atol=1e-14)
    np.testing.assert_allclose(np.diag(flow), a, atol=1e-12)


def test_moderate_size_performance():
    import time

    rng = np.random.default_rng(3)
    x = rng.normal(size=(400, 2))
    y = rng.normal(size=(400, 2)) + 0.5
    t0 = time.perf_counter()
    val = emd_native.exact_w2(x, y)
    dt = time.perf_counter() - t0
    assert np.isfinite(val)
    assert dt < 30.0, f"too slow: {dt:.1f}s"


def test_exact_w2_1d_inputs():
    """(n,) arrays are n samples in d=1 (ADVICE r1: used to IndexError)."""
    from lmc_atomi_tpu.eval.emd_native import exact_w2

    rng = np.random.default_rng(3)
    x = rng.normal(size=50)
    y = rng.normal(size=60) + 1.0
    v = exact_w2(x, y)
    v2 = exact_w2(x[:, None], y[:, None])
    assert np.isclose(v, v2)
    # 1-d exact W2^2 has a closed form via sorted quantile coupling for
    # equal sizes; sanity-check the order of magnitude instead
    assert 0.0 < v < 10.0


def test_scale_3k_matches_sinkhorn():
    """Round-2 network-simplex rewrite: thousands of points in seconds
    (round-1 capped at ~2k); cross-check vs on-device Sinkhorn on
    well-separated distributions where the entropic bias is negligible."""
    import time

    import jax.numpy as jnp

    from lmc_atomi_tpu.eval.emd_native import exact_w2
    from lmc_atomi_tpu.eval.wasserstein import sinkhorn_w2

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3000, 2))
    y = rng.normal(size=(3000, 2)) + np.asarray([1.5, -0.5])
    t0 = time.time()
    ve = exact_w2(x, y)
    dt = time.time() - t0
    assert dt < 60.0, f"3k exact EMD took {dt:.0f}s"
    assert abs(ve - 2.5) < 0.25  # true shift + finite-sample bias
    # Sinkhorn cross-check at a size where the CPU Sinkhorn is quick
    xs, ys = x[:1200], y[:1200]
    vs = float(sinkhorn_w2(jnp.asarray(xs), jnp.asarray(ys)))
    ve_s = exact_w2(xs, ys)
    assert abs(vs - ve_s) / ve_s < 0.02


def test_multiscale_brackets_exact():
    """Quantized exact W2 (k-means + weighted network simplex) must bracket
    the full-resolution exact W2 within its certified triangle-inequality
    radius, and tighten as k grows."""
    from lmc_atomi_tpu.eval.wasserstein import exact_w2, exact_w2_multiscale

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1500, 2))
    y = rng.normal(size=(1500, 2)) * 1.3 + np.asarray([2.0, 0.0])
    w_true = np.sqrt(exact_w2(x, y))
    errs = []
    for k in (64, 256):
        v, err = exact_w2_multiscale(x, y, k=k)
        assert abs(np.sqrt(v) - w_true) <= err + 1e-9, (k, v, err, w_true)
        errs.append(err)
    assert errs[1] < errs[0]  # finer quantization -> tighter certificate
    assert errs[1] < 0.35 * w_true  # and the k=256 radius is usefully small


def test_multiscale_k_ge_n_reduces_to_exact():
    from lmc_atomi_tpu.eval.wasserstein import exact_w2, exact_w2_multiscale

    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 3))
    y = rng.normal(size=(150, 3)) + 0.7
    v, err = exact_w2_multiscale(x, y, k=256)
    np.testing.assert_allclose(v, exact_w2(x, y), rtol=1e-5)
    assert err < 1e-3
