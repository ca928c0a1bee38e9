"""TV prox tests: adjointness of the internal grad/div pair, objective
optimality of the Chambolle dual iteration, convergence to the true prox."""
import jax
import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.ops import tv as T


def test_grad_div_adjoint():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (9, 7), jnp.float64)
    p = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 7), jnp.float64)
    lhs = jnp.sum(T.grad2d(x) * p)
    rhs = -jnp.sum(x * T.div2d(p))  # div = -grad^T
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def _tv_prox_objective(y, x, gamma, tv_fn):
    return float(tv_fn(y) + jnp.sum((y - x) ** 2) / (2 * gamma))


def test_prox_tv_iso_optimality():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 16)) + 2.0 * (rng.random((16, 16)) > 0.5))
    gamma = 0.4
    y = T.prox_tv_iso(x, gamma, niter=300)

    def obj(z):
        return T.tv_iso(z) + jnp.sum((z - x) ** 2) / (2 * gamma)

    base = float(obj(y))
    # y must beat x itself and random perturbations (local optimality probe)
    assert base <= float(obj(x)) + 1e-9
    for s in range(5):
        pert = jnp.asarray(rng.normal(size=(16, 16))) * 0.01
        assert base <= float(obj(y + pert)) + 1e-9

    # and the truncated 10-iteration version (the reference's niter_tv=10,
    # prox_lmc_deconv.py:122) should be close to converged in objective
    y10 = T.prox_tv_iso(x, gamma, niter=10)
    assert float(obj(y10)) <= float(obj(x))
    gap = (float(obj(y10)) - base) / abs(base)
    assert gap < 5e-3, gap


def test_prox_tv_iso_proj_matches_chambolle_minimizer():
    """Projected-dual FGP converges to the SAME minimizer as Chambolle
    (they solve the identical dual program), and at the production trip
    counts FGP-8 is at least as accurate as cold Chambolle-10."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32)) * 1.5
    for gamma in (0.05, 0.3):
        ref = T.prox_tv_iso(x, gamma, niter=800)
        fgp = T.prox_tv_iso_proj(x, gamma, niter=800)
        np.testing.assert_allclose(
            np.asarray(fgp), np.asarray(ref), rtol=0, atol=1e-3
        )
        scale = float(jnp.linalg.norm(ref - x))
        e_fgp8 = float(jnp.linalg.norm(
            T.prox_tv_iso_proj(x, gamma, niter=8) - ref)) / scale
        e_ch10 = float(jnp.linalg.norm(
            T.prox_tv_iso(x, gamma, niter=10) - ref)) / scale
        assert e_fgp8 <= e_ch10 * 1.05, (gamma, e_fgp8, e_ch10)


def test_fgp_momentum_coefficients():
    # t_1 = 1, t_{k+1} = (1 + sqrt(1+4 t_k^2))/2; c_k = (t_k - 1)/t_{k+1}
    cs = T.fgp_momentum(3)
    t1 = 1.0
    t2 = 0.5 * (1 + np.sqrt(5.0))
    t3 = 0.5 * (1 + np.sqrt(1 + 4 * t2 * t2))
    t4 = 0.5 * (1 + np.sqrt(1 + 4 * t3 * t3))
    np.testing.assert_allclose(
        cs, [(t1 - 1) / t2, (t2 - 1) / t3, (t3 - 1) / t4], rtol=1e-12
    )


def test_prox_tv_iso_constant_image_fixed_point():
    x = jnp.full((8, 8), 3.7, jnp.float64)
    y = T.prox_tv_iso(x, 0.5, niter=50)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-10)


def test_prox_tv1d_matches_taut_string_reference():
    # 1-D TV prox has an exact O(n) solution; compare against a direct
    # numpy implementation (Condat's taut-string algorithm).
    def tv1d_denoise(y, lam):
        # Condat (2013) direct algorithm
        y = np.asarray(y, float)
        n = len(y)
        x = np.zeros(n)
        k = k0 = kminus = kplus = 0
        vmin = y[0] - lam
        vmax = y[0] + lam
        umin = lam
        umax = -lam
        while True:
            if k == n - 1:
                x[kminus : k + 1] = vmin if umin < 0 else (
                    vmax if umax > 0 else vmin + umin / (k - k0 + 1)
                )
                if umin < 0:
                    x[k0 : kminus + 1] = vmin
                    k = k0 = kminus = kminus + 1
                    if k > n - 1:
                        break
                    vmin = y[k]
                    umin = lam
                    umax = y[k] + lam - vmax
                    continue
                elif umax > 0:
                    x[k0 : kplus + 1] = vmax
                    k = k0 = kplus = kplus + 1
                    if k > n - 1:
                        break
                    vmax = y[k]
                    umax = -lam
                    umin = y[k] - lam - vmin
                    continue
                else:
                    x[k0 : n] = vmin + umin / (k - k0 + 1)
                    break
            k += 1
            umin += y[k] - vmin
            umax += y[k] - vmax
            if umin < -lam:
                x[k0 : kminus + 1] = vmin
                k = k0 = kminus = kplus = kminus + 1
                vmin = y[k]
                vmax = y[k] + 2 * lam
                umin = lam
                umax = -lam
            elif umax > lam:
                x[k0 : kplus + 1] = vmax
                k = k0 = kminus = kplus = kplus + 1
                vmin = y[k] - 2 * lam
                vmax = y[k]
                umin = lam
                umax = -lam
            else:
                if umin >= lam:
                    kminus = k
                    vmin += (umin - lam) / (k - k0 + 1)
                    umin = lam
                if umax <= -lam:
                    kplus = k
                    vmax += (umax + lam) / (k - k0 + 1)
                    umax = -lam
        return x

    rng = np.random.default_rng(3)
    y = rng.normal(size=40).cumsum() / 3.0
    lam = 0.7
    want = tv1d_denoise(y, lam)
    got = np.asarray(T.prox_tv1d(jnp.asarray(y), lam, niter=3000))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_tv_values():
    x = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    # iso: grads (dy, dx): rows diff 2, cols diff 1, with last row/col zero
    # pixel (0,0): dy=2, dx=1 -> sqrt(5); (0,1): dy=2 -> 2; (1,0): dx=1 -> 1
    np.testing.assert_allclose(float(T.tv_iso(x)), np.sqrt(5) + 2 + 1)
    np.testing.assert_allclose(float(T.tv_aniso(x)), 2 + 1 + 2 + 1)
    np.testing.assert_allclose(float(T.tv1d(jnp.asarray([0.0, 2.0, 1.0]))), 3.0)
