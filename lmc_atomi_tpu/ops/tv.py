"""Total-variation values and proximal operators.

TPU-native replacement for pyproximal ``TV`` (Chambolle inner iterations,
``niter_tv=10`` at reference prox_lmc_deconv.py:122) and ``L21``/``L1`` TV
regularizers (reference prox_lmc_deconv.py:116-119): the dual projection
algorithm of Chambolle (2004) with a *fixed* trip count inside
``lax.fori_loop`` so the whole sampler step stays one fused XLA computation
(SURVEY.md §2b N4, idiom shift 4).

Internal gradient convention: forward differences with Neumann boundary
(standard for Chambolle), independent of the ``Gradient2D`` operator used by
primal-dual samplers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "grad2d",
    "div2d",
    "tv_iso",
    "tv_aniso",
    "tv1d",
    "prox_tv_iso",
    "prox_tv_iso_proj",
    "fgp_momentum",
    "prox_tv_aniso",
    "prox_tv1d",
]


def _last_mask(n, axis_len_axis, shape, dtype):
    """1.0 everywhere except the last slot along the given axis."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis_len_axis)
    return (idx < (n - 1)).astype(dtype)


def _fwd_diff(x, axis):
    """Forward difference with zeroed last slot, in roll+mask form — sharding
    friendly (slice-based forms produce odd-size dims that cannot be
    partitioned; ``roll`` lowers to a collective permute on sharded axes)."""
    n = x.shape[axis]
    mask = _last_mask(n, axis, x.shape, x.dtype)
    return (jnp.roll(x, -1, axis) - x) * mask


def _fwd_diff_adjoint_neg(p, axis):
    """Divergence component: the negative adjoint of :func:`_fwd_diff`.

    With p~ = p masked at the last slot, div = p~ - roll(p~, +1); the wrapped
    entry is p~[last] = 0, so no boundary fixup is needed.
    """
    n = p.shape[axis]
    pm = p * _last_mask(n, axis, p.shape, p.dtype)
    return pm - jnp.roll(pm, 1, axis)


def grad2d(x):
    """Forward differences, Neumann boundary: shape (2, ny, nx)."""
    return jnp.stack([_fwd_diff(x, 0), _fwd_diff(x, 1)])


def div2d(p):
    """Discrete divergence, the negative adjoint of :func:`grad2d`."""
    return _fwd_diff_adjoint_neg(p[0], 0) + _fwd_diff_adjoint_neg(p[1], 1)


def tv_iso(x):
    """Isotropic TV value: sum of per-pixel gradient-vector norms."""
    g = grad2d(x)
    return jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))


def tv_aniso(x):
    """Anisotropic TV value: l1 norm of all forward differences."""
    return jnp.sum(jnp.abs(grad2d(x)))


def tv1d(x):
    """1-D TV of a flattened signal (pyproximal ``TV((prod(dims),))``
    semantics used by the ME-TV anisotropic mode, reference algs.py:169-170)."""
    return jnp.sum(jnp.abs(x[1:] - x[:-1]))


def prox_tv_iso(x, gamma, niter: int = 10, step: float = 0.25,
                backend: str = "auto"):
    """Prox of ``gamma * TV_iso`` via Chambolle dual projection.

    Iterates ``p <- (p + step*grad(div p - x/gamma)) / (1 + step*|...|_2)``
    with the per-pixel Euclidean norm; returns ``x - gamma * div p``.
    ``step <= 1/4`` converges (1/8 is Chambolle's proven constant; 1/4 is the
    standard accelerated choice and what we fix for reproducibility).

    ``backend='auto'`` uses the fused Pallas kernel on TPU when the image
    fits VMEM (ops/tv_pallas.py); 'xla'/'pallas' force a path.
    """
    if backend != "xla":
        from lmc_atomi_tpu.ops.tv_pallas import (
            pallas_tv_supported,
            prox_tv_iso_pallas,
        )

        if backend == "pallas" or pallas_tv_supported(x.shape, x.dtype):
            return prox_tv_iso_pallas(x, gamma, niter=niter, step=step)

    gamma = jnp.asarray(gamma, x.dtype)

    def body(_, p):
        u = div2d(p) - x / gamma
        g = grad2d(u)
        mag = jnp.sqrt(jnp.sum(g * g, axis=0, keepdims=True))
        return (p + step * g) / (1.0 + step * mag)

    p0 = jnp.zeros((2,) + x.shape, x.dtype)
    p = jax.lax.fori_loop(0, niter, body, p0)
    return x - gamma * div2d(p)


def fgp_momentum(niter: int):
    """FGP (FISTA) momentum coefficients ``(t_k - 1) / t_{k+1}`` for a fixed
    trip count, as Python floats — compile-time constants for fused kernels
    (Beck & Teboulle 2009, eq. 4.2-4.3)."""
    t, out = 1.0, []
    for _ in range(niter):
        t_next = 0.5 * (1.0 + (1.0 + 4.0 * t * t) ** 0.5)
        out.append((t - 1.0) / t_next)
        t = t_next
    return tuple(out)


def prox_tv_iso_proj(x, gamma, niter: int = 10, step: float = 0.125,
                     accel: bool = True):
    """Prox of ``gamma * TV_iso`` via *projected* dual gradient ascent.

    Same minimizer as :func:`prox_tv_iso` but with the dual-ball projection
    ``p <- p~ * min(1, 1/|p~|_2)`` in place of Chambolle's semi-implicit
    ``/(1 + step*|grad u|)`` scaling: one ``rsqrt`` per trip instead of a
    sqrt AND a reciprocal — on the TPU VPU the transcendentals are the
    fused MYULA step's largest serial-cycle term (scripts/roofline.py), so
    this halves that term. ``accel=True`` adds FGP/FISTA momentum (pure
    adds/multiplies with host-precomputed coefficients), which at
    ``step = 1/8`` (the dual gradient's 1/L) reaches Chambolle-10 accuracy
    in comparable trips. ``rsqrt(0) = inf`` makes the projection exact at
    zero duals (``min(1, inf) = 1``).
    """
    gamma = jnp.asarray(gamma, x.dtype)
    xg = x / gamma

    def proj(p):
        s = jnp.sum(p * p, axis=0, keepdims=True)
        return p * jnp.minimum(jnp.asarray(1.0, x.dtype), jax.lax.rsqrt(s))

    def ascend(r):
        return proj(r + step * grad2d(div2d(r) - xg))

    p = jnp.zeros((2,) + x.shape, x.dtype)
    if accel:
        r = p
        for c in fgp_momentum(niter):
            q = ascend(r)
            r = q + c * (q - p)
            p = q
    else:
        p = jax.lax.fori_loop(0, niter, lambda _, p: ascend(p), p)
    return x - gamma * div2d(p)


def prox_tv_aniso(x, gamma, niter: int = 10, step: float = 0.25):
    """Prox of ``gamma * TV_aniso`` via the dual projection with the
    per-component box constraint ``|p_i| <= 1`` (anisotropic dual ball)."""
    gamma = jnp.asarray(gamma, x.dtype)

    def body(_, p):
        u = div2d(p) - x / gamma
        g = grad2d(u)
        return (p + step * g) / (1.0 + step * jnp.abs(g))

    p0 = jnp.zeros((2,) + x.shape, x.dtype)
    p = jax.lax.fori_loop(0, niter, body, p0)
    return x - gamma * div2d(p)


def _grad1d(x):
    return _fwd_diff(x, 0)


def _div1d(p):
    return _fwd_diff_adjoint_neg(p, 0)


def prox_tv1d(x, gamma, niter: int = 10, step: float = 0.25):
    """Prox of 1-D TV on a flat vector (dual projection, fixed trips)."""
    gamma = jnp.asarray(gamma, x.dtype)

    def body(_, p):
        g = _grad1d(_div1d(p) - x / gamma)
        return (p + step * g) / (1.0 + step * jnp.abs(g))

    p = jax.lax.fori_loop(0, niter, body, jnp.zeros_like(x))
    return x - gamma * _div1d(p)
