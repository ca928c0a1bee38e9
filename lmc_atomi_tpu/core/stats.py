"""Streaming (online) statistics accumulated in HBM.

The reference hoards full sample arrays and post-processes them
(``samples.mean(axis=0)`` + ``del`` for memory, reference
prox_lmc_deconv.py:474-475). At 1e5 steps x 512^2 state that is impossible, so
every full-array statistic has a streaming formulation here:

  * ``RunningMoments`` — Welford mean/variance, numerically stable in f32,
    mergeable across devices (Chan parallel combine; use with ``psum``-style
    tree reductions or ``merge``).
  * ``RunningQuantile`` — vectorized P^2 quantile estimator (Jain & Chlamtac
    1985) for per-pixel credible intervals without storing samples.

All are pure pytrees driven by ``init / update / finalize``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["RunningMoments", "RunningQuantile"]


@struct.dataclass
class RunningMoments:
    """Welford online mean/variance over a pytree of arrays."""

    count: jnp.ndarray
    mean: Any
    m2: Any

    @classmethod
    def init(cls, example: Any) -> "RunningMoments":
        zeros = jax.tree.map(jnp.zeros_like, example)
        return cls(
            count=jnp.zeros((), jnp.int32),
            mean=zeros,
            m2=jax.tree.map(jnp.zeros_like, example),
        )

    def update(self, x: Any, weight=None) -> "RunningMoments":
        """Add one observation. ``weight`` optionally masks it (0 or 1)."""
        w = (
            jnp.ones((), jnp.int32)
            if weight is None
            else jnp.asarray(weight).astype(jnp.int32)
        )
        new_count = self.count + w
        dt = jax.tree.leaves(self.mean)[0].dtype
        # Guard the first (or masked) update against 0/0.
        denom = jnp.maximum(new_count, 1).astype(dt)
        wf = w.astype(dt)

        def upd(mean, m2, xi):
            delta = xi - mean
            mean_new = mean + wf * delta / denom
            m2_new = m2 + wf * delta * (xi - mean_new)
            return mean_new, m2_new

        flat_mean, treedef = jax.tree.flatten(self.mean)
        flat_m2 = jax.tree.leaves(self.m2)
        flat_x = jax.tree.leaves(x)
        new = [upd(m, s, xi) for m, s, xi in zip(flat_mean, flat_m2, flat_x)]
        mean_new = jax.tree.unflatten(treedef, [a for a, _ in new])
        m2_new = jax.tree.unflatten(treedef, [b for _, b in new])
        return RunningMoments(count=new_count, mean=mean_new, m2=m2_new)

    def merge(self, other: "RunningMoments") -> "RunningMoments":
        """Chan et al. parallel combine — use to reduce per-device partials."""
        na, nb = self.count, other.count
        n = na + nb
        dt = jax.tree.leaves(self.mean)[0].dtype
        naf, nbf = na.astype(dt), nb.astype(dt)
        nf = jnp.maximum(n, 1).astype(dt)

        def comb(ma, sa, mb, sb):
            delta = mb - ma
            mean = ma + delta * nbf / nf
            m2 = sa + sb + delta * delta * naf * nbf / nf
            return mean, m2

        flat_ma, treedef = jax.tree.flatten(self.mean)
        pairs = [
            comb(ma, sa, mb, sb)
            for ma, sa, mb, sb in zip(
                flat_ma,
                jax.tree.leaves(self.m2),
                jax.tree.leaves(other.mean),
                jax.tree.leaves(other.m2),
            )
        ]
        return RunningMoments(
            count=n,
            mean=jax.tree.unflatten(treedef, [a for a, _ in pairs]),
            m2=jax.tree.unflatten(treedef, [b for _, b in pairs]),
        )

    @property
    def variance(self) -> Any:
        denom = jnp.maximum(self.count - 1, 1)
        return jax.tree.map(
            lambda s: s / denom.astype(s.dtype), self.m2
        )

    @property
    def std(self) -> Any:
        return jax.tree.map(jnp.sqrt, self.variance)


@struct.dataclass
class RunningQuantile:
    """Vectorized P^2 streaming quantile estimator.

    Tracks the ``p``-quantile elementwise over arrays of shape ``shape`` with
    five markers per element (5x state memory, zero sample memory). After
    >= 5 updates, ``value`` approximates the running quantile; used for
    per-pixel credible-interval maps.
    """

    p: jnp.ndarray
    count: jnp.ndarray
    heights: jnp.ndarray  # (5, *shape) marker heights
    positions: jnp.ndarray  # (5, *shape) marker positions (1-based, float)

    @classmethod
    def init(cls, shape, p: float, dtype=jnp.float32) -> "RunningQuantile":
        return cls(
            p=jnp.asarray(p, dtype),
            count=jnp.zeros((), jnp.int32),
            heights=jnp.zeros((5,) + tuple(shape), dtype),
            positions=jnp.tile(
                jnp.arange(1.0, 6.0, dtype=dtype).reshape((5,) + (1,) * len(shape)),
                (1,) + tuple(shape),
            ),
        )

    def update(self, x: jnp.ndarray) -> "RunningQuantile":
        c = self.count

        def bootstrap(st: RunningQuantile) -> RunningQuantile:
            h = st.heights.at[c].set(x)
            # On the 5th observation, sort the initial block.
            h = jax.lax.cond(
                c == 4, lambda hh: jnp.sort(hh, axis=0), lambda hh: hh, h
            )
            return st.replace(count=c + 1, heights=h)

        def p2step(st: RunningQuantile) -> RunningQuantile:
            p = st.p
            q = st.heights
            n = st.positions
            # Locate cell k such that q[k] <= x < q[k+1] (with clamping).
            below_min = x < q[0]
            above_max = x >= q[4]
            q0 = jnp.where(below_min, x, q[0])
            q4 = jnp.where(above_max, x, q[4])
            q = q.at[0].set(q0).at[4].set(q4)
            k = (
                (x >= q[1]).astype(jnp.int32)
                + (x >= q[2]).astype(jnp.int32)
                + (x >= q[3]).astype(jnp.int32)
            )  # in {0,1,2,3}

            # Increment positions of markers above the cell.
            idx = jnp.arange(5).reshape((5,) + (1,) * (q.ndim - 1))
            n = n + (idx > k).astype(n.dtype)

            # Desired positions.
            cnt = (st.count + 1).astype(n.dtype)
            dn = jnp.stack(
                [
                    jnp.ones_like(p),
                    1 + 2 * p,
                    1 + 4 * p,
                    3 + 2 * p,
                    jnp.asarray(5.0, p.dtype),
                ]
            )
            nprime = 1 + (dn - 1) / 4.0 * (cnt - 1)
            nprime = nprime.reshape((5,) + (1,) * (q.ndim - 1)) * jnp.ones_like(n)

            # Adjust interior markers 1..3 by parabolic (P^2) or linear step.
            def adjust(i, qn):
                q, n = qn
                d = nprime[i] - n[i]
                move_up = jnp.logical_and(d >= 1, n[i + 1] - n[i] > 1)
                move_dn = jnp.logical_and(d <= -1, n[i - 1] - n[i] < -1)
                s = jnp.where(move_up, 1.0, jnp.where(move_dn, -1.0, 0.0)).astype(
                    q.dtype
                )
                do_move = s != 0
                # Parabolic prediction.
                nm, ni, np_ = n[i - 1], n[i], n[i + 1]
                qm, qi, qp = q[i - 1], q[i], q[i + 1]
                para = qi + s / (np_ - nm) * (
                    (ni - nm + s) * (qp - qi) / (np_ - ni)
                    + (np_ - ni - s) * (qi - qm) / (ni - nm)
                )
                ok = jnp.logical_and(qm < para, para < qp)
                # linear fallback (Jain & Chlamtac): q_i + s*(q_{i+s}-q_i)/(n_{i+s}-n_i)
                lin = qi + s * jnp.where(
                    s > 0, (qp - qi) / (np_ - ni), (qi - qm) / (ni - nm)
                )
                qnew = jnp.where(do_move, jnp.where(ok, para, lin), qi)
                nnew = jnp.where(do_move, ni + s, ni)
                return q.at[i].set(qnew), n.at[i].set(nnew)

            for i in (1, 2, 3):
                q, n = adjust(i, (q, n))
            return st.replace(count=st.count + 1, heights=q, positions=n)

        return jax.lax.cond(c < 5, bootstrap, p2step, self)

    @property
    def value(self) -> jnp.ndarray:
        """Current quantile estimate (marker 2); valid once count >= 5."""
        return self.heights[2]
