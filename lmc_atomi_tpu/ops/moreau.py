"""Moreau-Yosida envelope combinators.

Given any ``g`` with a prox, the envelope

    env_lam(g)(x) = g(p) + ||p - x||^2 / (2 lam),   p = prox_{lam g}(x)

is smooth with gradient ``(x - p)/lam`` — the identity the reference applies
by hand in each sampler (reference prox_lmc.py:114-115, lmc_laplace.py:70-78).
Here it is a combinator usable with every prox in the library.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

__all__ = ["MoreauEnvelope", "moreau_envelope"]


class MoreauEnvelope(NamedTuple):
    value: Callable
    grad: Callable
    prox_point: Callable


def moreau_envelope(g_value: Callable, g_prox: Callable, lam) -> MoreauEnvelope:
    """Build (value, grad, prox-point) functions of the lam-Moreau envelope.

    ``g_value(x)`` evaluates g; ``g_prox(x, t)`` is ``prox_{t g}``.
    """

    def prox_point(x):
        return g_prox(x, lam)

    def value(x):
        p = prox_point(x)
        sq = jnp.sum(jnp.square(p - x))
        return g_value(p) + sq / (2.0 * lam)

    def grad(x):
        return (x - prox_point(x)) / lam

    return MoreauEnvelope(value=value, grad=grad, prox_point=prox_point)
