"""Bregman proximal maps under the hyperbolic entropy mirror map.

Mirror map ``phi_beta(x) = sum_i x_i arcsinh(x_i/beta_i) - sqrt(x_i^2+beta_i^2)``
with ``grad phi = arcsinh(x/beta)`` and conjugate gradient ``beta*sinh(y)``
(reference lmc.py:173-177, prox_lmc.py:212-216). The left Bregman prox of
``gamma * |.|_1`` has the three-branch closed form of reference
prox_lmc.py:218-233, vectorized here with ``jnp.where``.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "grad_mirror_hyp",
    "grad_conjugate_mirror_hyp",
    "left_bregman_prox_l1_hypent",
    "bregman_moreau_env_grad_l1_hypent",
]


def grad_mirror_hyp(x, beta):
    return jnp.arcsinh(x / beta)


def grad_conjugate_mirror_hyp(y, beta):
    return beta * jnp.sinh(y)


def left_bregman_prox_l1_hypent(x, beta, gamma):
    """Left Bregman prox of ``gamma |.|_1`` w.r.t. hyperbolic entropy."""
    up = beta * jnp.sinh(jnp.arcsinh(x / beta) - gamma)
    dn = beta * jnp.sinh(jnp.arcsinh(x / beta) + gamma)
    mid = jnp.sqrt(x**2 + beta**2) - beta
    p = jnp.where(x > beta * jnp.sinh(gamma), up, mid)
    return jnp.where(x < beta * jnp.sinh(-gamma), dn, p)


def bregman_moreau_env_grad_l1_hypent(x, beta, lam, alpha):
    """Gradient of the Bregman-Moreau envelope of ``alpha |.|_1`` (reference
    prox_lmc.py:235-236): ``(x - breg_prox(x)) / (lam * sqrt(x^2 + beta^2))``."""
    p = left_bregman_prox_l1_hypent(x, beta, lam * alpha)
    return (x - p) / (lam * jnp.sqrt(x**2 + beta**2))
