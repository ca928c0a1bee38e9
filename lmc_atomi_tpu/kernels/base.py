"""Kernel protocol: (init, step) pure-function factories.

Every sampler is a factory returning ``Kernel(init, step)`` where

    state = kernel.init(x0, ...)
    state, info = kernel.step(state, key)

``step`` is pure and scan-able: the runner folds a per-step key and drives K
steps in one ``lax.scan`` (SURVEY.md idiom shift 1/5 — the reference drives
every sampler from a K-iteration Python loop, e.g. lmc.py:99-104, and its JAX
port even re-jits per step, jax/sgld.py:146). This is the kernel-factory idiom
seeded at reference jax/sgld.py:259-293, made universal.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

__all__ = ["Kernel", "stepsize_at"]


class Kernel(NamedTuple):
    init: Callable
    step: Callable


def stepsize_at(gamma, step):
    """Resolve a stepsize spec at a given (traced) step index.

    ``gamma`` may be a scalar, an array of per-iteration values (reference
    algs.py:401-408 allows tau/mu arrays), or a callable ``step -> value``
    (schedules like the SGLD 0.05 k^-0.55 of reference jax/sgld.py:132).
    """
    if callable(gamma):
        return gamma(step)
    gamma = jnp.asarray(gamma)
    if gamma.ndim == 0:
        return gamma
    return gamma[step]
