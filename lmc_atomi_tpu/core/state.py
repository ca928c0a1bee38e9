"""Sampler state pytrees.

The reference holds chain state in Python locals and hoards samples in Python
lists (reference lmc.py:98-104, prox_lmc_deconv.py:447-475). Here every kernel
carries an immutable pytree state through ``lax.scan``; auxiliary per-step
output (acceptance flags, energies) flows through a parallel ``info`` pytree.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["SamplerState", "StepInfo"]


@struct.dataclass
class SamplerState:
    """Generic Langevin sampler state.

    Attributes:
      position: current chain position (any pytree of arrays; typically one
        array of shape ``(d,)`` or an image ``(ny, nx)``).
      step: iteration counter (int32 scalar).
      extras: kernel-specific state (e.g. ULPDA dual variable and
        extrapolated primal, PP-ULA warm starts). ``None`` for simple kernels.
    """

    position: Any
    step: jnp.ndarray
    extras: Optional[Any] = None

    @classmethod
    def init(cls, position, extras=None) -> "SamplerState":
        return cls(
            position=position,
            step=jnp.zeros((), jnp.int32),
            extras=extras,
        )

    def next(self, position, extras=None) -> "SamplerState":
        return self.replace(
            position=position,
            step=self.step + 1,
            extras=self.extras if extras is None else extras,
        )


@struct.dataclass
class StepInfo:
    """Per-step diagnostics emitted by kernels.

    ``accepted`` reproduces the reference MALA bookkeeping (reference
    lmc.py:128-131 drops rejected proposals; under scan we keep the standard
    stay-at-current-state chain plus this mask and filter at eval time).
    """

    accepted: Optional[jnp.ndarray] = None
    log_accept_ratio: Optional[jnp.ndarray] = None
    energy: Optional[jnp.ndarray] = None
