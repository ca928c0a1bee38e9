"""Sampler-state checkpoint / resume.

The reference has no persistence at all — a failed 80k-step run restarts from
scratch (SURVEY.md §5 "checkpoint/resume: none"). Here any pytree bundle —
sampler state, PRNG key, streaming moments/quantiles, step counters — can be
saved and restored, making 1e5-step runs resumable.

Format: msgpack (flax.serialization) of the state dict with host numpy
leaves; PRNG keys are stored as raw key data and re-wrapped on restore.
Atomic write via rename.
"""
from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint"]

_KEY_TAG = "__prng_key__"


def _is_key(x) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


_NONE_TAG = "__none__"


def _encode(node: Any) -> Any:
    if node is None:
        return {_NONE_TAG: True}
    if isinstance(node, dict):
        return {k: _encode(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_encode(v) for v in node]
    if _is_key(node):
        return {_KEY_TAG: np.asarray(jax.random.key_data(node))}
    return np.asarray(node)


def _decode(node: Any) -> Any:
    if isinstance(node, dict):
        if _NONE_TAG in node:
            return None
        if _KEY_TAG in node:
            return jax.random.wrap_key_data(jnp.asarray(node[_KEY_TAG]))
        return {k: _decode(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_decode(v) for v in node]
    return node


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialize a pytree bundle (flax structs, dicts, arrays) atomically."""
    state = serialization.to_state_dict(tree)
    payload = serialization.msgpack_serialize(_encode(state))
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a bundle saved by :func:`save_checkpoint`; ``template`` is a
    pytree with the target structure (e.g. a freshly built state)."""
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(template, _decode(data))
