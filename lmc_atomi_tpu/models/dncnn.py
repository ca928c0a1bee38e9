"""DnCNN denoiser prior for Plug-and-Play ULA (BASELINE.json config 5).

A compact residual CNN (Zhang et al. 2017 architecture family, sized for the
synthetic-phantom image class): conv-ReLU stacks predicting the *noise*
residual. Trained in-repo on random synthetic phantoms — there are no
downloadable weights in this environment — with Adam/optax, fully on device.

The trained ``denoiser`` callable plugs straight into
``kernels.imaging.pnp_ula``.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lmc_atomi_tpu.utils.synthetic import random_phantom_batch

__all__ = ["DnCNN", "train_denoiser", "make_denoiser"]


class DnCNN(nn.Module):
    depth: int = 6
    features: int = 32

    @nn.compact
    def __call__(self, x):
        # x: (..., ny, nx) -> add channel dim
        h = x[..., None]
        for i in range(self.depth - 1):
            h = nn.Conv(self.features, (3, 3), padding="SAME", name=f"conv{i}")(h)
            h = nn.relu(h)
        noise = nn.Conv(1, (3, 3), padding="SAME", name="conv_out")(h)
        return x - noise[..., 0]


def train_denoiser(
    key,
    noise_sigma: float = 0.1,
    patch: int = 40,
    batch: int = 16,
    steps: int = 800,
    lr: float = 1e-3,
    depth: int = 6,
    features: int = 32,
) -> Tuple[dict, Callable]:
    """Train DnCNN on random phantoms; returns (params, apply_fn)."""
    import optax

    model = DnCNN(depth=depth, features=features)
    k_init, k_train = jax.random.split(key)
    params = model.init(k_init, jnp.zeros((1, patch, patch)))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, k):
        k_img, k_noise = jax.random.split(k)
        clean = random_phantom_batch(k_img, batch, patch)
        noisy = clean + noise_sigma * jax.random.normal(
            k_noise, clean.shape, clean.dtype
        )

        def loss_fn(p):
            den = model.apply(p, noisy)
            return jnp.mean((den - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = jnp.inf
    for i in range(steps):
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.fold_in(k_train, i)
        )
    return params, model.apply


def make_denoiser(params, apply_fn) -> Callable:
    """Wrap trained params into an image -> image callable (single image)."""

    def denoise(x):
        return apply_fn(params, x[None])[0]

    return denoise
