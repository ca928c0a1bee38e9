"""Noise-conditional score prior: learned priors beyond DnCNN (round-3).

The PnP-ULA prior (models/dncnn.py) is a *fixed-noise* denoiser whose
residual approximates one scale of the score via Tweedie's identity.  This
module learns the score field itself across a geometric ladder of noise
levels — a compact NCSN-style network (Song & Ermon 2019 family, sized for
the synthetic-phantom class) trained by denoising score matching fully on
device — and provides

  * ``score_fn(x, sigma)``   — the learned ``grad log p_sigma`` at any
    ladder noise level (the net predicts the noise ``eps``; the score is
    ``-eps_hat / sigma``, the standard DSM parametrization);
  * ``score_to_denoiser``    — Tweedie adapter ``D(x) = x + sigma^2 s(x)``
    so the net drops into the existing ``kernels.imaging.pnp_ula``
    (Laumont et al. 2022 use ``eps = sigma^2`` as the MMSE-denoiser
    variance; reference has no learned-prior analogue at all — this
    extends the framework past reference scope);
  * an annealed posterior sampler lives in
    ``kernels.imaging.score_ula``: Langevin with data-consistency drift
    whose prior score anneals down the ladder (annealed-Langevin applied
    to posterior sampling).

Conditioning: Fourier features of ``log sigma`` -> 2-layer MLP -> FiLM
scale/shift per conv block.  All convs are 'SAME' 3x3; the whole forward
is a stack of MXU-friendly batched convolutions with static shapes.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lmc_atomi_tpu.utils.synthetic import random_phantom_batch

__all__ = [
    "ScoreNet",
    "ScoreUNet",
    "train_score_net",
    "make_score_fn",
    "score_to_denoiser",
    "geometric_sigmas",
]


def geometric_sigmas(sigma_max: float, sigma_min: float, n: int,
                     dtype=jnp.float32):
    """Geometric noise ladder sigma_max -> sigma_min (NCSN convention)."""
    return jnp.asarray(
        jnp.exp(jnp.linspace(jnp.log(sigma_max), jnp.log(sigma_min), n)),
        dtype,
    )


class _SigmaEmbed(nn.Module):
    """log-sigma -> Fourier features -> MLP embedding."""

    features: int = 64

    @nn.compact
    def __call__(self, sigma):
        # sigma: (batch,) strictly positive
        logs = jnp.log(sigma)[:, None]
        freqs = 2.0 ** jnp.arange(0, 8, dtype=logs.dtype)
        ff = jnp.concatenate(
            [jnp.sin(logs * freqs), jnp.cos(logs * freqs)], axis=-1
        )
        h = nn.silu(nn.Dense(self.features, name="emb1")(ff))
        return nn.silu(nn.Dense(self.features, name="emb2")(h))


class ScoreNet(nn.Module):
    """Compact noise-conditional residual CNN predicting ``eps``.

    ``__call__(x, sigma) -> eps_hat`` with ``x`` of shape (batch, n, n)
    and ``sigma`` (batch,).  Score: ``-eps_hat / sigma``.
    """

    depth: int = 6
    features: int = 48
    emb_features: int = 64

    @nn.compact
    def __call__(self, x, sigma):
        emb = _SigmaEmbed(self.emb_features, name="sigma_embed")(sigma)
        h = x[..., None]
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv_in")(h)
        for i in range(self.depth - 2):
            scale = nn.Dense(self.features, name=f"film_s{i}")(emb)
            shift = nn.Dense(self.features, name=f"film_b{i}")(emb)
            g = nn.Conv(
                self.features, (3, 3), padding="SAME", name=f"conv{i}"
            )(nn.silu(h))
            g = g * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
            h = h + g  # residual blocks keep gradients healthy at depth
        out = nn.Conv(1, (3, 3), padding="SAME", name="conv_out")(nn.silu(h))
        return out[..., 0]


class _FiLMBlock(nn.Module):
    """Pre-activation residual conv block with FiLM sigma conditioning."""

    features: int

    @nn.compact
    def __call__(self, h, emb):
        scale = nn.Dense(self.features, name="film_s")(emb)
        shift = nn.Dense(self.features, name="film_b")(emb)
        g = nn.Conv(self.features, (3, 3), padding="SAME", name="conv")(
            nn.silu(h)
        )
        g = g * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        if h.shape[-1] != self.features:
            h = nn.Conv(self.features, (1, 1), name="skip")(h)
        return h + g


class ScoreUNet(nn.Module):
    """Noise-conditional U-Net score head (NCSN-style encoder/decoder).

    The flat ``ScoreNet`` sees a (2*depth+1)-pixel receptive field — enough
    for the fine ladder levels but blind to the long-range structure the
    COARSE levels need (at sigma ~ 0.5 the score field is dominated by
    shape-scale features).  Two strided downsamplings widen the field ~4x
    at the bottleneck for the same FLOP budget: stride-2 convs down,
    ``ConvTranspose`` up, concat skips, FiLM conditioning in every block
    (cf. ``ScoreNet``).  ``__call__(x, sigma) -> eps_hat``, x (batch, n, n)
    with n divisible by ``2 ** (len(features) - 1)``.
    """

    features: Tuple[int, ...] = (32, 64, 96)
    emb_features: int = 64

    @nn.compact
    def __call__(self, x, sigma):
        emb = _SigmaEmbed(self.emb_features, name="sigma_embed")(sigma)
        h = nn.Conv(self.features[0], (3, 3), padding="SAME",
                    name="conv_in")(x[..., None])
        skips = []
        for i, f in enumerate(self.features[:-1]):
            h = _FiLMBlock(f, name=f"down{i}")(h, emb)
            skips.append(h)
            h = nn.Conv(self.features[i + 1], (3, 3), strides=(2, 2),
                        padding="SAME", name=f"pool{i}")(h)
        h = _FiLMBlock(self.features[-1], name="mid0")(h, emb)
        h = _FiLMBlock(self.features[-1], name="mid1")(h, emb)
        for i, f in reversed(list(enumerate(self.features[:-1]))):
            h = nn.ConvTranspose(f, (3, 3), strides=(2, 2), padding="SAME",
                                 name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = _FiLMBlock(f, name=f"dec{i}")(h, emb)
        out = nn.Conv(1, (3, 3), padding="SAME", name="conv_out")(nn.silu(h))
        return out[..., 0]


def train_score_net(
    key,
    sigma_max: float = 0.5,
    sigma_min: float = 0.01,
    n_sigmas: int = 10,
    patch: int = 40,
    batch: int = 16,
    steps: int = 1500,
    lr: float = 1e-3,
    depth: int = 6,
    features: int = 48,
    arch: str = "cnn",  # 'cnn' (flat ScoreNet) | 'unet' (ScoreUNet)
    unet_features: Tuple[int, ...] = (32, 64, 96),
    image_class: str = "phantom",  # 'phantom' | 'terrain' | 'photo'
) -> Tuple[dict, Callable, jnp.ndarray]:
    """Denoising score matching on random images of ``image_class``;
    returns ``(params, apply_fn, sigmas)``.

    Per element: draw a ladder level sigma_i, perturb ``x = x0 + sigma_i z``
    and regress ``eps_hat(x, sigma_i) -> z`` — the sigma^2-weighted DSM
    objective in the noise-prediction parametrization (uniform weight on
    ``eps`` <=> lambda(sigma)=sigma^2 on the score residual).
    ``arch="unet"`` trains the wider-receptive-field :class:`ScoreUNet`
    (``patch`` must divide by ``2 ** (len(unet_features) - 1)``).
    """
    import optax

    if arch == "unet":
        model = ScoreUNet(features=tuple(unet_features))
    else:
        model = ScoreNet(depth=depth, features=features)
    sigmas = geometric_sigmas(sigma_max, sigma_min, n_sigmas)
    k_init, k_train = jax.random.split(key)
    params = model.init(
        k_init, jnp.zeros((1, patch, patch)), jnp.ones((1,))
    )
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    if image_class == "terrain":
        from lmc_atomi_tpu.utils.synthetic import random_terrain_batch

        gen_batch = random_terrain_batch
    elif image_class == "photo":
        # real-photograph patches (bundled einstein + hopper, dihedral
        # augmentation) — the class the reference's denoiser priors are
        # trained on
        from lmc_atomi_tpu.utils.synthetic import random_photo_batch

        gen_batch = random_photo_batch
    else:
        gen_batch = random_phantom_batch

    @jax.jit
    def train_step(params, opt_state, k):
        k_img, k_lvl, k_noise = jax.random.split(k, 3)
        clean = gen_batch(k_img, batch, patch)
        lvl = jax.random.randint(k_lvl, (batch,), 0, n_sigmas)
        sig = sigmas[lvl]
        z = jax.random.normal(k_noise, clean.shape, clean.dtype)
        noisy = clean + sig[:, None, None] * z

        def loss_fn(p):
            eps_hat = model.apply(p, noisy, sig)
            return jnp.mean((eps_hat - z) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, _ = train_step(
            params, opt_state, jax.random.fold_in(k_train, i)
        )
    return params, model.apply, sigmas


def make_score_fn(params, apply_fn) -> Callable:
    """Wrap trained params into ``(x, sigma) -> grad log p_sigma(x)`` for a
    single image ``x`` (scalar ``sigma``)."""

    def score(x, sigma):
        sig = jnp.asarray(sigma, x.dtype).reshape(())
        eps_hat = apply_fn(params, x[None], sig[None])[0]
        return -eps_hat / sig

    return score


def score_to_denoiser(score: Callable, sigma: float) -> Callable:
    """Tweedie adapter: ``D(x) = x + sigma^2 * score(x, sigma)`` — an MMSE
    denoiser at noise sd ``sigma``; pair with ``pnp_ula(..., eps=sigma**2)``
    so the drift ``(D(x)-x)/eps`` is exactly the learned score."""

    def denoise(x):
        return x + sigma**2 * score(x, sigma)

    return denoise
