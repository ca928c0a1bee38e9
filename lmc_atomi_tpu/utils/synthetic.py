"""Random piecewise-smooth synthetic images (device-side, vmappable).

Training data for the PnP denoiser prior and test data for inpainting /
deblurring: random rectangles, disks, and linear ramps composited per PRNG
key — all ``jnp`` ops so batches generate on-chip under vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "random_phantom",
    "random_phantom_batch",
    "random_terrain",
    "random_terrain_batch",
    "photo_bank",
    "random_photo_patch",
    "random_photo_batch",
]


def random_phantom(key, n: int, n_shapes: int = 6, dtype=jnp.float32):
    """One random piecewise-smooth n x n image in [0, 1]."""
    kr, kbg = jax.random.split(key)
    yy, xx = jnp.meshgrid(
        jnp.arange(n, dtype=dtype) / n, jnp.arange(n, dtype=dtype) / n,
        indexing="ij",
    )
    kb1, kb2, kb3 = jax.random.split(kbg, 3)
    img = (
        0.2
        + 0.3 * jax.random.uniform(kb1, (), dtype)
        + 0.3 * jax.random.uniform(kb2, (), dtype) * xx
        + 0.3 * jax.random.uniform(kb3, (), dtype) * yy
    ) * jnp.ones((n, n), dtype)

    def add_shape(img, k):
        kt, kc, ks, kv = jax.random.split(k, 4)
        cy, cx = jax.random.uniform(kc, (2,), dtype, 0.1, 0.9)
        sy, sx = jax.random.uniform(ks, (2,), dtype, 0.05, 0.35)
        val = jax.random.uniform(kv, (), dtype, 0.0, 1.0)
        is_disk = jax.random.bernoulli(kt)
        disk = ((yy - cy) / sy) ** 2 + ((xx - cx) / sx) ** 2 < 1.0
        rect = (jnp.abs(yy - cy) < sy) & (jnp.abs(xx - cx) < sx)
        mask = jnp.where(is_disk, disk, rect)
        return jnp.where(mask, val, img)

    keys = jax.random.split(kr, n_shapes)
    for i in range(n_shapes):
        img = add_shape(img, keys[i])
    return jnp.clip(img, 0.0, 1.0)


def random_phantom_batch(key, batch: int, n: int, dtype=jnp.float32):
    return jax.vmap(lambda k: random_phantom(k, n, dtype=dtype))(
        jax.random.split(key, batch)
    )


def random_terrain(key, n: int, dtype=jnp.float32, beta: float = 1.6):
    """Random natural-statistics textured image in [0, 1] (device-side).

    The per-key randomized counterpart of ``utils/images.py::terrain``:
    1/f^beta spectral synthesis (beta jittered +-0.2 per draw), tanh tone
    curve, and a dark ridge along a random level set.  Training data for
    score/denoiser priors on the terrain class — pure jnp, complex FFT
    intermediates stay inside the surrounding jit."""
    k1, k2, k3 = jax.random.split(key, 3)
    white = jax.random.normal(k1, (n, n), dtype)
    f = jnp.fft.fftfreq(n).astype(dtype)
    rad = jnp.sqrt(f[:, None] ** 2 + f[None, :] ** 2).at[0, 0].set(1.0 / n)
    b = beta + 0.2 * jax.random.uniform(k2, (), dtype, -1.0, 1.0)
    spec = jnp.fft.fft2(white) * rad ** (-b)
    spec = spec.at[0, 0].set(0.0)
    base = jnp.real(jnp.fft.ifft2(spec)).astype(dtype)
    base = (base - base.mean()) / (base.std() + 1e-12)
    img = 0.5 + 0.2 * jnp.tanh(0.9 * base)
    q = jax.random.uniform(k3, (), dtype, 0.35, 0.75)
    thr = jnp.quantile(base, q)
    img = jnp.where(jnp.abs(base - thr) < 0.035, 0.35 * img, img)
    return jnp.clip(img, 0.0, 1.0)


def random_terrain_batch(key, batch: int, n: int, dtype=jnp.float32):
    return jax.vmap(lambda k: random_terrain(k, n, dtype=dtype))(
        jax.random.split(key, batch)
    )


_PHOTO_BANK_CACHE: dict = {}


def photo_bank(dtype=jnp.float32):
    """Stacked bundled photographs (2, 512, 512) scaled to [0, 1].

    The real-image training class: the reference's DnCNN-style priors are
    trained on natural photographs; the two in-repo ones (einstein +
    hopper, `utils/images.py`) form the bank. Loaded once per dtype and
    cached (the PNG decode is host-side numpy)."""
    key = jnp.dtype(dtype).name
    if key not in _PHOTO_BANK_CACHE:
        import numpy as np

        from lmc_atomi_tpu.utils.images import einstein, hopper

        # decode at float64 so a wider requested dtype keeps full precision
        # (the PNGs are uint8, so f64/255 is exact), then cast once
        bank = np.stack(
            [einstein(512, np.float64), hopper(512, np.float64)]
        ) / 255.0
        _PHOTO_BANK_CACHE[key] = jnp.asarray(bank, dtype)
    return _PHOTO_BANK_CACHE[key]


def random_photo_patch(key, n: int, bank):
    """One random n x n patch from ``bank`` (stack of images), augmented
    by the dihedral flips (up-down, left-right, transpose) — the standard
    denoiser-training augmentation. Pure jnp: source image index and crop
    corner via dynamic_slice, so it vmaps/jits."""
    k_im, k_y, k_x, k_f = jax.random.split(key, 4)
    i = jax.random.randint(k_im, (), 0, bank.shape[0])
    y0 = jax.random.randint(k_y, (), 0, bank.shape[1] - n + 1)
    x0 = jax.random.randint(k_x, (), 0, bank.shape[2] - n + 1)
    p = jax.lax.dynamic_slice(bank, (i, y0, x0), (1, n, n))[0]
    fy, fx, tr = jax.random.bernoulli(k_f, 0.5, (3,))
    p = jnp.where(fy, p[::-1], p)
    p = jnp.where(fx, p[:, ::-1], p)
    return jnp.where(tr, p.T, p)


def random_photo_batch(key, batch: int, n: int, dtype=jnp.float32):
    bank = photo_bank(dtype)
    return jax.vmap(lambda k: random_photo_patch(k, n, bank))(
        jax.random.split(key, batch)
    )
