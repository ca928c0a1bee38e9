"""Imaging and MCMC quality metrics (component C15/C17 reporting).

``snr`` follows the reference's definition exactly
(prox_lmc_deconv.py:35-36); ``psnr``/``mse`` follow the skimage conventions
the reference imports (peak_signal_noise_ratio / mean_squared_error with
``data_range`` inferred from the true image unless given).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["snr", "psnr", "mse", "acceptance_rate", "effective_sample_mask"]


def snr(image_true, image_test):
    """20 log10(||x|| / ||x_hat - x||)  (reference prox_lmc_deconv.py:35-36)."""
    num = jnp.linalg.norm(jnp.ravel(image_true))
    den = jnp.linalg.norm(jnp.ravel(image_test - image_true))
    return 20.0 * jnp.log10(num / den)


def mse(image_true, image_test):
    return jnp.mean(jnp.square(image_true - image_test))


def psnr(image_true, image_test, data_range=None):
    """Peak SNR; ``data_range`` defaults to max-min of the true image
    (skimage semantics for float inputs)."""
    if data_range is None:
        data_range = jnp.max(image_true) - jnp.min(image_true)
    err = mse(image_true, image_test)
    return 10.0 * jnp.log10((data_range**2) / err)


def acceptance_rate(infos):
    """Fraction of accepted MH steps — the reference's 'percentage of
    effective samples' print (lmc.py:275-276)."""
    return jnp.mean(infos.accepted.astype(jnp.float32))


def effective_sample_mask(infos):
    """Boolean mask of accepted steps: filtering stacked samples with it
    reproduces the reference MALA's dropped-rejection sample set
    (lmc.py:128-131; SURVEY.md idiom shift 3)."""
    return infos.accepted
