"""MCMC convergence diagnostics: autocorrelation ESS and split-R-hat.

The reference's only mixing diagnostic is the MH acceptance ratio
(lmc.py:275-276). A production sampling framework needs quantitative ones:

  * ``effective_sample_size`` — Geyer initial-positive-sequence estimator on
    FFT autocorrelations, vectorized over parameter dimensions;
  * ``split_rhat`` — Gelman-Rubin potential scale reduction on split halves,
    vectorized over chains x steps x dims.

Both run on-device (one FFT per dimension) and accept stacked samples from
``run_chain(s)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "autocorrelation",
    "effective_sample_size",
    "rhat_from_moments",
    "split_rhat",
]


def autocorrelation(x, max_lag=None):
    """Normalized autocorrelation of a (steps,) or (steps, dims) series via
    FFT (Wiener-Khinchin)."""
    x = jnp.atleast_2d(x.T).T  # (n, d)
    n = x.shape[0]
    xc = x - x.mean(axis=0, keepdims=True)
    size = 2 * n  # zero-padding for linear (not circular) correlation
    f = jnp.fft.rfft(xc, n=size, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=0)[:n].real
    acov = acov / jnp.arange(n, 0, -1)[:, None]
    rho = acov / jnp.maximum(acov[0:1], 1e-30)
    if max_lag is not None:
        rho = rho[: max_lag + 1]
    return rho


def effective_sample_size(x):
    """Geyer initial-positive-sequence ESS for (steps,) or (steps, dims).

    Geyer pairs are Gamma_m = rho_{2m} + rho_{2m+1} (including rho_0 = 1);
    these are guaranteed positive for reversible chains, so summation stops
    at the first non-positive pair: tau = 2 sum Gamma_m - 1, ESS = n / tau.
    Returns a scalar (1-D input) or (dims,) array.
    """
    squeeze = x.ndim == 1
    rho = autocorrelation(x)  # (n, d)
    n, d = rho.shape
    n_pairs = n // 2
    pair_sums = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)
    positive = pair_sums > 0
    # stop at the first non-positive Gamma_m (Geyer initial positive seq.)
    keep = jnp.cumprod(positive.astype(jnp.float32), axis=0)
    tau = 2.0 * jnp.sum(pair_sums * keep, axis=0) - 1.0
    ess = n / jnp.maximum(tau, 1.0 / n)
    ess = jnp.clip(ess, 1.0, n)
    return ess[0] if squeeze else ess


def split_rhat(samples):
    """Split-R-hat over samples of shape (chains, steps, ...dims).

    Each chain is split in half (doubling the chain count); R-hat compares
    between- and within-half variances. Values near 1 indicate convergence.
    """
    c, n = samples.shape[:2]
    half = n // 2
    x = samples[:, : 2 * half]
    x = x.reshape((2 * c, half) + samples.shape[2:])
    mean_per = x.mean(axis=1)
    var_per = x.var(axis=1, ddof=1)
    w = var_per.mean(axis=0)
    b = half * mean_per.var(axis=0, ddof=1)
    var_hat = (half - 1) / half * w + b / half
    return jnp.sqrt(var_hat / jnp.maximum(w, 1e-30))


def rhat_from_moments(moments):
    """Gelman-Rubin potential scale reduction from per-chain STREAMING
    moments (``RunningMoments`` with a leading chain axis) — no sample
    hoarding, so it works on the fused in-VMEM runners that keep only
    Welford summaries.  Unsplit (between-chain vs within-chain): within
    W = mean_c var_c, between B = n * var_c(mean_c);
    ``rhat = sqrt(((n-1)/n W + B/n) / W)``.  Split-R-hat (``split_rhat``)
    is sharper when full sample arrays are available."""
    cnt = jnp.asarray(moments.count, jnp.float32)
    n = jnp.maximum(cnt.min(), 2.0)
    means = moments.mean  # (chains, ...)
    denom = jnp.maximum(cnt - 1.0, 1.0).reshape(
        (-1,) + (1,) * (means.ndim - 1)
    )
    w = (moments.m2 / denom.astype(means.dtype)).mean(axis=0)
    b = n * means.var(axis=0, ddof=1)
    var_hat = (n - 1.0) / n * w + b / n
    return jnp.sqrt(var_hat / jnp.maximum(w, 1e-30))
