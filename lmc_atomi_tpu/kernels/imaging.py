"""Imaging-scale samplers: ULPDA, MYULA, PnP-ULA (components C4/C5).

Library-grade kernels over functional objects (the ``L2Data``/``L21Norm``/
``TVNorm``/``L2NcvxTV`` protocol), redesigned from the reference's
``UnadjustedLangevinPrimalDual`` (algs.py:295-474) and
``MoreauYosidaUnadjustedLangevin`` (algs.py:477-587):

  * state (x, y, xbar) is an explicit pytree carried through ``lax.scan``;
  * per-iteration tau/mu arrays are supported via ``stepsize_at``
    (reference algs.py:401-408);
  * noise is on-chip threefry; the posterior mean/variance accumulate in the
    runner's streaming moments instead of sample hoarding
    (reference prox_lmc_deconv.py:474-475).

PnP-ULA (BASELINE.json config 5) follows Laumont et al. 2022: the prior score
is ``(D_eps(x) - x)/eps`` for a (learned or analytic) denoiser ``D_eps``,
plus a box projection drift for stability.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lmc_atomi_tpu.core.random import normal_like
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.kernels.base import Kernel, stepsize_at

__all__ = [
    "ulpda",
    "myula_imaging",
    "pnp_ula",
    "score_ula",
    "score_ula_pc",
    "ULPDAExtras",
]


class ULPDAExtras(NamedTuple):
    y: Any  # dual variable
    xbar: Any  # extrapolated primal
    # previous primal iterate (tiled kernel only): resuming from xprev is
    # EXACT, while inverting xbar costs ~1 ulp that the non-contractive
    # primal-dual iteration amplifies exponentially (~4x/step measured)
    xprev: Any = None


def ulpda(
    proxf,
    proxg,
    a_op,
    tau,
    mu,
    theta: float = 1.0,
    z: Optional[jnp.ndarray] = None,
    gfirst: bool = True,
    noise_scale: float = 1.0,
) -> Kernel:
    """Unadjusted Langevin Primal-Dual (Chambolle-Pock + primal noise).

    gfirst=True recursion (reference algs.py:370-381, 435-441):
        y    <- proxdual_g(y + mu A xbar, mu)
        x    <- prox_f(x - tau (A^T y + z), tau) + sqrt(2 tau) xi
        xbar <- x + theta (x - x_old)
    gfirst=False applies the primal update first (algs.py:383-392, 442-448).
    Convergence needs tau mu lambda_max(A^T A) < 1 (algs.py:381).

    ``a_op`` is any LinOp — forward-difference TV duals
    (``Gradient2D`` + ``L21Norm``/``L1Norm``) or orthogonal wavelet-domain
    duals (``DaubechiesDWT2D`` + ``L1Norm``), matching the reference's
    generic-operator ULPDA (algs.py:436-448). ``noise_scale=0`` recovers
    deterministic Chambolle-Pock (for MAP cross-checks).
    """

    def init(x0, y0=None):
        y = a_op.matvec(x0) * 0.0 if y0 is None else y0
        return SamplerState.init(x0, extras=ULPDAExtras(y=y, xbar=x0))

    def step(state, key):
        t = stepsize_at(tau, state.step)
        m = stepsize_at(mu, state.step)
        xi = noise_scale * normal_like(key, state.position)
        x_old = state.position
        y = state.extras.y
        xbar = state.extras.xbar

        if gfirst:
            y = proxg.proxdual(y + m * a_op.matvec(xbar), m)
            aty = a_op.rmatvec(y)
            if z is not None:
                aty = aty + z
            x = proxf.prox(x_old - t * aty, t) + jnp.sqrt(2 * t) * xi
            xbar = x + theta * (x - x_old)
        else:
            aty = a_op.rmatvec(y)
            if z is not None:
                aty = aty + z
            x = proxf.prox(x_old - t * aty, t) + jnp.sqrt(2 * t) * xi
            xbar = x + theta * (x - x_old)
            y = proxg.proxdual(y + m * a_op.matvec(xbar), m)

        return state.next(x, extras=ULPDAExtras(y=y, xbar=xbar)), StepInfo()

    return Kernel(init, step)


def myula_imaging(proxf, proxg, tau, gamma, epsg: float = 1.0) -> Kernel:
    """Moreau-Yosida ULA over functionals (reference algs.py:528-535, 569):

        x <- (1 - tau/gamma) x - tau grad_f(x)
             + (tau/gamma) prox_g(x, epsg*gamma) + sqrt(2 tau) xi
    """

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        t = stepsize_at(tau, state.step)
        g = stepsize_at(gamma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        x_new = (
            (1.0 - t / g) * x
            - t * proxf.grad(x)
            + (t / g) * proxg.prox(x, epsg * g)
            + jnp.sqrt(2 * t) * xi
        )
        return state.next(x_new), StepInfo()

    return Kernel(init, step)


def pnp_ula(
    grad_f: Callable,
    denoiser: Callable,
    tau,
    eps: float,
    alpha: float = 1.0,
    box: Optional[tuple] = None,
    box_weight: Optional[float] = None,
) -> Kernel:
    """Plug-and-Play ULA (Laumont et al. 2022; BASELINE.json config 5):

        x <- x - tau grad_f(x) + tau (alpha/eps)(D_eps(x) - x)
               + tau/lam_box (proj_C(x) - x) + sqrt(2 tau) xi

    ``denoiser`` is any callable image -> image (a trained CNN denoiser or an
    analytic one); ``box=(lo, hi)`` adds the compact-set projection drift that
    guarantees ergodicity.
    """

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        t = stepsize_at(tau, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        drift = -grad_f(x) + (alpha / eps) * (denoiser(x) - x)
        if box is not None:
            lw = box_weight if box_weight is not None else eps
            drift = drift + (jnp.clip(x, box[0], box[1]) - x) / lw
        return state.next(x + t * drift + jnp.sqrt(2 * t) * xi), StepInfo()

    return Kernel(init, step)


def score_ula(
    grad_f: Callable,
    score: Callable,
    sigma,
    tau,
    alpha: float = 1.0,
    box: Optional[tuple] = None,
    box_weight: float = 1.0,
) -> Kernel:
    """Posterior Langevin with a learned noise-conditional score prior
    (models/score.py) — annealed when ``sigma`` is a schedule:

        x <- x - tau_i grad_f(x) + tau_i alpha s_theta(x, sigma_i)
               + tau_i/lam_box (proj_C(x) - x) + sqrt(2 tau_i) xi

    ``sigma`` and ``tau`` follow the ``stepsize_at`` spec (scalar, per-step
    array, or callable of the step index), so an annealed-Langevin ladder is
    just ``sigma=jnp.repeat(sigmas, steps_per_level)`` with the matching
    ``tau`` schedule (Song & Ermon anneal ``tau_i ∝ sigma_i^2``); a scalar
    ``sigma`` recovers fixed-level PnP-ULA with ``eps = sigma^2``
    (Tweedie: ``alpha/eps (D_eps(x)-x) = alpha s_theta(x, sigma)``).
    Goes beyond the reference (no learned priors there); the fixed-level
    equivalence is tested against ``pnp_ula`` +
    ``models.score.score_to_denoiser``.
    """

    def init(x0):
        return SamplerState.init(x0)

    def step(state, key):
        t = stepsize_at(tau, state.step)
        s = stepsize_at(sigma, state.step)
        xi = normal_like(key, state.position)
        x = state.position
        drift = -grad_f(x) + alpha * score(x, s)
        if box is not None:
            drift = drift + (jnp.clip(x, box[0], box[1]) - x) / box_weight
        return state.next(x + t * drift + jnp.sqrt(2 * t) * xi), StepInfo()

    return Kernel(init, step)


def score_ula_pc(
    grad_f: Callable,
    score: Callable,
    sigma,
    tau,
    alpha: float = 1.0,
    n_corrector: int = 1,
    snr: float = 0.16,
    box: Optional[tuple] = None,
    box_weight: float = 1.0,
) -> Kernel:
    """Predictor-corrector annealed score sampling (Song et al. 2021 PC
    sampler, posterior form — beyond the reference, which has no learned
    priors at all).

    Each kernel step = one :func:`score_ula` predictor step at
    ``(sigma_i, tau_i)`` followed by ``n_corrector`` Langevin corrector
    sweeps at the SAME level with the SNR-calibrated step
    ``eps_i = min(2 (snr sigma_i)^2, tau_i)`` (for a conditional score
    ``s ~ -z/sigma``, Song's ``2 alpha (snr ||z||/||s||)^2`` reduces to
    ``2 (snr sigma)^2``; the ``tau_i`` clamp keeps the data-term drift
    inside its stability region).  The correctors re-equilibrate each
    annealing level before the ladder moves on, which is where annealed
    Langevin leaves accuracy on sharp multimodal priors.

    ``n_corrector=0`` reduces EXACTLY to ``score_ula`` (same noise stream:
    the predictor consumes the undivided step key).  Corrector noise comes
    from per-sweep ``fold_in`` subkeys, so the kernel stays scan- and
    checkpoint-safe.
    """

    def init(x0):
        return SamplerState.init(x0)

    def drift_at(x, s):
        d = -grad_f(x) + alpha * score(x, s)
        if box is not None:
            d = d + (jnp.clip(x, box[0], box[1]) - x) / box_weight
        return d

    def step(state, key):
        t = stepsize_at(tau, state.step)
        s = stepsize_at(sigma, state.step)
        x = state.position
        # predictor: consumes the undivided key = score_ula's stream
        x = x + t * drift_at(x, s) + jnp.sqrt(2 * t) * normal_like(key, x)
        eps = jnp.minimum(2.0 * (snr * s) ** 2, t)
        for j in range(n_corrector):
            kj = jax.random.fold_in(key, j + 1)
            x = (
                x + eps * drift_at(x, s)
                + jnp.sqrt(2 * eps) * normal_like(kj, x)
            )
        return state.next(x), StepInfo()

    return Kernel(init, step)
