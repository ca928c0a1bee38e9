"""Measured diagnosis of the proximal-SGLD mode-coverage collapse
(round-4 VERDICT item 6; the round-3b MSGLD methodology: matched noise
streams, schedule sweep, prior-strength ablation, plus a long-MALA
ground truth of the SAME composite target).

The reference cannot be consulted: its prox-SGLD classes construct the
prox machinery but the sampling loops run plain ``blackjax.sgld``
(/root/reference/jax/prox_sgld.py:111-216 — ``spgld = blackjax.sgld(...)``),
so the algorithms' behavior has to be characterized from theory and
measurement. Two questions:

1. WHAT SHOULD COVERAGE BE? The prox variants sample a DIFFERENT target
   than the plain-SGLD rows: 25-mode grid mixture TIMES a Laplace(alpha)
   prior. The prior downweights the corner modes by exp(-|mu|_1/alpha)
   (mode (4,4): e^-8). A long small-step MALA chain on the composite
   target gives the honest ceiling for "modes covered /25 at k draws".

2. WHY DID SPGLD SIT AT 4/25? Its prox threshold was CONSTANT
   (moreau_lam*alpha = 0.1/step) instead of step-scaled (g/alpha):
   the implied prior weight is threshold/g, which grows ~40x over the
   reference polynomial schedule — a massively over-regularized target.
   The fix is ``prox_fn(x, g) -> prox_laplace(x, g/alpha)``
   (kernels/sgmcmc.py::_as_stepped_prox).

Run: ``python scripts/diag_prox_sgld.py`` (CPU, ~minutes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from lmc_atomi_tpu.experiments.configs import GRID_POSITIONS
from lmc_atomi_tpu.kernels import mala
from lmc_atomi_tpu.kernels import sgmcmc as S
from lmc_atomi_tpu.models import GridGaussianMixture
from lmc_atomi_tpu.ops.prox import prox_laplace
from lmc_atomi_tpu.run.runner import run_chain_jit

MODES = np.stack(
    np.meshgrid(GRID_POSITIONS, GRID_POSITIONS), -1
).reshape(-1, 2)


def coverage(s):
    d2 = ((np.asarray(s)[None, :, :] - MODES[:, None, :]) ** 2).sum(-1)
    return int((d2.min(1) < 1.0).sum())


def shell_counts(s):
    """Retained draws per L1-radius shell of the nearest mode (the prior
    weights exp(-r/alpha) predict the decay across shells)."""
    s = np.asarray(s)
    d2 = ((s[None, :, :] - MODES[:, None, :]) ** 2).sum(-1)
    near = d2.argmin(0)
    ok = d2.min(0) < 1.0
    r1 = np.abs(MODES).sum(1)[near[ok]]
    return {float(r): int((r1 == r).sum()) for r in np.unique(np.abs(MODES).sum(1))}


def main(k: int = 50000, alpha: float = 1.0, moreau_lam: float = 0.1,
         seed: int = 0):
    gm = GridGaussianMixture.create(GRID_POSITIONS, sigma=0.03, lam=1 / 25.0)
    key = jax.random.PRNGKey(seed)
    x0 = -10 + 20 * jax.random.uniform(key, (2,))

    def logpost(x):
        return gm.log_prob(x) - jnp.abs(x).sum() / alpha

    grad_post = jax.grad(logpost)

    rows = []

    def record(name, s, t):
        row = {"sampler": name, "retained": int(np.asarray(s).shape[0]),
               "modes": coverage(s), "iters_per_sec": round(k / t, 1),
               "shells": shell_counts(s)}
        rows.append(row)
        print(f"{name:36s} modes={row['modes']:2d}/25 "
              f"shells={row['shells']}", file=sys.stderr)

    # --- ground truth: long MALA on the composite target ------------------
    t0 = time.perf_counter()
    kern = mala(logpost, grad_post, 0.02)
    res = run_chain_jit(kern, x0, key, 4 * k, collect="samples")
    jax.block_until_ready(res.samples)
    acc = float(np.asarray(res.infos.accepted).mean())
    record(f"MALA 4x{k} (truth, acc={acc:.2f})", res.samples[::4],
           (time.perf_counter() - t0) / 4)

    # --- the prox family: schedule sweep x prox scaling --------------------
    for scale in (1.0, 8.0):
        sched = S.polynomial_schedule(0.05 * scale, -0.55)
        tag = f"a0={0.05 * scale:g}"
        variants = {
            f"SPGLD const-thresh ({tag})": S.spgld(
                gm.grad_log_prob,
                lambda x: prox_laplace(x, moreau_lam * alpha), sched,
            ),
            f"SPGLD g-scaled ({tag})": S.spgld(
                gm.grad_log_prob,
                lambda x, g: prox_laplace(x, g / alpha), sched,
            ),
            f"SSGLD ({tag})": S.ssgld(
                gm.grad_log_prob,
                lambda x: (x - prox_laplace(x, moreau_lam / alpha))
                / moreau_lam,
                sched,
            ),
            f"MYSGLD ({tag})": S.mysgld(
                gm.grad_log_prob,
                lambda x: prox_laplace(x, moreau_lam / alpha),
                moreau_lam, sched,
            ),
        }
        for name, kern in variants.items():
            t0 = time.perf_counter()
            res = run_chain_jit(kern, x0, key, k, collect="samples")
            jax.block_until_ready(res.samples)
            record(name, res.samples, time.perf_counter() - t0)

    # --- prior-strength ablation (alpha = 4: weaker shrinkage) -------------
    sched = S.polynomial_schedule(0.4, -0.55)
    kern = S.spgld(
        gm.grad_log_prob, lambda x, g: prox_laplace(x, g / 4.0), sched
    )
    t0 = time.perf_counter()
    res = run_chain_jit(kern, x0, key, k, collect="samples")
    jax.block_until_ready(res.samples)
    record("SPGLD g-scaled alpha=4 (a0=0.4)", res.samples,
           time.perf_counter() - t0)

    print(json.dumps({"workload": "diag_prox_sgld", "k": k, "rows": rows}))


if __name__ == "__main__":
    main()
