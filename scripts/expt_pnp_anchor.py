"""Generate `assets/results_pnp_anchor.json`: the PnP-vs-TV anchor
comparison on ONE shared observation (round-3 VERDICT item 5).

Runs, all on the identical 256^2 blurred/noisy observation (same seed):
  1. a 64-chain PnP-ULA posterior (alpha=1.0) WITH the fused TV-MYULA
     baseline on a converged 20k-step budget (in-kernel P^2 CI maps),
  2. an alpha ablation pair (1.0 vs 0.3) at 8 chains each,
and writes the merged report consumed by `scripts/make_results.py::sec_pnp`.

Usage: `python scripts/expt_pnp_anchor.py` (TPU, ~10 min; trains the
SN-DnCNN prior once and caches it in /tmp).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmc_atomi_tpu.experiments.pnp import pnp_ula_deblur

PARAMS = "/tmp/pnp_anchor_params.msgpack"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "results_pnp_anchor.json",
)


def main(n_chains: int = 64, n_steps: int = 2000, tv_steps: int = 20000,
         tau_tv: float = 15.0, ablation_chains: int = 8, out: str = OUT):
    # tau_tv=15 is the sweep winner on this observation (20k-step
    # posterior-mean PSNR: tau 2/5/8/10/15/20 -> 15.9/23.9/25.7/26.1/
    # 26.2/26.0 dB) — the anchor row must show the best TV can do
    _, _, rep = pnp_ula_deblur(
        size=256, n_chains=n_chains, n_steps=n_steps, params_path=PARAMS,
        tv_baseline=True, tau_tv_baseline=tau_tv, tv_steps=tv_steps,
        score_baseline=True, make_plots=False,
    )
    report = {
        "n_chains": n_chains, "n_steps": n_steps, "tv_steps": tv_steps,
        "tau_tv_baseline": tau_tv, "ablation_n_chains": ablation_chains,
        **{k: rep[k] for k in (
            "psnr_posterior_mean", "mean_ci_width",
            "psnr_tv_baseline_mean", "tv_baseline_ci_width",
            "psnr_score_mean", "score_ci_width",
            "lipschitz_certified_bound", "lipschitz_measured",
        )},
    }
    for alpha in (1.0, 0.3):
        _, _, r = pnp_ula_deblur(
            size=256, n_chains=ablation_chains, n_steps=n_steps,
            params_path=PARAMS, alpha=alpha, tv_baseline=False,
            make_plots=False,
        )
        report[f"psnr_alpha_{alpha}"] = r["psnr_posterior_mean"]
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    from lmc_atomi_tpu.utils.cli import auto_cli

    auto_cli(main)
