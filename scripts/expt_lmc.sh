#!/bin/bash
# Sweep: Gaussian-mixture LMC over step sizes x mixture sizes
# (equivalent of reference expt_lmc.sh:1-11)
set -e
cd "$(dirname "$0")/.."
for gamma in 0.1 0.05 0.01; do
  for n in 1 2 3 4 5; do
    python -m lmc_atomi_tpu.experiments.mixtures \
      --gamma_ula "$gamma" --gamma_mala "$gamma" --gamma_pula "$gamma" \
      --gamma_ihpula "$gamma" --gamma_mla "$gamma" \
      --n "$n" --k 10000
  done
done
