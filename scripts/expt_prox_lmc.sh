#!/bin/bash
# Sweep: proximal LMC on mixture x Laplace prior
# (equivalent of reference expt_prox_lmc.sh:1-14)
set -e
cd "$(dirname "$0")/.."
for gamma in 0.05 0.01; do
  for lamda in 0.01 0.001; do
    for n in 1 2 3 4 5; do
      python -m lmc_atomi_tpu.experiments.prox_mixtures \
        --gamma_pgld "$gamma" --gamma_myula "$gamma" --gamma_mymala "$gamma" \
        --gamma_ppula "$gamma" --gamma_fbula "$gamma" --gamma_lbmumla "$gamma" \
        --lamda "$lamda" --n "$n" --k 10000
    done
  done
done
