#!/bin/bash
# Deconvolution: MAP + both samplers (equivalent of reference expt_deconv.sh)
set -e
cd "$(dirname "$0")/.."
python -m lmc_atomi_tpu.experiments.deconv --compute_map true --niter_map 1000
python -m lmc_atomi_tpu.experiments.deconv --alg ULPDA --n_steps 1000
python -m lmc_atomi_tpu.experiments.deconv --alg MYULA --n_steps 1000
