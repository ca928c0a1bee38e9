#!/usr/bin/env bash
# Round-3 TPU measurement pass (run when the tunnel is up).
# Each step is independent; comment out what's already recorded.
set -x
cd "$(dirname "$0")/.."

# 1. Canonical bench (headline + warm5 + fused-ULPDA + CI extras)
python bench.py 2>bench_r3.stderr | tee /tmp/bench_r3.json

# 2. TPU-gated statistical tests (noise statistics, PSNR parity,
#    new wavelet/packed kernels)
LMC_TEST_TPU=1 python -m pytest tests/test_myula_fused.py \
  tests/test_ulpda_fused.py tests/test_wavelet_fused.py \
  tests/test_fused_quantiles.py -q -k "TPU or noise or contracts"

# 3. Lane packing aggregate (new packed rows at 64^2/32^2)
python scripts/bench_multichain.py

# 4. Fused wavelet kernels at 512^2 (inpainting, haar + d4)
python -m lmc_atomi_tpu.experiments.inpainting --size 512 --n_steps 2000 \
  --burn_in 200 --fused true --make_plots false
python -m lmc_atomi_tpu.experiments.inpainting --size 512 --n_steps 2000 \
  --burn_in 200 --wavelet d4 --fused true --make_plots false

# 5. Multichain UQ numbers
python -m lmc_atomi_tpu.experiments.multichain --size 64 --n_chains 8 \
  --n_steps 20000 --burn_in 2000 --make_plots false

# 6. CT with FBP init + PC correctors (updates the CT table inputs)
python -m lmc_atomi_tpu.experiments.ct --size 128 --n_angles 30 \
  --make_plots false --score_prior true --pc_correctors 1

# 7. Deconvolution wavelet row (fused wl1 dual at 512^2)
python -m lmc_atomi_tpu.experiments.deconv --size 512 --n_steps 1000 \
  --alg ULPDA --wavelet_row true --make_plots false

# 7b. Second natural photograph (hopper) deconv rows (round-3c addition;
#     regenerates the full deconv section including the new hopper table)
python scripts/make_results.py --sections deconv --out /tmp/RESULTS_deconv.md

# 8. Regenerate the RESULTS sections whose generators changed
python scripts/make_results.py --sections wavelets,ci,multichain,ct \
  --out /tmp/RESULTS_new_sections.md
