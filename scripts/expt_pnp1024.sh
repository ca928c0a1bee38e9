#!/bin/bash
# BASELINE.json config 5 as written: 1024-chain PnP-ULA credible-interval
# farm at 256^2, run as 16 independent 64-chain invocations (each short
# enough for the tunneled TPU runtime, each resumable/retryable) that share
# one trained SN-DnCNN prior and pool their Welford moments at the end.
set -o pipefail
cd "$(dirname "$0")/.."
PARAMS=${PARAMS:-/tmp/pnp_params.msgpack}
OUT=${OUT:-/tmp}

# 1. train the prior once (no-op if the checkpoint already exists)
if [ ! -f "$PARAMS" ]; then
  timeout 1800 python -m lmc_atomi_tpu.experiments.pnp \
    --train_only true --params_path "$PARAMS" --make_plots false || exit 1
fi

# 2. 16 x 64-chain blocks, disjoint key streams via --chain_offset
for b in $(seq 0 15); do
  f="$OUT/pnp_block_$b.npz"
  [ -f "$f" ] && continue
  for attempt in 1 2 3; do
    if timeout 600 python -m lmc_atomi_tpu.experiments.pnp \
        --n_chains 64 --chain_block 64 --chain_offset $((b * 64)) \
        --params_path "$PARAMS" --moments_out "$f" --make_plots false; then
      break
    fi
    echo "block $b attempt $attempt failed, retrying" >&2
    sleep 30
  done
done

# 3. pool the farm
python -m lmc_atomi_tpu.experiments.pnp merge \
  --pattern "$OUT/pnp_block_*.npz" --out "$OUT/pnp_1024_final.npz"
