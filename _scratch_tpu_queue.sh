#!/bin/bash
cd /root/repo
echo "=== 1024-chain PnP ==="
timeout 3000 python -m lmc_atomi_tpu.experiments.pnp --size 256 --n_chains 1024 --chain_block 64 --train_steps 1500 --n_steps 2000 --burn_in 200 --make_plots false 2>&1 | grep -viE "^warning|futurewarn" | tail -4
echo "=== wavelet comparison ==="
timeout 3000 python /root/repo/_scratch_wav.py 2>&1 | tail -10
echo "=== queue done ==="
