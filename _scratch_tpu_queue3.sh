#!/bin/bash
set -o pipefail
cd /root/repo
for b in $(seq 1 15); do
  for attempt in 1 2 3; do
    if timeout 500 python _scratch_pnp_block.py $b /tmp/pnp_block_$b.npz 2>/dev/null; then
      break
    fi
    echo "block $b attempt $attempt failed, retrying"
    sleep 30
  done
done
echo "=== merge ==="
timeout 300 python _scratch_pnp_merge.py 2>&1 | tail -2
echo "=== wavelet comparison ==="
timeout 3000 python /root/repo/_scratch_wav.py 2>&1 | grep -E "^(phantom|einstein)|Error" | tail -10
echo "=== longrun measurement ==="
timeout 900 python /root/repo/_scratch_longrun.py 2>&1 | grep -v WARNING | tail -3
echo "=== queue3 done ==="
