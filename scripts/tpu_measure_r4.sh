#!/bin/bash
# Round-4 TPU measurement runbook — run when the tunnel is healthy:
#   bash scripts/tpu_measure_r4.sh [outdir]
# Each block appends JSON to $OUT; every run is independently resumable
# (re-running skips nothing but is idempotent in effect).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-fig/r4_measurements}
mkdir -p "$OUT"

run() { # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name ==="
  timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log"
}

# 1. 1024^2 fused CI with HBM-paged markers (VERDICT item 1 gate: >=5k)
run ci1024 python scripts/bench_ci_1024.py

# 2. fused-ULPDA frontier (item 4): Chebyshev trips + ME-TV env-warm
run ulpda_frontier python scripts/bench_ulpda_frontier.py

# 3. CT convergence at 256^2/90 (item 2): budget + tau sweep, CI map
run ct256_long python -m lmc_atomi_tpu.experiments.ct \
  --size 256 --n_angles 90 --n_steps 20000 --burn_in 4000 \
  --segment_steps 500 --ci_quantiles "(0.025,0.975)" --pnp false \
  --score_prior false --make_plots false
run ct256_tau05 python -m lmc_atomi_tpu.experiments.ct \
  --size 256 --n_angles 90 --n_steps 20000 --burn_in 4000 --tau_scale 0.5 \
  --segment_steps 500 --pnp false --make_plots false
run ct256_tv15 python -m lmc_atomi_tpu.experiments.ct \
  --size 256 --n_angles 90 --n_steps 20000 --burn_in 4000 --tau_tv 15 \
  --segment_steps 500 --pnp false --make_plots false

# 4. learned-prior row at the 512^2 north star (item 3), both photographs
run deconv_score_einstein python -m lmc_atomi_tpu.experiments.deconv \
  --size 512 --image einstein --n_steps 20000 --alg MYULA \
  --score_row true --collect_metrics false --make_plots false
run deconv_score_hopper python -m lmc_atomi_tpu.experiments.deconv \
  --size 512 --image hopper --n_steps 20000 --alg MYULA \
  --score_row true --collect_metrics false --make_plots false

# 5. third real-capture image: deconv protocol at its native 256^2
run deconv_mri python -m lmc_atomi_tpu.experiments.deconv \
  --size 256 --image mri --n_steps 20000 --alg MYULA \
  --collect_metrics false --make_plots false
run deconv_mri_map python -m lmc_atomi_tpu.experiments.deconv \
  --size 256 --image mri --compute_map true --niter_map 1000 \
  --collect_metrics false --make_plots false

# 6. Laplace-mixture at the reference sweep's K=80000 (item 8b)
run laplace80k python -m lmc_atomi_tpu.experiments.laplace_mixtures \
  --k 80000 --make_plots false

# 7. stochastic fused kernel under a 1-device mesh (item 5 tail)
run mesh_stochastic python - <<'EOF'
import jax, numpy as np, jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from lmc_atomi_tpu.core.random import chain_keys
from lmc_atomi_tpu.kernels.myula_fused import run_myula_tv_fused
from lmc_atomi_tpu.ops.functionals import L2Data
from lmc_atomi_tpu.ops.linops import CirculantBlur2D, uniform_kernel
from lmc_atomi_tpu.parallel.mesh import chain_mesh
from lmc_atomi_tpu.utils.images import phantom
n = 256
img = jnp.asarray(phantom(n), jnp.float32)
blur = CirculantBlur2D.from_kernel((n, n), uniform_kernel(5, jnp.float32))
y = jax.jit(lambda im, k: blur.matvec(im) + 0.75 * jax.random.normal(k, im.shape))(
    img, jax.random.PRNGKey(0))
l2 = L2Data.create(op=blur, b=y, sigma=1 / 0.75**2)
gamma = 0.75**2
x0 = jnp.zeros((1, n, n)); keys = chain_keys(jax.random.PRNGKey(4), 1)
farm = lambda x, k: jax.vmap(lambda xi, ki: run_myula_tv_fused(
    l2, 0.3, 0.2 * gamma, gamma, xi, ki, 2000, block=500, burn_in=500,
    quantiles=(0.025, 0.975)).moments.mean)(x, k)
out = jax.jit(jax.shard_map(farm, mesh=chain_mesh(1),
    in_specs=(P("chains"), P("chains")), out_specs=P("chains"),
    check_vma=False))(x0, keys)
out.block_until_ready()
assert np.isfinite(np.asarray(out)).all()
print("stochastic fused kernel under 1-device mesh: OK, mean finite,",
      "shape", out.shape)
EOF

# 8. canonical bench + SGLD table refresh on the device
run bench python bench.py
run sgld_table python -c "
from lmc_atomi_tpu.experiments.sgld_runs import sgld_grid_mixture
sgld_grid_mixture(make_plots=False)"

echo "=== all round-4 measurements done; logs in $OUT ==="
