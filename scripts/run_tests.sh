#!/bin/bash
# Verified full-suite workflow (round 5). A MONOLITHIC `python -m pytest
# tests/` run segfaults (RC=139) late in the run, inside XLA's native
# backend_compile_and_load while compiling a scan-of-interpret-pallas
# program (observed at test_ulpda_tiled / test_wavelet_fused in rounds
# 4-5) -- accumulated native process state, NOT a test bug: every group
# below passes in a fresh interpreter. The suite therefore runs as four
# sequential processes over disjoint file groups covering ALL of tests/
# (a guard below fails if a new test file is missing from the groups).
# Nonzero exit if any group fails. Extra pytest args pass through.
set -u
cd "$(dirname "$0")/.."
groups=(
  "tests/test_diagnostics.py tests/test_emd_native.py tests/test_eval.py tests/test_experiments.py tests/test_fused_quantiles.py tests/test_imaging_kernels.py tests/test_kernels.py tests/test_linops.py"
  "tests/test_longrun_trace.py tests/test_make_results.py tests/test_misc_robustness.py tests/test_models.py tests/test_multihost.py tests/test_myula_fused.py tests/test_myula_pallas.py tests/test_myula_tiled.py"
  "tests/test_parallel.py tests/test_parity_extras.py tests/test_png.py tests/test_pnp_inpainting.py tests/test_precision_parity.py tests/test_prox.py tests/test_score.py tests/test_sgld.py tests/test_statistical.py tests/test_stats.py"
  "tests/test_tpu_lowering.py tests/test_tv.py tests/test_tv_pallas.py tests/test_ulpda_fused.py tests/test_ulpda_tiled.py tests/test_wavelet_fused.py tests/test_wavelet_radon.py"
)
# coverage guard: every tests/test_*.py must appear in exactly one group
all_listed=$(printf '%s\n' "${groups[@]}" | tr ' ' '\n' | sort)
all_files=$(ls tests/test_*.py | sort)
if [ "$all_listed" != "$all_files" ]; then
  echo "run_tests.sh: group lists are stale vs tests/ directory:" >&2
  diff <(echo "$all_listed") <(echo "$all_files") >&2
  exit 2
fi
rc=0
for g in "${groups[@]}"; do
  echo "=== pytest $g"
  python -m pytest $g -q "$@" || rc=1
done
exit $rc
