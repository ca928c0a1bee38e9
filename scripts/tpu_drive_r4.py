"""Flap-tolerant round-4 TPU measurement driver.

The axon tunnel comes and goes in windows of a few minutes (see
/tmp/tpu_status history), so a monolithic runbook dies mid-stage and
loses everything. This driver runs the round-4 measurement stages ONE AT
A TIME, probing the tunnel first, recording per-stage completion in
``fig/r4_measurements/done.json`` so finished stages are never re-run,
and retrying tunnel-killed stages (timeout / hang) on the next UP window.

    python scripts/tpu_drive_r4.py            # run until all stages done
    python scripts/tpu_drive_r4.py --once     # one pass over pending stages
    python scripts/tpu_drive_r4.py --status   # print the ledger and exit

A stage that exits nonzero WITH a Python traceback (a real bug, not a
tunnel drop) is marked "fail" after MAX_REAL_FAILURES attempts and
skipped thereafter — fix the bug, delete its ledger entry, re-run.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "fig", "r4_measurements")
LEDGER = os.path.join(OUT, "done.json")

PY = sys.executable
MAX_REAL_FAILURES = 2

# (name, timeout_s, argv) — ordered by round-5 verdict priority: the
# tiled flagship's first chip numbers, then CT/score/mri rows. The
# scheduler is fewest-attempts-first, so this order holds among
# fresh stages.
STAGES = [
    # row-band tiled kernel at the new scale ceiling (rows persist to
    # tiled_rows.jsonl, resumable) — round-4 flagship, zero chip numbers
    ("tiled_2048", 3600, [PY, "scripts/bench_tiled_2048.py",
                          "tiled 2048 band,tiled 2048 CI"]),
    ("tiled_1024", 3000, [PY, "scripts/bench_tiled_2048.py",
                          "tiled 1024 band,whole-image 1024"]),
    ("tiled_4096", 3600, [PY, "scripts/bench_tiled_2048.py",
                          "tiled 4096"]),
    ("ulpda_tiled", 3600, [PY, "scripts/bench_tiled_2048.py", "ulpda"]),
    ("tiled_stream", 3600, [PY, "scripts/bench_tiled_2048.py",
                            "tiled 2048 stream"]),
    ("ulpda_stream", 3600, [PY, "scripts/bench_tiled_2048.py",
                            "ulpda tiled 2048 stream"]),
    ("tiled_ncvx", 3600, [PY, "scripts/bench_tiled_2048.py",
                          "tiled 2048 mctv,tiled 2048 metv,"
                          "ulpda tiled 2048 m"]),
    ("mesh_stochastic", 600, [PY, "scripts/mesh_stochastic_probe.py"]),
    ("ct256_long", 3600, [
        PY, "-m", "lmc_atomi_tpu.experiments.ct", "--size", "256",
        "--n_angles", "90", "--n_steps", "20000", "--burn_in", "4000",
        "--segment_steps", "500", "--ci_quantiles", "(0.025,0.975)",
        "--pnp", "false", "--score_prior", "false",
        "--make_plots", "false"]),
    ("deconv_score_einstein", 3600, [
        PY, "-m", "lmc_atomi_tpu.experiments.deconv", "--size", "512",
        "--image", "einstein", "--n_steps", "20000", "--alg", "MYULA",
        "--score_row", "true", "--collect_metrics", "false",
        "--make_plots", "false"]),
    ("deconv_score_hopper", 3600, [
        PY, "-m", "lmc_atomi_tpu.experiments.deconv", "--size", "512",
        "--image", "hopper", "--n_steps", "20000", "--alg", "MYULA",
        "--score_row", "true", "--collect_metrics", "false",
        "--make_plots", "false"]),
    ("bench", 900, [PY, "bench.py"]),
    # moments + thin16 rows landed 2026-08-19 (5455 / 4964 iters/s, log
    # ci1024.log); remaining rows run one compile at a time so a tunnel
    # flap can't discard finished compiles
    ("ci1024_thin32", 3000, [PY, "scripts/bench_ci_1024.py", "thin32"]),
    # thin8 measured 2026-08-20 (4564 iters/s, ci1024_rest.log); thin1
    # whole-image OOMs (121.64 MiB scoped stack) -> row now runs tiled
    ("ci1024_rest", 3600, [PY, "scripts/bench_ci_1024.py",
                           "thin1,unfused"]),
    # frontier rows persist to ulpda_frontier_rows.jsonl, so the two
    # chunks resume row-by-row after a flap; final chunk prints the JSON
    ("ulpda_frontier_tv", 3000,
     [PY, "scripts/bench_ulpda_frontier.py", "Chebyshev"]),
    ("ulpda_frontier", 3000, [PY, "scripts/bench_ulpda_frontier.py"]),
    ("fgp_frontier", 3000, [PY, "scripts/bench_fgp_frontier.py"]),
    ("deconv_mri", 2400, [
        PY, "-m", "lmc_atomi_tpu.experiments.deconv", "--size", "256",
        "--image", "mri", "--n_steps", "20000", "--alg", "MYULA",
        "--collect_metrics", "false", "--make_plots", "false"]),
    ("deconv_mri_map", 1800, [
        PY, "-m", "lmc_atomi_tpu.experiments.deconv", "--size", "256",
        "--image", "mri", "--compute_map", "true", "--niter_map", "1000",
        "--collect_metrics", "false", "--make_plots", "false"]),
    ("ct256_tau05", 3600, [
        PY, "-m", "lmc_atomi_tpu.experiments.ct", "--size", "256",
        "--n_angles", "90", "--n_steps", "20000", "--burn_in", "4000",
        "--tau_scale", "0.5", "--segment_steps", "500", "--pnp", "false",
        "--make_plots", "false"]),
    ("ct256_tv15", 3600, [
        PY, "-m", "lmc_atomi_tpu.experiments.ct", "--size", "256",
        "--n_angles", "90", "--n_steps", "20000", "--burn_in", "4000",
        "--tau_tv", "15", "--segment_steps", "500", "--pnp", "false",
        "--make_plots", "false"]),
    ("sgld_table", 1800, [
        PY, "-c",
        "from lmc_atomi_tpu.experiments.sgld_runs import sgld_grid_mixture;"
        "sgld_grid_mixture(make_plots=False)"]),
]

PROBE = (
    "import jax, jax.numpy as jnp;"
    "assert jax.devices()[0].platform != 'cpu';"
    "assert float(jnp.ones((256, 256)).sum()) == 65536.0;"
    "print('probe ok')"
)


def load_ledger():
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return {}


def save_ledger(led):
    with open(LEDGER, "w") as f:
        json.dump(led, f, indent=1, sort_keys=True)


def tpu_up() -> bool:
    try:
        r = subprocess.run(
            [PY, "-c", PROBE], timeout=90, capture_output=True, cwd=ROOT,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_stage(name, tmo, argv) -> str:
    """Returns "ok" | "tunnel" | "real" (real python failure)."""
    log = os.path.join(OUT, f"{name}.log")
    print(f"=== {name} (timeout {tmo}s) ===", flush=True)
    t0 = time.time()
    try:
        with open(log, "w") as f:
            r = subprocess.run(argv, timeout=tmo, stdout=f,
                               stderr=subprocess.STDOUT, cwd=ROOT)
        code = r.returncode
    except subprocess.TimeoutExpired:
        print(f"  {name}: TIMEOUT after {tmo}s (tunnel?)", flush=True)
        return "tunnel"
    dt = time.time() - t0
    if code == 0:
        print(f"  {name}: OK in {dt:.0f}s", flush=True)
        return "ok"
    tail = open(log).read()[-2000:]
    print(f"  {name}: exit {code} in {dt:.0f}s; log tail:\n{tail[-600:]}",
          flush=True)
    # heuristics: tracebacks = real bug UNLESS the exception is the
    # tunnel itself dying mid-RPC (remote_compile / transfer errors
    # raise JaxRuntimeError with a traceback — round-5 observed
    # "read body: response body closed" killing a stage and the old
    # rule misclassifying it as a code failure); anything else
    # (hang-kill, connection reset) = tunnel
    tunnel_sig = (
        "remote_compile", "read body", "response body closed",
        "Socket closed", "UNAVAILABLE", "DEADLINE_EXCEEDED",
        "Connection reset", "connect: connection refused",
    )
    if any(s in tail for s in tunnel_sig):
        return "tunnel"
    return "real" if "Traceback" in tail else "tunnel"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--status", action="store_true")
    ap.add_argument("--max-hours", type=float, default=10.0)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    led = load_ledger()
    if args.status:
        for name, _, _ in STAGES:
            print(f"{name}: {led.get(name, {}).get('status', 'pending')}")
        return

    deadline = time.time() + args.max_hours * 3600
    while time.time() < deadline:
        pending = [
            (n, t, a) for n, t, a in STAGES
            if led.get(n, {}).get("status") not in ("ok", "fail")
        ]
        if not pending:
            print("all stages done", flush=True)
            break
        if not tpu_up():
            print(f"tunnel down at {time.strftime('%H:%M:%S')}; "
                  f"{len(pending)} stages pending", flush=True)
            if args.once:
                break
            time.sleep(120)
            continue
        # fewest-attempts-first (stable): a stage the tunnel keeps killing
        # can't starve everything behind it
        name, tmo, argv = min(
            pending, key=lambda s: led.get(s[0], {}).get("attempts", 0))
        res = run_stage(name, tmo, argv)
        ent = led.setdefault(name, {"attempts": 0})
        ent["attempts"] += 1
        if res == "ok":
            ent["status"] = "ok"
        elif res == "real" and ent["attempts"] >= MAX_REAL_FAILURES:
            ent["status"] = "fail"
        save_ledger(led)
        if args.once and res != "ok":
            break
    for name, _, _ in STAGES:
        print(f"{name}: {led.get(name, {}).get('status', 'pending')}")


if __name__ == "__main__":
    main()
