"""Roofline / utilization calibration for the fused MYULA kernel.

Converts measured iters/s into "% of the VPU speed-of-light" so perf
levers can be ranked by arithmetic instead of guesswork (round-3's
grid-over-chains refutation cost a bench script to discover what this
estimate predicts in one line).

The fused kernel is VPU-bound by construction: the whole image lives in
VMEM across a block of steps (zero per-step HBM traffic, no MXU use —
the separable gram is rolls+FMAs, not matmul), so the bound is ALU/
permute throughput, not bandwidth. Op counts below are derived from the
kernel structure (kernels/myula_fused.py::_block_kernel) with three op
classes per pixel per step:

- ``alu``   — adds/muls/selects/compares (4 per lane-position per cycle:
              the v5e VPU has 4 ALUs per (sublane, lane) position)
- ``perm``  — ``pltpu.roll`` lane/sublane rotations (crossbar: modeled at
              1 elem/position/cycle)
- ``trans`` — transcendentals (log/sqrt/cos/rsqrt/recip: the special
              -function path; modeled at 1 per 4 cycles/position)

Clock: the public v5e spec (197 bf16 TFLOP/s over 4 MXUs of 128x128 MACs)
implies ~1.5 GHz; VPU positions = 8 sublanes x 128 lanes. Peak alu rate
= 8*128*4*1.5e9 = 6.1e12/s.

Two bounds are reported per config:
- ``overlap``  (optimistic): cycles = max(alu/4, perm, trans*4) — perfect
  co-issue across units;
- ``serial``   (pessimistic): cycles = alu/4 + perm + trans*4.
The truth lies between; "% of light" uses the optimistic bound (so the
printed utilization is a LOWER bound on how close to light-speed we are).

Usage: ``python scripts/roofline.py`` (pure analysis — no device needed;
measured rates default to BENCH_r03 numbers, override with env).
"""
import json
import os
import sys

CLOCK_HZ = 1.5e9
POSITIONS = 8 * 128  # (sublanes, lanes) positions per VPU
ALUS = 4


def tv_prox_ops(niter):
    """Chambolle dual trips (myula_fused.py::_tv_prox + _grad_div_ops)."""
    # per trip: div (2 perm + 5 alu), u=div-xg (1), fwd_y/fwd_x
    # (1 perm + 2 alu each), mag (2 mul + 1 add + 1 sqrt), inv (1 add +
    # 1 recip), p-updates (6 alu)
    alu = niter * (5 + 1 + 4 + 3 + 1 + 6) + 1 + 2  # + xg, final combine
    perm = niter * 4 + 2  # + final div
    trans = niter * 2  # sqrt + recip
    return alu, perm, trans


def tv_prox_fgp_ops(niter):
    """FGP projected-dual trips (myula_fused.py::_tv_prox_fgp).

    Per trip: div (2 perm + 5 alu), u=div-xg (1), fwd_y/fwd_x (1 perm +
    2 alu each), p-updates (4 alu), s=py^2+px^2 (3), rsqrt (1 trans),
    min (1), scale muls (2), momentum (6 alu: 2x q + c*(q-p)).
    """
    alu = niter * (5 + 1 + 4 + 4 + 3 + 1 + 2 + 6) + 1 + 2
    perm = niter * 4 + 2
    trans = niter * 1  # one rsqrt
    return alu, perm, trans


def sep_gram_ops(ktaps=9, rank=1):
    """Separable wrap conv (myula_fused.py::_sep_gram), (2k-1) taps/axis."""
    alu = rank * 2 * (2 * ktaps - 1)  # mul+add per tap, both axes
    perm = rank * 2 * (ktaps - 1)
    return alu, perm, 0


def step_ops(niter_tv=10, with_noise=True, with_stats=True, n_q=0,
             thin=1, tv_solver="chambolle"):
    a, p, t = sep_gram_ops()
    prox_fn = tv_prox_fgp_ops if tv_solver == "fgp" else tv_prox_ops
    a2, p2, t2 = prox_fn(niter_tv)
    a, p, t = a + a2, p + p2, t + t2
    a += 2  # grad = gscale*gram - atbs
    a += 5  # convex-combination x update
    if with_noise:
        # Box-Muller amortized over 2 steps: 2 bits + 2 shifts + 2 casts +
        # 2 scale-offset, log, sqrt, cos+sin, 2 muls -> halved
        a += (2 + 2 + 4 + 2) / 2
        t += 4 / 2
        a += 2  # noise add + amp mul
    if with_stats:
        a += 8  # weighted Welford (delta, mean, m2)
    if n_q:
        # P^2 per quantile (myula_fused.py::_p2_update): bootstrap selects
        # (5 where + 9 compare-exchange pairs = 23) + steady state
        # (extremes 2, cell index 3 cmp + 2 add, positions 3, targets ~8,
        # 3 interior markers x ~22 (parabolic + guards + selects)) + final
        # selects 8 -> ~112 alu/quantile, amortized by thin
        a += n_q * 112 / thin
    return a, p, t


def light_speed(n_pixels, ops):
    alu, perm, trans = ops
    cyc_overlap = max(alu / ALUS, perm, trans * 4)
    cyc_serial = alu / ALUS + perm + trans * 4
    rate = POSITIONS * CLOCK_HZ
    return rate / (n_pixels * cyc_overlap), rate / (n_pixels * cyc_serial)


def report(label, n_pixels, cfg, measured):
    ops = step_ops(**cfg)
    hi, lo = light_speed(n_pixels, ops)
    util_hi = 100.0 * measured / hi if measured else float("nan")
    util_lo = 100.0 * measured / lo if measured else float("nan")
    print(
        f"{label:42s} alu/px={ops[0]:6.1f} perm/px={ops[1]:3d} "
        f"trans/px={ops[2]:4.1f} | light {lo/1e3:6.1f}-{hi/1e3:6.1f}k it/s"
        f" | measured {measured/1e3:6.1f}k -> {util_hi:4.1f}-{util_lo:5.1f}"
        f"% of light"
    )
    return {"label": label, "alu": ops[0], "perm": ops[1], "trans": ops[2],
            "light_lo": lo, "light_hi": hi, "measured": measured,
            "util_pct_vs_hi": util_hi, "util_pct_vs_lo": util_lo}


def main():
    # measured rates (BENCH_r03 / RESULTS.md round-3 tables; override via
    # env when re-measuring)
    m = {
        "cold10": float(os.environ.get("M_COLD10", 21509)),
        "warm5": float(os.environ.get("M_WARM5", 33441)),
        "ci_thin1": float(os.environ.get("M_CI", 10546)),
        "packed64": float(os.environ.get("M_PACKED64", 645485 / 8)),
        "fgp8": float(os.environ.get("M_FGP8", 0)),
    }
    rows = [
        report("512^2 TV cold-10 (headline)", 512 * 512,
               dict(niter_tv=10), m["cold10"]),
        report("512^2 TV warm-5", 512 * 512, dict(niter_tv=5), m["warm5"]),
        # FGP-8: stricter-than-cold-10 accuracy (scripts/diag_tv_proj.py),
        # 8 rsqrt vs 10 sqrt + 10 recip, 32 vs 40 prox rolls
        report("512^2 TV FGP-8 (accuracy >= cold-10)", 512 * 512,
               dict(niter_tv=8, tv_solver="fgp"), m["fgp8"]),
        report("512^2 TV cold-10 + 95% CI (thin=1)", 512 * 512,
               dict(niter_tv=10, n_q=2), m["ci_thin1"]),
        # the packed config runs 4 kernel instances (2 chains each,
        # 64x128 px per instance) that serialize on the one TensorCore:
        # back-to-back kernel-step rate = aggregate chain-steps / 2
        report("64^2 packed pair (64x128 px/instance)", 64 * 128,
               dict(niter_tv=10), 8 * m["packed64"] / 2),
    ]
    print(json.dumps(rows[0]))


if __name__ == "__main__":
    sys.exit(main())
