"""Tracing / profiling / iteration-log utilities (SURVEY.md §5).

The reference's only observability is wall-clock prints and show=True
iteration tables (algs.py:411, 459-469, 584-585). TPU equivalents here:

  * ``Timer`` — ``block_until_ready``-based wall-clock + iters/sec;
  * ``profile`` — context manager around ``jax.profiler.trace`` (view with
    TensorBoard or xprof);
  * ``should_log`` / ``print_iteration_table`` — the reference's log-every
    policy (first 10, last 10, every niter/10 — algs.py:460) applied
    post-hoc to metric series collected by the jitted runner (per-step host
    printing would force a device sync every step).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional, Sequence

import jax
import numpy as np

__all__ = ["Timer", "profile", "should_log", "print_iteration_table"]


class Timer:
    """Wall-clock timer that waits for device completion.

    >>> with Timer("myula", n_iters=1000) as t: ... run ...
    prints "myula: 1000 iters in 2.31 s (433.2 iters/s)".
    """

    def __init__(self, name: str = "", n_iters: Optional[int] = None,
                 sync: bool = True, quiet: bool = False):
        self.name = name
        self.n_iters = n_iters
        self.sync = sync
        self.quiet = quiet
        self.elapsed = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                (jax.device_put(0.0) + 0).block_until_ready()
            except Exception:
                pass
        self.elapsed = time.perf_counter() - self._t0
        if not self.quiet and not exc[0]:
            msg = f"{self.name}: {self.elapsed:.2f} s"
            if self.n_iters:
                msg += (
                    f" ({self.n_iters} iters, "
                    f"{self.n_iters / self.elapsed:.1f} iters/s)"
                )
            print(msg)
        return False

    @property
    def iters_per_sec(self) -> float:
        return (self.n_iters or 0) / self.elapsed if self.elapsed else 0.0


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a device profile for everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def should_log(i: int, n: int) -> bool:
    """The reference's row policy (algs.py:460): first 10, last 10, every
    n // 10 iterations."""
    return i < 10 or (n - i) < 10 or (n >= 10 and i % (n // 10) == 0)


def print_iteration_table(
    metrics: Dict[str, Sequence], n: Optional[int] = None, width: int = 12
) -> str:
    """Render the show=True-style table from collected metric series."""
    names = list(metrics)
    series = {k: np.asarray(v) for k, v in metrics.items()}
    n = n or len(next(iter(series.values())))
    header = "   Itn " + " ".join(f"{k:>{width}s}" for k in names)
    lines = [header]
    for i in range(n):
        if should_log(i, n):
            row = f"{i + 1:6d} " + " ".join(
                f"{float(series[k][i]):>{width}.4e}" for k in names
            )
            lines.append(row)
    out = "\n".join(lines)
    print(out)
    return out
