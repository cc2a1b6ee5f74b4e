"""Wall-clock + MLUPS benchmarking helpers (replaces the reference's
ParallelDescriptor::second()/ReduceRealMax timing, main_run_job.cpp:416-420)."""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax


def fetch_scalar(tree) -> float:
    """Force completion by fetching one element to host.

    On this environment's tunneled TPU backend ``jax.block_until_ready``
    can return before execution finishes; a device-to-host copy of any
    output element is the only reliable completion barrier.
    """
    import numpy as np

    leaf = jax.tree_util.tree_leaves(tree)[0]
    idx = tuple(0 for _ in leaf.shape)
    return float(np.asarray(leaf[idx] if leaf.ndim else leaf))


def time_steps(run: Callable[[], object], cells: int, steps: int,
               warmup: int = 1, repeats: int = 3) -> dict:
    """Benchmark a compiled step loop.  run() must end with a host fetch
    (see fetch_scalar) — block_until_ready alone is not reliable here."""
    for _ in range(warmup):
        run()
    best = float("inf")
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        times.append(dt)
        best = min(best, dt)
    mlups = cells * steps / best / 1e6
    return {
        "best_s": best,
        "times_s": times,
        "mlups": mlups,
        "glups": mlups / 1e3,
        "ns_per_cell_step": best / (cells * steps) * 1e9,
    }
