"""Host scaling ceiling probe: N independent processes each run IDENTICAL
fixed numpy work (no Ray, no shared state, no synchronization) — the
aggregate-throughput ratio between N=2 and N=8 is this machine's own
hardware ceiling for 2->8 scaling. Any engine measurement can only sit at
or below it; an engine within a few percent of the ceiling has no serial
section left to fix.

Two workload flavors bracket the flagship's mix:
  stream  — big-array copy + elementwise (memory-bandwidth-bound, the
            shuffle/sort side of the pipeline)
  compute — small-array FMA loop in L2 (core-bound, the kernel side)

Usage: python scripts/host_scaling_probe.py [reps]
Prints one JSON line per (flavor, nprocs) plus the 2->8 efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")


_BARRIER = None


def _init(barrier):
    global _BARRIER
    _BARRIER = barrier


def _stream(_):
    import numpy as np

    a = np.random.default_rng(0).random(25_000_000)  # 200 MB
    b = np.empty_like(a)
    np.add(a, 0.0, out=b)  # touch every page before the barrier
    _BARRIER.wait()
    t0 = time.time()
    for _ in range(12):
        np.multiply(a, 1.0000001, out=b)
        np.add(b, 0.5, out=b)
        a, b = b, a
    return time.time() - t0


def _compute(_):
    import numpy as np

    a = np.random.default_rng(0).random(200_000)  # ~1.6 MB, cache-resident
    b = np.empty_like(a)
    _BARRIER.wait()
    t0 = time.time()
    for _ in range(6000):
        np.multiply(a, 1.0000001, out=b)
        np.add(b, 0.5, out=b)
        a, b = b, a
    return time.time() - t0


def leg(fn, nprocs: int, reps: int) -> float:
    """Best-of-reps of the SLOWEST worker's synchronized-loop time — all
    workers release from a barrier together, so max() is the honest
    concurrent wall for the fixed per-worker work."""
    best = None
    ctx = mp.get_context("spawn")
    for _ in range(reps):
        barrier = ctx.Barrier(nprocs)
        with ctx.Pool(nprocs, initializer=_init, initargs=(barrier,)) as p:
            wall = max(p.map(fn, range(nprocs)))
        best = wall if best is None or wall < best else best
    return best


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    for name, fn in (("stream", _stream), ("compute", _compute)):
        w2 = leg(fn, 2, reps)
        w8 = leg(fn, 8, reps)
        # throughput = procs/wall; efficiency vs 4x ideal
        eff = (8.0 / w8) / (2.0 / w2) / 4.0
        out[name] = {"wall_2": round(w2, 3), "wall_8": round(w8, 3), "ceiling_2to8": round(eff, 3)}
        print(json.dumps({name: out[name]}))
    print(json.dumps({"host_scaling_ceiling": out}))
