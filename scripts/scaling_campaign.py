"""Scaling campaign driver: runs bench.py headline legs at alternating CPU
counts, appending each completed leg's JSON line to a log file so a killed
campaign never loses finished legs.

Usage: python scripts/scaling_campaign.py [pairs] [log_path]

Per-leg protocol: GRAFT_REPS timed reps in one Ray session (rep arrays
recorded in the JSON); rep 1 doubles as the allocator/page warmup
(GRAFT_NO_WARMUP=1), best-of-reps is the leg time — the BASELINE.md
steady-state discipline with the warmup folded into the recorded array so
convergence is visible to the reader."""

import json
import os
import subprocess
import sys
import time

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
LOG = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_campaign.jsonl"
SCALE_DIR = os.environ.get("GRAFT_SCALING_SF_DIR", "/root/testdata/sf2.0")
N = int(os.environ.get("GRAFT_SCALE_N", "2"))
REPS = os.environ.get("GRAFT_SCALE_REPS", "4")
BENCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench.py")


def leg(ncpu: int, pair: int) -> dict | None:
    # a finished leg can leave object-store spill files behind in tmpfs
    # (/dev/shm/ray_spill): Ray only unlinks them when objects are freed
    # before shutdown. 30 GB of stale tmpfs measured after one sf8.0 leg —
    # memory the NEXT leg then lacks, skewing its reps. Clear before each
    # leg so every leg starts from the same memory state.
    import shutil

    shutil.rmtree("/dev/shm/ray_spill", ignore_errors=True)
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_HEADLINE_ONLY="1",
        GRAFT_NO_WARMUP="1",
        GRAFT_SF_DIR=SCALE_DIR,
        GRAFT_REPS=REPS,
    )
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.abspath(BENCH)], env=env, capture_output=True, text=True
    )
    if p.returncode != 0:
        rec = {"pair": pair, "cpus": ncpu, "error": p.stderr[-500:]}
    else:
        rec = json.loads(p.stdout.strip().splitlines()[-1])
        rec.update({"pair": pair, "cpus": ncpu, "leg_wall": round(time.time() - t0, 1)})
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
    return rec


for pair in range(1, PAIRS + 1):
    lo = leg(N, pair)
    hi = leg(4 * N, pair)
    if lo and hi and "error" not in lo and "error" not in hi:
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
        with open(LOG, "a") as f:
            f.write(
                json.dumps(
                    {
                        "pair": pair,
                        "summary": True,
                        f"sec_{N}": lo["value"],
                        f"sec_{4 * N}": hi["value"],
                        "efficiency": round(eff, 3),
                    }
                )
                + "\n"
            )
print("campaign done")
