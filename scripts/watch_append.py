"""Micro-batch watch loop — the reference's online/scheduler analogue.

Reference: the daily cron loop re-runs Step1 per symbol with retries
(auto_features_daily/run_daily_features.py:165-247) and the online mode
rebuilds a micro-batch window every poll (unified_feature_pipeline.py:311-531).
Here the unit of streaming is an arriving transcript parquet file: each new
file under --input is fed through run_incremental_append (exact, state-
checkpointed), and consumed inputs are recorded in the output's
consumed_inputs.jsonl so restarts are idempotent.

    python scripts/watch_append.py --input <dir> --out <dir> [--once] [--poll 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def consumed_path(out_dir: str) -> str:
    return os.path.join(out_dir, "consumed_inputs.jsonl")


def load_consumed(out_dir: str) -> set[str]:
    seen = set()
    p = consumed_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                if line.strip():
                    seen.add(json.loads(line)["input"])
    return seen


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="directory of arriving parquet files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--once", action="store_true", help="single scan (for tests/cron)")
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--buckets", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from quant_feature_pipeline_ray.manifest import (
        load_manifest,
        run_incremental_append,
        run_streaming_backfill,
    )

    os.makedirs(args.out, exist_ok=True)
    while True:
        seen = load_consumed(args.out)
        new = sorted(
            os.path.join(args.input, f)
            for f in os.listdir(args.input)
            if f.endswith(".parquet") and os.path.join(args.input, f) not in seen
        )
        for path in new:
            bootstrap = not load_manifest(args.out)
            if bootstrap:
                res = run_streaming_backfill(path, args.out, num_buckets=args.buckets)
            else:
                res = run_incremental_append(path, args.out, num_buckets=args.buckets)
            with open(consumed_path(args.out), "a") as f:
                f.write(json.dumps({"input": path, "ts": time.time(), **res}) + "\n")
            print(json.dumps({"input": os.path.basename(path), **res}), flush=True)
        if args.once:
            break
        time.sleep(args.poll)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
