"""Micro-batch watch loop — the reference's online/scheduler analogue.

Reference: the daily cron loop re-runs Step1 per symbol with retries
(auto_features_daily/run_daily_features.py:165-247) and the online mode
rebuilds a micro-batch window every poll (unified_feature_pipeline.py:311-531).
Here the unit of streaming is an arriving transcript parquet file: each new
file under --input is fed through run_incremental_append (exact, state-
checkpointed) by scheduler.backfill_entity, and consumed inputs are recorded
in the output's consumed_inputs.jsonl so restarts are idempotent. The
multi-corpus cron analogue (per-entity retry/isolation) is
scripts/backfill_all.py over the same primitive.

    python scripts/watch_append.py --input <dir> --out <dir> [--once] [--poll 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from quant_feature_pipeline_ray.scheduler import backfill_entity

    while True:
        backfill_entity(
            args.input,
            args.out,
            num_buckets=args.buckets,
            on_applied=lambda path, res: print(
                json.dumps({"input": os.path.basename(path), **res}), flush=True
            ),
        )
        if args.once:
            break
        time.sleep(args.poll)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
