"""Production backfill entrypoint — the script `ray job submit` runs.

    ray job submit --working-dir . -- \
        python scripts/backfill_job.py --input <transcripts_dir> --out <out_dir> \
            [--mode batch|streaming|incremental] [--buckets B]

On a real cluster the driver connects to the running Ray head via
RAY_ADDRESS (set by the job runtime); in this sandbox it falls back to
local mode. Either way the pipeline code is identical — partition-granular
checkpointing makes re-submission of a failed job resume where it stopped.
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["batch", "streaming", "incremental"], default="batch")
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
        export_contract,
        run_backfill,
        run_incremental_append,
        run_streaming_backfill,
    )

    t0 = time.time()
    if args.mode == "batch":
        res = run_backfill(args.input, args.out, num_buckets=args.buckets)
    elif args.mode == "streaming":
        res = run_streaming_backfill(args.input, args.out, num_buckets=args.buckets)
    else:
        res = run_incremental_append(args.input, args.out, num_buckets=args.buckets)
    export_contract(args.out)
    res["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
