"""Multi-corpus backfill driver — the reference's daily multi-symbol cron
run re-expressed for transcript corpora.

Reference semantics (auto_features_daily/run_daily_features.py:165-247):
loop every enabled entity, retry each up to --retries times with a doubled
delay between attempts, never let one entity's failure stop the others,
pause --entity-delay between entities, print a per-entity summary and an
overall success count at the end. Here an entity is one corpus directory of
arriving transcript parquet files and the per-entity unit of work is the
exact incremental-append pipeline (scheduler.backfill_entity); progress is
durable per input FILE via consumed_inputs.jsonl, so a retry resumes at the
file that failed instead of redoing the entity.

    python scripts/backfill_all.py --root <dir-of-corpus-subdirs> --out <dir>
        [--retries 3] [--retry-delay 0] [--entity-delay 0] [--buckets N]

Each immediate subdirectory of --root is one corpus; its output lands at
<out>/<name>/. Exit code is the number of entities that still failed after
all retries (0 == clean run), so a cron wrapper can alert on it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="directory whose subdirectories are corpora")
    ap.add_argument("--out", required=True, help="output root; one subdir per corpus")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--retry-delay", type=float, default=0.0)
    ap.add_argument("--entity-delay", type=float, default=0.0)
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

    from quant_feature_pipeline_ray.scheduler import backfill_all

    corpora = {
        name: os.path.join(args.root, name)
        for name in sorted(os.listdir(args.root))
        if os.path.isdir(os.path.join(args.root, name))
    }
    results = backfill_all(
        corpora,
        args.out,
        max_retries=args.retries,
        retry_delay=args.retry_delay,
        entity_delay=args.entity_delay,
        num_buckets=args.buckets,
    )
    for name, row in results.items():
        print(json.dumps({"corpus": name, **row}), flush=True)
    ok = sum(1 for r in results.values() if r["ok"])
    print(f"done: {ok}/{len(results)} corpora ok", flush=True)
    ray.shutdown()
    return len(results) - ok


if __name__ == "__main__":
    raise SystemExit(main())
