"""Corpus-curation entrypoint — the document-side sibling of backfill_job.

    ray job submit --working-dir . -- \
        python scripts/curate_job.py --input <sf_dir> --out <out_dir> \
            [--threshold 0.82] [--min-tokens 8]

Runs the composed funnel (quality filter ∩ exact-dedup rep ∖ near-dup
victims) and writes the surviving documents as lang-partitioned parquet
shards plus _funnel_summary.json. Re-submission of a finished job is a
no-op (resume marker); a failed job restarts clean.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=0.82)
    ap.add_argument("--min-tokens", type=int, default=8)
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

    from quant_feature_pipeline_ray.pipelines.curation import curate_corpus

    summary = curate_corpus(
        args.input, args.out, threshold=args.threshold, min_tokens=args.min_tokens
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
