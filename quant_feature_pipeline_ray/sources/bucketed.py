"""Shuffle-free reuse of bucketed backfill output.

`run_backfill` (manifest.py) writes one `part=<bucket>/data.parquet` per
conv_id hash bucket — every conversation's rows live entirely inside one
part file. Any downstream job that needs conv-local semantics (grouped
aggregates, window stats, incremental re-feature passes) can therefore
process one part per task and pay ZERO exchange: the "pick ONE
partitioning key and reuse it across stages" rule made concrete. The
first job's single shuffle is amortized across every job that reads its
output.

Guard: the reuse contract is only valid for the layout the run_header
describes — `bucketed_map_groups` fails fast if the header's num_buckets
is missing or the schema_sha disagrees with the caller's expectation,
the same fail-fast discipline as manifest.run_header (S8).

reference parity: the reference re-reads its step outputs from disk
between pipeline stages (step4_merge_features.py reads step2/step3 CSVs)
but re-sorts per stage; here the partition layout IS the contract.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pandas as pd
import pyarrow.parquet as pq

import ray
import ray.data


def list_parts(out_dir: str) -> list[str]:
    """Committed part files of a backfill output, bucket order."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if name.startswith("part=") and os.path.isdir(pdir):
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet") and not f.startswith("state"):
                    parts.append(os.path.join(pdir, f))
    return parts


def bucketed_map_groups(
    out_dir: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    columns: list[str] | None = None,
    expect_schema_sha: str | None = None,
) -> ray.data.Dataset:
    """Apply `fn` to each bucket of a `part=<bucket>` backfill output with
    NO exchange: a paths Dataset (one row per part) fans out to one read +
    apply per task. `fn` sees one bucket's complete frame — every conv_id
    of that bucket in full, the same contract partition_map_groups gives —
    so any conv-local computation is valid without re-shuffling.

    Streaming-safe: parts are read inside map_batches tasks (never on the
    driver), so Ray's executor pipelines read → fn → downstream with
    backpressure exactly as a shuffle stage would, minus the shuffle."""
    header_p = os.path.join(out_dir, "run_header.json")
    if not os.path.isfile(header_p):
        raise FileNotFoundError(
            f"{out_dir} has no run_header.json — not a committed backfill output"
        )
    header = json.load(open(header_p))
    if "num_buckets" not in header:
        raise ValueError(f"run_header at {out_dir} lacks num_buckets; layout unknown")
    if expect_schema_sha is not None:
        from quant_feature_pipeline_ray.manifest import load_manifest

        shas = {r.get("schema_sha") for r in load_manifest(out_dir).values()}
        if shas and shas != {expect_schema_sha}:
            raise ValueError(
                f"schema_sha mismatch at {out_dir}: manifest has {sorted(shas)!r} "
                f"!= expected {expect_schema_sha!r} — the bucketed layout belongs "
                "to a different feature contract; re-run the backfill instead of "
                "reusing it"
            )
    paths = list_parts(out_dir)
    if not paths:
        raise FileNotFoundError(f"{out_dir} contains no committed part files")

    def run_part(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for p in batch["path"]:
            df = pq.read_table(p, columns=columns).to_pandas()
            outs.append(fn(df))
        return pd.concat(outs, ignore_index=True)

    # one part per task: batch_size=1 over the paths dataset
    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        run_part, batch_format="pandas", batch_size=1
    )
