"""Shuffle-free reuse of bucketed backfill output.

`run_backfill` (manifest.py) writes one `part=<bucket>/data.parquet` per
conv_id hash bucket — every conversation's rows live entirely inside one
part file. Any downstream job that needs conv-local semantics (grouped
aggregates, window stats, incremental re-feature passes) can therefore
process one part per task and pay ZERO exchange: the "pick ONE
partitioning key and reuse it across stages" rule made concrete. The
first job's single shuffle is amortized across every job that reads its
output.

Guard (fail-fast contract): reuse is only valid for a FINISHED backfill
whose on-disk files agree with its manifest. `bucketed_map_groups`
therefore requires
  1. `run_complete.json` — written only after every manifest record of a
     successful run is durable, so an interrupted-but-resumable backfill
     (the supported kill/resume path) is rejected instead of silently
     processed as a partial corpus;
  2. part paths derived from `manifest.jsonl` COMMITTED records (never
     `os.listdir`), cross-checked both ways against the directory: a
     manifest record whose file is missing, or an on-disk data file with
     no manifest record (task-side os.replace succeeded, driver died
     before append_manifest), both raise.
Same fail-fast discipline as manifest.run_header (S8).

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
    """Data files of a backfill output by directory listing, bucket order.

    Listing-based convenience for ad-hoc reads; `bucketed_map_groups` does
    NOT use it — reuse with conv-local semantics goes through the
    manifest-derived `manifest_parts` so uncommitted or missing partitions
    fail fast instead of silently shaping the result."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if name.startswith("part=") and os.path.isdir(pdir):
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet") and not f.startswith("state"):
                    parts.append(os.path.join(pdir, f))
    return parts


def _record_file(out_dir: str, rec: dict) -> str | None:
    """Map one manifest record to the data file it committed (None for
    records that wrote nothing, e.g. skipped duplicate-input appends)."""
    bucket = int(rec["partition"])
    part_dir = os.path.join(out_dir, f"part={bucket:05d}")
    mode = rec.get("mode")
    if mode is None:  # run_backfill
        return os.path.join(part_dir, "data.parquet")
    if mode == "streaming_backfill":
        return os.path.join(part_dir, "data-00000.parquet")
    if mode == "incremental_append":
        if rec.get("skipped_duplicate_input") or rec.get("file_seq") is None:
            return None
        return os.path.join(part_dir, f"data-{int(rec['file_seq']):05d}.parquet")
    raise ValueError(f"unknown manifest record mode {mode!r} in {out_dir}")


def manifest_parts(out_dir: str) -> dict[int, list[str]]:
    """bucket -> committed data files, derived from manifest.jsonl and
    cross-checked BOTH ways against the directory. Raises if disk and
    manifest disagree in either direction."""
    mpath = os.path.join(out_dir, "manifest.jsonl")
    if not os.path.isfile(mpath):
        raise FileNotFoundError(f"{out_dir} has no manifest.jsonl — not a backfill output")
    by_bucket: dict[int, list[str]] = {}
    committed: set[str] = set()
    with open(mpath) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            p = _record_file(out_dir, rec)
            if p is not None and p not in committed:  # replayed commit = same file
                committed.add(p)
                by_bucket.setdefault(int(rec["partition"]), []).append(p)
    missing = sorted(p for p in committed if not os.path.isfile(p))
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} manifest-committed data file(s) missing on disk "
            f"(first: {missing[0]}) — disk and manifest disagree; re-run the backfill"
        )
    on_disk = set(list_parts(out_dir))
    orphans = sorted(on_disk - committed)
    if orphans:
        raise ValueError(
            f"{len(orphans)} on-disk data file(s) have no manifest record "
            f"(first: {orphans[0]}) — a task committed but the driver died before "
            "append_manifest; resume the producing run to completion before reuse"
        )
    return {b: sorted(ps) for b, ps in sorted(by_bucket.items())}


def bucketed_map_groups(
    out_dir: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    columns: list[str] | None = None,
    expect_schema_sha: str | None = None,
) -> ray.data.Dataset:
    """Apply `fn` to each bucket of a `part=<bucket>` backfill output with
    NO exchange: a paths Dataset (one row per BUCKET) fans out to one read +
    apply per task. `fn` sees one bucket's complete frame — every data file
    of that bucket concatenated, so every conv_id of the bucket in full, the
    same contract partition_map_groups gives — and any conv-local
    computation is valid without re-shuffling.

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
    from quant_feature_pipeline_ray.manifest import run_complete_path

    if not os.path.isfile(run_complete_path(out_dir)):
        raise ValueError(
            f"{out_dir} has no run_complete.json — the producing backfill is "
            "unfinished (killed mid-run?); resume it to completion before reusing "
            "its partition layout, or read it explicitly with list_parts if a "
            "partial view is intended"
        )
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
    parts = manifest_parts(out_dir)
    if not parts:
        raise FileNotFoundError(f"{out_dir} contains no committed part files")

    def run_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for paths_json in batch["paths"]:
            frames = [
                pq.read_table(p, columns=columns).to_pandas()
                for p in json.loads(paths_json)
            ]
            outs.append(fn(pd.concat(frames, ignore_index=True)))
        return pd.concat(outs, ignore_index=True)

    # one bucket per task: batch_size=1 over the per-bucket path lists
    return ray.data.from_items(
        [{"paths": json.dumps(ps)} for ps in parts.values()]
    ).map_batches(run_bucket, batch_format="pandas", batch_size=1)
