"""Partition-granular checkpoint manifest — resumable backfills.

Replaces the reference's whole-file incremental mode (warm-start +
safe_concat_dedup, tools/incremental.py:6-40, step2_resample.py:370-397,
overwrite=false skip, congfigs/main_config.yaml:94-96) with the layout
SURVEY.md §4.2.4 calls for:

    out_dir/
      part=<bucket>/data.parquet     (atomic: tmp file + os.replace)
      manifest.jsonl                 (one record per committed partition)

Manifest record: {partition, rows, bytes, min_ts_us, max_ts_us, n_convs,
schema_sha, wall_ms, input} — per-partition lineage + metrics. A resumed run
reads the manifest, SKIPS committed buckets BEFORE the shuffle (cheap
map_batches filter on the bucket column — skipped rows never enter the
exchange), and processes only the rest. Because every bucket is computed
independently from its own raw rows, a resumed run is byte-identical to an
uninterrupted one (tests/test_resume.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
from quant_feature_pipeline_ray.hashing import stable_bucket
from quant_feature_pipeline_ray.stages.partition import BUCKET_COL
from quant_feature_pipeline_ray.stages.turn_features_arrow import featurize_bucket_arrow
from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus, read_transcripts


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def _resolve_num_buckets(out_dir: str, requested: int | None, default: int) -> int:
    """Persist num_buckets in a run header and validate it on re-entry.

    B determines hash(conv_id) % B — a resumed or appending run that infers
    a DIFFERENT B would silently rehash conversations into other buckets
    (dropped/duplicated rows, orphaned ConvState). So: first writer records
    B; every later run reads it back and fails fast on a caller-supplied
    mismatch instead of guessing from cpu count or max(partition)+1."""
    path = os.path.join(out_dir, "run_header.json")
    if os.path.exists(path):
        with open(path) as f:
            stored = int(json.load(f)["num_buckets"])
        if requested is not None and requested != stored:
            raise ValueError(
                f"num_buckets={requested} disagrees with this output's run "
                f"header ({stored}); pass num_buckets={stored} or a new out_dir"
            )
        return stored
    B = requested or default
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_buckets": B}, f)
    os.replace(tmp, path)
    return B


def load_manifest(out_dir: str) -> dict[int, dict]:
    """partition -> record for every committed partition."""
    path = manifest_path(out_dir)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[int(rec["partition"])] = rec
    return done


def append_manifest(out_dir: str, records: list[dict]) -> None:
    with open(manifest_path(out_dir), "a") as f:
        for rec in records:
            f.write(json.dumps(rec, sort_keys=True) + "\n")


def run_complete_path(out_dir: str) -> str:
    return os.path.join(out_dir, "run_complete.json")


def mark_run_complete(out_dir: str, info: dict) -> None:
    """Atomically publish a run-complete marker. Written ONLY after every
    manifest record of a successful run is on disk, so a resumable-but-
    unfinished backfill (killed between partition commits — the supported
    fail_after path) is distinguishable from a finished one: the marker is
    absent until some later run finishes the remaining buckets."""
    path = run_complete_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f, sort_keys=True)
    os.replace(tmp, path)


def _commit_partition(out_dir: str, bucket: int, tbl: pa.Table, input_path: str, wall_ms: float) -> dict:
    """Atomic per-partition publish (reference: tmp + os.replace,
    tools/export_utils.py:264-283)."""
    part_dir = os.path.join(out_dir, f"part={bucket:05d}")
    os.makedirs(part_dir, exist_ok=True)
    final = os.path.join(part_dir, "data.parquet")
    tmp = final + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)
    ts = tbl["ts_us"].to_numpy(zero_copy_only=False) if "ts_us" in tbl.column_names else np.zeros(1)
    schema_sha = hashlib.sha1("|".join(tbl.column_names).encode()).hexdigest()
    return {
        "partition": bucket,
        "rows": tbl.num_rows,
        "bytes": os.path.getsize(final),
        "min_ts_us": int(ts.min()) if len(ts) else None,
        "max_ts_us": int(ts.max()) if len(ts) else None,
        "n_convs": int(len(pa.compute.unique(tbl["conv_id"]))) if tbl.num_rows else 0,
        "schema_sha": schema_sha,
        "wall_ms": round(wall_ms, 1),
        "input": input_path,
    }


def run_backfill(
    input_path: str,
    out_dir: str,
    cfg: FeatureConfig = DEFAULT_CONFIG,
    num_buckets: int | None = None,
    fail_after: int | None = None,
) -> dict:
    """Feature backfill with partition-granular checkpoint/resume.

    Committed buckets (from a previous, possibly killed, run) are filtered
    out BEFORE the shuffle; each remaining bucket is featurized, written
    atomically, and recorded in the manifest. `fail_after` kills the run
    after N commits (test hook for the kill/resume invariant).

    Returns {committed, skipped, rows}.
    """
    B = _resolve_num_buckets(out_dir, num_buckets, max(32, cluster_cpus()))
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    skip = set(done)
    skip_arr = np.fromiter(skip, dtype=np.int64) if skip else None

    ds = read_transcripts(input_path)

    def add_bucket_and_filter(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["conv_id"].to_numpy(zero_copy_only=False), B)
        batch = batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
        if skip_arr is not None:
            batch = batch.filter(pa.array(~np.isin(b, skip_arr)))
        return batch

    bucketed = ds.map_batches(add_bucket_and_filter, batch_format="pyarrow")

    def featurize_and_commit(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"partition": pa.array([], pa.int32()), "record": pa.array([], pa.string())})
        bucket = int(tbl[BUCKET_COL][0].as_py())
        t0 = time.time()
        out = featurize_bucket_arrow(tbl.drop_columns([BUCKET_COL]), cfg)
        rec = _commit_partition(out_dir, bucket, out, input_path, (time.time() - t0) * 1e3)
        return pa.table(
            {
                "partition": pa.array([bucket], pa.int32()),
                "record": pa.array([json.dumps(rec, sort_keys=True)], pa.string()),
            }
        )

    results = bucketed.groupby(BUCKET_COL).map_groups(featurize_and_commit, batch_format="pyarrow")

    committed = []
    for row in results.iter_rows():
        rec = json.loads(row["record"])
        committed.append(rec)
        append_manifest(out_dir, [rec])
        if fail_after is not None and len(committed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} partitions")

    mark_run_complete(
        out_dir,
        {
            "mode": "backfill",
            "input": input_path,
            "partitions": len(load_manifest(out_dir)),
        },
    )
    return {
        "committed": len(committed),
        "skipped": len(skip),
        "rows": sum(r["rows"] for r in committed),
    }


def _sorted_pandas(tbl: pa.Table) -> "object":
    from quant_feature_pipeline_ray.stages.turn_features_arrow import _sorted_dedup

    out, _ = _sorted_dedup(tbl)
    return out.to_pandas()


def run_streaming_backfill(
    input_path: str,
    out_dir: str,
    cfg: FeatureConfig = DEFAULT_CONFIG,
    num_buckets: int | None = None,
) -> dict:
    """Backfill through the streaming carry-state kernel, persisting each
    bucket's per-conversation state next to its data partition:

        part=<bucket>/data-00000.parquet   feature rows
        part=<bucket>/state.parquet        serialized ConvState per conv

    This is the EXACT-incremental mode: run_incremental_append later feeds
    only new rows into kernels restored from state.parquet and produces
    byte-identical features to a full recompute (the reference's
    incremental mode re-reads a lookback window and merges —
    step2_resample.py:370-397 / tools/incremental.py:31-40 — which is only
    approximate for unbounded-history features; checkpointed state is not).

    Crash semantics: manifest records are appended only after ALL buckets
    commit, so an interrupted initial backfill simply redoes the run
    (idempotent overwrite of data-00000/state). Partition-granular resume
    for the initial pass is run_backfill's job; this mode optimizes the
    append path instead.
    """
    from quant_feature_pipeline_ray.state.kernels import snapshot_states

    B = _resolve_num_buckets(out_dir, num_buckets, max(32, cluster_cpus()))
    os.makedirs(out_dir, exist_ok=True)
    ds = read_transcripts(input_path)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["conv_id"].to_numpy(zero_copy_only=False), B)
        return batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    from quant_feature_pipeline_ray.state.kernels import (
        bootstrap_states_from_batch,
        streaming_columns,
    )

    stream_cols = streaming_columns(cfg)

    def run_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"partition": pa.array([], pa.int32()), "record": pa.array([], pa.string())})
        bucket = int(tbl[BUCKET_COL][0].as_py())
        t0 = time.time()
        # fast bootstrap: run the batch (arrow) kernel, project to the
        # streaming column layout, and DERIVE the streaming state from the
        # output — 4-10x the per-conversation streaming loop, still
        # byte-identical for later appends (tests/test_incremental.py)
        batch_out = featurize_bucket_arrow(tbl.drop_columns([BUCKET_COL]), cfg)
        out = batch_out.to_pandas()[stream_cols]
        kern = bootstrap_states_from_batch(out, cfg)
        part_dir = os.path.join(out_dir, f"part={bucket:05d}")
        os.makedirs(part_dir, exist_ok=True)
        out_tbl = pa.Table.from_pandas(out, preserve_index=False)
        state_tbl = snapshot_states(kern).replace_schema_metadata(
            {"applied_count": "1", "last_input": input_path}
        )
        for name, final in (
            (out_tbl, os.path.join(part_dir, "data-00000.parquet")),
            (state_tbl, os.path.join(part_dir, "state.parquet")),
        ):
            tmp = final + ".tmp"
            pq.write_table(name, tmp)
            os.replace(tmp, final)
        rec = {
            "partition": bucket,
            "rows": out_tbl.num_rows,
            "files": 1,
            "schema_sha": hashlib.sha1("|".join(out_tbl.column_names).encode()).hexdigest(),
            "wall_ms": round((time.time() - t0) * 1e3, 1),
            "input": input_path,
            "mode": "streaming_backfill",
        }
        return pa.table(
            {"partition": pa.array([bucket], pa.int32()),
             "record": pa.array([json.dumps(rec, sort_keys=True)], pa.string())}
        )

    results = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(run_bucket, batch_format="pyarrow")
    )
    recs = [json.loads(r["record"]) for r in results.iter_rows()]
    append_manifest(out_dir, recs)
    mark_run_complete(
        out_dir,
        {
            "mode": "streaming_backfill",
            "input": input_path,
            "partitions": len(load_manifest(out_dir)),
        },
    )
    return {"committed": len(recs), "rows": sum(r["rows"] for r in recs)}


def run_incremental_append(
    new_input_path: str,
    out_dir: str,
    cfg: FeatureConfig = DEFAULT_CONFIG,
    num_buckets: int | None = None,
) -> dict:
    """Append-only incremental update (S2 analogue, exact).

    Feeds ONLY the new rows (strictly later than each conversation's
    watermark — enforced by the kernel's watermark assert) into kernels
    restored from each partition's state.parquet, writes a new data file
    per partition, and refreshes the state snapshot. Features for appended
    rows are bitwise-identical to what a full recompute would produce
    (tests/test_incremental.py). Assumes an append-only, pre-deduped feed;
    replayed/stale rows fail fast at the watermark.

    Idempotent per (partition, input): each state snapshot records the
    applied-input count and the last applied input path in its Parquet
    schema metadata, and the commit order is data THEN state. Replaying the
    same input file (e.g. the watcher crashed between its commit and its
    consumed-record write) is a no-op: partitions whose state already names
    this input are skipped, and a crash BETWEEN the data and state commits
    re-runs deterministically into the same data-<seq> file."""
    from quant_feature_pipeline_ray.state.kernels import (
        StreamingTurnKernel,
        restore_states,
        snapshot_states,
    )

    existing = load_manifest(out_dir)
    B = _resolve_num_buckets(
        out_dir,
        num_buckets,
        (max(int(r["partition"]) for r in existing.values()) + 1 if existing else max(32, cluster_cpus())),
    )
    ds = read_transcripts(new_input_path)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch["conv_id"].to_numpy(zero_copy_only=False), B)
        return batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    def run_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"partition": pa.array([], pa.int32()), "record": pa.array([], pa.string())})
        bucket = int(tbl[BUCKET_COL][0].as_py())
        t0 = time.time()
        part_dir = os.path.join(out_dir, f"part={bucket:05d}")
        os.makedirs(part_dir, exist_ok=True)
        kern = StreamingTurnKernel(cfg)
        state_path = os.path.join(part_dir, "state.parquet")
        applied = 0
        if os.path.exists(state_path):
            state_tbl = pq.read_table(state_path)
            md = state_tbl.schema.metadata or {}
            last_input = (md.get(b"last_input") or b"").decode() or None
            if b"applied_count" in md:
                applied = int(md[b"applied_count"])
            else:  # pre-metadata snapshot: fall back to counting data files
                applied = len([f for f in os.listdir(part_dir) if f.startswith("data-")])
            if last_input == new_input_path:
                rec = {
                    "partition": bucket, "rows": 0, "file_seq": None,
                    "wall_ms": 0.0, "input": new_input_path,
                    "mode": "incremental_append", "skipped_duplicate_input": True,
                }
                return pa.table(
                    {"partition": pa.array([bucket], pa.int32()),
                     "record": pa.array([json.dumps(rec, sort_keys=True)], pa.string())}
                )
            restore_states(kern, state_tbl)
        out = kern(_sorted_pandas(tbl.drop_columns([BUCKET_COL])))
        # seq derives from the STATE, not from listing files: a crash after
        # the data commit but before the state commit replays into the SAME
        # file with identical bytes instead of appending a duplicate
        seq = applied
        out_tbl = pa.Table.from_pandas(out, preserve_index=False)
        new_state = snapshot_states(kern).replace_schema_metadata(
            {"applied_count": str(applied + 1), "last_input": new_input_path}
        )
        for t, final in (
            (out_tbl, os.path.join(part_dir, f"data-{seq:05d}.parquet")),
            (new_state, state_path),
        ):
            tmp = final + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, final)
        rec = {
            "partition": bucket,
            "rows": out_tbl.num_rows,
            "file_seq": seq,
            "wall_ms": round((time.time() - t0) * 1e3, 1),
            "input": new_input_path,
            "mode": "incremental_append",
        }
        return pa.table(
            {"partition": pa.array([bucket], pa.int32()),
             "record": pa.array([json.dumps(rec, sort_keys=True)], pa.string())}
        )

    results = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(run_bucket, batch_format="pyarrow")
    )
    recs = [json.loads(r["record"]) for r in results.iter_rows()]
    append_manifest(out_dir, recs)
    mark_run_complete(
        out_dir,
        {
            "mode": "incremental_append",
            "input": new_input_path,
            "partitions": len(load_manifest(out_dir)),
        },
    )
    return {"appended_partitions": len(recs), "rows": sum(r["rows"] for r in recs)}


def read_streaming_output(out_dir: str) -> "object":
    """All data files of a streaming/incremental output as one Dataset."""
    paths = []
    for part in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, part)
        if part.startswith("part=") and os.path.isdir(pdir):
            paths += [
                os.path.join(pdir, f)
                for f in sorted(os.listdir(pdir))
                if f.startswith("data-") and f.endswith(".parquet")
            ]
    return ray.data.read_parquet(paths, partitioning=None)


def export_contract(out_dir: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> dict:
    """Write the frozen feature contract next to the output (S6 analogue:
    the NPZ exporter's feature_names + schema_sha + metadata blob,
    tools/export_utils.py:228-327). Offline/online consistency = comparing
    schema_sha of two contracts (config_loader.py:96-168 analogue)."""
    from quant_feature_pipeline_ray.pipelines.flagship import feature_schema_names

    names = feature_schema_names(cfg)
    contract = {
        "feature_names": names,
        "n_features": len(names),
        "schema_sha": cfg.schema_sha(names),
        "config": {
            "sma_windows": list(cfg.sma_windows),
            "ema_spans": list(cfg.ema_spans),
            "lag_turns": list(cfg.lag_turns),
            "lead_turns": list(cfg.lead_turns),
            "rank_window": cfg.rank_window,
            "rate_window": cfg.rate_window,
            "session_gap_s": cfg.session_gap_s,
            "agg_windows_s": list(cfg.agg_windows_s),
            "gap_event_threshold_s": cfg.gap_event_threshold_s,
            "gap_event_min_persist": cfg.gap_event_min_persist,
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, "contract.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(contract, f, indent=2, sort_keys=True)
    os.replace(tmp, final)
    return contract


def validate_contract(out_dir: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> None:
    """Fail fast when the on-disk contract disagrees with the code's
    feature schema (schema_sha pinning, tools/export_utils.py:47-50)."""
    from quant_feature_pipeline_ray.pipelines.flagship import feature_schema_names

    with open(os.path.join(out_dir, "contract.json")) as f:
        stored = json.load(f)
    names = feature_schema_names(cfg)
    sha = cfg.schema_sha(names)
    if stored["schema_sha"] != sha:
        raise ValueError(
            f"contract mismatch: stored {stored['schema_sha'][:12]} != current {sha[:12]}"
        )


def read_backfill(out_dir: str) -> ray.data.Dataset:
    """Read a (possibly partial) backfill output as one Dataset."""
    done = load_manifest(out_dir)
    paths = [os.path.join(out_dir, f"part={b:05d}", "data.parquet") for b in sorted(done)]
    # partitioning=None: the part=NNNNN dirs are checkpoint units, not hive
    # partition columns — don't let path inference invent a column
    return ray.data.read_parquet(paths, partitioning=None)
