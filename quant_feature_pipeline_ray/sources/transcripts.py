"""Transcript parquet source with scale-aware block sizing.

Reference analogues: the normalizing readers (read_base_csv/read_kline,
step2_resample.py:109-157) — column projection + time-range predicate at the
read. On top of that, block-count control: Ray's default parquet split
produced ~1 MB blocks for this table, and a sort-based shuffle over hundreds
of tiny blocks costs more than the actual compute. We size blocks to
~max(total_cpus, bytes / 128 MiB) so the one hash shuffle moves a small
number of well-filled blocks.
"""

from __future__ import annotations

import pyarrow.parquet as pq

import ray
import ray.data

INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
TARGET_BLOCK_BYTES = 128 * 1024 * 1024


def cluster_cpus(default: int = 32) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        return default


def default_num_blocks(path: str) -> int:
    """max(cpus, file_bytes / 128 MiB) — enough blocks to keep every core
    busy, but never so many that shuffle fragmentation dominates."""
    import os

    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        nbytes = 0
    return max(cluster_cpus(), nbytes // TARGET_BLOCK_BYTES + 1)


def _is_csv(path: str) -> bool:
    import os

    if path.endswith(".csv"):
        return True
    if os.path.isdir(path):
        names = os.listdir(path)
        return any(f.endswith(".csv") for f in names) and not any(
            f.endswith(".parquet") for f in names
        )
    return False


def _is_jsonl(path: str) -> bool:
    import os

    if path.endswith(".jsonl"):
        return True
    if os.path.isdir(path):
        names = os.listdir(path)
        return any(f.endswith(".jsonl") for f in names) and not any(
            f.endswith((".parquet", ".csv")) for f in names
        )
    return False


def read_transcripts(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    ts_start=None,
    ts_stop=None,
) -> ray.data.Dataset:
    """Projected, optionally time-sliced transcript read with
    CSV/NDJSON/parquet extension dispatch (S3/M2/M3 analogues; reference:
    read_df_auto, tools/io_paths.py:9-18 reads whichever format exists).
    NDJSON rides the same normalize_ts stage as CSV (epoch-unit sniffing,
    int32 narrowing) and is bitwise-identical to the parquet path.

    Parquet: ts_start/ts_stop are pushed down as a row-group predicate on
    `ts` (reference: start/end slicing, step2_resample.py:146-149).
    CSV: rows flow through the normalize_ts stage (epoch-unit sniffing /
    string parsing -> canonical timestamp[us]) and the time slice is a
    vectorized post-read filter — CSV has no row-group statistics to
    push into. Output is bitwise-identical to the parquet path
    (tests/test_setops.py::test_csv_read_parity)."""
    import pyarrow.compute as pc

    flt = None
    if ts_start is not None:
        flt = pc.field("ts") >= ts_start
    if ts_stop is not None:
        f2 = pc.field("ts") <= ts_stop
        flt = f2 if flt is None else flt & f2
    if _is_csv(path) or _is_jsonl(path):
        from quant_feature_pipeline_ray.sources.normalize_ts import normalize_ts_batch

        ds = ray.data.read_csv(path) if _is_csv(path) else ray.data.read_json(path)

        import pyarrow as pa

        def norm(batch):
            batch = normalize_ts_batch(batch)
            batch = batch.select(columns or INPUT_COLUMNS)
            if "turn_idx" in batch.column_names:
                # CSV type inference widens to int64; the canonical
                # transcript schema (and the parquet path) carries int32
                i = batch.column_names.index("turn_idx")
                batch = batch.set_column(i, "turn_idx", batch["turn_idx"].cast(pa.int32()))
            if flt is not None:
                batch = batch.filter(flt)
            return batch

        return ds.map_batches(norm, batch_format="pyarrow")
    return ray.data.read_parquet(
        path,
        columns=columns or INPUT_COLUMNS,
        override_num_blocks=num_blocks or default_num_blocks(path),
        filter=flt,
    )


def last_timestamp(path: str):
    """Parquet-footer freshness probe without a data scan (reference:
    get_last_timestamp fast path reading only metadata/last row group,
    tools/io_paths.py:33-134). Accepts a file or a part-file directory."""
    import os

    if os.path.isdir(path):
        vals = [
            last_timestamp(os.path.join(path, f))
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        return max(v for v in vals if v is not None)
    f = pq.ParquetFile(path)
    md = f.metadata
    best = None
    for rg in range(md.num_row_groups):
        col = md.row_group(rg).column(md.schema.to_arrow_schema().get_field_index("ts"))
        stats = col.statistics
        if stats is not None and stats.has_min_max:
            best = stats.max if best is None else max(best, stats.max)
    if best is not None:
        return best
    # fallback: scan only the final row group's ts column
    tbl = f.read_row_group(md.num_row_groups - 1, columns=["ts"])
    return tbl["ts"].to_pandas().max()
