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


def read_transcripts(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    ts_start=None,
    ts_stop=None,
) -> ray.data.Dataset:
    """Projected, optionally time-sliced transcript read (M2/M3 analogues).

    ts_start/ts_stop are pushed down as a parquet row-group predicate on
    `ts` (reference: start/end slicing, step2_resample.py:146-149)."""
    import pyarrow.compute as pc

    flt = None
    if ts_start is not None:
        flt = pc.field("ts") >= ts_start
    if ts_stop is not None:
        f2 = pc.field("ts") <= ts_stop
        flt = f2 if flt is None else flt & f2
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
