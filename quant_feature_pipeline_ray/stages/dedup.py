"""Set operations: union + dedup keep-last (J2), tail sampling (O2), sinks (S5).

J2: the reference's history-merge `safe_concat_dedup(old, new)` — concat,
keep-last per timestamp, sort (tools/incremental.py:31-40; call sites
step2_resample.py:493-529, step3_generate_indicators.py:286-355). In this
engine the checkpoint manifest makes partitions idempotent, so this operator
exists for parity and for ad-hoc merges; "new wins" is expressed by a side
tag, not input order (Dataset.union does not guarantee block order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from quant_feature_pipeline_ray.stages.partition import partition_map_groups

_SIDE = "_ud_side"


def union_dedup_keep_last(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    keys: list[str] = ("conv_id", "turn_idx"),
    order_col: str = "ts",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Union two same-schema datasets; per key keep the row with the highest
    (order_col, side) — i.e. `new` wins ties, later order_col wins always."""
    keys = list(keys)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(_SIDE, pa.array(np.full(len(b), side, dtype=np.int8)))

        return fn

    unioned = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [order_col, _SIDE], kind="mergesort")
        g = g[~g.duplicated(keys, keep="last")]
        return g.drop(columns=[_SIDE])

    return partition_map_groups(unioned, dedup, key=keys[0], num_buckets=num_buckets)


def sample_tail(
    ds: ray.data.Dataset, ratio: float, min_rows: int = 100, ts_col: str = "ts"
) -> ray.data.Dataset:
    """O2 analogue: the reference's quick-validation tail sample
    (`df.tail(max(100, N*ratio))`, unified_feature_pipeline.py:652-655) —
    expressed deterministically as a time-cutoff filter so it stays a
    streaming predicate, not a global sort."""
    import pyarrow.compute as pc

    n = ds.count()
    k = max(min_rows, int(n * ratio))
    # cutoff = the k-th largest ts; exact via a tiny aggregate over ts only
    ts_parts = []
    for b in ds.select_columns([ts_col]).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ts_parts.append(b[ts_col].to_numpy(zero_copy_only=False))
    allts = np.concatenate(ts_parts)
    k = min(k, len(allts))
    cutoff = np.partition(allts, len(allts) - k)[len(allts) - k]
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t[ts_col], pa.scalar(cutoff, type=t[ts_col].type))),
        batch_format="pyarrow",
    )


def write_output(ds: ray.data.Dataset, out_dir: str, fmt: str = "parquet") -> None:
    """S5 analogue: dual-format sink (csv/parquet/both —
    step2_resample.py:325-343, tools/io_paths.py:300-349)."""
    if fmt in ("parquet", "both"):
        ds.write_parquet(out_dir if fmt == "parquet" else out_dir + "_parquet")
    if fmt in ("csv", "both"):
        ds.write_csv(out_dir if fmt == "csv" else out_dir + "_csv")
    if fmt not in ("parquet", "csv", "both"):
        raise ValueError(f"unknown format {fmt!r}")
