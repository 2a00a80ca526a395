"""Distributed large×large equi-join via tagged-union hash co-partitioning.

Every other join in this repo broadcasts a small side (`ray.put` + lookup
inside map_batches) because the reference's joins are all dimension-shaped
(unified_feature_pipeline.py merges per-symbol frames in one process). This
stage covers the remaining shape: BOTH sides too large to broadcast.

Plan (ONE all-to-all exchange, the repo's standard backbone):

  tag each side with ``_side`` (0=left, 1=right) and pad it to the union
  schema with typed sentinel values (never read — each output row takes
  left columns from left rows and right columns from right rows, and
  pandas' merge supplies the nulls for outer misses). Sentinels rather
  than Arrow nulls so int64 key/id columns survive the pandas hop without
  a lossy float64 promotion.

  → union → hash-partition on the first key (partition_map_groups, the
  same exchange the flagship uses) → per-partition C-level pandas merge.

Skew note (100 TB): a single hot key lands in one partition; keys here are
join keys (orderkey/doc_id-shaped), whose fan-in is bounded by data model,
unlike group keys. For a genuinely hot key, salt the BUILD side k ways and
replicate the probe row k ways upstream — same recipe as stages/salting.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from quant_feature_pipeline_ray.stages.partition import partition_map_groups

_SIDE = "_side"


def _pandas_dtypes(sch: "ray.data.Schema") -> dict[str, np.dtype]:
    """Per-column dtype exactly as `batch.to_pandas()` will produce it, so
    padded frames and real frames union into one consistent block type."""
    out: dict[str, np.dtype] = {}
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):  # arrow-backed blocks
            out[n] = (
                pa.schema([pa.field(n, t)]).empty_table().to_pandas()[n].to_numpy().dtype
            )
        else:  # pandas-backed blocks report numpy dtypes directly
            out[n] = np.dtype(t)
    return out


def _pad_frame(df: pd.DataFrame, all_cols: dict[str, np.dtype]) -> pd.DataFrame:
    for c, dt in all_cols.items():
        if c not in df.columns:
            if dt == object:
                df[c] = [""] * len(df)
            else:
                df[c] = np.zeros(len(df), dtype=dt)
    return df[list(all_cols)]


def hash_equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int = 32,
    rsuffix: str = "_r",
) -> ray.data.Dataset:
    """Join two Datasets on equality of `on` with ONE hash exchange.

    how: 'inner' | 'left' | 'semi' | 'anti' (semi/anti return left columns
    only; left-misses carry pandas nulls on right columns). Non-key columns
    present on both sides get `rsuffix` appended on the right.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    # non-key columns on both sides get rsuffix on the right (pandas-merge
    # convention); renamed inside the tag fn — Dataset.rename_columns breaks
    # on pandas-backed blocks in ray 2.49
    ren = {c: c + rsuffix for c in rsch.names if c not in keys and c in lcols}
    rcols = [ren.get(c, c) for c in rsch.names]
    rpayload = [c for c in rcols if c not in keys]

    all_cols: dict[str, np.dtype] = {_SIDE: np.dtype(np.int8)}
    for c, dt in _pandas_dtypes(lsch).items():
        all_cols[c] = dt
    for c, dt in _pandas_dtypes(rsch).items():
        all_cols.setdefault(ren.get(c, c), dt)

    def tag(side: int):
        def run(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            if side == 1 and ren:
                df = df.rename(columns=ren)
            df[_SIDE] = np.int8(side)
            return _pad_frame(df, all_cols)

        return run

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        L = df.loc[df[_SIDE] == 0, lcols]
        R = df.loc[df[_SIDE] == 1, keys + rpayload]
        if how in ("semi", "anti"):
            mask = (
                pd.MultiIndex.from_frame(L[keys]).isin(pd.MultiIndex.from_frame(R[keys]))
                if len(keys) > 1
                else L[keys[0]].isin(R[keys[0]]).to_numpy()
            )
            out = L[mask] if how == "semi" else L[~mask]
            return out.reset_index(drop=True)
        return L.merge(R, on=keys, how=how, sort=False)

    return partition_map_groups(
        tagged, join_partition, key=keys[0], num_buckets=num_partitions
    )
