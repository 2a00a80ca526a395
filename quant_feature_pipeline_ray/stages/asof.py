"""Point-in-time (backward) as-of join — the centerpiece operator (J1).

Reference: Step4 left-joins every base-axis row to the latest indicator row
with window_ts <= ts via pd.merge_asof(direction='backward',
allow_exact_matches=True) per timeframe (step4_merge_features.py:347-359,
519-537). Here the same semantics are expressed Ray-Data-first:

  * BOTH datasets get the same stable hash bucket on the `by` key
    (hashing.stable_bucket) → co-partitioned by construction.
  * The two sides are padded to one common Arrow schema, tagged, and
    UNIONED; a single groupby(bucket).map_groups splits the tag, sorts each
    side by its time key, and runs a sorted backward merge per bucket. One
    shuffle total — Ray Data cannot co-group two datasets directly; the
    tagged union is the portable way to get a co-partitioned join without a
    second exchange.
  * Leak-freedom: a right row is visible at ts iff its label <= ts
    (allow_exact_matches=True); when the right table comes from window_agg,
    the label already excludes the labeled instant ([W-p, W)), so equality
    at the boundary still reads only the past. A monotonic per-conversation
    cursor is exactly what pd.merge_asof's sorted backward scan implements.

Skew note: buckets are the unit of parallelism; a hot `by` key stays inside
one bucket. The right side (window features) is ~1-2 orders of magnitude
smaller than turns, so the join inherits the turn partitioning cost, not a
second large shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from quant_feature_pipeline_ray.hashing import stable_bucket
from quant_feature_pipeline_ray.stages.partition import BUCKET_COL

_SIDE_COL = "_asof_side"


def merge_asof_frames(
    left: pd.DataFrame,
    right: pd.DataFrame,
    on: str,
    right_on: str,
    by: str = "conv_id",
    prefix: str = "",
    direction: str = "backward",
) -> pd.DataFrame:
    """As-of merge of two frames of ONE co-partition.

    direction: 'backward' (latest right row at-or-before, the default and
    the reference's semantics), 'forward' (earliest at-or-after), or
    'nearest' (closest in either direction; on exact-distance ties pandas
    keeps the backward row). Column prefixing mirrors the reference's
    add_timeframe_prefix (step4_merge_features.py:340-344)."""
    lo = left.sort_values(on, kind="mergesort")
    value_cols = [c for c in right.columns if c not in (right_on, by)]
    ro = right.sort_values(right_on, kind="mergesort")[[by, right_on] + value_cols]
    ro = ro.rename(columns={c: f"{prefix}{c}" for c in value_cols + [right_on]})
    return pd.merge_asof(
        lo,
        ro,
        left_on=on,
        right_on=f"{prefix}{right_on}",
        by=by,
        direction=direction,
        allow_exact_matches=True,
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    by: str = "conv_id",
    num_buckets: int = 64,
    prefix: str = "r_",
    fill_zero: bool = True,
    direction: str = "backward",
) -> ray.data.Dataset:
    """Distributed as-of join of two Datasets on a time key within a `by`
    entity, in any pandas direction (backward / forward / nearest).
    Single shuffle (padded+tagged union → bucket groupby)."""
    right_on = right_on or on

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        t = np.dtype(t)  # PandasBlockSchema carries numpy dtypes
        return pa.string() if t == object else pa.from_numpy_dtype(t)

    lschema, rschema = left.schema(), right.schema()
    left_cols = list(lschema.names)
    right_cols = list(rschema.names)
    left_only = [c for c in left_cols if c not in right_cols]
    right_only = [c for c in right_cols if c not in left_cols]
    types = {
        **{n: _pa_type(t) for n, t in zip(lschema.names, lschema.types)},
        **{n: _pa_type(t) for n, t in zip(rschema.names, rschema.types)},
    }
    common_cols = left_cols + right_only  # one canonical order

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols, names = [], []
            for c in common_cols:
                names.append(c)
                if c in batch.column_names:
                    cols.append(batch[c])
                else:
                    cols.append(pa.nulls(n, type=types[c]))
            key = batch[by].to_numpy(zero_copy_only=False)
            names += [BUCKET_COL, _SIDE_COL]
            cols += [
                pa.array(stable_bucket(key, num_buckets), type=pa.int32()),
                pa.array(np.full(n, side, dtype=np.int8)),
            ]
            return pa.Table.from_arrays(cols, names=names)

        return fn

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    pd_dtype = dict(pa.schema(list(types.items())).empty_table().to_pandas().dtypes)

    def join_bucket(tbl: pa.Table) -> pd.DataFrame:
        # split sides IN ARROW before the pandas hop: each side's own
        # columns carry no padding nulls after the row filter, so int64
        # keys survive without the float64 promotion (and the group never
        # materializes as one wide object block)
        side = tbl[_SIDE_COL].to_numpy(zero_copy_only=False)
        lf = tbl.filter(pa.array(side == 0)).select(left_cols).to_pandas()
        rf = tbl.filter(pa.array(side == 1)).select(right_cols).to_pandas()
        if len(lf) == 0:
            return lf
        if len(rf) == 0:
            # empty right side: emit the left rows with all-null join columns
            out = lf.copy()
            for c in [right_on] + [x for x in right_cols if x not in (right_on, by)]:
                out[f"{prefix}{c}"] = np.nan
        else:
            out = merge_asof_frames(
                lf, rf, on=on, right_on=right_on, by=by, prefix=prefix,
                direction=direction,
            )
        if fill_zero:
            for c in right_only:
                name = f"{prefix}{c}" if c != right_on else f"{prefix}{right_on}"
                if name in out and out[name].isna().any():
                    out[name] = out[name].fillna(0)
                if name in out and pd.api.types.is_float_dtype(out[name]) and pd.api.types.is_integer_dtype(pd_dtype[c]):
                    out[name] = out[name].astype(np.int64)
        return out.drop(columns=[BUCKET_COL, _SIDE_COL], errors="ignore")

    return unioned.groupby(BUCKET_COL).map_groups(join_bucket, batch_format="pyarrow")
