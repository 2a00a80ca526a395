"""Generic point-in-interval (range) join — the operator family Ray Data
lacks natively (reference analogue: time-slice selection + merge steps,
step2_resample.py:146-149 / step4 merge; generalized to arbitrary
[start, end) intervals).

Two physical strategies, bitwise-equal (pinned in tests/test_interval_join.py):

* ``broadcast_interval_join`` — the 100-TB default when the interval side is
  dimension-sized (incident windows, curriculum phases, holiday calendars):
  `ray.put` the intervals ONCE, each map_batches task masks its point batch
  against every interval. Zero shuffle; the per-interval loop runs over the
  SMALL side only and each iteration is one vectorized comparison.

* ``bucketed_interval_join`` — the scale path when BOTH sides are large:
  pick a coarse time-bucket width W, replicate each interval to every bucket
  it overlaps (replication factor ≤ ceil(len/W)+1, bounded when interval
  length is bounded — THE documented partitioning assumption), key points by
  ts//W, hash-co-partition both sides on the bucket id in ONE tagged-union
  exchange, then join inside each partition with per-bucket searchsorted
  over ts-sorted points. A point matches an interval copy only in the
  point's own bucket, so replicated intervals can never double-count.

Both emit one output row per (point, containing interval) pair — m:n, like
SQL `ON p.ts >= i.start AND p.ts < i.end`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _interval_frame(intervals: pd.DataFrame) -> pd.DataFrame:
    iv = intervals.reset_index(drop=True)
    if not {"w_start_us", "w_end_us"} <= set(iv.columns):
        raise ValueError("intervals need int64 w_start_us / w_end_us columns")
    return iv


def broadcast_interval_join(
    points: ray.data.Dataset,
    intervals: pd.DataFrame,
    ts_col: str = "ts_us",
) -> ray.data.Dataset:
    """Inner join: each point row × every interval containing its ts.

    Interval payload columns are appended to the point columns. Output row
    order within a batch follows interval order then point order
    (deterministic given deterministic input blocks)."""
    iv = _interval_frame(intervals)
    iv_ref = ray.put(iv)

    def fn(batch: pa.Table) -> pa.Table:
        ivf = ray.get(iv_ref) if isinstance(iv_ref, ray.ObjectRef) else iv_ref
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        pieces: list[pa.Table] = []
        for k in range(len(ivf)):
            s = np.int64(ivf["w_start_us"].iat[k])
            e = np.int64(ivf["w_end_us"].iat[k])
            idx = np.flatnonzero((ts >= s) & (ts < e))
            if len(idx) == 0:
                continue
            t = batch.take(pa.array(idx))
            for c in ivf.columns:
                v = ivf[c].iat[k]
                t = t.append_column(c, pa.array(np.repeat(v, len(idx))))
            pieces.append(t)
        if not pieces:
            # typed empty table so schemas stay stable across blocks
            t = batch.slice(0, 0)
            for c in ivf.columns:
                # infer the arrow type from actual values (object -> string)
                t = t.append_column(c, pa.array(ivf[c].to_numpy()).slice(0, 0))
            return t
        return pa.concat_tables(pieces)

    return points.map_batches(fn, batch_format="pyarrow")


def bucketed_interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    ts_col: str = "ts_us",
    bucket_width_us: int = 3_600_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large×large range join via time-bucket co-partitioning (ONE shuffle).

    Tagged union: interval rows are exploded to one row per overlapped
    bucket; point rows carry their own bucket. Both sides hash-partition on
    the bucket id (hash into num_partitions so thousands of time buckets
    never become thousands of map_groups calls — see NOTES_ROUND2 on
    per-group overhead), and the per-partition kernel segments by bucket
    and joins with searchsorted over ts-sorted points."""
    W = np.int64(bucket_width_us)

    ipt = points.schema()
    point_cols = ipt.names
    iv_schema = intervals.schema().names
    iv_payload = [c for c in iv_schema if c not in ("w_start_us", "w_end_us")]

    def explode_intervals(batch: pa.Table) -> pd.DataFrame:
        s = batch["w_start_us"].to_numpy(zero_copy_only=False)
        e = batch["w_end_us"].to_numpy(zero_copy_only=False)
        b0 = s // W
        b1 = (np.maximum(e, s + 1) - 1) // W  # inclusive last bucket
        reps = (b1 - b0 + 1).astype(np.int64)
        rows = np.repeat(np.arange(len(s), dtype=np.int64), reps)
        # bucket id per replica: b0[row] + offset within run
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        out = pd.DataFrame({"_bkt": b0[rows] + offs, "_side": np.int64(0)})
        out["w_start_us"] = s[rows]
        out["w_end_us"] = e[rows]
        for c in iv_payload:
            out[c] = batch[c].to_numpy(zero_copy_only=False)[rows]
        return out

    def tag_points(batch: pa.Table) -> pd.DataFrame:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        out = pd.DataFrame({"_bkt": ts // W, "_side": np.int64(1)})
        for c in point_cols:
            out[c] = batch[c].to_numpy(zero_copy_only=False)
        return out

    # unify schemas for the tagged union: fill the other side's columns
    def pad(df: pd.DataFrame, all_cols: dict[str, np.dtype]) -> pd.DataFrame:
        for c, dt in all_cols.items():
            if c not in df.columns:
                df[c] = pd.Series(np.zeros(len(df), dtype=dt) if dt.kind != "O" else [""] * len(df))
        return df[list(all_cols)]

    iv_probe = explode_intervals(intervals.limit(1).to_pandas().pipe(pa.Table.from_pandas))
    pt_probe = tag_points(points.limit(1).to_pandas().pipe(pa.Table.from_pandas))
    all_cols: dict[str, np.dtype] = {}
    for df in (iv_probe, pt_probe):
        for c in df.columns:
            if c not in all_cols:
                all_cols[c] = df[c].to_numpy().dtype

    tagged = intervals.map_batches(
        lambda b: pad(explode_intervals(b), all_cols), batch_format="pyarrow"
    ).union(points.map_batches(lambda b: pad(tag_points(b), all_cols), batch_format="pyarrow"))

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_bkt", "_side", ts_col], kind="mergesort", ignore_index=True)
        bkt = df["_bkt"].to_numpy()
        side = df["_side"].to_numpy()
        ts = df[ts_col].to_numpy()
        out_pt: list[np.ndarray] = []
        out_iv: list[np.ndarray] = []
        # segment by bucket: loop runs once per bucket PRESENT IN THIS
        # PARTITION that has at least one interval — proportional to the
        # replicated interval side, never to the point count
        seg = np.flatnonzero(np.diff(bkt, prepend=bkt[:1] - 1))
        seg = np.append(seg, len(df))
        for a, b in zip(seg[:-1], seg[1:]):
            sides = side[a:b]
            n_iv = int(np.searchsorted(sides, 1))
            if n_iv == 0 or n_iv == b - a:
                continue  # no intervals or no points in this bucket
            pts_ts = ts[a + n_iv : b]
            s_arr = df["w_start_us"].to_numpy()[a : a + n_iv]
            e_arr = df["w_end_us"].to_numpy()[a : a + n_iv]
            for k in range(n_iv):
                lo = a + n_iv + np.searchsorted(pts_ts, s_arr[k], side="left")
                hi = a + n_iv + np.searchsorted(pts_ts, e_arr[k], side="left")
                if hi > lo:
                    out_pt.append(np.arange(lo, hi, dtype=np.int64))
                    out_iv.append(np.full(hi - lo, a + k, dtype=np.int64))
        cols: dict[str, np.ndarray] = {}
        if not out_pt:
            for c in point_cols:
                cols[c] = df[c].to_numpy()[:0]
            for c in ("w_start_us", "w_end_us", *iv_payload):
                cols[c] = df[c].to_numpy()[:0]
            return pd.DataFrame(cols)
        pt_idx = np.concatenate(out_pt)
        iv_idx = np.concatenate(out_iv)
        for c in point_cols:
            cols[c] = df[c].to_numpy()[pt_idx]
        for c in ("w_start_us", "w_end_us", *iv_payload):
            cols[c] = df[c].to_numpy()[iv_idx]
        return pd.DataFrame(cols)

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    return partition_map_groups(
        tagged, join_partition, key="_bkt", num_buckets=num_partitions
    )
