"""Event-stream pipelines over the testdata `events` table.

Exercises the same operator family as the transcript engine on a second
entity key (user_id:int64): W1 fixed-window aggregates with first/last
semantics (the literal OHLCV-resample analogue, step2_resample.py:220-244),
M8 gap-based sessionize, and the generic co-partitioned as-of join
(stages/asof.py) joining each event to its latest *completed* window.

Numerical parity: `value` carries exactly 2 decimals, so sums go through
integer cents (CAST(round(value*100) AS BIGINT)) — exact and
order-independent in both engines. first/last are by unique ts → exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from quant_feature_pipeline_ray.stages.asof import asof_join
from quant_feature_pipeline_ray.stages.partition import partition_map_groups

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _window_agg_frame(df: pd.DataFrame, window_s: int) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts"], kind="mergesort")
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    p = np.int64(window_s) * 1_000_000
    out = pd.DataFrame(
        {
            "user_id": df["user_id"].to_numpy(),
            "w_end_us": (ts_us // p + 1) * p,
            "value_c": np.round(df["value"].to_numpy() * 100).astype(np.int64),
            "value": df["value"].to_numpy(),
        }
    )
    g = out.groupby(["user_id", "w_end_us"], sort=True, as_index=False)
    agg = g.agg(
        n_events=("value", "size"),
        first_value=("value", "first"),
        last_value=("value", "last"),
        min_value=("value", "min"),
        max_value=("value", "max"),
        sum_value_c=("value_c", "sum"),
    )
    agg["n_events"] = agg["n_events"].astype(np.int64)
    agg["sum_value"] = agg["sum_value_c"] / 100.0
    return agg.drop(columns=["sum_value_c"])


def _read_events(path: str, columns: list[str]) -> ray.data.Dataset:
    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    # events tables ship as one file; split the read so it isn't one task
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=min(16, cluster_cpus())
    )


def events_window_agg(path: str, window_s: int = 3600, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-(user, leak-free [W-p,W) window) OHLC-style aggregate."""
    ds = _read_events(path, EVENT_COLS)
    return partition_map_groups(
        ds, lambda g: _window_agg_frame(g, window_s), key="user_id", num_buckets=num_buckets
    )


def _sessionize_frame(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
    user = df["user_id"].to_numpy()
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    n = len(df)
    new_user = np.empty(n, dtype=bool)
    new_user[0] = True
    np.not_equal(user[1:], user[:-1], out=new_user[1:])
    dt_us = np.diff(ts_us, prepend=ts_us[:1])
    dt_us[new_user] = 0
    new_session = new_user | (dt_us > np.int64(gap_s * 1e6))
    sid = np.cumsum(new_session.astype(np.int64))
    first_sid = np.maximum.accumulate(np.where(new_user, sid, 0))
    idx = np.arange(n, dtype=np.int64)
    sess_start = np.maximum.accumulate(np.where(new_session, idx, 0))
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": user,
            "ts_us": ts_us,
            "dt_secs": dt_us / 1e6,
            "session_id": sid - first_sid,
            "session_evt": idx - sess_start + 1,
        }
    )


def events_sessionize(path: str, gap_s: float = 1800.0, num_buckets: int = 32) -> ray.data.Dataset:
    ds = _read_events(path, ["event_id", "ts", "user_id"])
    return partition_map_groups(
        ds, lambda g: _sessionize_frame(g, gap_s), key="user_id", num_buckets=num_buckets
    )


def events_asof_window(path: str, window_s: int = 3600, num_buckets: int = 32) -> ray.data.Dataset:
    """Each event joined to its latest completed per-user window aggregate —
    drives the generic two-Dataset asof_join operator (J1)."""
    ds = _read_events(path, ["event_id", "ts", "user_id"])

    def to_us(batch):
        import pyarrow as pa

        ts_us = batch["ts"].cast(pa.int64())
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    left = ds.map_batches(to_us, batch_format="pyarrow")
    right = events_window_agg(path, window_s, num_buckets).drop_columns(
        ["first_value", "last_value", "min_value", "max_value"]
    )
    return asof_join(
        left,
        right,
        on="ts_us",
        right_on="w_end_us",
        by="user_id",
        num_buckets=num_buckets,
        prefix="w_",
        fill_zero=True,
    )


def events_interval_join(
    path: str, strategy: str = "bucketed", num_partitions: int = 32
) -> ray.data.Dataset:
    """Range join: every event × every derived 'active window' containing
    its ts (m:n point-in-interval join — the operator Ray Data lacks
    natively; stages/interval_join.py).

    Interval side derived from the data itself (deterministic, unaligned to
    any ts bucketing): per event_type, the middle [10%, 40%) slice of that
    type's global time span — int64-µs arithmetic end-to-end so the DuckDB
    range-join oracle is exact. The interval derivation is itself a partial
    Min/Max aggregate (one tiny shuffle of ≤ types×blocks rows).

    strategy="bucketed" drives the large×large co-partitioned path;
    "broadcast" drives the small-side path; both bitwise-equal
    (tests/test_interval_join.py)."""
    import pyarrow as pa

    from quant_feature_pipeline_ray.stages.interval_join import (
        broadcast_interval_join,
        bucketed_interval_join,
    )

    ds = _read_events(path, ["event_id", "ts", "user_id", "event_type"])

    def to_us(batch: "pa.Table") -> "pa.Table":
        ts_us = batch["ts"].cast(pa.int64())
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    points = ds.map_batches(to_us, batch_format="pyarrow")

    def span_partial(batch: "pa.Table") -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "itype": batch["event_type"].to_numpy(zero_copy_only=False),
                "ts_us": batch["ts_us"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("itype", as_index=False)["ts_us"]
        return g.min().rename(columns={"ts_us": "t0"}).merge(
            g.max().rename(columns={"ts_us": "t1"}), on="itype"
        )

    from ray.data.aggregate import Max, Min

    spans = (
        points.map_batches(span_partial, batch_format="pyarrow")
        .groupby("itype")
        .aggregate(Min("t0", alias_name="t0"), Max("t1", alias_name="t1"))
        .to_pandas()  # ≤ #event_types rows
    )
    iv = pd.DataFrame(
        {
            "w_start_us": spans["t0"] + (spans["t1"] - spans["t0"]) // 10,
            "w_end_us": spans["t0"] + (4 * (spans["t1"] - spans["t0"])) // 10,
            "itype": spans["itype"],
        }
    )
    if strategy == "broadcast":
        return broadcast_interval_join(points, iv)
    import ray.data as rd

    return bucketed_interval_join(
        points,
        rd.from_pandas(iv),
        bucket_width_us=3_600_000_000,
        num_partitions=num_partitions,
    )


def events_interval_join_sql() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
),
span AS (
  SELECT event_type AS itype, MIN(ts_us) AS t0, MAX(ts_us) AS t1
  FROM e GROUP BY event_type
),
iv AS (
  SELECT itype,
         t0 + (t1 - t0) // 10 AS w_start_us,
         t0 + (4 * (t1 - t0)) // 10 AS w_end_us
  FROM span
)
SELECT e.event_id, e.user_id, e.event_type, e.ts_us,
       iv.w_start_us, iv.w_end_us, iv.itype
FROM e JOIN iv ON e.ts_us >= iv.w_start_us AND e.ts_us < iv.w_end_us
ORDER BY event_id, itype"""


def events_running_total(path: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Ordered window function: per-user running total of `value` in event
    order (the SUM() OVER (PARTITION BY user ORDER BY ts, event_id) shape).

    One hash partition by user_id; inside each partition a single
    conv-major sort + global cumsum with per-user reset (cumsum minus the
    user's base — O(n), no per-user loop). Integer cents keep the running
    sum associative and bitwise vs the oracle."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        user = df["user_id"].to_numpy()
        vc = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        n = len(df)
        new_user = np.empty(n, dtype=bool)
        if n:
            new_user[0] = True
            np.not_equal(user[1:], user[:-1], out=new_user[1:])
        cs = np.cumsum(vc)
        # per-user base via ffilled start INDEX (index accumulate stays
        # monotone even when values are negative and cs is not)
        idx = np.arange(n, dtype=np.int64)
        start_idx = np.maximum.accumulate(np.where(new_user, idx, 0))
        run_c = cs - (cs - vc)[start_idx]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": user,
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "value": df["value"].to_numpy(),
                "running_total": run_c / 100.0,
                "user_event_seq": idx - start_idx + 1,
            }
        )

    ds = _read_events(path, ["event_id", "ts", "user_id", "value"])
    return partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)


def events_running_total_sql() -> str:
    return """
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       value,
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) / 100.0
         AS running_total,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS user_event_seq
FROM events
ORDER BY event_id"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(path: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Pivot (long→wide): per-user event-type counts + value sums as
    columns. Per-batch partial pivot (one pandas crosstab-style groupby per
    batch) → grouped_aggregate sums — the exchange moves one wide partial
    row per (user, batch), never the long rows. Fixed, config-declared
    column set (a data-dependent pivot would need a schema-discovery pass
    first — same two-phase shape as the interval join's span scan)."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["ts", "user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow as _pa

        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "value_c": np.round(batch["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False)["value_c"].agg(
            n="size", value_c="sum"
        )
        out = pd.DataFrame({"user_id": g["user_id"].unique()})
        out = out.set_index("user_id")
        for t in EVENT_TYPES:
            sub = g[g["event_type"] == t].set_index("user_id")
            out[f"n_{t}"] = sub["n"].reindex(out.index, fill_value=0).astype(np.int64)
            out[f"sum_{t}_c"] = sub["value_c"].reindex(out.index, fill_value=0).astype(np.int64)
        return out.reset_index()

    aggs = {}
    for t in EVENT_TYPES:
        aggs[f"n_{t}"] = (f"n_{t}", "sum")
        aggs[f"sum_{t}_c"] = (f"sum_{t}_c", "sum")
    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", aggs,
        num_partitions=num_buckets,
    )

    def finalize(batch: pa.Table) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": batch["user_id"].to_numpy()})
        for t in EVENT_TYPES:
            out[f"n_{t}"] = batch[f"n_{t}"].to_numpy()
            out[f"sum_{t}"] = batch[f"sum_{t}_c"].to_numpy() / 100.0
        return out

    return agg.map_batches(finalize, batch_format="pyarrow")


def events_pivot_sql() -> str:
    cols = []
    for t in EVENT_TYPES:
        cols.append(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}")
        cols.append(
            f"CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = '{t}'), 0) AS BIGINT) / 100.0 AS sum_{t}"
        )
    return "SELECT user_id, " + ", ".join(cols) + " FROM events GROUP BY user_id ORDER BY user_id"


def events_json_extract(path: str) -> ray.data.Dataset:
    """Semi-structured payload extraction + grouped aggregate: pull the
    integer field `k` out of the JSON `props` column, then per-event-type
    count / sum / min / max.

    The extraction is a VECTORIZED regex over the whole batch (pandas
    str.extract on a compiled pattern) — the right kernel for a fixed-shape
    payload; an arbitrarily-nested payload would swap in orjson.loads per
    row inside the same map_batches stage (still one pass, no shuffle).
    Event-type cardinality is a handful, so the final step is Ray's native
    aggregate (COVERAGE.md A1b rule: native only for handful-of-groups)."""
    import re

    ds = _read_events(path, ["event_type", "props"])
    pat = re.compile(r'"k":\s*(-?\d+)')

    def partial(batch: pa.Table) -> pd.DataFrame:
        props = batch["props"].to_pandas()
        # NULL-tolerant extraction (round-2 ADVICE): a row whose payload
        # lacks "k" (or has a null props) yields <NA> and is aggregated
        # AROUND — n counts every row (SQL count(*)), sum/min/max skip
        # missing (SQL NULL semantics) — instead of killing the query
        k = pd.to_numeric(props.str.extract(pat, expand=False), errors="coerce").astype(
            "Int64"
        )
        p = pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(zero_copy_only=False), "k": k}
        )
        agg = p.groupby("event_type", as_index=False).agg(
            n=("k", "size"), k_sum=("k", "sum"), k_min=("k", "min"), k_max=("k", "max")
        )
        # a group that is ALL-missing has pandas NA partials; keep int64
        # blocks (schema-stable across batches) with identity fill values
        # for the downstream Sum/Min/Max merge
        agg["k_sum"] = agg["k_sum"].fillna(0).astype("int64")
        agg["k_min"] = agg["k_min"].fillna(np.iinfo(np.int64).max).astype("int64")
        agg["k_max"] = agg["k_max"].fillna(np.iinfo(np.int64).min).astype("int64")
        return agg

    from ray.data.aggregate import Max, Min, Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
        )
    )
    return out


def events_json_extract_sql() -> str:
    k = r"""CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)"""
    return f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({k}) AS BIGINT) AS k_sum,
       CAST(min({k}) AS BIGINT) AS k_min,
       CAST(max({k}) AS BIGINT) AS k_max
FROM events
GROUP BY event_type ORDER BY event_type"""


def events_lead_lag(path: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Generic per-entity LAG/LEAD window functions (the reference's
    shift-family, step5_featueres_unified.py lag/lead deltas, on a second
    entity key): previous/next value and inter-event gap per user in
    (ts, event_id) order.

    One hash partition by user_id; inside each partition a single
    user-major sort, then global shift with boundary masking (no per-user
    loop). Floats are COPIED (lag/lead) or subtracted (delta) — identical
    IEEE ops on identical doubles, so the DuckDB comparison is bitwise."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        user = df["user_id"].to_numpy()
        val = df["value"].to_numpy()
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(df)
        same_prev = np.zeros(n, dtype=bool)
        if n > 1:
            same_prev[1:] = user[1:] == user[:-1]
        lag = np.full(n, np.nan)
        lead = np.full(n, np.nan)
        gap = np.full(n, np.nan)
        if n > 1:
            lag[1:] = np.where(same_prev[1:], val[:-1], np.nan)
            lead[:-1] = np.where(same_prev[1:], val[1:], np.nan)
            gap[1:] = np.where(same_prev[1:], (ts_us[1:] - ts_us[:-1]).astype(np.float64), np.nan)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": user,
                "ts_us": ts_us,
                "value": val,
                "value_lag": lag,
                "value_lead": lead,
                "value_delta": val - lag,
                "gap_us": gap,
            }
        )

    ds = _read_events(path, ["event_id", "ts", "user_id", "value"])
    return partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)


def events_lead_lag_sql() -> str:
    return """
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       value,
       LAG(value)  OVER w AS value_lag,
       LEAD(value) OVER w AS value_lead,
       value - LAG(value) OVER w AS value_delta,
       CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS DOUBLE) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id"""


def events_rank_topn(path: str, n: int = 3, num_buckets: int = 32) -> ray.data.Dataset:
    """Grouped rank + top-N filter (ROW_NUMBER() <= n shape): each user's
    n highest-value events with their rank. Deterministic under value ties
    via the event_id tiebreak. Per hash partition: one sort + groupby.head
    — never a global sort; output is n·|users| rows."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
        user = df["user_id"].to_numpy()
        m = len(df)
        idx = np.arange(m, dtype=np.int64)
        new_user = np.empty(m, dtype=bool)
        if m:
            new_user[0] = True
            np.not_equal(user[1:], user[:-1], out=new_user[1:])
        start_idx = np.maximum.accumulate(np.where(new_user, idx, 0))
        rank = idx - start_idx + 1
        keep = rank <= n
        return pd.DataFrame(
            {
                "user_id": user[keep],
                "event_id": df["event_id"].to_numpy()[keep],
                "value": df["value"].to_numpy()[keep],
                "rnk": rank[keep],
            }
        )

    ds = _read_events(path, ["event_id", "user_id", "value"])
    return partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)


def events_rank_topn_sql(n: int = 3) -> str:
    return f"""
SELECT user_id, event_id, value, rnk FROM (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rnk
  FROM events)
WHERE rnk <= {n}
ORDER BY user_id, rnk"""


def events_distinct_users(path: str, num_buckets: int = 32) -> pd.DataFrame:
    """Exact COUNT(DISTINCT entity) per group at fact scale: per-batch
    DISTINCT (event_type, user) pairs (combiner — the exchange moves one
    row per pair per batch, not one per event), hash exchange on user_id so
    every copy of a pair lands in ONE partition, per-partition dedup +
    count, driver sums a handful of (type, n) partials. Raw event counts
    ride the same exchange as per-pair partial sums."""
    ds = _read_events(path, ["user_id", "event_type"])

    def pairs(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby(["user_id", "event_type"], as_index=False).size()
        out["n_events"] = out.pop("size").astype(np.int64)
        return out

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "event_type"], as_index=False)["n_events"].sum()
        out = agg.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size"), n_events=("n_events", "sum")
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    parts = partition_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow"),
        per_partition,
        key="user_id",
        num_buckets=num_buckets,
    )
    out = parts.to_pandas().groupby("event_type", as_index=False)[["n_users", "n_events"]].sum()
    out["n_users"] = out["n_users"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


def events_distinct_users_sql() -> str:
    return """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type"""


def events_grouped_quantiles(path: str, qs: tuple[float, ...] = (0.5, 0.9)) -> pd.DataFrame:
    """Exact per-group quantiles at fact scale via the distributed
    value-counts histogram (stages/normalize.global_value_counts, grouped):
    per-batch (group, value) count partials -> ONE composite-key
    grouped_aggregate -> driver interpolates each group's
    cardinality-bounded histogram with numpy's exact _lerp. Bitwise equal
    to DuckDB quantile_cont (value carries 2 decimals -> bounded
    cardinality; for unbounded floats freeze constants or accept a
    rows-only sketch, cf. normalize.global_value_counts docstring)."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.normalize import _lerp_quantile

    ds = _read_events(path, ["event_type", "value"])

    def vc(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "v": batch["value"].to_numpy(),
            }
        )
        out = df.groupby(["event_type", "v"], as_index=False).size()
        out["n"] = out.pop("size").astype(np.int64)
        return out

    hist = (
        grouped_aggregate(
            ds.map_batches(vc, batch_format="pyarrow"),
            ["event_type", "v"],
            {"n": ("n", "sum")},
        )
        .to_pandas()  # cardinality-bounded per group, NOT row-bounded
        .sort_values(["event_type", "v"], ignore_index=True)
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        vals, counts = g["v"].to_numpy(), g["n"].to_numpy()
        # round(,6): numpy's _lerp and DuckDB's quantile_cont agree on the
        # math but not always on the last ulp (observed at sf0.1: one q90
        # differed by 2^-46 — different lerp association). 6dp absorbs it;
        # the source values carry 2 decimals, so no information is lost.
        rows.append(
            {
                "event_type": et,
                **{
                    f"q{int(q * 100)}": round(_lerp_quantile(vals, counts, q), 6)
                    for q in qs
                },
            }
        )
    return pd.DataFrame(rows)


def events_grouped_quantiles_sql(qs: tuple[float, ...] = (0.5, 0.9)) -> str:
    cols = ", ".join(
        f"round(quantile_cont(value, {q}), 6) AS q{int(q * 100)}" for q in qs
    )
    return f"SELECT event_type, {cols} FROM events GROUP BY event_type ORDER BY event_type"


_WQ = ((1, 2), (9, 10))  # rational quantiles: exact integer comparisons


def events_weighted_quantiles(path: str, qs=_WQ) -> pd.DataFrame:
    """Exact per-group WEIGHTED quantiles (lower weighted quantile: the
    smallest value whose cumulative weight reaches q·W) — the primitive
    DuckDB has no builtin for, so the oracle spells out the same
    cumulative-weight definition. Weight = user_id % 10 + 1 (an integer
    importance stand-in), quantiles given as rationals so the pick is an
    INTEGER comparison cw·den >= W·num on both sides — no float
    interpolation anywhere.

    Scale shape = events_grouped_quantiles: per-batch (group, value)
    weight partials (combiner collapses duplicates), ONE composite-key
    grouped_aggregate, driver walks each group's cardinality-bounded
    histogram."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["event_type", "user_id", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "v": batch["value"].to_numpy(),
                "w": batch["user_id"].to_numpy() % 10 + 1,
            }
        )
        return df.groupby(["event_type", "v"], as_index=False)["w"].sum()

    hist = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "v"],
            {"w": ("w", "sum")},
        )
        .to_pandas()
        .sort_values(["event_type", "v"], ignore_index=True)
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        vals = g["v"].to_numpy()
        cw = np.cumsum(g["w"].to_numpy(dtype=np.int64))
        W = int(cw[-1])
        row = {"event_type": et}
        for num, den in qs:
            row[f"wq{num * 100 // den}"] = float(vals[np.searchsorted(cw * den, W * num)])
        rows.append(row)
    return pd.DataFrame(rows)


def events_weighted_quantiles_sql(qs=_WQ) -> str:
    picks = ",\n  ".join(
        f"MIN(value) FILTER (WHERE cw * {den} >= tw * {num}) AS wq{num * 100 // den}"
        for num, den in qs
    )
    return f"""
WITH g AS (
  SELECT event_type, value, SUM(user_id % 10 + 1) AS w
  FROM events GROUP BY event_type, value
), c AS (
  SELECT event_type, value,
         SUM(w) OVER (PARTITION BY event_type ORDER BY value) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM g
)
SELECT event_type,
  {picks}
FROM c GROUP BY event_type ORDER BY event_type"""


def events_funnel(path: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Ordered conversion funnel per user: first 'view', then the first
    'click' strictly after it, then the first 'purchase' strictly after
    that — the sequential-pattern shape (stage timestamps must respect
    event order, not just existence).

    One hash exchange on user_id; inside each partition the three stages
    resolve as vectorized grouped mins + filtered joins (no per-user Python
    loop). NULL stage timestamps stay NULL; stage = how deep the user got."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    ds = _read_events(path, ["user_id", "event_type", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        t1 = g[g["event_type"] == "view"].groupby("user_id")["ts_us"].min()
        clicks = g[g["event_type"] == "click"].copy()
        clicks["t1"] = clicks["user_id"].map(t1)
        t2 = clicks[clicks["ts_us"] > clicks["t1"]].groupby("user_id")["ts_us"].min()
        purch = g[g["event_type"] == "purchase"].copy()
        purch["t2"] = purch["user_id"].map(t2)
        t3 = purch[purch["ts_us"] > purch["t2"]].groupby("user_id")["ts_us"].min()
        users = np.sort(g["user_id"].unique())
        out = pd.DataFrame({"user_id": users})
        out["t_view_us"] = out["user_id"].map(t1)
        out["t_click_us"] = out["user_id"].map(t2)
        out["t_purchase_us"] = out["user_id"].map(t3)
        out["stage"] = (
            out["t_view_us"].notna().astype("int64")
            + out["t_click_us"].notna().astype("int64")
            + out["t_purchase_us"].notna().astype("int64")
        )
        return out[["user_id", "stage", "t_view_us", "t_click_us", "t_purchase_us"]]

    return partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)


def events_funnel_sql() -> str:
    return """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
v AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM e JOIN v ON v.user_id = e.user_id AND e.ts_us > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts_us) AS t3
  FROM e JOIN c ON c.user_id = e.user_id AND e.ts_us > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT u.user_id,
       CAST((v.t1 IS NOT NULL)::INT + (c.t2 IS NOT NULL)::INT + (p.t3 IS NOT NULL)::INT AS BIGINT) AS stage,
       v.t1 AS t_view_us, c.t2 AS t_click_us, p.t3 AS t_purchase_us
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
ORDER BY u.user_id"""


def events_retention(path: str, num_buckets: int = 32) -> pd.DataFrame:
    """Cohort retention: users grouped by their FIRST active day (the
    cohort), with day-1 and within-7-day return rates — the standard
    product-analytics rollup, and a two-level aggregation shape (per-user
    resolution, then per-cohort rollup).

    ONE hash exchange on user_id resolves each user to a single
    (cohort_day, returned_d1, returned_d7) row via vectorized grouped mins
    inside the partition; the per-cohort rollup then moves only one row per
    user. Days are integer epoch-µs midnights, so the oracle is exact."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    DAY = np.int64(86_400_000_000)
    ds = _read_events(path, ["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // DAY
        d = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day}).drop_duplicates()
        first = d.groupby("user_id")["day"].min()
        d["cohort"] = d["user_id"].map(first)
        gap = d["day"] - d["cohort"]
        r = d.assign(
            r1=(gap == 1).astype(np.int64),
            r7=((gap >= 1) & (gap <= 7)).astype(np.int64),
        ).groupby("user_id", as_index=False).agg(
            cohort=("cohort", "first"), r1=("r1", "max"), r7=("r7", "max")
        )
        return r

    users = partition_map_groups(ds, per_user, key="user_id", num_buckets=num_buckets)
    out = grouped_aggregate(
        users,
        "cohort",
        {"n_users": ("user_id", "size"), "retained_d1": ("r1", "sum"),
         "retained_d7": ("r7", "sum")},
    ).to_pandas()
    out["cohort_day_us"] = out["cohort"].to_numpy(np.int64) * DAY
    out = out.astype({"n_users": "int64", "retained_d1": "int64", "retained_d7": "int64"})
    return out.sort_values("cohort_day_us", ignore_index=True)[
        ["cohort_day_us", "n_users", "retained_d1", "retained_d7"]
    ]


def events_retention_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1),
r AS (
  SELECT f.user_id, f.cohort,
         max(CASE WHEN d.day - f.cohort = 1 THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN d.day - f.cohort BETWEEN 1 AND 7 THEN 1 ELSE 0 END) AS r7
  FROM f JOIN d USING (user_id) GROUP BY 1, 2
)
SELECT cohort * 86400000000 AS cohort_day_us,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(r1) AS BIGINT) AS retained_d1,
       CAST(SUM(r7) AS BIGINT) AS retained_d7
FROM r GROUP BY 1 ORDER BY 1"""


def events_asof_forward(path: str, window_s: int = 3600, num_buckets: int = 32) -> ray.data.Dataset:
    """FORWARD as-of: each event joined to the EARLIEST per-user window
    aggregate ending at-or-after it — the "next scheduled boundary" lookup
    (completes the J1 family's direction axis; same single-shuffle plan,
    direction='forward' in the co-partition merge)."""
    ds = _read_events(path, ["event_id", "ts", "user_id"])

    def to_us(batch):
        import pyarrow as pa

        ts_us = batch["ts"].cast(pa.int64())
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    left = ds.map_batches(to_us, batch_format="pyarrow")
    right = events_window_agg(path, window_s, num_buckets).drop_columns(
        ["first_value", "last_value", "min_value", "max_value"]
    )
    return asof_join(
        left,
        right,
        on="ts_us",
        right_on="w_end_us",
        by="user_id",
        num_buckets=num_buckets,
        prefix="w_",
        fill_zero=True,
        direction="forward",
    )


def events_asof_forward_sql(window_s: int = 3600) -> str:
    # DuckDB ASOF JOIN is backward-only (>=): negating both time keys turns
    # "earliest w_end_us >= ts" into a backward lookup on the negated axis.
    p = window_s * 1_000_000
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, -epoch_us(ts) AS neg_ts
  FROM events
), w AS (
  SELECT user_id,
         (ts_us // {p} + 1) * {p} AS w_end_us,
         -((ts_us // {p} + 1) * {p}) AS neg_w_end,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(value_c) AS BIGINT) / 100.0 AS sum_value
  FROM (SELECT user_id, epoch_us(ts) AS ts_us,
               CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
  GROUP BY 1, 2, 3
)
SELECT e.event_id, e.user_id, e.ts_us,
       COALESCE(w.n_events, 0) AS w_n_events,
       COALESCE(w.sum_value, 0.0) AS w_sum_value,
       COALESCE(w.w_end_us, 0) AS w_w_end_us
FROM e ASOF LEFT JOIN w ON e.user_id = w.user_id AND e.neg_ts >= w.neg_w_end
ORDER BY e.event_id"""


def events_unpivot(path: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Unpivot / melt (wide→long): the pivoted per-user count/sum columns
    back to (user_id, event_type, n, sum_value) rows — the inverse reshape
    (feeding per-metric pipelines from a wide table). Stateless flat map
    over the pivot's blocks: each wide row fans out to one row per
    declared event type, no extra shuffle beyond the pivot's own."""
    wide = events_pivot(path, num_buckets)

    def melt(batch: pa.Table) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy()
        n = len(uid)
        k = len(EVENT_TYPES)
        out = pd.DataFrame(
            {
                "user_id": np.repeat(uid, k),
                "event_type": np.tile(np.asarray(EVENT_TYPES, dtype=object), n),
                "n": np.column_stack(
                    [batch[f"n_{t}"].to_numpy() for t in EVENT_TYPES]
                ).reshape(-1),
                "sum_value": np.column_stack(
                    [batch[f"sum_{t}"].to_numpy() for t in EVENT_TYPES]
                ).reshape(-1),
            }
        )
        return out[out["n"] > 0].reset_index(drop=True)

    return wide.map_batches(melt, batch_format="pyarrow")


def events_unpivot_sql() -> str:
    return """
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


def events_distinct_users_hll(path: str, num_buckets: int = 32) -> pd.DataFrame:
    """PER-GROUP HLL distinct count — the sketch variant of
    events_distinct_users for when the per-group entity sets outgrow an
    exact pair exchange (distinct URLs per domain at 100 TB).

    Grouped-sketch merge pattern: each batch emits (group, register_idx,
    rho) rows for its non-zero HLL registers; grouped_aggregate MAX over
    (group, idx) IS the HLL merge (register max is associative /
    idempotent), and the driver folds 2^p rows per group into one
    estimate. The exchange is bounded by groups x 2^p regardless of row
    count.

    The user hash is md5-lower-64 of the DECIMAL user_id string
    (DuckDB md5_number_lower parity — the doc_checksum discipline), and
    the per-group estimate keeps the register sum as an exact integer, so
    the SQL oracle reproduces every estimate bit-for-bit (md5 runs once
    per DISTINCT user per batch, not per row)."""
    import math

    from quant_feature_pipeline_ray.hashing import md5_lower64
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    P = 12
    M, REST = 1 << P, 64 - P
    ds = _read_events(path, ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        from quant_feature_pipeline_ray.functions.sketches import hll_registers

        df = pd.DataFrame(
            {
                "t": batch["event_type"].to_numpy(zero_copy_only=False),
                "u": batch["user_id"].to_numpy(),
            }
        )
        rows = []
        for t, g in df.groupby("t"):
            users = np.unique(g["u"].to_numpy())
            h = md5_lower64([str(int(u)) for u in users])
            reg = hll_registers(h, p=P)
            nz = np.flatnonzero(reg)
            rows.append(pd.DataFrame({"event_type": t, "idx": nz.astype(np.int64),
                                      "rho": reg[nz].astype(np.int64)}))
        return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            {"event_type": pd.Series(dtype=object), "idx": pd.Series(dtype="int64"),
             "rho": pd.Series(dtype="int64")}
        )

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "idx"],
        {"rho": ("rho", "max")},
        num_partitions=num_buckets,
    ).to_pandas()

    alpha = 0.7213 / (1.0 + 1.079 / M)
    out_rows = []
    for t, g in merged.groupby("event_type"):
        reg = np.zeros(M, dtype=np.uint8)
        reg[g["idx"].to_numpy()] = g["rho"].to_numpy().astype(np.uint8)
        s_int = sum((1 << (REST - int(r))) for r in reg)  # exact integer
        zeros = int(np.count_nonzero(reg == 0))
        est = alpha * M * M * float(1 << REST) / float(s_int)
        if est <= 2.5 * M and zeros > 0:
            est = M * math.log(M / zeros)  # linear counting
        out_rows.append({"event_type": t, "n_users_est": est})
    return pd.DataFrame(out_rows).sort_values("event_type", ignore_index=True)


def events_distinct_users_hll_sql() -> str:
    """Bit-exact SQL mirror of the per-group HLL estimate (same md5 hash,
    exact HUGEINT register sums, identical IEEE float tail)."""
    p = 12
    m, rest = 1 << p, 64 - p
    return f"""
WITH u AS (
  SELECT DISTINCT event_type, user_id FROM events
), h AS (
  SELECT event_type, md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM u
), reg AS (
  SELECT event_type, CAST(h >> {rest} AS BIGINT) AS register,
         CAST(h & ((CAST(1 AS UBIGINT) << {rest}) - 1) AS UBIGINT) AS w
  FROM h
), rho AS (
  SELECT event_type, register,
         MAX(CASE WHEN w = 0 THEN {rest + 1}
                  ELSE {rest} - length(bin(w)) + 1 END) AS rho
  FROM reg GROUP BY event_type, register
), s AS (
  SELECT event_type,
         SUM(CAST(1 AS HUGEINT) << ({rest} - rho)) AS s_nz, COUNT(*) AS n_nz
  FROM rho GROUP BY event_type
), est AS (
  SELECT event_type,
         (0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)} * {float(1 << rest)}
           / CAST(s_nz + ({m} - n_nz) * (CAST(1 AS HUGEINT) << {rest}) AS DOUBLE)
           AS raw,
         {m} - n_nz AS zeros
  FROM s
)
SELECT event_type,
       CASE WHEN raw <= {2.5 * m} AND zeros > 0
            THEN {float(m)} * ln({float(m)} / zeros)
            ELSE raw END AS n_users_est
FROM est ORDER BY event_type"""


def events_streaming_windows(path: str, window_s: int = 60, num_buckets: int = 32) -> ray.data.Dataset:
    """The event-time streaming kernel (state/event_windows.py) driven as a
    Dataset stage: ONE user_id hash exchange, one kernel instance per
    partition, rows fed in arrival (ts) order in micro-chunks — emissions +
    final flush must equal the batch tumbling aggregate, which is exactly
    what the SQL oracle checks (streaming == batch through the driver
    contract, the events-table sibling of the transcript engine's
    streaming parity)."""
    import numpy as np

    from quant_feature_pipeline_ray.state.event_windows import StreamingEventWindows
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    ds = _read_events(path, ["user_id", "ts", "value"])

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "ts_us": g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "value_c": np.round(g["value"].to_numpy() * 100).astype(np.int64),
            }
        ).sort_values("ts_us", kind="mergesort", ignore_index=True)
        k = StreamingEventWindows(window_s, allowed_lateness_s=0)
        # split by integer index, not np.array_split(DataFrame) — the
        # latter rides DataFrame.swapaxes, removed in pandas 3.0
        outs = [
            k.process(df.iloc[idx])[0]
            for idx in np.array_split(np.arange(len(df)), 8)
        ]
        outs.append(k.flush())
        out = pd.concat(outs, ignore_index=True)
        out["sum_value"] = out.pop("sum_value_c") / 100.0
        return out

    return partition_map_groups(ds, per_partition, key="user_id", num_buckets=num_buckets)


def events_streaming_windows_sql(window_s: int = 60) -> str:
    p = window_s * 1_000_000
    return f"""
SELECT user_id,
       (epoch_us(ts) // {p} + 1) * {p} AS w_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""


def events_streaming_sessions(
    path: str, gap_s: int = 1800, num_buckets: int = 32
) -> ray.data.Dataset:
    """Event-time SESSION windows (state/event_windows.StreamingSessionWindows)
    driven as a Dataset stage: ONE user_id hash exchange, one kernel per
    partition, rows fed in ts order in micro-chunks so emissions + flush
    equal the batch gap-sessionization — the SQL oracle. The harder
    streaming semantics (gap-MERGE on bridging arrivals, late side output,
    snapshot/restore) are pinned in tests/test_event_windows.py."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups
    from quant_feature_pipeline_ray.state.event_windows import StreamingSessionWindows

    ds = _read_events(path, ["user_id", "ts", "value"])

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "ts_us": g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "value_c": np.round(g["value"].to_numpy() * 100).astype(np.int64),
            }
        ).sort_values("ts_us", kind="mergesort", ignore_index=True)
        k = StreamingSessionWindows(gap_s, allowed_lateness_s=0)
        outs = [
            k.process(df.iloc[idx])[0]
            for idx in np.array_split(np.arange(len(df)), 8)
        ]
        outs.append(k.flush())
        out = pd.concat(outs, ignore_index=True)
        out["sum_value"] = out.pop("sum_value_c") / 100.0
        return out

    return partition_map_groups(ds, per_partition, key="user_id", num_buckets=num_buckets)


def events_streaming_sessions_sql(gap_s: int = 1800) -> str:
    g = gap_s * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events
),
o AS (
  SELECT *,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {g}
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
s AS (
  SELECT *,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       CAST(sid AS BIGINT) AS session_id,
       MIN(ts_us) AS start_us,
       MAX(ts_us) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(value_c) AS BIGINT) / 100.0 AS sum_value
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_id"""


def events_hopping_windows(
    path: str, window_s: int = 3600, hop_s: int = 900, num_buckets: int = 32
) -> ray.data.Dataset:
    """Hopping (overlapping/sliding) event-time windows: every event lands
    in window_s/hop_s windows whose starts are hop_s apart — the streaming
    form of the reference's multi-timeframe resample family (a fixed window
    per scale, step2_resample.py:220-244, generalized to overlap).

    Dataflow: vectorized explode (np.repeat row data x K, np.tile the K
    window-start offsets — no Python loop) followed by a per-batch partial
    groupby, so the single hash exchange moves at most one row per
    (user, window) per input batch instead of K rows per event; the final
    per-(user_id, w_start_us) reduce is grouped_aggregate (C-level pandas
    per hash partition, no per-group task cost). Sums ride integer cents,
    exact and order-independent — bitwise against the DuckDB oracle."""
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s
    hop_us = np.int64(hop_s) * 1_000_000

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["ts", "user_id", "value"])

    def explode(batch) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = (ts_us // hop_us) * hop_us
        offs = np.arange(k, dtype=np.int64) * hop_us
        w_start = np.repeat(base, k) - np.tile(offs, len(ts_us))
        cents = np.repeat(
            np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64), k
        )
        df = pd.DataFrame(
            {
                "user_id": np.repeat(batch["user_id"].to_numpy(zero_copy_only=False), k),
                "w_start_us": w_start,
                "n": np.int64(1),
                "sum_cents": cents,
                "min_cents": cents,
                "max_cents": cents,
            }
        )
        df = df[df["w_start_us"] >= 0]
        return df.groupby(["user_id", "w_start_us"], as_index=False).agg(
            {"n": "sum", "sum_cents": "sum", "min_cents": "min", "max_cents": "max"}
        )

    partials = ds.map_batches(explode, batch_format="pyarrow", batch_size=65536)
    agg = grouped_aggregate(
        partials,
        key=["user_id", "w_start_us"],
        aggs={
            "n": ("n", "sum"),
            "sum_cents": ("sum_cents", "sum"),
            "min_cents": ("min_cents", "min"),
            "max_cents": ("max_cents", "max"),
        },
        num_partitions=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "w_start_us": df["w_start_us"],
                "n": df["n"].astype(np.int64),
                "sum_value": df["sum_cents"].to_numpy() / 100.0,
                "min_value": df["min_cents"].to_numpy() / 100.0,
                "max_value": df["max_cents"].to_numpy() / 100.0,
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def events_hopping_windows_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000
    return f"""
WITH x AS (
  SELECT user_id,
         (epoch_us(ts) // {hop_us} - i.k) * {hop_us} AS w_start_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events CROSS JOIN (SELECT unnest(range({k})) AS k) i
)
SELECT user_id, w_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) / 100.0 AS sum_value,
       CAST(MIN(cents) AS BIGINT) / 100.0 AS min_value,
       CAST(MAX(cents) AS BIGINT) / 100.0 AS max_value
FROM x
WHERE w_start_us >= 0
GROUP BY user_id, w_start_us
ORDER BY user_id, w_start_us"""


def _ntile_frame(g: pd.DataFrame, tiles: int) -> pd.DataFrame:
    """NTILE(t) per event_type with the SQL tie-break (value, event_id):
    the first n % t tiles get ceil(n/t) rows, the rest floor(n/t) —
    computed per group from cumulative boundaries, no per-row loop."""
    g = g.sort_values(["event_type", "value", "event_id"], kind="mergesort", ignore_index=True)
    et = g["event_type"].to_numpy()
    n = len(g)
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    np.not_equal(et[1:], et[:-1], out=new_grp[1:])
    starts = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(starts, n))
    idx = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)  # 0-based rank in group
    gsz = np.repeat(sizes, sizes)
    q, r = gsz // tiles, gsz % tiles
    big = r * (q + 1)  # rows covered by the oversized tiles
    tile = np.where(
        idx < big,
        idx // np.maximum(q + 1, 1),
        r + np.where(q > 0, (idx - big) // np.maximum(q, 1), 0),
    )
    return pd.DataFrame(
        {
            "event_id": g["event_id"].to_numpy(),
            "event_type": et,
            "tile": (tile + 1).astype(np.int64),
        }
    )


def events_ntile(path: str, tiles: int = 4, num_buckets: int = 8) -> ray.data.Dataset:
    """NTILE(t) OVER (PARTITION BY event_type ORDER BY value, event_id) —
    equal-frequency bucketing per event class (the windowed-rank family
    member the repo's rank_topn/percentile operators don't cover).
    Exchange keyed on event_type (few groups, small rows: 3 columns)."""
    ds = _read_events(path, ["event_id", "event_type", "value"])
    return partition_map_groups(
        ds, lambda g: _ntile_frame(g, tiles), key="event_type", num_buckets=num_buckets
    )


def events_ntile_sql(tiles: int = 4) -> str:
    return f"""
SELECT event_id, event_type,
       CAST(NTILE({tiles}) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
ORDER BY event_id"""


def events_window_distinct_users(
    path: str, window_s: int = 3600, num_buckets: int = 32
) -> ray.data.Dataset:
    """Distinct-aggregate inside tumbling event-time windows: per window,
    event count AND exact distinct-user count. The per-batch combiner
    dedupes (window, user) pairs locally and carries the batch's event
    count, so the exchange moves at most one row per (window, user) per
    batch — never one per event; the per-window distinct is then the group
    size after a second local dedup, all inside ONE hash exchange keyed by
    window."""
    win_us = np.int64(window_s) * 1_000_000

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    ds = _read_events(path, ["ts", "user_id"])

    def partial(batch) -> pd.DataFrame:
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "w_start_us": (ts_us // win_us) * win_us,
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby(["w_start_us", "user_id"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("w_start_us").agg(
            n_events=("n", "sum"), n_users=("user_id", "nunique")
        )
        out = out.reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partition_map_groups(partials, finish, key="w_start_us", num_buckets=num_buckets)


def events_window_distinct_users_sql(window_s: int = 3600) -> str:
    win_us = window_s * 1_000_000
    return f"""
SELECT (epoch_us(ts) // {win_us}) * {win_us} AS w_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY w_start_us
ORDER BY w_start_us"""


_TOUCH_TYPES = ("click", "signup", "view")
_ATTR_HORIZON_US = 7 * 86_400 * 1_000_000


def events_attribution(path: str, num_buckets: int = 32) -> pd.DataFrame:
    """Last-touch attribution: each 'purchase' is credited to the user's
    MOST RECENT touch event (view/click/signup) within a 7-day horizon, or
    'direct' if none — the marketing-attribution join every event pipeline
    ships (a per-key as-of join with tolerance, the event-table twin of the
    transcript engine's backward as-of merge).

    ONE hash exchange on user_id; inside each partition the credit resolves
    as a vectorized pd.merge_asof (backward, tolerance=horizon) — no
    per-user loop. Equal-timestamp touches resolve to the largest event_id
    (touches sorted (ts, event_id), merge_asof keeps the last match; the
    oracle pins the same tiebreak with ORDER BY ts DESC, event_id DESC).
    Revenue sums as integer cents; per-partition partials roll up in one
    channel-sized reduce."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    ds = _read_events(path, ["event_id", "user_id", "event_type", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            ts_us=g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            cents=np.round(g["value"].to_numpy() * 100).astype(np.int64),
        )
        conv = g[g["event_type"] == "purchase"][
            ["event_id", "user_id", "ts_us", "cents"]
        ].sort_values("ts_us", kind="mergesort", ignore_index=True)
        tch = g[g["event_type"].isin(_TOUCH_TYPES)][
            ["user_id", "ts_us", "event_id", "event_type"]
        ].sort_values(["ts_us", "event_id"], kind="mergesort", ignore_index=True)
        if len(conv) == 0:
            return pd.DataFrame(
                {
                    "channel": pd.Series(dtype="object"),
                    "n_conv": pd.Series(dtype="int64"),
                    "cents": pd.Series(dtype="int64"),
                }
            )
        m = pd.merge_asof(
            conv,
            tch,
            on="ts_us",
            by="user_id",
            direction="backward",
            tolerance=_ATTR_HORIZON_US,
            suffixes=("", "_t"),
        )
        m["channel"] = m["event_type"].fillna("direct")
        part = m.groupby("channel", as_index=False).agg(
            n_conv=("event_id", "size"), cents=("cents", "sum")
        )
        part["n_conv"] = part["n_conv"].astype(np.int64)
        return part

    partials = partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)
    out = grouped_aggregate(
        partials, "channel", {"n_conv": ("n_conv", "sum"), "cents": ("cents", "sum")}
    ).to_pandas()
    out["total_value"] = out["cents"] / 100.0
    out["n_conv"] = out["n_conv"].astype("int64")
    return out.sort_values("channel", ignore_index=True)[["channel", "n_conv", "total_value"]]


def events_attribution_sql() -> str:
    touch = ", ".join(f"'{t}'" for t in _TOUCH_TYPES)
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
conv AS (SELECT * FROM e WHERE event_type = 'purchase'),
tch AS (SELECT * FROM e WHERE event_type IN ({touch})),
att AS (
  SELECT c.event_id, c.cents, t.event_type AS channel
  FROM conv c LEFT JOIN tch t
    ON t.user_id = c.user_id
   AND t.ts_us <= c.ts_us AND t.ts_us >= c.ts_us - {_ATTR_HORIZON_US}
  QUALIFY row_number() OVER (
    PARTITION BY c.event_id ORDER BY t.ts_us DESC, t.event_id DESC) = 1
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_conv,
       CAST(SUM(cents) AS BIGINT) / 100.0 AS total_value
FROM att GROUP BY 1 ORDER BY 1"""


def events_stream_join(path: str, window_s: int = 86400, num_buckets: int = 32) -> pd.DataFrame:
    """Time-bounded stream-stream join: every (click, purchase) pair of the
    SAME user with purchase.ts in [click.ts, click.ts + window) — the m:n
    windowed equi-join a streaming engine keeps dual keyed state for
    (Flink-style intervalJoin). Batch form here; the streaming-state
    variant of the same semantics lives in state/event_windows.py.

    ONE hash exchange on user_id (both sides ride the same partitioning,
    like events_attribution); inside a partition both sides sort once by a
    (user_code << 47 | ts_rel) composite and every left row's match range
    resolves with TWO binary searches (np.searchsorted), exploded to pairs
    by repeat/arange — no per-user Python loop. ts_rel is partition-local
    (offset from the partition min), so the composite stays inside int64
    for spans up to ~4.5 years and 65k users per partition; wider spans
    would switch to per-user segment offsets.

    Exact DuckDB oracle: the equivalent self-join with the identical range
    predicate (integer µs arithmetic end-to-end)."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    w_us = np.int64(window_s) * 1_000_000
    ds = _read_events(path, ["event_id", "user_id", "event_type", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "click_id": pd.Series(dtype="int64"),
                "purchase_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "dt_us": pd.Series(dtype="int64"),
            }
        )
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        lm = et == "click"
        rm = et == "purchase"
        if not lm.any() or not rm.any():
            return empty
        base = ts_us.min()
        codes, _ = pd.factorize(g["user_id"].to_numpy(), sort=True)
        # +w_us in the guard: the probe key ts_rel + w_us must also stay
        # below 2^47 or the upper search could leak into the next user code
        if codes.max() >= (1 << 16) or (ts_us.max() - base) + w_us >= (1 << 47):
            raise ValueError("events_stream_join: composite key envelope exceeded")
        comp = (codes.astype(np.int64) << 47) | (ts_us - base)
        l_ids = g["event_id"].to_numpy()[lm]
        l_users = g["user_id"].to_numpy()[lm]
        l_comp = comp[lm]
        l_ts = ts_us[lm]
        order_l = np.argsort(l_comp, kind="stable")
        l_ids, l_users, l_comp, l_ts = (
            l_ids[order_l], l_users[order_l], l_comp[order_l], l_ts[order_l]
        )
        r_ids = g["event_id"].to_numpy()[rm]
        r_comp = comp[rm]
        r_ts = ts_us[rm]
        order_r = np.argsort(r_comp, kind="stable")
        r_ids, r_comp, r_ts = r_ids[order_r], r_comp[order_r], r_ts[order_r]
        lo = np.searchsorted(r_comp, l_comp, side="left")
        hi = np.searchsorted(r_comp, l_comp + w_us, side="left")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return empty
        total = int(cnt[keep].sum())
        li = np.repeat(np.flatnonzero(keep), cnt[keep])
        starts = np.concatenate([[0], np.cumsum(cnt[keep])[:-1]])
        ri = np.arange(total) - np.repeat(starts, cnt[keep]) + np.repeat(lo[keep], cnt[keep])
        return pd.DataFrame(
            {
                "click_id": l_ids[li].astype(np.int64),
                "purchase_id": r_ids[ri].astype(np.int64),
                "user_id": l_users[li].astype(np.int64),
                "dt_us": (r_ts[ri] - l_ts[li]).astype(np.int64),
            }
        )

    out = partition_map_groups(
        ds, per_bucket, key="user_id", num_buckets=num_buckets
    ).to_pandas()
    return out.sort_values(["click_id", "purchase_id"], ignore_index=True)


def events_stream_join_sql(window_s: int = 86400) -> str:
    w_us = window_s * 1_000_000
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
)
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       p.ts_us - c.ts_us AS dt_us
FROM e c JOIN e p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND p.ts_us >= c.ts_us AND p.ts_us < c.ts_us + {w_us}
ORDER BY click_id, purchase_id"""


def events_cube(path: str) -> pd.DataFrame:
    """CUBE grouping-sets shape: event counts + value sums at FOUR
    aggregation levels — (event_type, hour), (event_type), (hour), grand
    total — from ONE pass over the fact table.

    Same multi-level discipline as tpch.sales_rollup: the FINEST grid
    (|types| × 24, dimension-sized) aggregates through per-batch combiners
    and one tiny key exchange; every coarser CUBE level re-aggregates the
    finest-level integer partials driver-side — the fact table is read
    once and never re-shuffled. Sentinels ('ALL', -1) stand in for CUBE's
    NULLs so the value-hash compare is engine-independent. Value sums ride
    integer cents end-to-end."""
    import pyarrow as pa

    import ray

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(path, columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch["ts"].to_numpy()
        hour = ((ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000) % 24).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "hour": hour,
                "value_c": np.round(batch["value"].to_numpy() * 100).astype(np.int64),
                "n": np.ones(len(hour), np.int64),
            }
        )
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            value_c=("value_c", "sum"), n=("n", "sum")
        )

    fine = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"],
        {"value_c": ("value_c", "sum"), "n": ("n", "sum")},
    ).to_pandas()

    def lvl(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if keys:
            out = df.groupby(keys, as_index=False).agg(
                value_c=("value_c", "sum"), n=("n", "sum")
            )
        else:
            out = pd.DataFrame(
                {"value_c": [df["value_c"].sum()], "n": [df["n"].sum()]}
            )
        if "event_type" not in out:
            out["event_type"] = "ALL"
        if "hour" not in out:
            out["hour"] = np.int64(-1)
        return out[["event_type", "hour", "value_c", "n"]]

    cube = pd.concat(
        [lvl(fine, ["event_type", "hour"]), lvl(fine, ["event_type"]), lvl(fine, ["hour"]), lvl(fine, [])],
        ignore_index=True,
    )
    out = pd.DataFrame(
        {
            "event_type": cube["event_type"],
            "hour": cube["hour"].astype(np.int64),
            "total_value": cube["value_c"].astype(np.int64) / 100.0,
            "n": cube["n"].astype(np.int64),
        }
    )
    return out.sort_values(["event_type", "hour"], ignore_index=True)


def events_cube_sql() -> str:
    return """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       CAST(COALESCE(CAST(hour(ts) AS BIGINT), -1) AS BIGINT) AS hour,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY CUBE(event_type, hour(ts))
ORDER BY event_type, hour"""


def events_time_weighted_avg(path: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-user TIME-weighted average of `value` — the step-function mean
    (each event's value holds until the next event; the metric a plain AVG
    silently misstates whenever sampling is irregular).

    One hash partition by user_id; inside each bucket a single sort and a
    vectorized segment reduce: numerator Σ value_i·(ts_{i+1}−ts_i) and
    denominator ts_last−ts_first, both in exact int64 (cents × micros — the
    products stay < 2^60 for any plausible span), so the final
    double-division is bitwise identical to the oracle's. Single-event /
    zero-duration users are excluded (no interval to weight)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                            ignore_index=True)
        user = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vc = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        n = len(df)
        if n == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "twa_value": pd.Series(dtype=np.float64),
                                 "dur_us": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64)})
        same = np.empty(n, dtype=bool)
        same[:-1] = user[1:] == user[:-1]
        same[-1] = False
        dt = np.zeros(n, dtype=np.int64)
        dt[:-1] = ts[1:] - ts[:-1]
        dt[~same] = 0  # last event of each user carries no interval
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        num = np.add.reduceat(vc * dt, starts)
        cnt = np.add.reduceat(np.ones(n, dtype=np.int64), starts)
        ends = np.r_[starts[1:], n] - 1
        dur = ts[ends] - ts[starts]
        keep = dur > 0
        return pd.DataFrame(
            {
                "user_id": user[starts][keep],
                "twa_value": (num[keep].astype(np.float64)
                              / (dur[keep].astype(np.float64) * 100.0)),
                "dur_us": dur[keep],
                "n_events": cnt[keep],
            }
        )

    ds = _read_events(path, ["event_id", "ts", "user_id", "value"])
    return partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)


def events_time_weighted_avg_sql() -> str:
    return """
WITH e AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS vc,
         lead(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id,
       CAST(SUM(vc * (nxt - ts_us)) AS DOUBLE)
         / (CAST(MAX(ts_us) - MIN(ts_us) AS DOUBLE) * 100.0) AS twa_value,
       MAX(ts_us) - MIN(ts_us) AS dur_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM e
GROUP BY user_id
HAVING MAX(ts_us) - MIN(ts_us) > 0
ORDER BY user_id"""


def events_markov(path: str, num_buckets: int = 32) -> pd.DataFrame:
    """First-order Markov transition counts over each user's event-type
    SEQUENCE (the session-flow mining shape: which action follows which).

    One hash partition by user_id; inside each bucket a single sort and a
    shifted-array pair extraction (next event within the same user), then
    per-bucket pre-counted partials so the final exchange is
    transition-matrix-sized (|types|² rows), never a row per event. The
    row-conditional probability p_next = cnt / Σ_row cnt is computed from
    the exact integer counts on both engine and oracle sides — bitwise."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                            ignore_index=True)
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        if len(df) < 2:
            return pd.DataFrame({"cur": pd.Series(dtype=str),
                                 "nxt": pd.Series(dtype=str),
                                 "cnt": pd.Series(dtype=np.int64)})
        same = user[1:] == user[:-1]
        out = pd.DataFrame({"cur": et[:-1][same], "nxt": et[1:][same]})
        return out.groupby(["cur", "nxt"], as_index=False).agg(
            cnt=("cur", "size")
        ).astype({"cnt": np.int64})

    ds = _read_events(path, ["event_id", "ts", "user_id", "event_type"])
    parts = partition_map_groups(ds, per_bucket, key="user_id",
                                 num_buckets=num_buckets).to_pandas()
    if parts.empty:  # no user has two events — an all-empty result loses
        # its schema on the way back, so rebuild the typed empty frame
        return pd.DataFrame({"cur": pd.Series(dtype=str),
                             "nxt": pd.Series(dtype=str),
                             "cnt": pd.Series(dtype=np.int64),
                             "p_next": pd.Series(dtype=np.float64)})
    out = parts.groupby(["cur", "nxt"], as_index=False).agg(cnt=("cnt", "sum"))
    row_tot = out.groupby("cur")["cnt"].transform("sum")
    out["p_next"] = out["cnt"].astype(np.float64) / row_tot.astype(np.float64)
    return out.sort_values(["cur", "nxt"], ignore_index=True).astype({"cnt": np.int64})


def events_markov_sql() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
)
SELECT cur, nxt, cnt,
       CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY cur) AS DOUBLE)
         AS p_next
FROM pairs ORDER BY cur, nxt"""


def events_session_path_topk(
    path: str, gap_s: float = 1800.0, k: int = 20, num_buckets: int = 32
) -> pd.DataFrame:
    """Top-k full session PATHS (sequence-pattern mining lite): sessionize
    each user by inactivity gap (the e_sessionize rule), join the session's
    event types in order into one '>'-delimited path string, count path
    frequencies corpus-wide and keep the k most common under the
    deterministic (count desc, path asc) total order — the navigation-flow
    complement of e_markov's one-step transition matrix.

    Dataflow: one user_id hash partition (sessions are user-local, so the
    whole sessionize+join runs inside the bucket), per-bucket path counts
    (combiner), ONE path-keyed exchange, per-batch partial top-k, driver
    merges <= blocks x k rows. The path string rides the exchange bounded
    by session length x distinct-path count; at 100 TB ship a 64-bit path
    hash instead and resolve the winning strings by hash afterward (the
    doc_crossdoc_ngrams note)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                            ignore_index=True)
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"path": pd.Series(dtype=str), "n": pd.Series(dtype=np.int64)}
            )
        user = df["user_id"].to_numpy()
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(user[1:], user[:-1], out=new_user[1:])
        dt_us = np.diff(ts_us, prepend=ts_us[:1])
        dt_us[new_user] = 0
        sid = np.cumsum(new_user | (dt_us > np.int64(gap_s * 1e6)))
        paths = (
            pd.DataFrame({"sid": sid, "et": df["event_type"].to_numpy()})
            .groupby("sid", sort=False)["et"]
            .agg(">".join)
        )
        out = paths.value_counts().rename_axis("path").reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["event_id", "ts", "user_id", "event_type"])
    parts = partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets)
    agg = grouped_aggregate(parts, "path", {"n": ("n", "sum")})

    def partial_topk(batch) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.sort_values(["n", "path"], ascending=[False, True]).head(k)

    top = agg.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if top.empty:
        return pd.DataFrame({"path": pd.Series(dtype=str), "n": pd.Series(dtype=np.int64)})
    return (
        top.sort_values(["n", "path"], ascending=[False, True], ignore_index=True)
        .head(k)
        .astype({"n": np.int64})
    )


def events_session_path_topk_sql(gap_s: float = 1800.0, k: int = 20) -> str:
    gap_us = int(gap_s * 1e6)
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS dt_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *,
         SUM(CASE WHEN dt_us > {gap_us} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS session_id
  FROM e
), p AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
  FROM s GROUP BY user_id, session_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY path
ORDER BY n DESC, path LIMIT {k}"""


def events_grouped_quantiles_sketch(
    path: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    max_centroids: int = 256,
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Bounded-state grouped quantiles — the sketch counterpart of the
    exact events_grouped_quantiles, for value domains too wide for the
    value-counts histogram (unbounded floats at 100 TB).

    Per batch each group's values compress to a ≤ max_centroids (mean,
    weight) digest (functions/sketches.qdigest_partial); ONE group-keyed
    exchange merges digests associatively (centroids are never split, so
    merge order cannot change the bound); the driver reads quantiles off
    groups × max_centroids state — corpus-size-INDEPENDENT, vs the exact
    operator's distinct-value-sized exchange. Rank error ≤ 1/max_centroids
    of the group mass per merge level (pytest pins it against the exact
    operator)."""
    from quant_feature_pipeline_ray.functions.sketches import (
        qdigest_merge,
        qdigest_partial,
        qdigest_quantile,
    )

    ds = _read_events(path, ["event_type", "value"])

    def part(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "v": batch["value"].to_numpy(),
            }
        )
        rows = []
        for et, g in df.groupby("event_type"):
            rows.append((et, qdigest_partial(g["v"].to_numpy(), max_centroids).ravel().tolist()))
        return pd.DataFrame(rows, columns=["event_type", "digest"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type"):
            parts = [np.asarray(d, dtype=np.float64).reshape(-1, 2) for d in gg["digest"]]
            rows.append((et, qdigest_merge(parts, max_centroids).ravel().tolist()))
        return pd.DataFrame(rows, columns=["event_type", "digest"])

    merged = partition_map_groups(
        ds.map_batches(part, batch_format="pyarrow"),
        merge,
        key="event_type",
        num_buckets=num_buckets,
    ).to_pandas()
    out = {"event_type": merged["event_type"].to_numpy()}
    for q in qs:
        out[f"q{int(q * 100)}"] = np.array(
            [qdigest_quantile(np.asarray(d, dtype=np.float64).reshape(-1, 2), q)
             for d in merged["digest"]]
        )
    return pd.DataFrame(out).sort_values("event_type", ignore_index=True)


def events_max_concurrency(path: str) -> pd.DataFrame:
    """Peak number of simultaneously-active users — the sweep-line /
    interval-aggregation shape: each user's activity span [first_ts,
    last_ts] contributes +1 at its start and −1 past its end; the answer is
    the max of the running sum over the globally ordered delta stream.

    Distributed prefix-scan: spans (one row per user) come from a grouped
    min/max; the ±1 delta stream is globally sorted on the UNIQUE key
    (ts, delta DESC, user_id) — +1 sorts before −1 at ties, so a user
    active for a single instant still counts — then each block reduces to
    the associative pair (block_sum, block_max_prefix); blocks combine on
    the driver in key order ((Σa+maxpref_b) ⊕ rule), block-count-sized
    state. Nothing user- or event-scaled lands on the driver."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["ts", "user_id"])

    def to_us(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "ts_us": batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            }
        )

    spans = grouped_aggregate(
        ds.map_batches(to_us, batch_format="pyarrow"),
        "user_id",
        {"a": ("ts_us", "min"), "b": ("ts_us", "max")},
    )

    def explode(batch: pa.Table) -> pd.DataFrame:
        u = batch["user_id"].to_numpy()
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pd.DataFrame(
            {
                "ts_us": np.concatenate([a, b]),
                "delta": np.concatenate(
                    [np.ones(len(u), dtype=np.int64), -np.ones(len(u), dtype=np.int64)]
                ),
                "user_id": np.concatenate([u, u]),
            }
        )

    deltas = spans.map_batches(explode, batch_format="pyarrow").sort(
        ["ts_us", "delta", "user_id"], descending=[False, True, False]
    )

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        d = df["delta"].to_numpy()
        pref = np.cumsum(d)
        return pd.DataFrame(
            {
                "first_ts": [np.int64(df["ts_us"].iloc[0])],
                "first_delta": [np.int64(df["delta"].iloc[0])],
                "first_user": [np.int64(df["user_id"].iloc[0])],
                "bsum": [np.int64(pref[-1])],
                "bmax": [np.int64(pref.max())],
            }
        )

    stats = deltas.map_batches(
        block_stats, batch_format="pandas", batch_size=None
    ).to_pandas()
    # combine per-block (sum, max-prefix) pairs in global key order: the
    # (+1-first) sort key is unique, so block first-keys totally order the
    # blocks. (s,m)_ab = (s_a+s_b, max(m_a, s_a+m_b)) — associative.
    stats = stats.sort_values(
        ["first_ts", "first_delta", "first_user"],
        ascending=[True, False, True], ignore_index=True,
    )
    run, best = np.int64(0), np.int64(0)
    for s, m in zip(stats["bsum"], stats["bmax"]):
        best = max(best, run + m)
        run += s
    return pd.DataFrame({"max_concurrency": [np.int64(best)]})


def events_max_concurrency_sql() -> str:
    return """
WITH spans AS (
  SELECT user_id,
         MIN(CAST(epoch_us(ts) AS BIGINT)) AS a,
         MAX(CAST(epoch_us(ts) AS BIGINT)) AS b
  FROM events GROUP BY user_id
), deltas AS (
  SELECT user_id, a AS ts_us, 1 AS delta FROM spans
  UNION ALL
  SELECT user_id, b AS ts_us, -1 AS delta FROM spans
), run AS (
  SELECT SUM(delta) OVER (ORDER BY ts_us, delta DESC, user_id) AS c
  FROM deltas
)
SELECT CAST(MAX(c) AS BIGINT) AS max_concurrency FROM run"""


def events_rate_outliers(
    path: str, z_thresh: float = 2.0, num_buckets: int = 16
) -> ray.data.Dataset:
    """Per-user daily event-rate anomaly detection — the abuse/bot-rate
    audit every event pipeline runs before trusting volume features: for
    each (user, day), the z-score of that user's event count against the
    SAME DAY's population of active users, flagged at |z| >= z_thresh.

    Bitwise-exact variance discipline (the t_moments / integer-moment
    rule): per-day mean and variance come from int64 Σx and Σx² over user
    counts — order-independent integer sums — then ONE float expression
    var = (n·Σx² − (Σx)²) / (n·(n−1)) and z = (x·n − Σx) / (n·sqrt(var)),
    so the DuckDB oracle reproduces every bit (no float accumulation
    order anywhere).

    Dataflow (100-TB-safe): per-batch (user, day) count combiner → ONE
    exchange keyed on day (population stats need the day's users
    together; day cardinality is unbounded over time so the key does not
    hot-spot) → per-day vectorized z. Events themselves never ride the
    exchange — only (user, day, count) triples."""
    ds = ray.data.read_parquet(path, columns=["user_id", "ts"])

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        day = batch["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "day": day,
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return df.groupby(["user_id", "day"], sort=False, as_index=False).sum()

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "day"], sort=True, as_index=False)["n"].sum()
        out = []
        for day, sub in g.groupby("day", sort=True):
            x = sub["n"].to_numpy()
            n_users = np.int64(len(x))
            sx = np.int64(x.sum())
            sxx = np.int64((x * x).sum())
            if n_users < 2:
                z = np.zeros(len(x))
            else:
                var = (n_users * sxx - sx * sx) / (n_users * (n_users - 1))
                denom = n_users * np.sqrt(var)
                z = np.where(denom > 0, (x * n_users - sx) / denom, 0.0)
            out.append(
                pd.DataFrame(
                    {
                        "user_id": sub["user_id"].to_numpy(),
                        "day": np.full(len(x), day, dtype=np.int64),
                        "n_events": x,
                        "z": z,
                        "is_outlier": np.abs(z) >= z_thresh,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return partition_map_groups(
        ds.map_batches(partials, batch_format="pandas"),
        per_day,
        key="day",
        num_buckets=num_buckets,
    )


def events_rate_outliers_sql(z_thresh: float = 2.0) -> str:
    return f"""
WITH per AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, day
), pop AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n_events) AS BIGINT) AS sx,
         CAST(sum(n_events * n_events) AS BIGINT) AS sxx
  FROM per GROUP BY day
), z AS (
  SELECT p.user_id, p.day, p.n_events,
         CASE WHEN o.n_users < 2 THEN 0.0
              WHEN o.n_users * sqrt((o.n_users * o.sxx - o.sx * o.sx)
                                    / (o.n_users * (o.n_users - 1))) > 0
              THEN (p.n_events * o.n_users - o.sx)
                   / (o.n_users * sqrt((o.n_users * o.sxx - o.sx * o.sx)
                                       / (o.n_users * (o.n_users - 1))))
              ELSE 0.0 END AS z
  FROM per p JOIN pop o USING (day)
)
SELECT user_id, day, n_events, z, abs(z) >= {z_thresh} AS is_outlier
FROM z ORDER BY user_id, day"""


def events_burst_detect(
    path: str, factor: float = 2.0, num_buckets: int = 8
) -> ray.data.Dataset:
    """Per-event-type hourly burst detection — flag the hours where a
    type's volume runs >= `factor`x its own median hourly volume (the
    rate-spike audit run before trusting event-derived features: deploy
    storms and bot floods corrupt every downstream aggregate). Median over
    the type's OBSERVED hours; ratio and flag from exact integer counts
    with one float division, so the oracle is bitwise (numpy and DuckDB
    share the even-n median = mean-of-middle-two definition over the same
    sorted integers).

    Dataflow: per-batch (type, hour) count combiner → ONE exchange keyed
    on event_type (types are few but each group is only |hours| rows —
    the skew-proof shape) → per-type vectorized median + flags."""
    ds = ray.data.read_parquet(path, columns=["event_type", "ts"])

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        hour = batch["ts"].to_numpy().astype("datetime64[h]").astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(),
                "hour": hour,
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return df.groupby(["event_type", "hour"], sort=False, as_index=False).sum()

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "hour"], sort=True, as_index=False)["n"].sum()
        out = []
        for et, sub in g.groupby("event_type", sort=True):
            x = sub["n"].to_numpy()
            med = float(np.median(x))
            ratio = x / med
            out.append(
                pd.DataFrame(
                    {
                        "event_type": sub["event_type"].to_numpy(),
                        "hour": sub["hour"].to_numpy(),
                        "n_events": x,
                        "type_median": np.full(len(x), med),
                        "burst_ratio": ratio,
                        "is_burst": ratio >= factor,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return partition_map_groups(
        ds.map_batches(partials, batch_format="pandas"),
        per_type,
        key="event_type",
        num_buckets=num_buckets,
    )


def events_burst_detect_sql(factor: float = 2.0) -> str:
    return f"""
WITH per AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, hour
), med AS (
  SELECT event_type, median(n_events) AS type_median
  FROM per GROUP BY event_type
)
SELECT p.event_type, p.hour, p.n_events,
       m.type_median,
       p.n_events / m.type_median AS burst_ratio,
       p.n_events / m.type_median >= {factor} AS is_burst
FROM per p JOIN med m USING (event_type)
ORDER BY p.event_type, p.hour"""


def events_debounce(
    path: str, window_s: float = 600.0, num_buckets: int = 16
) -> ray.data.Dataset:
    """Event-stream DEBOUNCE / throttle-dedup — keep an event only if the
    previous KEPT event of the same (user, type) is more than `window_s`
    older (the standard streaming dedup every ingestion pipeline runs in
    front of counters; distinct from keep-last dedup, which needs a key
    collision — this suppresses rapid-fire repeats of the same signal).
    The keep decision is a true per-key RECURRENCE (depends on the last
    *kept* event, not the previous event), so it is not a SQL WINDOW
    function — but it IS a rank-indexed recursion, so the oracle replays
    it exactly with a RECURSIVE CTE (one iteration per within-group rank;
    affordable at oracle scale, never the engine's plan). Promoted from
    rows-only to exact in round 5; the brute-force parity pytest and
    kept-spacing invariant remain.

    Dataflow: ONE exchange keyed on user (same partition the whole events
    family reuses), per-key ordered scan inside the group. The per-key
    loop is the recurrence itself — state is one int64 per live key,
    which is exactly what the streaming carry-state kernel would hold."""
    ds = ray.data.read_parquet(path, columns=["event_id", "user_id", "event_type", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"], kind="mergesort")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uids = g["user_id"].to_numpy()
        etypes = g["event_type"].to_numpy()
        w = np.int64(window_s * 1e6)
        keep = np.zeros(len(g), dtype=bool)
        last_key = None
        last_kept = np.int64(0)
        for i in range(len(g)):
            key = (uids[i], etypes[i])
            if key != last_key or ts_us[i] - last_kept > w:
                keep[i] = True
                last_key, last_kept = key, ts_us[i]
        out = g[keep]
        return pd.DataFrame(
            {
                "event_id": out["event_id"].to_numpy(),
                "user_id": out["user_id"].to_numpy(),
                "event_type": out["event_type"].to_numpy(),
                "ts": out["ts"].to_numpy(),
            }
        )

    return partition_map_groups(ds, per_user, key="user_id", num_buckets=num_buckets)


def events_debounce_sql(window_s: float = 600.0) -> str:
    """Exact recursive-CTE replay of the debounce recurrence: rank events
    within each (user, type) by (ts, event_id); rank 1 is kept; each
    iteration advances every group by one rank, carrying the last KEPT
    timestamp and applying the same strict `gap > window` test."""
    w_us = int(window_s * 1e6)
    return f"""
WITH RECURSIVE e AS (
  SELECT user_id, event_type, event_id, ts, epoch_us(ts) AS tu,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
), walk AS (
  SELECT user_id, event_type, event_id, ts, tu, rn, tu AS last_kept, TRUE AS kept
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.tu, e.rn,
         CASE WHEN e.tu - k.last_kept > {w_us} THEN e.tu ELSE k.last_kept END,
         e.tu - k.last_kept > {w_us}
  FROM e JOIN walk k
    ON e.user_id = k.user_id AND e.event_type = k.event_type AND e.rn = k.rn + 1
)
SELECT event_id, user_id, event_type, ts
FROM walk WHERE kept ORDER BY user_id, event_type, ts, event_id"""


def events_seasonality_profile(path: str) -> pd.DataFrame:
    """Hour-of-day traffic profile per event type — the seasonality sheet
    read before trusting any rate/burst threshold (a "burst" at 14:00 may
    just be the daily peak; cf. events_burst_detect which compares against
    the type's own median): per (event_type, hour 0–23), count, the share
    of the type's traffic, and the lift vs a uniform 1/24 profile.

    Scale shape: per-batch (type, hour) count COMBINER → one exchange of
    |types|×24 partial rows → the 120-row profile is finished on the
    driver. Events never ride the exchange. Integer counts + one float
    division per derived column → bitwise oracle."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tsu = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # domain contract: ts >= epoch. numpy's % is sign-of-divisor (always
        # 0-23) while DuckDB's is sign-of-dividend, so a pre-1970 timestamp
        # would break the bitwise oracle — fail fast instead of diverging.
        if len(tsu) and int(tsu.min()) < 0:
            raise ValueError(
                "events_seasonality_profile requires ts >= 1970-01-01 (epoch): "
                "hour-of-day modulo semantics diverge from the SQL oracle for "
                "negative epochs"
            )
        hour = (tsu // 3_600_000_000) % 24
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(),
                "hour": hour,
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return df.groupby(["event_type", "hour"], sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"), ["event_type", "hour"],
        {"n": ("n", "sum")},
    ).to_pandas()  # |types|×24-bounded
    tot = m.groupby("event_type")["n"].transform("sum").to_numpy(dtype=np.int64)
    n = m["n"].to_numpy(dtype=np.int64)
    m["share"] = n / tot
    m["lift"] = (n / tot) * 24.0
    return m.sort_values(["event_type", "hour"], ignore_index=True)


def events_seasonality_profile_sql() -> str:
    return """
WITH h AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour
  FROM events
), c AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS n
  FROM h GROUP BY 1, 2
), tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1)
SELECT c.event_type, c.hour, c.n,
       c.n / CAST(tot.t AS DOUBLE) AS share,
       (c.n / CAST(tot.t AS DOUBLE)) * 24.0 AS lift
FROM c JOIN tot USING (event_type)
ORDER BY c.event_type, c.hour"""


def _sum_sq_exact(gaps: np.ndarray) -> int:
    """Exact Σgap² over non-negative int64 µs gaps via the 2²⁰-split
    discipline (doc_quality_length_corr's Moments): gap = hi·2²⁰ + lo, so
    gap² = hi²·2⁴⁰ + hi·lo·2²¹ + lo² — every vectorized product/chunk-sum
    stays inside int64 (hi < 2²³ for gaps under ~101 days, chunks of 2¹⁶),
    recombined as arbitrary-precision Python ints. No per-element loop."""
    if len(gaps) == 0:
        return 0
    if int(gaps.max()) >= (1 << 43):  # >101-day gap: hi² would overflow a chunk
        return sum(int(x) * int(x) for x in gaps)
    hi, lo = gaps >> 20, gaps & ((1 << 20) - 1)
    total = 0
    C = 1 << 16
    for i in range(0, len(gaps), C):
        h, l = hi[i : i + C], lo[i : i + C]
        total += (int((h * h).sum()) << 40) + (int((h * l).sum()) << 21) + int((l * l).sum())
    return total


def events_interarrival_stats(path: str, num_buckets: int = 8) -> pd.DataFrame:
    """Per-type inter-arrival-time statistics — the Poisson-ness audit of
    each event stream (CV ≈ 1 → memoryless arrivals, CV >> 1 → bursty,
    CV << 1 → scheduled/heartbeat traffic; read next to e_burst_detect
    before trusting rate features): gaps between consecutive events of a
    type in (ts, event_id) order, then count, min/max, one float mean and
    the coefficient of variation from EXACT integer moments.

    Σgap² overflows int64 (gaps in µs square past 2^63), so the per-type
    partial carries Python-int (arbitrary-precision) sums — the
    doc_checksum discipline — mirrored by HUGEINT in the oracle; both
    convert once to double for the final expressions, and IEEE
    round-to-nearest makes those conversions identical.

    Scale shape: hash partition by event_type (each type's gaps need its
    own order; type cardinality is assumed bounded — documented, same as
    e_markov), sort + diff inside the bucket, ONE |types|-row table to
    the driver."""

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "ts", "event_id"], kind="mergesort")
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            tsu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            gaps = np.diff(tsu)
            m = int(len(gaps))
            if m == 0:
                # a single-event type has no inter-arrival distribution;
                # skipped on both sides (the oracle's lag() yields no row)
                continue
            sd = int(gaps.sum())
            sdd = _sum_sq_exact(gaps)  # python-int, exact, vectorized
            mean_gap_s = sd / (m * 1000000.0)
            if m >= 2 and sd > 0:
                var = float(m * sdd - sd * sd) / (m * (m - 1.0))
                cv = np.sqrt(var) / (sd / (m * 1.0))
            else:
                cv = 0.0
            rows.append(
                (
                    et,
                    np.int64(m + 1),
                    np.int64(m),
                    np.int64(gaps.min()),
                    np.int64(gaps.max()),
                    mean_gap_s,
                    cv,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "n_events", "n_gaps", "min_gap_us", "max_gap_us",
                "mean_gap_s", "cv_gap",
            ],
        )

    ds = _read_events(path, ["event_id", "ts", "event_type"])
    out = partition_map_groups(ds, per_type, key="event_type", num_buckets=num_buckets)
    return out.to_pandas().sort_values("event_type", ignore_index=True)


def events_interarrival_stats_sql() -> str:
    return """
WITH e AS (SELECT event_type, epoch_us(ts) AS tsu, event_id FROM events),
d AS (
  SELECT event_type,
         tsu - lag(tsu) OVER (PARTITION BY event_type ORDER BY tsu, event_id) AS g
  FROM e
),
gg AS (SELECT event_type, CAST(g AS HUGEINT) AS g FROM d WHERE g IS NOT NULL),
a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m, sum(g) AS sd, sum(g * g) AS sdd,
         CAST(min(g) AS BIGINT) AS min_gap_us, CAST(max(g) AS BIGINT) AS max_gap_us
  FROM gg GROUP BY 1
)
SELECT event_type, m + 1 AS n_events, m AS n_gaps, min_gap_us, max_gap_us,
       sd / (m * 1000000.0) AS mean_gap_s,
       CASE WHEN m >= 2 AND sd > 0
            THEN sqrt((m * sdd - sd * sd) / (m * (m - 1.0))) / (sd / (m * 1.0))
            ELSE 0.0 END AS cv_gap
FROM a ORDER BY event_type"""


def events_retention_cohorts(path: str, num_buckets: int = 16) -> pd.DataFrame:
    """Cohort retention matrix — the product-analytics table every event
    warehouse publishes (cohort = day of a user's FIRST event; cell
    (cohort, offset) = how many of that cohort were active offset days
    later), and in a training-data pipeline the user-activity decay curve
    that decides how far back a feed is worth keeping.

    Scale shape: ONE exchange keyed on user_id (the events family's
    standing partition); each group computes its users' first day and
    distinct active days vectorized, pre-aggregates to (cohort_day,
    day_offset) count partials, and a |days|²-bounded grouped exchange
    finishes the matrix. Events never ride the second exchange. Integer
    counts + one float division → bitwise oracle."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = _read_events(path, ["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        day = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        )
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day}).drop_duplicates()
        first = df.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": first.to_numpy(),
                "day_offset": (df["day"] - first).to_numpy(),
                "n_active": np.ones(len(df), dtype=np.int64),
                "n_first": (df["day"] == first).to_numpy().astype(np.int64),
            }
        )
        return out.groupby(["cohort_day", "day_offset"], as_index=False).sum()

    m = grouped_aggregate(
        partition_map_groups(ds, per_user, key="user_id", num_buckets=num_buckets),
        ["cohort_day", "day_offset"],
        {"n_active": ("n_active", "sum"), "n_first": ("n_first", "sum")},
    ).to_pandas()  # |days|^2-bounded
    coh = (
        m[m["day_offset"] == 0][["cohort_day", "n_first"]]
        .rename(columns={"n_first": "n_cohort"})
    )
    out = m.merge(coh, on="cohort_day")
    out["retention"] = out["n_active"].to_numpy(dtype=np.int64) / out[
        "n_cohort"
    ].to_numpy(dtype=np.int64)
    return out[["cohort_day", "day_offset", "n_active", "n_cohort", "retention"]].sort_values(
        ["cohort_day", "day_offset"], ignore_index=True
    )


def events_retention_cohorts_sql() -> str:
    return """
WITH u AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
), f AS (SELECT user_id, min(day) AS cohort_day FROM u GROUP BY user_id),
act AS (
  SELECT u.user_id, f.cohort_day, u.day - f.cohort_day AS day_offset
  FROM u JOIN f USING (user_id)
), coh AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_cohort FROM f GROUP BY cohort_day
), ret AS (
  SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM act GROUP BY 1, 2
)
SELECT r.cohort_day, r.day_offset, r.n_active, c.n_cohort,
       r.n_active / CAST(c.n_cohort AS DOUBLE) AS retention
FROM ret r JOIN coh c USING (cohort_day)
ORDER BY cohort_day, day_offset"""


def events_funnel_conversion(
    path: str,
    steps: tuple = ("view", "click", "purchase"),
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Strict-order funnel conversion — per user, the greedy earliest
    chain: step k counts only if it happens STRICTLY after the chosen
    occurrence of step k-1 (the standard product funnel; greedy-earliest
    is the classic deterministic matching). Output: one row per step with
    users reached, conversion vs the previous step, and vs step 1.

    Scale shape: ONE exchange keyed on user_id; the per-group pass walks
    the |steps| stages with vectorized per-user min-after-cursor reductions
    and emits a |steps|-row count partial; the driver sums |buckets| ×
    |steps| rows. Integer counts + two float divisions → bitwise oracle."""
    ds = _read_events(path, ["user_id", "event_type", "ts"])
    steps = tuple(steps)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tsu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "et": g["event_type"].to_numpy(), "tsu": tsu}
        )
        # cursor per user: ts of the chosen occurrence of the previous step
        users = pd.Index(df["user_id"].unique())
        cursor = pd.Series(np.int64(-1), index=users)
        alive = pd.Series(True, index=users)
        counts = []
        for s in steps:
            sub = df[df["et"] == s]
            cur = cursor.reindex(sub["user_id"]).to_numpy()
            ok = sub["tsu"].to_numpy() > cur
            hit = (
                pd.DataFrame(
                    {"user_id": sub["user_id"].to_numpy()[ok], "tsu": sub["tsu"].to_numpy()[ok]}
                )
                .groupby("user_id")["tsu"]
                .min()
            )
            reached = alive.index.isin(hit.index) & alive.to_numpy()
            alive = pd.Series(reached, index=alive.index)
            cursor = pd.Series(
                np.where(reached, hit.reindex(alive.index).fillna(-1).to_numpy(dtype=np.int64), -1),
                index=alive.index,
            )
            counts.append(int(reached.sum()))
        return pd.DataFrame(
            {
                "step_idx": np.arange(len(steps), dtype=np.int64),
                "step": list(steps),
                "n_users": np.asarray(counts, dtype=np.int64),
            }
        )

    parts = partition_map_groups(ds, per_bucket, key="user_id", num_buckets=num_buckets).to_pandas()
    agg = parts.groupby(["step_idx", "step"], as_index=False)["n_users"].sum().sort_values(
        "step_idx", ignore_index=True
    )
    n = agg["n_users"].to_numpy(dtype=np.int64)
    prev = np.concatenate([[n[0] if len(n) else 0], n[:-1]])
    with np.errstate(invalid="ignore", divide="ignore"):
        agg["conv_from_prev"] = np.where(prev > 0, n / prev, 0.0)
        agg["conv_from_first"] = np.where(n[0] > 0, n / (n[0] if len(n) else 1), 0.0) if len(n) else 0.0
    return agg


def events_funnel_conversion_sql(steps: tuple = ("view", "click", "purchase")) -> str:
    ctes = ["s0 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = '%s' GROUP BY user_id)" % steps[0]]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{i-1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{steps[i]}' AND e.ts > p.t GROUP BY e.user_id)"
        )
    rows = ",\n  ".join(
        f"({i}, '{s}', (SELECT CAST(count(*) AS BIGINT) FROM s{i}))"
        for i, s in enumerate(steps)
    )
    return f"""
WITH {", ".join(ctes)},
f(step_idx, step, n_users) AS (VALUES
  {rows}
)
SELECT CAST(step_idx AS BIGINT) AS step_idx, step, n_users,
       CASE WHEN lag(n_users) OVER (ORDER BY step_idx) > 0
            THEN n_users / CAST(lag(n_users) OVER (ORDER BY step_idx) AS DOUBLE)
            WHEN step_idx = 0 AND n_users > 0 THEN 1.0
            ELSE 0.0 END AS conv_from_prev,
       CASE WHEN first_value(n_users) OVER (ORDER BY step_idx) > 0
            THEN n_users / CAST(first_value(n_users) OVER (ORDER BY step_idx) AS DOUBLE)
            ELSE 0.0 END AS conv_from_first
FROM f ORDER BY step_idx"""
