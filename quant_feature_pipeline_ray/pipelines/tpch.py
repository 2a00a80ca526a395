"""Classic analytical queries over the TPC-H-ish testdata tables.

Not part of the reference's surface, but they exercise the engine's
aggregate / sort / top-k / broadcast-join operators at testdata scale and
demonstrate the scale patterns SURVEY.md §4.2 calls for:

  * partial (combiner) aggregation inside map_batches BEFORE the groupby —
    the shuffle moves one row per (key, batch), not one per input row;
  * integer-scaled money sums (cents / basis points) so partial sums are
    associative and exact → results are order-independent and match the
    DuckDB oracle bitwise;
  * broadcast of the small dimension side (customer) via ray.put instead of
    a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def tpch_q1(sf_dir: str) -> pd.DataFrame:
    """Pricing summary report (TPC-H Q1 shape) with partial aggregation."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        qty_c = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        price_c = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        tax_c = np.round(df["l_tax"].to_numpy() * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].to_numpy(),
                "l_linestatus": df["l_linestatus"].to_numpy(),
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_price_e4": price_c * (100 - disc_c),  # cents x bp
                "charge_e6": price_c * (100 - disc_c) * (100 + tax_c),
                "disc_c": disc_c,
                "n": np.ones(len(df), dtype=np.int64),
            }
        )
        return p.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    from ray.data.aggregate import Sum

    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="qty_c"),
        Sum("price_c", alias_name="price_c"),
        Sum("disc_price_e4", alias_name="disc_price_e4"),
        Sum("charge_e6", alias_name="charge_e6"),
        Sum("disc_c", alias_name="disc_c"),
        Sum("n", alias_name="n"),
    )
    out = agg.to_pandas()  # tiny (4 groups)
    res = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": out["qty_c"] / 100.0,
            "sum_base_price": out["price_c"] / 100.0,
            "sum_disc_price": out["disc_price_e4"] / 10000.0,
            "sum_charge": out["charge_e6"] / 1000000.0,
            "avg_qty": out["qty_c"] / (out["n"] * 100.0),
            "avg_price": out["price_c"] / (out["n"] * 100.0),
            "avg_disc": out["disc_c"] / (out["n"] * 100.0),
            "count_order": out["n"].astype(np.int64),
        }
    )
    return res.sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)


def tpch_q1_sql(sf_dir: str) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / (COUNT(*) * 100.0) AS avg_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / (COUNT(*) * 100.0) AS avg_price,
       CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / (COUNT(*) * 100.0) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def top_revenue_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Revenue per customer via a SHUFFLE JOIN on l_orderkey.

    Orders is a fact-sized table — broadcasting an orderkey→custkey map
    would put the whole fact table in driver + every-actor memory at 100 TB.
    Instead: tagged-union co-group (the repo's standard join shape, cf.
    stages/asof.py):

      lineitem → per-batch partial revenue per orderkey (combiner: the
                 exchange moves one row per (orderkey, batch))
      orders   → (orderkey, custkey) rows, tagged via custkey >= 0
      union    → groupby(o_orderkey): Sum(rev) + Max(custkey) resolves the
                 join in ONE vectorized aggregate (lineitem rows carry
                 custkey = -1, so Max picks the orders row's key)
      groupby(custkey) Sum → per-block partial top-k → driver merges
                 blocks×k rows. Only the customer NAME dimension is
                 broadcast, and only the final k rows touch it."""
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(),
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        out = p.groupby("o_orderkey", as_index=False).sum()
        out["o_custkey"] = np.int64(-1)
        return out

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def orders_rows(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(),
                "rev_e4": np.zeros(len(batch), dtype=np.int64),
                "o_custkey": batch["o_custkey"].to_numpy().astype(np.int64),
            }
        )

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(orders_rows, batch_format="pyarrow", batch_size=65536)
    )
    # orderkey/custkey are fact-cardinality keys: hash-partitioned pandas
    # reduce, never Ray's per-group sort-aggregate (stages/hash_aggregate.py)
    per_order = grouped_aggregate(
        tagged,
        "o_orderkey",
        {"rev_e4": ("rev_e4", "sum"), "c_custkey": ("o_custkey", "max")},
    )

    def cust_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["c_custkey"] >= 0]  # orderkeys missing from orders (none in TPC-H)
        return df.groupby("c_custkey", as_index=False)["rev_e4"].sum()

    per_cust = grouped_aggregate(
        per_order.map_batches(cust_partial, batch_format="pyarrow"),
        "c_custkey",
        {"rev_e4": ("rev_e4", "sum")},
    )

    def topk_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.sort_values(
            ["rev_e4", "c_custkey"], ascending=[False, True], ignore_index=True
        ).head(k)

    agg = (
        per_cust.map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()  # blocks × k rows
        .sort_values(["rev_e4", "c_custkey"], ascending=[False, True], ignore_index=True)
        .head(k)
    )
    agg["revenue"] = agg["rev_e4"] / 10000.0
    names = ray.get(cust_ref)
    agg["c_name"] = agg["c_custkey"].map(names)
    agg["c_custkey"] = agg["c_custkey"].astype(np.int64)
    return agg[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join via broadcast key set (SURVEY.md guide pattern: semi/anti
    = broadcast the key set — or a Bloom filter of it at 100 TB — and
    filter inside map_batches; no shuffle)."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    keys = set()
    for b in orders.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_numpy(zero_copy_only=False).tolist())
    keys_ref = ray.put(np.fromiter(keys, dtype=np.int64))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )

    def anti(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        mask = ~np.isin(batch["c_custkey"].to_numpy(zero_copy_only=False), ks)
        return batch.filter(pa.array(mask))

    out = cust.map_batches(anti, batch_format="pyarrow").to_pandas()
    if out.empty and not len(out.columns):
        # an all-empty Dataset loses its schema through to_pandas; restore
        # the typed empty frame so the result contract stays stable
        out = pd.DataFrame(
            {
                "c_custkey": pd.Series(dtype="int64"),
                "c_name": pd.Series(dtype="object"),
                "c_nationkey": pd.Series(dtype="int64"),
            }
        )
    return out


def customers_without_orders_sql(sf_dir: str) -> str:
    return """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey"""


def top_revenue_customers_sql(sf_dir: str, k: int = 10) -> str:
    return f"""
SELECT o_custkey AS c_custkey,
       any_value(c_name) AS c_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
ORDER BY SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) DESC, o_custkey
LIMIT {k}"""


def tpch_q3(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-30", k: int = 10) -> pd.DataFrame:
    """Shipping-priority report (TPC-H Q3 shape): 3-way join composed as
    broadcast-dimension filter + ONE tagged-union shuffle join.

      customer (dimension) → broadcast the qualifying custkey SET (ray.put);
                 at 100 TB this side stays millions of int64s, not the fact
                 tables.
      orders   → filter o_orderdate < cutoff AND o_custkey ∈ set inside
                 map_batches (no shuffle); emit one tagged row per order
                 carrying (orderdate, priority).
      lineitem → filter l_shipdate > cutoff; per-batch partial revenue per
                 orderkey (combiner), tagged odate_us = -1.
      union    → ONE groupby(o_orderkey): Sum(rev) + Max(odate_us) +
                 Max(prio) resolves the inner join; rows missing either side
                 are dropped by (rev > 0 AND odate_us >= 0).
      top-k    → per-block partial top-k, driver merges blocks×k rows.

    Revenue in integer cents×bp (e4) so partial sums are associative and
    the DuckDB comparison is bitwise."""
    cutoff_ts = pd.Timestamp(cutoff)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys: list[np.ndarray] = []
    for b in cust.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        m = pa.compute.equal(b["c_mktsegment"], segment)
        keys.append(b.filter(m)["c_custkey"].to_numpy(zero_copy_only=False))
    keys_ref = ray.put(np.sort(np.concatenate(keys)) if keys else np.empty(0, np.int64))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def orders_rows(batch: pa.Table) -> pd.DataFrame:
        ks = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        mask = (odate < np.datetime64(cutoff_ts, "us")) & np.isin(
            batch["o_custkey"].to_numpy(zero_copy_only=False), ks
        )
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[mask],
                "rev_e4": np.zeros(int(mask.sum()), dtype=np.int64),
                "odate_us": odate[mask].astype(np.int64),
                "o_orderpriority": batch["o_orderpriority"].to_numpy(zero_copy_only=False)[mask],
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        mask = ship > np.datetime64(cutoff_ts, "us")
        price_c = np.round(batch["l_extendedprice"].to_numpy()[mask] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[mask] * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[mask],
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        out = p.groupby("o_orderkey", as_index=False).sum()
        out["odate_us"] = np.int64(-1)
        out["o_orderpriority"] = ""
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(orders_rows, batch_format="pyarrow", batch_size=65536)
    )
    # orderkey is a FACT-cardinality key: hash-partitioned pandas reduce,
    # never Ray's per-group sort-aggregate (stages/hash_aggregate.py)
    per_order = grouped_aggregate(
        tagged,
        "o_orderkey",
        {
            "rev_e4": ("rev_e4", "sum"),
            "odate_us": ("odate_us", "max"),
            "o_orderpriority": ("o_orderpriority", "max"),
        },
    )

    def topk_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[(df["rev_e4"] > 0) & (df["odate_us"] >= 0)]
        return df.sort_values(
            ["rev_e4", "o_orderkey"], ascending=[False, True], ignore_index=True
        ).head(k)

    agg = (
        per_order.map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()  # blocks × k rows
        .sort_values(["rev_e4", "o_orderkey"], ascending=[False, True], ignore_index=True)
        .head(k)
    )
    return pd.DataFrame(
        {
            "l_orderkey": agg["o_orderkey"].astype(np.int64),
            "revenue": agg["rev_e4"] / 10000.0,
            "o_orderdate": agg["odate_us"].astype("datetime64[us]"),
            "o_orderpriority": agg["o_orderpriority"],
        }
    )


def tpch_q3_sql(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-30", k: int = 10) -> str:
    return f"""
SELECT l_orderkey,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{cutoff}'
  AND l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) DESC, l_orderkey
LIMIT {k}"""


def tpch_q6(sf_dir: str) -> pd.DataFrame:
    """Forecasting-revenue-change (TPC-H Q6 shape): predicate-heavy scan +
    ONE global scalar aggregate. Per-batch partial sums (int cents×bp) →
    a single-row Sum aggregate; nothing but two int64s per block moves."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    lo, hi = np.datetime64("1997-01-01", "us"), np.datetime64("1998-01-01", "us")

    def partial(batch: pa.Table) -> pd.DataFrame:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = batch["l_quantity"].to_numpy()
        mask = (ship >= lo) & (ship < hi) & (disc_c >= 3) & (disc_c <= 7) & (qty < 24)
        price_c = np.round(batch["l_extendedprice"].to_numpy()[mask] * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "rev_e4": [np.int64((price_c * disc_c[mask]).sum())],
                "n": [np.int64(mask.sum())],
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(Sum("rev_e4", alias_name="rev_e4"), Sum("n", alias_name="n_items"))
    )
    return pd.DataFrame(
        {"revenue": [agg["rev_e4"] / 10000.0], "n_items": [np.int64(agg["n_items"])]}
    )


def tpch_q6_sql(sf_dir: str) -> str:
    return """
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 3 AND 7
  AND l_quantity < 24"""
