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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

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


def tpch_q5(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> pd.DataFrame:
    """Local-supplier-volume report (TPC-H Q5 shape): the 6-table join as a
    TWO-stage shuffle pipeline plus broadcast dimensions.

      region+nation+supplier → driver-side (true dimensions: region 5 rows,
                 nation 25, supplier 100·SF); broadcast suppkey→nationkey for
                 the qualifying region only.
      stage 1 (exchange on custkey): customer rows (custkey, c_nationkey ∈
                 region) ∪ date-filtered orders rows (custkey, orderkey);
                 per-partition pandas merge resolves orderkey→c_nat. The
                 customer FACT side is never broadcast — at 10^12-row scale
                 customers shuffle like any fact table.
      stage 2 (exchange on orderkey): stage-1 rows (orderkey, nat=c_nat,
                 tagged rev=-1) ∪ lineitem partial revenue per (orderkey,
                 s_nat) — supplier nationkey resolved from the broadcast, rows
                 outside the region dropped at the scan. Per-partition merge
                 on (orderkey, nat) implements the c_nat == s_nat equi-join;
                 per-nation partial sums leave each partition.
      final    → ≤25 nation rows on the driver, name-joined, sorted.

    Revenue in integer cents×bp (e4) so partial sums are associative and the
    DuckDB comparison is bitwise."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    regionkeys = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkey = regionkeys.loc[regionkeys["r_name"] == region, "r_regionkey"]
    nat_in_region = nation.loc[nation["n_regionkey"].isin(rkey), "n_nationkey"].to_numpy()
    n_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp[supp["s_nationkey"].isin(nat_in_region)]
    supp_ref = ray.put(
        (supp["s_suppkey"].to_numpy(np.int64), supp["s_nationkey"].to_numpy(np.int64))
    )
    nat_set_ref = ray.put(np.sort(nat_in_region.astype(np.int64)))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def cust_rows(batch: pa.Table) -> pd.DataFrame:
        nats = ray.get(nat_set_ref) if isinstance(nat_set_ref, ray.ObjectRef) else nat_set_ref
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(cn, nats)
        return pd.DataFrame(
            {
                "k_cust": ck[m],
                "o_orderkey": np.full(int(m.sum()), -1, dtype=np.int64),
                "nat": cn[m],
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        m = (odate >= lo) & (odate < hi)
        return pd.DataFrame(
            {
                "k_cust": batch["o_custkey"].to_numpy(zero_copy_only=False)[m],
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[m],
                "nat": np.full(int(m.sum()), -1, dtype=np.int64),
            }
        )

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    stage1_in = cust.map_batches(cust_rows, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    )

    def resolve_cust(g: pd.DataFrame) -> pd.DataFrame:
        cmap = g[g["o_orderkey"] < 0][["k_cust", "nat"]]
        os_ = g[g["o_orderkey"] >= 0][["k_cust", "o_orderkey"]]
        j = os_.merge(cmap, on="k_cust", how="inner")
        return j[["o_orderkey", "nat"]]

    order_nat = partition_map_groups(stage1_in, resolve_cust, key="k_cust", num_buckets=32)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        sk, sn = ray.get(supp_ref) if isinstance(supp_ref, ray.ObjectRef) else supp_ref
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(sk) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "nat": pd.Series(dtype="int64"),
                    "rev_e4": pd.Series(dtype="int64"),
                }
            )
        pos_c = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
        m = sk[pos_c] == lsk
        price_c = np.round(batch["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
                "nat": sn[pos_c[m]],
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        return p.groupby(["o_orderkey", "nat"], as_index=False).sum()

    def order_tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["rev_e4"] = np.int64(-1)  # tag: this (orderkey, nat) came from stage 1
        return df[["o_orderkey", "nat", "rev_e4"]]

    stage2_in = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        order_nat.map_batches(order_tag, batch_format="pyarrow")
    )

    def resolve_nation(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["o_orderkey", "nat"], as_index=False)["rev_e4"].agg(["sum", "min"])
        # a (orderkey, nat) pair counts iff BOTH sides present: min == -1
        # proves the stage-1 (c_nat) row, sum+1 restores the revenue
        hit = gg[gg["min"] == -1].copy()
        hit["rev_e4"] = hit["sum"] + 1
        hit = hit[hit["rev_e4"] > 0]
        return hit.groupby("nat", as_index=False)["rev_e4"].sum()

    parts = partition_map_groups(stage2_in, resolve_nation, key="o_orderkey", num_buckets=32)
    out = parts.to_pandas().groupby("nat", as_index=False)["rev_e4"].sum()
    out["n_name"] = out["nat"].map(n_names)
    out["revenue"] = out["rev_e4"] / 10000.0
    return (
        out[["n_name", "revenue"]]
        .sort_values(["revenue", "n_name"], ascending=[False, True], ignore_index=True)
    )


def tpch_q5_sql(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> str:
    return f"""
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{date_lo}' AND o_orderdate < TIMESTAMP '{date_hi}'
GROUP BY n_name
ORDER BY revenue DESC, n_name"""


def tpch_q14(sf_dir: str, date_lo: str = "1997-01-01", date_hi: str = "1998-01-01") -> pd.DataFrame:
    """Promotion-revenue share (TPC-H Q14 shape): broadcast-dimension
    attribute join + conditional GLOBAL aggregate.

    part is a genuine dimension (2k·SF rows of (partkey, is_promo)) —
    broadcast once via ray.put as a sorted key array + bool flag; each
    lineitem batch resolves is_promo with one searchsorted, accumulates TWO
    integer partial sums, and ships 2 int64s per block. Nothing shuffles."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    order = np.argsort(part["p_partkey"].to_numpy())
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64)[order],
            (part["p_type"].to_numpy() == "PROMO")[order],
        )
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        pk, promo = ray.get(part_ref) if isinstance(part_ref, ray.ObjectRef) else part_ref
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        m = (ship >= lo) & (ship < hi)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)[m]
        price_c = np.round(batch["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        pos = np.clip(np.searchsorted(pk, lpk), 0, len(pk) - 1)
        is_promo = (pk[pos] == lpk) & promo[pos]
        return pd.DataFrame(
            {
                "promo_e4": [np.int64(rev[is_promo].sum())],
                "total_e4": [np.int64(rev.sum())],
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).aggregate(
        Sum("promo_e4", alias_name="promo_e4"), Sum("total_e4", alias_name="total_e4")
    )
    return pd.DataFrame(
        {
            "promo_revenue": [agg["promo_e4"] / 10000.0],
            "total_revenue": [agg["total_e4"] / 10000.0],
            "promo_share_pct": [100.0 * agg["promo_e4"] / agg["total_e4"]],
        }
    )


def tpch_q14_sql(sf_dir: str, date_lo: str = "1997-01-01", date_hi: str = "1998-01-01") -> str:
    e4 = "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    return f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {e4} ELSE 0 END) AS BIGINT) / 10000.0 AS promo_revenue,
       CAST(SUM({e4}) AS BIGINT) / 10000.0 AS total_revenue,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {e4} ELSE 0 END) AS BIGINT)
             / CAST(SUM({e4}) AS BIGINT) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{date_lo}' AND l_shipdate < TIMESTAMP '{date_hi}'"""


def tpch_q18(
    sf_dir: str, qty_threshold: int = 300, k: int = 100, broadcast_cap: int | None = None
) -> pd.DataFrame:
    """Large-volume customers (TPC-H Q18 shape): grouped HAVING filter that
    feeds a join-back.

      lineitem → per-batch partial qty per orderkey (combiner) →
                 grouped_aggregate(orderkey) → filter sum > threshold.
                 The qualifying set is SMALL BY CONSTRUCTION (heavy-hitter
                 orders) — the one situation where collecting keys to the
                 driver and re-broadcasting them is the scale-correct plan
                 (same pattern as a Bloom-filtered semi-join build side).
      orders   → filtered by broadcast key membership inside map_batches
                 (no shuffle); the k·dim-sized result joins customer names
                 driver-side.
    Quantities in integer centi-units so partial sums are associative and
    the DuckDB comparison is bitwise.

    Guard: the driver-side collect is capped at `broadcast_cap` heavy keys
    (default GRAFT_Q18_BROADCAST_CAP or 2M ≈ 32 MB of int64+qty on the
    driver). An adversarially low threshold that qualifies more orders
    flips the plan to the distributed path — stages.equi_join.hash_equi_join
    (one hash exchange, nothing corpus-sized on the driver) + per-block
    top-k — instead of OOMing the driver; the capped collect uses
    limit(cap+1) so overflow detection never materializes the full set."""
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "qty_c": np.round(batch["l_quantity"].to_numpy() * 100).astype(np.int64),
            }
        )
        return p.groupby("o_orderkey", as_index=False).sum()

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    per_order = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow", batch_size=65536),
        "o_orderkey",
        {"qty_c": ("qty_c", "sum")},
    )
    heavy_ds = per_order.filter(expr=f"qty_c > {qty_threshold * 100}")
    cap = (
        broadcast_cap
        if broadcast_cap is not None
        else int(os.environ.get("GRAFT_Q18_BROADCAST_CAP", 2_000_000))
    )
    heavy = heavy_ds.limit(cap + 1).to_pandas()

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["o_totalprice", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)

    if len(heavy) > cap:
        # heavy set exceeds the driver budget: distributed hash join +
        # per-block top-k (blocks × k rows reach the driver, never the set)
        from quant_feature_pipeline_ray.stages.equi_join import hash_equi_join

        joined = hash_equi_join(orders, heavy_ds, on="o_orderkey", how="inner")
        picked = _topk(
            joined.map_batches(
                lambda b: _topk(b.to_pandas()), batch_format="pyarrow"
            ).to_pandas()
        ).reset_index(drop=True)
        import pyarrow.parquet as _pq

        cust = _pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filters=[("c_custkey", "in", picked["o_custkey"].unique().tolist())],
        ).to_pandas()
        out = picked.merge(cust, left_on="o_custkey", right_on="c_custkey")
        out["sum_qty"] = out["qty_c"] / 100.0
        out = _topk(out).reset_index(drop=True)
        out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
        return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]]

    key_ref = ray.put(np.sort(heavy["o_orderkey"].to_numpy(np.int64)))

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref) if isinstance(key_ref, ray.ObjectRef) else key_ref
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(ks, ok), 0, len(ks) - 1)
        return batch.filter(pa.array(ks[pos] == ok))

    picked = orders.map_batches(pick, batch_format="pyarrow").to_pandas()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = picked.merge(heavy, on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    out["sum_qty"] = out["qty_c"] / 100.0
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
        ignore_index=True,
    ).head(k)
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]]


def tpch_q18_sql(sf_dir: str, qty_threshold: int = 300, k: int = 100) -> str:
    return f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > {qty_threshold * 100}
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT {k}"""


def priority_revenue_shuffle_join(sf_dir: str) -> pd.DataFrame:
    """Order-priority revenue via the DISTRIBUTED fact×fact hash join —
    the one TPC-H shape where neither side fits a broadcast at 100 TB.

    Plan: lineitem → per-batch combiner to (l_orderkey, l_linestatus)
    partials (integer e4 cents so sums are associative and the DuckDB
    comparison is bitwise) → grouped_aggregate → hash_equi_join
    (stages/equi_join.py: ONE tagged-union hash exchange, per-partition
    C-level merge) against pruned orders → tiny final groupby
    (priority × linestatus ≈ 15 groups) driver-side.

    Reference analogue: the reference joins per-symbol frames in ONE
    process (unified_feature_pipeline.py merge steps); this is the same
    logical join re-expressed so both sides stream through the exchange."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pd.DataFrame:
        e4 = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64) * (
            100 - np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        )
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_linestatus": batch["l_linestatus"].to_numpy(zero_copy_only=False),
                "rev_e4": e4,
                "n_items": np.int64(1),
            }
        )
        return p.groupby(["o_orderkey", "l_linestatus"], as_index=False).sum()

    from quant_feature_pipeline_ray.stages.equi_join import hash_equi_join
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    per_order = grouped_aggregate(
        li.map_batches(rev_partial, batch_format="pyarrow", batch_size=65536),
        ["o_orderkey", "l_linestatus"],
        {"rev_e4": ("rev_e4", "sum"), "n_items": ("n_items", "sum")},
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_equi_join(per_order, orders, on="o_orderkey", how="inner")

    # priority×linestatus is ~15 groups: per-block partials, driver reduce.
    # n_keys: the join emits each (orderkey, linestatus) exactly once and an
    # orderkey has one priority, so a row COUNT per group equals
    # COUNT(DISTINCT l_orderkey) — mergeable across blocks where nunique
    # would not be.
    def final_partial_exact(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["n_rows"] = np.int64(1)
        return df.groupby(["o_orderpriority", "l_linestatus"], as_index=False).agg(
            revenue_e4=("rev_e4", "sum"),
            n_items=("n_items", "sum"),
            n_keys=("n_rows", "sum"),
        )

    parts = joined.map_batches(final_partial_exact, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["o_orderpriority", "l_linestatus"], as_index=False).agg(
        revenue_e4=("revenue_e4", "sum"), n_items=("n_items", "sum"), n_keys=("n_keys", "sum")
    )
    out["revenue"] = out["revenue_e4"] / 10000.0
    out = out.sort_values(["o_orderpriority", "l_linestatus"], ignore_index=True)
    return out[["o_orderpriority", "l_linestatus", "revenue", "n_items", "n_keys"]]


def priority_revenue_shuffle_join_sql(sf_dir: str) -> str:
    e4 = "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    return f"""
SELECT o_orderpriority, l_linestatus,
       CAST(SUM({e4}) AS BIGINT) / 10000.0 AS revenue,
       COUNT(*) AS n_items,
       COUNT(DISTINCT l_orderkey) AS n_keys
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_linestatus
ORDER BY o_orderpriority, l_linestatus"""


def tpch_q10(
    sf_dir: str,
    date_lo: str = "1996-07-01",
    date_hi: str = "1996-10-01",
    k: int = 20,
) -> pd.DataFrame:
    """Returned-item report (TPC-H Q10 shape): multi-filter fact-fact join
    + grouped revenue + distributed top-k + dimension decoration.

      lineitem (l_returnflag = 'R') → per-batch partial revenue per
                 orderkey (combiner);
      orders   (quarter filter)     → (orderkey, custkey) tagged rows;
      union    → ONE grouped_aggregate on o_orderkey: Sum(rev) + Max(cust)
                 resolves the join (a row qualifies iff BOTH sides landed:
                 custkey >= 0 AND rev > 0);
      groupby(custkey) Sum → per-block partial top-k → driver merges
                 blocks×k rows; only the final k rows touch the broadcast
                 customer/nation dimensions."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        m = batch["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        price_c = np.round(batch["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        out = p.groupby("o_orderkey", as_index=False).sum()
        out["o_custkey"] = np.int64(-1)
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        m = (odate >= lo) & (odate < hi)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[m],
                "rev_e4": np.zeros(int(m.sum()), dtype=np.int64),
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False)[m],
            }
        )

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    )
    per_order = grouped_aggregate(
        tagged,
        "o_orderkey",
        {"rev_e4": ("rev_e4", "sum"), "c_custkey": ("o_custkey", "max")},
    )

    def cust_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[(df["c_custkey"] >= 0) & (df["rev_e4"] > 0)]
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
        .to_pandas()
        .sort_values(["rev_e4", "c_custkey"], ascending=[False, True], ignore_index=True)
        .head(k)
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    agg = agg.merge(cust, on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    agg["revenue"] = agg["rev_e4"] / 10000.0
    agg = agg.sort_values(
        ["rev_e4", "c_custkey"], ascending=[False, True], ignore_index=True
    )
    return agg[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


def tpch_q10_sql(
    sf_dir: str,
    date_lo: str = "1996-07-01",
    date_hi: str = "1996-10-01",
    k: int = 20,
) -> str:
    e4 = "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"
    return f"""
SELECT c_custkey, any_value(c_name) AS c_name,
       CAST(SUM({e4}) AS BIGINT) / 10000.0 AS revenue,
       any_value(c_acctbal) AS c_acctbal,
       any_value(n_name) AS n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{date_lo}' AND o_orderdate < TIMESTAMP '{date_hi}'
  AND l_returnflag = 'R'
GROUP BY c_custkey
ORDER BY SUM({e4}) DESC, c_custkey
LIMIT {k}"""


def order_priority_check(
    sf_dir: str, date_lo: str = "1996-01-01", date_hi: str = "1996-07-01"
) -> pd.DataFrame:
    """Order-priority EXISTS check (TPC-H Q4 shape): a fact-fact SEMI-join
    where neither side can be broadcast.

      lineitem → per-batch DISTINCT orderkeys with l_returnflag = 'R'
                 (combiner: the exchange moves one row per (orderkey,
                 batch), pri = '' tag);
      orders   (date filter) → (orderkey, o_orderpriority) rows;
      exchange on orderkey → per-partition pandas groupby: max(pri) picks
                 the orders row's priority ('' sorts below every real
                 value), max(has_li) proves the EXISTS; per-partition
                 partial counts per priority;
      driver   → sums a handful of (priority, n) rows."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def li_keys(batch: pa.Table) -> pd.DataFrame:
        m = batch["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        keys = np.unique(batch["l_orderkey"].to_numpy(zero_copy_only=False)[m])
        return pd.DataFrame(
            {
                "o_orderkey": keys,
                "pri": np.full(len(keys), "", dtype=object),
                "has_li": np.ones(len(keys), dtype=np.int64),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        m = (odate >= lo) & (odate < hi)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[m],
                "pri": batch["o_orderpriority"].to_numpy(zero_copy_only=False)[m],
                "has_li": np.zeros(int(m.sum()), dtype=np.int64),
            }
        )

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    tagged = li.map_batches(li_keys, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    )

    def semi_count(g: pd.DataFrame) -> pd.DataFrame:
        per_key = g.groupby("o_orderkey").agg(pri=("pri", "max"), has_li=("has_li", "max"))
        hit = per_key[(per_key["has_li"] == 1) & (per_key["pri"] != "")]
        out = hit.groupby("pri", as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = partition_map_groups(tagged, semi_count, key="o_orderkey", num_buckets=32)
    out = parts.to_pandas().groupby("pri", as_index=False)["n"].sum()
    out = out.rename(columns={"pri": "o_orderpriority"})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("o_orderpriority", ignore_index=True)


def order_priority_check_sql(
    sf_dir: str, date_lo: str = "1996-01-01", date_hi: str = "1996-07-01"
) -> str:
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '{date_lo}' AND o_orderdate < TIMESTAMP '{date_hi}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


def idle_customer_balance(sf_dir: str, recent: str = "2000-06-01") -> pd.DataFrame:
    """Global-scalar subquery + anti-join + grouped rollup (TPC-H Q22
    shape): customers whose balance beats the positive-balance average and
    who have no RECENT orders (>= `recent`), rolled up per nation.

      pass 1 → per-batch integer-cent partial (sum, n) over positive
               balances; two int64s per block reach the driver — the
               threshold avg is exact and associative;
      orders → recent-buyer custkey set broadcast (the anti-join side; a
               Bloom filter of it at 100 TB);
      pass 2 → filter acctbal_cents * n_pos > sum_cents (INTEGER compare —
               no float-threshold drift) AND custkey not in orders;
               per-batch partial (count, cents) per nationkey → tiny final
               aggregate."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def bal_partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = cents > 0
        return pd.DataFrame(
            {"sum_cents": [np.int64(cents[pos].sum())], "n_pos": [np.int64(pos.sum())]}
        )

    from ray.data.aggregate import Sum

    tot = cust.map_batches(bal_partial, batch_format="pyarrow", batch_size=65536).aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n_pos", alias_name="n_pos")
    )
    sum_cents, n_pos = int(tot["sum_cents"]), int(tot["n_pos"])

    cutoff = np.datetime64(recent, "us")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    keys = set()
    for b in orders.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        odate = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        keys.update(b["o_custkey"].to_numpy(zero_copy_only=False)[odate >= cutoff].tolist())
    keys_ref = ray.put(np.sort(np.fromiter(keys, dtype=np.int64)))

    def pick(batch: pa.Table) -> pd.DataFrame:
        ks = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        cents = np.round(batch["c_acctbal"].to_numpy() * 100).astype(np.int64)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        rich = cents * n_pos > sum_cents
        if len(ks):
            pos = np.clip(np.searchsorted(ks, ck), 0, len(ks) - 1)
            rich &= ks[pos] != ck
        p = pd.DataFrame(
            {
                "c_nationkey": batch["c_nationkey"].to_numpy(zero_copy_only=False)[rich].astype(np.int64),
                "numcust": np.ones(int(rich.sum()), dtype=np.int64),
                "cents": cents[rich],
            }
        )
        return p.groupby("c_nationkey", as_index=False).sum()

    agg = (
        cust.map_batches(pick, batch_format="pyarrow", batch_size=65536)
        .groupby("c_nationkey")
        .aggregate(Sum("numcust", alias_name="numcust"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    if agg.empty and "cents" not in agg.columns:
        agg = pd.DataFrame(
            {
                "c_nationkey": pd.Series(dtype="int64"),
                "numcust": pd.Series(dtype="int64"),
                "cents": pd.Series(dtype="int64"),
            }
        )
    agg["totacctbal"] = agg["cents"] / 100.0
    agg["numcust"] = agg["numcust"].astype(np.int64)
    agg["c_nationkey"] = agg["c_nationkey"].astype(np.int64)
    return agg[["c_nationkey", "numcust", "totacctbal"]].sort_values(
        "c_nationkey", ignore_index=True
    )


def idle_customer_balance_sql(sf_dir: str, recent: str = "2000-06-01") -> str:
    return f"""
WITH thresh AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM customer WHERE round(c_acctbal * 100) > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS totacctbal
FROM customer, thresh
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * thresh.n_pos > thresh.sum_cents
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '{recent}')
GROUP BY c_nationkey
ORDER BY c_nationkey"""


def order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
    zero-order customers (the left-join-then-histogram pattern).

    Plan: tagged union of customer keys (n=0) and order rows (n=1) —
    both sides shuffle ONCE on custkey through grouped_aggregate (sum
    resolves the left join: a customer with no order rows keeps 0) —
    then the tiny n_orders histogram reduces in a second exchange whose
    key space is the max order count (~tens), not the customer count."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    cust_tagged = cust.map_batches(
        lambda b: pa.table(
            {"custkey": b["c_custkey"], "n": pa.array(np.zeros(len(b), np.int64))}
        ),
        batch_format="pyarrow",
    )
    order_tagged = orders.map_batches(
        lambda b: pa.table(
            {"custkey": b["o_custkey"], "n": pa.array(np.ones(len(b), np.int64))}
        ),
        batch_format="pyarrow",
    )
    per_cust = grouped_aggregate(
        cust_tagged.union(order_tagged), "custkey", {"n_orders": ("n", "sum")}
    )
    hist = grouped_aggregate(per_cust, "n_orders", {"n_customers": ("n_orders", "size")})
    out = hist.to_pandas().astype({"n_orders": "int64", "n_customers": "int64"})
    return out.sort_values("n_orders", ignore_index=True)


def order_count_distribution_sql(sf_dir: str) -> str:
    return """
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
) GROUP BY n_orders ORDER BY n_orders"""


def small_qty_revenue(sf_dir: str, brand: str = "Brand#23") -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below 20%
    of their part's average quantity — the correlated-aggregate-then-filter
    pattern, resolved with ONE shuffle on l_partkey.

    Per hash partition (which holds ALL lineitems of its parts plus the
    part dimension rows routed there by the tagged union): compute each
    part's (count, integer qty sum) over all its lineitems, apply the
    exact integer predicate 5 * n * qty_c < sum_qty_c (equivalent to
    qty < 0.2 * avg since avg = sum/(100n) in cents), restrict to the
    brand's parts, and emit one partial revenue sum; the driver adds the
    per-partition partials. avg_yearly = sum_cents / 700.0, the identical
    IEEE division in the oracle."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])

    li_tagged = li.map_batches(
        lambda b: pa.table(
            {
                "partkey": b["l_partkey"],
                "qty_c": pa.array(
                    np.round(b["l_quantity"].to_numpy() * 100).astype(np.int64)
                ),
                "price_c": pa.array(
                    np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
                ),
                "is_part": pa.array(np.zeros(len(b), bool)),
            }
        ),
        batch_format="pyarrow",
    )
    part_tagged = part.map_batches(
        lambda b, _brand=brand: pa.table(
            {
                "partkey": b["p_partkey"],
                "qty_c": pa.array(np.zeros(len(b), np.int64)),
                "price_c": pa.array(np.zeros(len(b), np.int64)),
                "is_part": pa.array(
                    pc.equal(b["p_brand"], _brand).to_numpy(zero_copy_only=False)
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        li_rows = g[~g["is_part"]]
        brand_parts = set(g.loc[g["is_part"], "partkey"].to_numpy())
        stats = li_rows.groupby("partkey").agg(n=("qty_c", "size"), sq=("qty_c", "sum"))
        cand = li_rows[li_rows["partkey"].isin(brand_parts)]
        if cand.empty:
            return pd.DataFrame({"rev_c": pd.Series([0], dtype="int64")})
        st = stats.reindex(cand["partkey"].to_numpy())
        keep = 5 * st["n"].to_numpy(np.int64) * cand["qty_c"].to_numpy() < st["sq"].to_numpy(
            np.int64
        )
        return pd.DataFrame(
            {"rev_c": pd.Series([int(cand.loc[keep, "price_c"].sum())], dtype="int64")}
        )

    partials = partition_map_groups(
        li_tagged.union(part_tagged), partial, key="partkey", num_buckets=32
    ).to_pandas()
    return pd.DataFrame({"avg_yearly": [int(partials["rev_c"].sum()) / 700.0]})


def small_qty_revenue_sql(sf_dir: str, brand: str = "Brand#23") -> str:
    return f"""
WITH stats AS (
  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT) / 700.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = '{brand}'
JOIN stats s ON s.pk = l.l_partkey
WHERE 5 * s.n * CAST(round(l.l_quantity * 100) AS BIGINT) < s.sq"""


def urgent_lineitem_revenue(sf_dir: str, priority: str = "1-URGENT") -> pd.DataFrame:
    """Semi-join with a BLOOM PREFILTER: revenue of lineitems whose order is
    urgent. The scale pattern for fact-to-fact semi-joins where the filter
    side is too big to broadcast exactly but its Bloom bitmap is not:

      1. build: per-batch Bloom partials (16 KiB uint8 bitmaps) over the
         urgent orderkeys, OR-merged — a constant-size mergeable summary
         like every other partial in this repo;
      2. prefilter: broadcast the bitmap (ray.put); each lineitem batch
         drops definite non-members BEFORE the exchange (no false
         negatives, so nothing qualifying is lost — typically ~80% of the
         shuffle volume at this selectivity);
      3. exact verify: the surviving ~1/5th shuffle-joins against the
         urgent orderkey dimension rows on l_orderkey (tagged union), which
         removes Bloom false positives, then per-partition revenue partials.

    Result is EXACT (integer cents) — the Bloom only prunes bytes."""
    from quant_feature_pipeline_ray.functions.sketches import (
        bloom_contains,
        bloom_partial,
    )
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def order_keys(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderpriority"], priority)
        return pa.table({"orderkey": pc.filter(b["o_orderkey"], keep)})

    urgent = orders.map_batches(order_keys, batch_format="pyarrow").materialize()

    def bloom_part(b: pa.Table) -> pd.DataFrame:
        bits = bloom_partial(b["orderkey"].to_numpy().astype(np.uint64))
        return pd.DataFrame({"bits": [bits]})

    partials = urgent.map_batches(bloom_part, batch_format="pyarrow").to_pandas()
    bits = np.bitwise_or.reduce(np.stack(partials["bits"].to_numpy()))
    bits_ref = ray.put(bits)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    class Prefilter:
        def __init__(self, ref):
            self.bits = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, b: pa.Table) -> pa.Table:
            maybe = bloom_contains(self.bits, b["l_orderkey"].to_numpy().astype(np.uint64))
            t = b.filter(pa.array(maybe))
            return pa.table(
                {
                    "orderkey": t["l_orderkey"],
                    "price_c": pa.array(
                        np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
                    ),
                    "is_dim": pa.array(np.zeros(len(t), bool)),
                }
            )

    li_filtered = li.map_batches(Prefilter, fn_constructor_args=(bits_ref,), batch_format="pyarrow", concurrency=2)
    dim = urgent.map_batches(
        lambda b: pa.table(
            {
                "orderkey": b["orderkey"],
                "price_c": pa.array(np.zeros(len(b), np.int64)),
                "is_dim": pa.array(np.ones(len(b), bool)),
            }
        ),
        batch_format="pyarrow",
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        real = set(g.loc[g["is_dim"], "orderkey"].to_numpy())
        rows = g[~g["is_dim"]]
        keep = rows["orderkey"].isin(real)
        return pd.DataFrame(
            {
                "rev_c": pd.Series([int(rows.loc[keep, "price_c"].sum())], dtype="int64"),
                "n_items": pd.Series([int(keep.sum())], dtype="int64"),
            }
        )

    out = partition_map_groups(
        li_filtered.union(dim), verify, key="orderkey", num_buckets=32
    ).to_pandas()
    return pd.DataFrame(
        {
            "revenue": [int(out["rev_c"].sum()) / 100.0],
            "n_items": [int(out["n_items"].sum())],
        }
    )


def urgent_lineitem_revenue_sql(sf_dir: str, priority: str = "1-URGENT") -> str:
    return f"""
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '{priority}')"""


def cheapest_supplier_per_part(
    sf_dir: str, max_size: int = 5, region: str = "ASIA"
) -> pd.DataFrame:
    """TPC-H Q2 shape: for every small part, the cheapest offer and which
    regional supplier makes it — the correlated-min + ARGMIN JOIN-BACK
    pattern (find the min per group, then recover the full row achieving
    it), resolved in two key-local exchanges:

      shuffle 1 (l_partkey): lineitem offers + part dimension rows ride one
        tagged union; per partition, per-(part, supplier) integer-cent min
        offer, then per-part argmin with (cost, suppkey) tie-break — one
        winner row per qualifying part leaves the exchange;
      shuffle 2 (suppkey): winners + supplier dimension rows; the
        nation->region map is genuinely tiny and rides broadcast.

    All comparisons are on integer cents, so the argmin (and therefore the
    surviving rows) is deterministic and matches the row_number() oracle
    exactly."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nation_ok = ray.put(set(nat.loc[nat["n_regionkey"].isin(rk), "n_nationkey"]))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])

    li_tagged = li.map_batches(
        lambda b: pa.table(
            {
                "partkey": b["l_partkey"],
                "suppkey": b["l_suppkey"].cast(pa.int64()),
                "price_c": pa.array(
                    np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
                ),
                "is_dim": pa.array(np.zeros(len(b), bool)),
            }
        ),
        batch_format="pyarrow",
    )
    part_tagged = part.map_batches(
        lambda b, _m=max_size: pa.table(
            {
                "partkey": b["p_partkey"],
                "suppkey": pa.array(np.zeros(len(b), np.int64)),
                "price_c": pa.array(np.zeros(len(b), np.int64)),
                "is_dim": pa.array(
                    pc.less_equal(b["p_size"], _m).to_numpy(zero_copy_only=False)
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        small = set(g.loc[g["is_dim"], "partkey"].to_numpy())
        offers = g[~g["is_dim"] & g["partkey"].isin(small)]
        if offers.empty:
            return pd.DataFrame(
                {
                    "partkey": pd.Series(dtype="int64"),
                    "suppkey": pd.Series(dtype="int64"),
                    "cost_c": pd.Series(dtype="int64"),
                }
            )
        per_offer = offers.groupby(["partkey", "suppkey"], as_index=False).agg(
            cost_c=("price_c", "min")
        )
        per_offer = per_offer.sort_values(["partkey", "cost_c", "suppkey"], ignore_index=True)
        win = per_offer.groupby("partkey", as_index=False).first()
        return win[["partkey", "suppkey", "cost_c"]].astype("int64")

    win_ds = partition_map_groups(
        li_tagged.union(part_tagged), winners, key="partkey", num_buckets=32
    )

    supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet")
    win_tagged = win_ds.map_batches(
        lambda b: pa.table(
            {
                "suppkey": b["suppkey"],
                "partkey": b["partkey"],
                "cost_c": b["cost_c"],
                "s_name": pa.array([""] * len(b), pa.string()),
                "nationkey": pa.array(np.full(len(b), -1, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    supp_tagged = supp.map_batches(
        lambda b: pa.table(
            {
                "suppkey": b["s_suppkey"],
                "partkey": pa.array(np.full(len(b), -1, np.int64)),
                "cost_c": pa.array(np.zeros(len(b), np.int64)),
                "s_name": b["s_name"],
                "nationkey": b["s_nationkey"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        ok = ray.get(nation_ok) if isinstance(nation_ok, ray.ObjectRef) else nation_ok
        dim = g[g["nationkey"] >= 0].set_index("suppkey")
        w = g[g["nationkey"] < 0]
        names = w["suppkey"].map(dim["s_name"])
        nk = w["suppkey"].map(dim["nationkey"])
        keep = nk.isin(ok).to_numpy()
        return pd.DataFrame(
            {
                "p_partkey": w["partkey"].to_numpy(np.int64)[keep],
                "s_suppkey": w["suppkey"].to_numpy(np.int64)[keep],
                "s_name": names.to_numpy(object)[keep],
                "cost": w["cost_c"].to_numpy(np.int64)[keep] / 100.0,
            }
        )

    out = partition_map_groups(
        win_tagged.union(supp_tagged), resolve, key="suppkey", num_buckets=16
    ).to_pandas()
    return out.sort_values("p_partkey", ignore_index=True)


def cheapest_supplier_per_part_sql(sf_dir: str, max_size: int = 5, region: str = "ASIA") -> str:
    return f"""
WITH cost AS (
  SELECT l_partkey AS pk, CAST(l_suppkey AS BIGINT) AS sk,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
win AS (
  SELECT pk, sk, c, row_number() OVER (PARTITION BY pk ORDER BY c, sk) AS rn
  FROM cost JOIN part ON p_partkey = pk AND p_size <= {max_size}
)
SELECT w.pk AS p_partkey, w.sk AS s_suppkey, s.s_name, w.c / 100.0 AS cost
FROM win w
JOIN supplier s ON s.s_suppkey = w.sk
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{region}'
WHERE w.rn = 1
ORDER BY p_partkey"""


def sole_supplier_orders(sf_dir: str, min_lines: int = 2) -> pd.DataFrame:
    """TPC-H Q21 shape: group-local EXISTS/NOT-EXISTS — per multi-line
    order, does a second supplier exist? Suppliers are credited one
    "sole-supplied order" for every order of >= min_lines lineitems where
    every line is theirs (the reference pattern: q21's "supplier was the
    only one who failed" is the same per-group existence predicate over
    sibling rows).

    shuffle 1 (l_orderkey): per-order n_lines + distinct-supplier count +
      the supplier, as ONE pandas groupby per hash partition (count
      distinct inside the group is the EXISTS resolution);
    shuffle 2 (suppkey): per-supplier order counts; the supplier name
      dimension is broadcast (dictionary-sized)."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = ray.put(dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_name"])))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    per_order = grouped_aggregate(
        li,
        "l_orderkey",
        {
            "n_lines": ("l_suppkey", "size"),
            "n_supp": ("l_suppkey", "nunique"),
            "suppkey": ("l_suppkey", "min"),
        },
    ).filter(expr=f"n_lines >= {min_lines} and n_supp == 1")

    counts = grouped_aggregate(
        per_order, "suppkey", {"n_sole_orders": ("l_orderkey", "size")}
    ).to_pandas()

    nm = ray.get(names) if isinstance(names, ray.ObjectRef) else names
    counts["s_suppkey"] = counts["suppkey"].astype(np.int64)
    counts["s_name"] = counts["s_suppkey"].map(nm)
    counts["n_sole_orders"] = counts["n_sole_orders"].astype(np.int64)
    return counts.sort_values("s_suppkey", ignore_index=True)[
        ["s_suppkey", "s_name", "n_sole_orders"]
    ]


def sole_supplier_orders_sql(sf_dir: str, min_lines: int = 2) -> str:
    return f"""
WITH o AS (
  SELECT l_orderkey,
         count(*) AS n_lines,
         count(DISTINCT l_suppkey) AS n_supp,
         CAST(min(l_suppkey) AS BIGINT) AS suppkey
  FROM lineitem GROUP BY 1
)
SELECT o.suppkey AS s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_sole_orders
FROM o JOIN supplier s ON s.s_suppkey = o.suppkey
WHERE o.n_lines >= {min_lines} AND o.n_supp = 1
GROUP BY 1, 2 ORDER BY 1"""


def top_suppliers_by_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the GLOBAL MAX revenue —
    aggregate-then-compare-to-max-of-aggregate (the correlated HAVING
    pattern), with ties kept exactly as Q15 requires.

    One suppkey exchange builds the per-supplier revenue table (per-batch
    combiner first, so the shuffle moves supplier-sized partials); the
    revenue table is dimension-sized, so the global max + tie filter run on
    the driver legitimately. Integer cents x basis-points arithmetic makes
    max and ties exact."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_name"]))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "suppkey": batch["l_suppkey"].to_numpy().astype(np.int64),
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        return df.groupby("suppkey", as_index=False).agg(rev_e4=("rev_e4", "sum"))

    rev = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        "suppkey",
        {"rev_e4": ("rev_e4", "sum")},
    ).to_pandas()
    best = rev[rev["rev_e4"] == rev["rev_e4"].max()].copy()
    best["s_suppkey"] = best["suppkey"].astype(np.int64)
    best["s_name"] = best["s_suppkey"].map(names)
    best["total_revenue"] = best["rev_e4"] / 10000.0
    return best.sort_values("s_suppkey", ignore_index=True)[
        ["s_suppkey", "s_name", "total_revenue"]
    ]


def top_suppliers_by_revenue_sql(sf_dir: str) -> str:
    return """
WITH rev AS (
  SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, r.rev_e4 / 10000.0 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.rev_e4 = (SELECT max(rev_e4) FROM rev)
ORDER BY r.s_suppkey"""


def disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of conjunctive
    brand/size/quantity clauses — the multi-clause OR predicate that forces
    engines to evaluate per-row boolean algebra rather than a single range
    pushdown.

    The part dimension is broadcast as three numpy-indexable attribute maps
    (brand code, size); each lineitem batch evaluates the whole OR
    vectorized and emits partial sums — one pass, no shuffle, two scalar
    rows out (matched revenue + matched line count)."""
    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(np.int64)
    size_map = np.full(pk.max() + 1, -1, np.int64)
    size_map[pk] = part["p_size"].to_numpy(np.int64)
    brand_codes = {"Brand#1": 1, "Brand#2": 2, "Brand#3": 3}
    bmap = np.zeros(pk.max() + 1, np.int64)
    for b, c in brand_codes.items():
        bmap[pk[(part["p_brand"] == b).to_numpy()]] = c
    ref = ray.put((bmap, size_map))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        bm, sm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        p = batch["l_partkey"].to_numpy().astype(np.int64)
        qty = batch["l_quantity"].to_numpy()
        b = bm[p]
        s = sm[p]
        m = (
            ((b == 1) & (s <= 10) & (qty <= 15))
            | ((b == 2) & (s <= 25) & (qty >= 10) & (qty <= 30))
            | ((b == 3) & (s >= 20) & (qty >= 25))
        )
        price_c = np.round(batch["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        return pd.DataFrame({"rev_e4": [int((price_c * (100 - disc_c)).sum())],
                             "n_lines": [int(m.sum())]})

    agg = li.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    return pd.DataFrame(
        {"revenue": [agg["rev_e4"] / 10000.0], "n_lines": [np.int64(agg["n_lines"])]}
    )


def disjunctive_revenue_sql(sf_dir: str) -> str:
    return """
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity <= 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 25 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size >= 20 AND l.l_quantity >= 25)"""


def supplier_count_by_part_attrs(sf_dir: str, max_size: int = 15) -> pd.DataFrame:
    """TPC-H Q16 shape: DISTINCT-supplier counts per part attribute group —
    a count-distinct rolled up to a coarser key than the distinct key
    itself (brand × size from (partkey, suppkey) pairs).

    shuffle 1 (l_partkey): distinct (partkey, suppkey) pairs resolve inside
      one pandas drop_duplicates per hash partition (the part dimension's
      brand/size ride broadcast, dictionary-sized);
    shuffle 2 (brand): nunique per (brand, size) — correct because shuffle
      1 already left each (part, supp) pair exactly once globally."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    part = part[part["p_size"] <= max_size]
    pref = ray.put(
        (
            dict(zip(part["p_partkey"].astype(np.int64), part["p_brand"])),
            dict(zip(part["p_partkey"].astype(np.int64), part["p_size"].astype(np.int64))),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        brands, sizes = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        b = g["l_partkey"].map(brands)
        keep = b.notna().to_numpy()
        return pd.DataFrame(
            {
                "p_brand": b.to_numpy(object)[keep],
                "p_size": g["l_partkey"].map(sizes).to_numpy()[keep].astype(np.int64),
                "suppkey": g["l_suppkey"].to_numpy(np.int64)[keep],
            }
        )

    pairs = partition_map_groups(li, distinct_pairs, key="l_partkey", num_buckets=32)
    out = grouped_aggregate(
        pairs, ["p_brand", "p_size"], {"supplier_cnt": ("suppkey", "nunique")}
    ).to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    return out.sort_values(["p_brand", "p_size"], ignore_index=True)


def supplier_count_by_part_attrs_sql(sf_dir: str, max_size: int = 15) -> str:
    return f"""
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= {max_size}
GROUP BY 1, 2 ORDER BY 1, 2"""


def part_value_concentration(sf_dir: str, frac_ppm: int = 700) -> pd.DataFrame:
    """TPC-H Q11 shape: keep the groups whose aggregate exceeds a FRACTION
    of the global total (value-concentration filter) — the
    correlated-with-global-scalar HAVING pattern.

    One partkey exchange builds per-part revenue (per-batch combiner
    first); the global total is the sum of the SAME integer partials (no
    second pass over the fact table); the filter is the exact integer
    predicate rev * 1e6 > total * frac_ppm. Only qualifying rows return."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "p_partkey": batch["l_partkey"].to_numpy().astype(np.int64),
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        return df.groupby("p_partkey", as_index=False).agg(rev_e4=("rev_e4", "sum"))

    rev = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        "p_partkey",
        {"rev_e4": ("rev_e4", "sum")},
    ).to_pandas()
    total = int(rev["rev_e4"].sum())
    # arbitrary-precision compare (dimension-sized array): rev*1e4 can pass
    # int64 at full fact-table scale, and DuckDB's HUGEINT side never wraps
    mask = rev["rev_e4"].to_numpy().astype(object) * 1000000 > total * frac_ppm
    keep = rev[mask.astype(bool)].copy()
    keep["revenue"] = keep["rev_e4"] / 10000.0
    keep["p_partkey"] = keep["p_partkey"].astype(np.int64)
    return keep.sort_values("p_partkey", ignore_index=True)[["p_partkey", "revenue"]]


def part_value_concentration_sql(sf_dir: str, frac_ppm: int = 700) -> str:
    return f"""
WITH rev AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY 1
)
SELECT p_partkey, rev_e4 / 10000.0 AS revenue
FROM rev
WHERE rev_e4 * 1000000 > (SELECT SUM(rev_e4) FROM rev) * {frac_ppm}
ORDER BY p_partkey"""


def sales_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP / grouping-sets shape: revenue + line counts at THREE
    aggregation levels — (brand, size), (brand), grand total — from ONE
    pass over the fact table.

    The classic multi-level trick: aggregate the FINEST level through the
    one hash exchange (per-batch combiner first), then derive every coarser
    level by re-aggregating the finest-level integer partials (dimension-
    sized, driver-side) — the fact table is never re-read. Sentinels
    ('ALL', -1) stand in for ROLLUP's NULLs so the value-hash compare is
    engine-independent."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    pref = ray.put(
        (
            dict(zip(part["p_partkey"].astype(np.int64), part["p_brand"])),
            dict(zip(part["p_partkey"].astype(np.int64), part["p_size"].astype(np.int64))),
        )
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        brands, sizes = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        pk = pd.Series(batch["l_partkey"].to_numpy().astype(np.int64))
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "brand": pk.map(brands),
                "size": pk.map(sizes).astype(np.int64),
                "rev_e4": price_c * (100 - disc_c),
                "n_lines": np.ones(len(pk), np.int64),
            }
        )
        return df.groupby(["brand", "size"], as_index=False).agg(
            rev_e4=("rev_e4", "sum"), n_lines=("n_lines", "sum")
        )

    fine = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["brand", "size"],
        {"rev_e4": ("rev_e4", "sum"), "n_lines": ("n_lines", "sum")},
    ).to_pandas()

    by_brand = fine.groupby("brand", as_index=False).agg(
        rev_e4=("rev_e4", "sum"), n_lines=("n_lines", "sum")
    )
    by_brand["size"] = np.int64(-1)
    total = pd.DataFrame(
        {
            "brand": ["ALL"],
            "size": np.array([-1], np.int64),
            "rev_e4": [fine["rev_e4"].sum()],
            "n_lines": [fine["n_lines"].sum()],
        }
    )
    out = pd.concat([fine, by_brand, total], ignore_index=True)
    out["revenue"] = out["rev_e4"].astype(np.int64) / 10000.0
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["size"] = out["size"].astype(np.int64)
    return out.sort_values(["brand", "size"], ignore_index=True)[
        ["brand", "size", "revenue", "n_lines"]
    ]


def sales_rollup_sql(sf_dir: str) -> str:
    return """
SELECT COALESCE(p.p_brand, 'ALL') AS brand,
       CAST(COALESCE(p.p_size, -1) AS BIGINT) AS size,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY ROLLUP(p.p_brand, p.p_size)
ORDER BY brand, size"""


def _dim_arrays(sf_dir: str):
    """Broadcast-ready dimension arrays: suppkey→nationkey, custkey→nationkey,
    nationkey→name, nationkey→regionkey (dense int index maps — O(|dim|)
    driver memory, shipped ONCE via ray.put)."""
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    s_map = np.full(int(supp["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    s_map[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
    c_map = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int64)
    c_map[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
    n_name = np.empty(int(nat["n_nationkey"].max()) + 1, dtype=object)
    n_name[nat["n_nationkey"].to_numpy()] = nat["n_name"].to_numpy()
    n_region = np.full(int(nat["n_nationkey"].max()) + 1, -1, dtype=np.int64)
    n_region[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()
    return s_map, c_map, n_name, n_region


def nation_trade_volume(
    sf_dir: str, n1: str = "NATION_3", n2: str = "NATION_19"
) -> pd.DataFrame:
    """Bilateral trade volume between two nations by ship year (TPC-H Q7
    shape): revenue of lineitems whose SUPPLIER sits in one nation of the
    pair and whose ordering CUSTOMER sits in the other.

    Scale shape: supplier/customer nationkeys are broadcast dense-index
    arrays (dimension tables, ray.put once); the supplier-nation filter runs
    INSIDE the lineitem combiner so only the pair's fact rows enter the
    exchange; the orderkey→custkey resolution is the repo's tagged-union
    SHUFFLE join (orders is fact-sized — never broadcast). One exchange,
    partial aggregation before it, 2×|years| result rows."""
    s_map, c_map, n_name, _ = _dim_arrays(sf_dir)
    nk1 = int(np.nonzero(n_name == n1)[0][0])
    nk2 = int(np.nonzero(n_name == n2)[0][0])
    s_ref, c_ref = ray.put(s_map), ray.put(c_map)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        sm = ray.get(s_ref) if isinstance(s_ref, ray.ObjectRef) else s_ref
        supp_nk = sm[batch["l_suppkey"].to_numpy()]
        keep = (supp_nk == nk1) | (supp_nk == nk2)
        if not keep.any():
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype=np.int64),
                    "supp_nk": pd.Series(dtype=np.int64),
                    "l_year": pd.Series(dtype=np.int64),
                    "rev_e4": pd.Series(dtype=np.int64),
                    "o_custkey": pd.Series(dtype=np.int64),
                }
            )
        t = batch.filter(pa.array(keep))
        price_c = np.round(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "o_orderkey": t["l_orderkey"].to_numpy(),
                "supp_nk": supp_nk[keep],
                "l_year": pc.year(t["l_shipdate"]).to_numpy().astype(np.int64),
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        out = p.groupby(["o_orderkey", "supp_nk", "l_year"], as_index=False).sum()
        out["o_custkey"] = np.int64(-1)
        return out

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def orders_rows(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(),
                "supp_nk": np.full(len(batch), -1, dtype=np.int64),
                "l_year": np.zeros(len(batch), dtype=np.int64),
                "rev_e4": np.zeros(len(batch), dtype=np.int64),
                "o_custkey": batch["o_custkey"].to_numpy().astype(np.int64),
            }
        )

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(orders_rows, batch_format="pyarrow", batch_size=65536)
    )

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        dim = df[df["o_custkey"] >= 0]
        fact = df[df["o_custkey"] < 0]
        if fact.empty:
            return pd.DataFrame(
                {
                    "supp_nk": pd.Series(dtype=np.int64),
                    "cust_nk": pd.Series(dtype=np.int64),
                    "l_year": pd.Series(dtype=np.int64),
                    "rev_e4": pd.Series(dtype=np.int64),
                }
            )
        custkey = fact["o_orderkey"].map(
            pd.Series(dim["o_custkey"].to_numpy(), index=dim["o_orderkey"].to_numpy())
        )
        cust_nk = cm[custkey.to_numpy()]
        sup_nk = fact["supp_nk"].to_numpy()
        keep = ((sup_nk == nk1) & (cust_nk == nk2)) | ((sup_nk == nk2) & (cust_nk == nk1))
        out = pd.DataFrame(
            {
                "supp_nk": sup_nk[keep],
                "cust_nk": cust_nk[keep],
                "l_year": fact["l_year"].to_numpy()[keep],
                "rev_e4": fact["rev_e4"].to_numpy()[keep],
            }
        )
        return out.groupby(["supp_nk", "cust_nk", "l_year"], as_index=False).sum()

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    parts = partition_map_groups(tagged, join_part, key="o_orderkey", num_buckets=32)
    out = parts.to_pandas()  # ≤ 32 × 2 × |years| rows
    out = out.groupby(["supp_nk", "cust_nk", "l_year"], as_index=False)["rev_e4"].sum()
    out["supp_nation"] = n_name[out["supp_nk"].to_numpy()]
    out["cust_nation"] = n_name[out["cust_nk"].to_numpy()]
    out["revenue"] = out["rev_e4"].astype(np.int64) / 10000.0
    out["l_year"] = out["l_year"].astype(np.int64)
    return out.sort_values(["supp_nation", "cust_nation", "l_year"], ignore_index=True)[
        ["supp_nation", "cust_nation", "l_year", "revenue"]
    ]


def nation_trade_volume_sql(sf_dir: str, n1: str = "NATION_3", n2: str = "NATION_19") -> str:
    return f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE (ns.n_name = '{n1}' AND nc.n_name = '{n2}')
   OR (ns.n_name = '{n2}' AND nc.n_name = '{n1}')
GROUP BY ns.n_name, nc.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year"""


def market_share(
    sf_dir: str, region: str = "ASIA", supp_nation: str = "NATION_3"
) -> pd.DataFrame:
    """Market share of one supplier nation inside one customer region by
    order year (TPC-H Q8 shape): a RATIO of two conditional sums over the
    same joined fact stream.

    Scale shape: identical tagged-union shuffle join on orderkey as
    nation_trade_volume, but the year comes from ORDERS (o_orderdate) so the
    dimension rows carry (custkey, o_year); the lineitem combiner keeps both
    sums in one pass (rev_e4 total + rev_e4 from the target nation) so the
    ratio needs no second exchange."""
    s_map, c_map, n_name, n_region = _dim_arrays(sf_dir)
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rk = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    target_nk = int(np.nonzero(n_name == supp_nation)[0][0])
    s_ref, c_ref = ray.put(s_map), ray.put(c_map)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        sm = ray.get(s_ref) if isinstance(s_ref, ray.ObjectRef) else s_ref
        supp_nk = sm[batch["l_suppkey"].to_numpy()]
        price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(),
                "rev_e4": rev,
                "nation_rev_e4": np.where(supp_nk == target_nk, rev, 0),
            }
        )
        out = p.groupby("o_orderkey", as_index=False).sum()
        out["o_custkey"] = np.int64(-1)
        out["o_year"] = np.int64(0)
        return out

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def orders_rows(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(),
                "rev_e4": np.zeros(len(batch), dtype=np.int64),
                "nation_rev_e4": np.zeros(len(batch), dtype=np.int64),
                "o_custkey": batch["o_custkey"].to_numpy().astype(np.int64),
                "o_year": pc.year(batch["o_orderdate"]).to_numpy().astype(np.int64),
            }
        )

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(orders_rows, batch_format="pyarrow", batch_size=65536)
    )

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        dim = df[df["o_custkey"] >= 0]
        fact = df[df["o_custkey"] < 0]
        if fact.empty:
            return pd.DataFrame(
                {
                    "o_year": pd.Series(dtype=np.int64),
                    "rev_e4": pd.Series(dtype=np.int64),
                    "nation_rev_e4": pd.Series(dtype=np.int64),
                }
            )
        idx = pd.Series(np.arange(len(dim)), index=dim["o_orderkey"].to_numpy())
        pos = fact["o_orderkey"].map(idx).to_numpy()
        custkey = dim["o_custkey"].to_numpy()[pos]
        keep = n_region[cm[custkey]] == rk
        out = pd.DataFrame(
            {
                "o_year": dim["o_year"].to_numpy()[pos][keep],
                "rev_e4": fact["rev_e4"].to_numpy()[keep],
                "nation_rev_e4": fact["nation_rev_e4"].to_numpy()[keep],
            }
        )
        return out.groupby("o_year", as_index=False).sum()

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    parts = partition_map_groups(tagged, join_part, key="o_orderkey", num_buckets=32)
    out = parts.to_pandas().groupby("o_year", as_index=False).sum()  # ≤ 32 × |years| rows
    out["mkt_share"] = out["nation_rev_e4"].astype(np.int64) / out["rev_e4"].astype(np.int64)
    out["total_revenue"] = out["rev_e4"].astype(np.int64) / 10000.0
    out["o_year"] = out["o_year"].astype(np.int64)
    return out.sort_values("o_year", ignore_index=True)[["o_year", "mkt_share", "total_revenue"]]


def market_share_sql(sf_dir: str, region: str = "ASIA", supp_nation: str = "NATION_3") -> str:
    return f"""
WITH joined AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = '{region}'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = '{supp_nation}' THEN rev_e4 ELSE 0 END) AS BIGINT)
         / CAST(SUM(rev_e4) AS BIGINT) AS mkt_share,
       CAST(SUM(rev_e4) AS BIGINT) / 10000.0 AS total_revenue
FROM joined
GROUP BY o_year
ORDER BY o_year"""


def profit_by_nation_year(sf_dir: str, name_like: str = "gear") -> pd.DataFrame:
    """Product-profit report (TPC-H Q9 shape): the widest join in the
    classic suite — lineitem x part x supplier x nation x orders — grouped
    by supplier nation and order year.

    Scale plan: part and supplier are true dimensions (part 2k rows at
    sf0.01; key-only int64 arrays even at 100 TB), so the p_name filter and
    the suppkey->nationkey map broadcast once via ray.put and resolve inside
    the lineitem scan with sorted-array searchsorted — three of the four
    joins never shuffle. The only fact-fact edge (lineitem x orders, both
    unbounded) is ONE hash exchange on o_orderkey carrying per-batch partial
    sums on the lineitem side (one row per (orderkey, nat) per batch) and
    (orderkey, year) rows on the orders side; per-partition pandas merge
    resolves the year, per-(nat, year) partials leave each partition, and
    the driver folds <=25 x n_years rows. Profit rides integer cents x bp
    (e4) — associative, bitwise vs the DuckDB oracle."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    n_names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    pk = np.sort(
        part.loc[part["p_name"].str.contains(name_like, regex=False), "p_partkey"].to_numpy(
            np.int64
        )
    )
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.sort_values("s_suppkey")
    dims_ref = ray.put(
        (pk, supp["s_suppkey"].to_numpy(np.int64), supp["s_nationkey"].to_numpy(np.int64))
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        parts, sk, sn = ray.get(dims_ref) if isinstance(dims_ref, ray.ObjectRef) else dims_ref
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(parts, lpk)
        m = (pos < len(parts)) & (parts[np.minimum(pos, len(parts) - 1)] == lpk)
        if not m.any():
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "nat": pd.Series(dtype="int64"),
                    "year": pd.Series(dtype="int64"),
                    "rev_e4": pd.Series(dtype="int64"),
                }
            )
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[m]
        nat = sn[np.searchsorted(sk, lsk)]
        price_c = np.round(batch["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        p = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
                "nat": nat,
                "year": np.int64(-1),
                "rev_e4": price_c * (100 - disc_c),
            }
        )
        return p.groupby(["o_orderkey", "nat"], as_index=False).agg(
            {"year": "first", "rev_e4": "sum"}
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]")
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "nat": np.int64(-1),
                "year": odate.astype(np.int64) + 1970,
                "rev_e4": np.int64(0),
            }
        )

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    )

    def resolve_year(g: pd.DataFrame) -> pd.DataFrame:
        rev = g[g["nat"] >= 0][["o_orderkey", "nat", "rev_e4"]]
        if rev.empty:
            return pd.DataFrame(
                {
                    "nat": pd.Series(dtype="int64"),
                    "year": pd.Series(dtype="int64"),
                    "rev_e4": pd.Series(dtype="int64"),
                }
            )
        om = g[g["nat"] < 0][["o_orderkey", "year"]]
        j = rev.merge(om, on="o_orderkey", how="inner")
        return j.groupby(["nat", "year"], as_index=False)["rev_e4"].sum()

    parts_ds = partition_map_groups(tagged, resolve_year, key="o_orderkey", num_buckets=32)
    out = parts_ds.to_pandas().groupby(["nat", "year"], as_index=False)["rev_e4"].sum()
    out["nation"] = out["nat"].map(n_names)
    out["profit"] = out["rev_e4"] / 10000.0
    out["o_year"] = out["year"].astype(np.int64)
    return (
        out[["nation", "o_year", "profit"]]
        .sort_values(["nation", "o_year"], ascending=[True, False], ignore_index=True)
    )


def profit_by_nation_year_sql(sf_dir: str, name_like: str = "gear") -> str:
    return f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0 AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%{name_like}%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC"""


def priority_linestatus_mix(
    sf_dir: str, date_lo: str = "1997-01-01", date_hi: str = "1998-01-01"
) -> pd.DataFrame:
    """Shipping-priority mix (TPC-H Q12 shape): conditional CASE
    aggregation after a fact-fact join — per lineitem status, how many
    joined orders were critical (1-URGENT / 2-HIGH) vs not, within a
    ship-date year.

    Dataflow: the lineitem side is date-filtered AT THE SCAN and ships only
    (orderkey, linestatus); the orders side ships (orderkey, priority
    class) — priority is classified to a 0/1 int BEFORE the exchange so the
    string never moves. ONE hash exchange on o_orderkey, per-partition
    pandas merge + conditional partial counts, driver folds <= |status|
    rows."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    )

    def li_rows(batch: pa.Table) -> pd.DataFrame:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        m = (sd >= lo) & (sd < hi)
        return pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
                "l_linestatus": batch["l_linestatus"].to_numpy(zero_copy_only=False)[m],
                "is_high": np.int64(-1),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "l_linestatus": np.full(len(pri), "", dtype=object),
                "is_high": np.isin(pri, ("1-URGENT", "2-HIGH")).astype(np.int64),
            }
        )

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    tagged = li.map_batches(li_rows, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    )

    def mix(g: pd.DataFrame) -> pd.DataFrame:
        lis = g[g["is_high"] < 0][["o_orderkey", "l_linestatus"]]
        if lis.empty:
            return pd.DataFrame(
                {
                    "l_linestatus": pd.Series(dtype="object"),
                    "high_line_count": pd.Series(dtype="int64"),
                    "low_line_count": pd.Series(dtype="int64"),
                }
            )
        om = g[g["is_high"] >= 0][["o_orderkey", "is_high"]]
        j = lis.merge(om, on="o_orderkey", how="inner")
        out = j.groupby("l_linestatus", as_index=False).agg(
            high_line_count=("is_high", "sum"), low_line_count=("is_high", "size")
        )
        out["low_line_count"] = out["low_line_count"] - out["high_line_count"]
        return out

    parts = partition_map_groups(tagged, mix, key="o_orderkey", num_buckets=32)
    out = parts.to_pandas().groupby("l_linestatus", as_index=False).sum()
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("l_linestatus", ignore_index=True)


def priority_linestatus_mix_sql(
    sf_dir: str, date_lo: str = "1997-01-01", date_hi: str = "1998-01-01"
) -> str:
    return f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '{date_lo}' AND l_shipdate < TIMESTAMP '{date_hi}'
GROUP BY l_linestatus
ORDER BY l_linestatus"""


def waiting_suppliers(sf_dir: str, late_days: int = 60, k: int = 20) -> pd.DataFrame:
    """TPC-H Q21 shape (suppliers-who-kept-orders-waiting): for finished
    orders with MULTIPLE distinct suppliers, blame the supplier iff it is the
    ONLY one whose items shipped late — the EXISTS + NOT-EXISTS double
    correlated-subquery pattern, the hardest join shape in the TPC-H suite.
    (The fixture's lineitem carries no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + late_days — the same correlated semantics on
    the columns available.)

    Dataflow (100-TB-safe): ONE tagged-union exchange on orderkey
    co-partitions the order rows ('F' filter applied at the read) with the
    lineitem rows; per partition, a vectorized pandas merge + two groupbys
    compute per-(order, supplier) lateness and the order-level distinct /
    distinct-late supplier counts — the EXISTS pair collapses to
    (n_supp >= 2 AND n_late == 1) — and emit per-supplier PARTIAL counts.
    The driver sums supplier-sized partials and resolves names from the
    broadcast supplier dimension (J3 pattern)."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    names = dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_name"]))
    late_us = np.int64(late_days) * np.int64(86_400_000_000)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )

    def li_rows(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": batch["l_orderkey"].to_numpy().astype(np.int64),
                "suppkey": batch["l_suppkey"].to_numpy().astype(np.int64),
                "ts_us": batch["l_shipdate"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .view(np.int64),
                "kind": np.zeros(batch.num_rows, dtype=np.int64),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
    )

    def order_rows(batch: pa.Table) -> pd.DataFrame:
        m = batch["o_orderstatus"].to_numpy(zero_copy_only=False) == "F"
        return pd.DataFrame(
            {
                "okey": batch["o_orderkey"].to_numpy().astype(np.int64)[m],
                "suppkey": np.full(int(m.sum()), -1, dtype=np.int64),
                "ts_us": batch["o_orderdate"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .view(np.int64)[m],
                "kind": np.ones(int(m.sum()), dtype=np.int64),
            }
        )

    tagged = li.map_batches(li_rows, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    )

    def blame(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["kind"] == 1][["okey", "ts_us"]].rename(columns={"ts_us": "odate_us"})
        l = g[g["kind"] == 0][["okey", "suppkey", "ts_us"]]
        j = l.merge(o, on="okey", how="inner")  # inner = the 'F' status filter
        if j.empty:
            return pd.DataFrame(
                {"suppkey": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
            )
        j["late"] = (j["ts_us"].to_numpy() > j["odate_us"].to_numpy() + late_us).astype(np.int64)
        per_os = j.groupby(["okey", "suppkey"], as_index=False).agg(late=("late", "max"))
        per_o = per_os.groupby("okey").agg(n_supp=("late", "size"), n_late=("late", "sum"))
        hit = per_os.merge(per_o, on="okey")
        hit = hit[(hit["late"] == 1) & (hit["n_supp"] >= 2) & (hit["n_late"] == 1)]
        out = hit.groupby("suppkey", as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = partition_map_groups(tagged, blame, key="okey", num_buckets=32)
    agg = parts.to_pandas().groupby("suppkey", as_index=False)["n"].sum()
    agg["s_name"] = agg["suppkey"].map(names)
    agg = agg.rename(columns={"n": "numwait"})
    agg["numwait"] = agg["numwait"].astype(np.int64)
    agg = agg.sort_values(
        ["numwait", "s_name"], ascending=[False, True], ignore_index=True
    ).head(k)
    return agg[["s_name", "numwait"]]


def waiting_suppliers_sql(sf_dir: str, late_days: int = 60, k: int = 20) -> str:
    return f"""
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
), per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late FROM j GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM j JOIN per_o USING (l_orderkey) JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {k}"""


def tpch_q3_bloom(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-30",
    k: int = 10,
    bits_log2: int = 20,
    n_hashes: int = 4,
) -> pd.DataFrame:
    """Q3 with a Bloom SEMI-JOIN pushdown on the fact-side exchange — the
    strategy for when the qualifying-key set is too large to broadcast
    exactly: tpch_q3 ships a lineitem revenue partial for EVERY
    shipdate-qualifying order, including orders that cannot survive the
    join (wrong segment / late orderdate); here a Bloom filter of the
    qualifying orderkeys (built in one extra pass over orders — m/8-byte
    partials OR-reduced and broadcast once, the doc_bloom_dedup
    discipline) prunes those partials BEFORE they enter the union
    exchange. False positives only fail to prune — they are resolved
    exactly by the join's (rev > 0 AND odate >= 0) gate — so the output is
    IDENTICAL to tpch_q3 and shares its oracle. At sf0.1 the filter drops
    ~69% of lineitem exchange rows (pytest measures the pruned fraction);
    at 100 TB the m ∝ n sizing note from doc_bloom_dedup applies."""
    cutoff_ts = pd.Timestamp(cutoff)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys: list[np.ndarray] = []
    for b in cust.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        m = pa.compute.equal(b["c_mktsegment"], segment)
        keys.append(b.filter(m)["c_custkey"].to_numpy(zero_copy_only=False))
    keys_ref = ray.put(np.sort(np.concatenate(keys)) if keys else np.empty(0, np.int64))

    m_bits = 1 << bits_log2
    n_words = m_bits >> 6
    C = np.uint64(0x9E3779B97F4A7C15)

    def _positions(h: np.ndarray, j: int) -> np.ndarray:
        x = h + np.uint64(j) * C
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return (x & np.uint64(m_bits - 1)).astype(np.int64)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def qualifying_mask(batch: pa.Table) -> np.ndarray:
        ks = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return (odate < np.datetime64(cutoff_ts, "us")) & np.isin(
            batch["o_custkey"].to_numpy(zero_copy_only=False), ks
        )

    def bloom_partial(batch: pa.Table) -> pd.DataFrame:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)[qualifying_mask(batch)]
        h = ok.astype(np.uint64)
        words = np.zeros(n_words, dtype=np.uint64)
        for j in range(n_hashes):
            pos = _positions(h, j)
            np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return pd.DataFrame({"bits": [words.tobytes()]})

    parts = orders.map_batches(
        bloom_partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    bloom = np.zeros(n_words, dtype=np.uint64)
    for b in parts["bits"]:
        bloom |= np.frombuffer(b, dtype=np.uint64)
    bref = ray.put(bloom)

    def orders_rows(batch: pa.Table) -> pd.DataFrame:
        mask = qualifying_mask(batch)
        odate = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[mask],
                "rev_e4": np.zeros(int(mask.sum()), dtype=np.int64),
                "odate_us": odate[mask].astype(np.int64),
                "o_orderpriority": batch["o_orderpriority"].to_numpy(zero_copy_only=False)[
                    mask
                ],
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        mask = ship > np.datetime64(cutoff_ts, "us")
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        bl = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        h = ok.astype(np.uint64)
        present = np.ones(len(ok), dtype=bool)
        for j in range(n_hashes):
            pos = _positions(h, j)
            present &= (bl[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1) != 0
        mask &= present  # the semi-join pushdown: pruned rows never exchange
        price_c = np.round(batch["l_extendedprice"].to_numpy()[mask] * 100).astype(np.int64)
        disc_c = np.round(batch["l_discount"].to_numpy()[mask] * 100).astype(np.int64)
        p = pd.DataFrame({"o_orderkey": ok[mask], "rev_e4": price_c * (100 - disc_c)})
        out = p.groupby("o_orderkey", as_index=False).sum()
        out["odate_us"] = np.int64(-1)
        out["o_orderpriority"] = ""
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    tagged = li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(orders_rows, batch_format="pyarrow", batch_size=65536)
    )
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
