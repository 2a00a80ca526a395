"""High-cardinality grouped aggregation via hash partitions.

Ray Data's native ``groupby().aggregate()`` is sort-based and pays ~1 ms of
per-GROUP Python overhead in the reduce step — measured 45 s for a 15k-group
Sum on this host, and linear in group count (it would be hours for a
vocabulary- or orderkey-sized keyspace). That cost model is fine for the
handful-of-groups case (tpch_q1's 4 flag/status groups) and fatal for
high-cardinality keys.

``grouped_aggregate`` keeps the SAME single hash exchange but runs the
per-group reduction as a C-level pandas groupby INSIDE each of
``num_partitions`` hash partitions (the repo's standard
partition_map_groups backbone, cf. NOTES_ROUND2 on per-group overhead):
group count affects only block sizes, never task count.

Callers that pre-combine per batch (partial aggregation) must pass
aggregation functions that are associative over partials (sum/min/max/...);
``size`` counts raw rows and is only correct when the input is one row per
original element."""

from __future__ import annotations

import pandas as pd

import ray.data

from quant_feature_pipeline_ray.stages.partition import partition_map_groups


def grouped_aggregate(
    ds: ray.data.Dataset,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Group by `key` and aggregate with `aggs`: out_col -> (in_col, fn),
    fn a pandas-named-agg function name ('sum', 'min', 'max', 'size',
    'first', 'last', 'nunique', ...).

    Rows of one group always share a hash partition (bucketing uses the
    first key column, a superset grouping), so a single pandas groupby per
    partition produces final rows — one shuffle, no per-group tasks."""
    keys = [key] if isinstance(key, str) else list(key)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            **{o: pd.NamedAgg(column=c, aggfunc=f) for o, (c, f) in aggs.items()}
        )

    return partition_map_groups(ds, part, key=keys[0], num_buckets=num_partitions)
