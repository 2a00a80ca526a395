"""The hash-partition backbone (SURVEY.md §4.2.1-2, §7.1 step 3).

Design: every stateful transcript operator (sort, dedup keep-last, sessionize,
rolling windows, as-of join) is conv-local. We therefore pay exactly ONE
all-to-all exchange — `groupby("_bucket")` on `hash(conv_id) % B` — and run
every kernel per bucket on rows sorted by (conv_id, turn_idx, ts). A bucket
holds MANY conversations, so the per-bucket kernels vectorize across
conversations (pandas groupby / numpy segmented scans), amortizing per-group
overhead that a per-conversation map_groups would pay ~n_convs times.

Scale notes (100 TB / 256 nodes):
  * B (num_buckets) should be ~2-4x total cores so the shuffle produces
    blocks that saturate the cluster without tiny-task overhead; it is
    config, not hardcoded.
  * The same `stable_bucket` function co-partitions both sides of the as-of
    join (stages/asof.py) — no second shuffle.
  * Skewed mega-conversations stay single-bucket here; stages/salting.py
    splits them with exact carry-state handoff when one conversation
    dominates a bucket.

Reference analogue: the reference processes one symbol in one process
(unified_feature_pipeline.py:534-701); the bucket IS the unit of parallelism
the reference never had.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from quant_feature_pipeline_ray.hashing import stable_bucket

BUCKET_COL = "_bucket"


def with_bucket(
    ds: ray.data.Dataset, key: str = "conv_id", num_buckets: int = 64
) -> ray.data.Dataset:
    """Append a deterministic int32 hash-bucket column (zero-copy Arrow in)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch[key].to_numpy(zero_copy_only=False), num_buckets)
        return batch.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def partition_map_groups(
    ds: ray.data.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    key: str = "conv_id",
    num_buckets: int = 64,
    drop_bucket: bool = True,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """hash-partition by `key` into `num_buckets`, apply `fn` per bucket.

    `fn` receives one bucket's rows (unsorted — it owns its sort) and returns
    the transformed frame. This is the single shuffle of the pipeline; all
    downstream stages stay narrow.
    """
    bucketed = with_bucket(ds, key=key, num_buckets=num_buckets)

    if drop_bucket:

        def run(g: pd.DataFrame) -> pd.DataFrame:
            out = fn(g)
            return out.drop(columns=[BUCKET_COL], errors="ignore")

    else:
        run = fn

    return bucketed.groupby(BUCKET_COL).map_groups(run, batch_format=batch_format)


def sort_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical per-partition ordering: (conv_id, turn_idx, ts), stable.

    Matches the reference's universal `sort_index()` + dedup invariant
    (step2_resample.py:143). Stable mergesort so equal keys keep input order.
    """
    return df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort", ignore_index=True)


def assert_watermark(ts: np.ndarray, conv_changed: np.ndarray) -> None:
    """Leakage guard: within a conversation, ts must be non-decreasing after
    the canonical sort. A violation means ordering was lost upstream — fail
    fast rather than silently compute leaky features (SURVEY.md §7.4.2)."""
    bad = (~conv_changed) & (np.diff(ts, prepend=ts[:1]) < 0)
    if bad.any():
        raise AssertionError(
            f"temporal watermark violated on {int(bad.sum())} rows — "
            "per-conversation ts ordering lost upstream"
        )
