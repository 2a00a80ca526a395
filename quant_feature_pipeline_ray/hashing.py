"""Stable, process-independent hashing for partitioning and dedup.

Every stateful operator in the engine is conv-local, so ONE hash partition by
conv_id up front serves the whole pipeline (SURVEY.md §4.2.1). The bucket
function must be deterministic across Python processes (PYTHONHASHSEED-free)
and across the two sides of a co-partitioned join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stable_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic hash-bucket for an array of strings (or any dtype).

    Uses pandas' SipHash-based ``hash_array`` with its fixed default key —
    stable across processes and machines, vectorized in C.
    """
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "US":
        h = pd.util.hash_array(arr.astype(object), categorize=True)
    else:
        h = pd.util.hash_array(arr)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def content_hash(values) -> np.ndarray:
    """64-bit stable content hash of a string column (exact-dedup key).

    At 100 TB the dedup groupby shuffles only (hash, id) pairs, never the
    payload text.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)
