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


def md5_lower64(strings) -> np.ndarray:
    """Little-endian uint64 of md5(s) digest bytes 8..16 — bit-identical to
    DuckDB's ``md5_number_lower``, so sketches keyed on it get EXACT SQL
    oracles (the doc_checksum discipline). Python-loop md5: reserve for
    cardinality-bounded inputs (per-batch distinct keys), not raw rows."""
    import hashlib

    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
    return out
