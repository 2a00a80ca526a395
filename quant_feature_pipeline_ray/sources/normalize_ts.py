"""Timestamp normalization reader stage (M1 analogue).

The reference sniffs the timestamp column name among
timestamp/time/datetime/ts and dispatches int-epoch vs string parsing at
every read (step2_resample.py:109-157, tools/io_paths.py:110-116; unit
inference ns/us/ms/s in 🧬test_rl_features.py:175-217). Here: one
vectorized Arrow stage that finds the column, infers the epoch unit from
magnitude, and emits a canonical `ts: timestamp[us]`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TS_CANDIDATES = ("ts", "timestamp", "time", "datetime")

# magnitude thresholds for epoch-unit inference (covers 2001..2286)
_UNIT_BOUNDS = (
    (10**17, "ns"),
    (10**14, "us"),
    (10**11, "ms"),
    (0, "s"),
)


def find_ts_column(names: list[str]) -> str:
    for c in TS_CANDIDATES:
        if c in names:
            return c
    raise ValueError(f"no timestamp column among {names} (want one of {TS_CANDIDATES})")


def infer_epoch_unit(sample: np.ndarray) -> str:
    mag = float(np.abs(sample).max()) if len(sample) else 0.0
    for bound, unit in _UNIT_BOUNDS:
        if mag >= bound:
            return unit
    return "s"


def normalize_ts_batch(batch: pa.Table, col: str | None = None) -> pa.Table:
    col = col or find_ts_column(batch.column_names)
    arr = batch[col]
    t = arr.type
    if pa.types.is_timestamp(t):
        out = arr.cast(pa.timestamp("us"))
    elif pa.types.is_integer(t) or pa.types.is_floating(t):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        unit = infer_epoch_unit(vals[: min(len(vals), 1024)])
        # ns uses integer floor division: modern ns epochs (~1.7e18) exceed
        # float64's 2^53 exact range, so float division could drift ±1 us
        if unit == "ns":
            us = vals // 1000
        else:
            us = vals * np.int64({"us": 1, "ms": 1000, "s": 1_000_000}[unit])
        out = pa.array(us, type=pa.timestamp("us"))
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        out = pc.strptime(arr, format="%Y-%m-%d %H:%M:%S", unit="us", error_is_null=True)
        if pc.count(out, mode="only_null").as_py() > 0:
            # fall back to full ISO parsing via cast
            out = arr.cast(pa.timestamp("us"))
    else:
        raise TypeError(f"cannot normalize ts column of type {t}")
    idx = batch.column_names.index(col)
    batch = batch.remove_column(idx)
    return batch.add_column(idx, "ts", out)


def read_normalized(path: str, **kwargs) -> ray.data.Dataset:
    """read_parquet + canonical-ts normalization in one stage."""
    ds = ray.data.read_parquet(path, **kwargs)
    return ds.map_batches(normalize_ts_batch, batch_format="pyarrow")
