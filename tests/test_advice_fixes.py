"""Regression tests for round-1 advisory fixes: ns-epoch exactness,
rolling-std int64 overflow guard, dedup tie determinism guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quant_feature_pipeline_ray.sources.normalize_ts import normalize_ts_batch
from quant_feature_pipeline_ray.stages.turn_features import (
    dedup_keep_last,
    rolling_mean_std_int,
)
from quant_feature_pipeline_ray.stages.turn_features_arrow import _sorted_dedup


def test_ns_epoch_integer_exact():
    # ~2023 ns epochs exceed float64's 2^53 exact-int range; float division
    # would drift the converted us by ±1
    ns = np.array([1_700_000_000_123_456_789, 1_700_000_000_123_457_789], dtype=np.int64)
    batch = pa.table({"ts": pa.array(ns, pa.int64()), "x": pa.array([1, 2])})
    out = normalize_ts_batch(batch)
    us = out["ts"].cast(pa.int64()).to_numpy()
    assert us.tolist() == [1_700_000_000_123_456, 1_700_000_000_123_457]


def test_rolling_std_overflow_guard():
    # a single ~300-day gap puts dt_cs^2 * w past 2^63 — must fail fast,
    # not silently wrap
    dt_us = np.array([0, 10**6, 300 * 86_400 * 10**6], dtype=np.int64)
    rn = np.arange(3, dtype=np.int64)
    with pytest.raises(ValueError, match="int64-exact bound"):
        rolling_mean_std_int(dt_us, rn, 20)
    # just below the bound: still exact, no raise
    dt_ok = np.array([0, 10**6, 86_400 * 10**6], dtype=np.int64)
    sma, std = rolling_mean_std_int(dt_ok, rn, 20)
    assert np.isfinite(sma).all() and np.isfinite(std).all()


def _dup_frame(text_b):
    return pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": [0, 0],
            "ts": pd.to_datetime([1_000_000, 1_000_000], unit="us"),
            "role": ["user", "user"],
            "tool": ["", ""],
            "text": ["hello", text_b],
        }
    )


def test_dedup_equal_ts_different_text_raises_pandas():
    with pytest.raises(ValueError, match="nondeterministic"):
        dedup_keep_last(_dup_frame("world"))
    out = dedup_keep_last(_dup_frame("hello"))  # identical payload: fine
    assert len(out) == 1


def test_dedup_equal_ts_different_text_raises_arrow():
    tbl = pa.Table.from_pandas(_dup_frame("world"), preserve_index=False)
    with pytest.raises(ValueError, match="nondeterministic"):
        _sorted_dedup(tbl)
    tbl_ok = pa.Table.from_pandas(_dup_frame("hello"), preserve_index=False)
    out, codes = _sorted_dedup(tbl_ok)
    assert out.num_rows == 1
