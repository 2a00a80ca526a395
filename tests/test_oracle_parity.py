"""Engine vs DuckDB oracle — EXACT equality (no tolerance) on all
SQL-expressible columns, single-process path (no Ray needed)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray import oracle
from quant_feature_pipeline_ray.pipelines.flagship import featurize_bucket
from quant_feature_pipeline_ray.stages.window_agg import window_aggregate_frame


@pytest.fixture(scope="module")
def eng(sf001_transcripts):
    return featurize_bucket(pq.read_table(sf001_transcripts).to_pandas())


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def assert_exact(e, r, cols, key):
    e = e[cols].sort_values(key, ignore_index=True)
    r = r[cols].sort_values(key, ignore_index=True)
    assert len(e) == len(r)
    for c in cols:
        a, b = e[c].to_numpy(), r[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b.astype(float)))).all()
        else:
            ok = (a == b).all()
        assert ok, f"column {c} differs"


def test_turn_base_exact(eng, con, sf001_transcripts):
    ref = con.sql(oracle.sql_turn_base(sf001_transcripts)).df()
    cols = [
        "conv_id", "turn_idx", "ts_us", "text_len", "is_tool", "role_change",
        "cum_turns", "dt_secs", "session_id", "session_turn", "text",
    ]
    assert_exact(eng, ref, cols, ["conv_id", "turn_idx"])


def test_rolling_exact(eng, con, sf001_transcripts):
    ref = con.sql(oracle.sql_rolling(sf001_transcripts)).df()
    cols = [
        "conv_id", "turn_idx", "lat_sma_5", "lat_std_5", "lat_sma_20",
        "lat_std_20", "tool_rate_20", "role_change_rate_20", "text_len_sma_20",
        "lat_lag_1", "lat_delta_1", "lat_lag_5", "lat_delta_5", "lat_lead_1",
        "gap_event",
    ]
    assert_exact(eng, ref, cols, ["conv_id", "turn_idx"])


def test_window_agg_exact(eng, con, sf001_transcripts):
    wa = window_aggregate_frame(eng, 300)
    ref = con.sql(oracle.sql_window_agg(sf001_transcripts, 300)).df()
    cols = [
        "conv_id", "w_end_us", "turns", "tool_turns", "text_chars",
        "dt_sum_us", "first_turn", "last_turn", "dt_mean",
    ]
    assert_exact(wa, ref, cols, ["conv_id", "w_end_us"])


def test_asof_exact(eng, con, sf001_transcripts):
    ref = con.sql(oracle.sql_asof_features(sf001_transcripts)).df()
    cols = [c for c in ref.columns]
    assert_exact(eng, ref, cols, ["conv_id", "turn_idx"])
