"""Property fuzz: engine == DuckDB oracle bitwise on random small inputs.

Hypothesis generates adversarial transcript shapes (single-turn convs,
zero inter-turn gaps i.e. duplicate timestamps, huge gaps, many tiny
conversations); the pandas kernel path must match the SQL oracle exactly on
every SQL-expressible column."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quant_feature_pipeline_ray import oracle
from quant_feature_pipeline_ray.pipelines.flagship import featurize_bucket


@st.composite
def transcript_frames(draw):
    n_convs = draw(st.integers(1, 6))
    rows = []
    for c in range(n_convs):
        n = draw(st.integers(1, 40))
        ts = 1_700_000_000_000_000 + c * 10**9
        for i in range(n):
            gap_us = draw(
                st.sampled_from([0, 1, 500_000, 30_000_000, 200_000_000, 4_000_000_000])
            )
            ts += gap_us
            role = draw(st.sampled_from(["user", "assistant", "tool", "system"]))
            tool = draw(st.sampled_from(["", "search", "python"])) if role == "tool" else ""
            rows.append((f"c{c:03d}", i, role, f"c{c:03d}:{i}:xyz", tool, ts))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    return df.sample(frac=1.0, random_state=draw(st.integers(0, 999)))  # shuffled


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(transcript_frames())
def test_fuzz_engine_matches_oracle(tmp_path_factory, df):
    import os
    import tempfile

    eng = featurize_bucket(df)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.parquet")
        df.to_parquet(path, index=False)
        con = duckdb.connect()
        base = con.sql(oracle.sql_turn_base(path)).df()
        roll = con.sql(oracle.sql_rolling(path)).df()
        con.close()
    for ref, cols in (
        (base, ["ts_us", "text_len", "is_tool", "role_change", "cum_turns",
                "dt_secs", "session_id", "session_turn"]),
        (roll, ["lat_sma_5", "lat_std_5", "lat_sma_20", "lat_std_20",
                "tool_rate_20", "role_change_rate_20", "lat_lag_1",
                "lat_delta_1", "lat_lead_1", "gap_event"]),
    ):
        assert len(eng) == len(ref)
        e = eng.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        r = ref.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        for c in cols:
            a, b = e[c].to_numpy(), r[c].to_numpy()
            if a.dtype.kind == "f":
                ok = ((a == b) | (np.isnan(a) & np.isnan(b.astype(float)))).all()
            else:
                ok = (a == b).all()
            assert ok, f"fuzz divergence in {c}\n{e[[c]].head()}\n{r[[c]].head()}"
