"""Property fuzz for the round-3 event operators: engine == DuckDB oracle
bitwise on hypothesis-generated event tables with adversarial shapes —
equal timestamps, single-event users, users whose whole span is one
instant, negative values."""

import os
import tempfile

import duckdb
import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quant_feature_pipeline_ray.pipelines import events as ev


@st.composite
def event_frames(draw):
    n_users = draw(st.integers(1, 8))
    rows = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 25))
        ts = 1_700_000_000_000_000 + u * 7  # overlapping user spans
        for _ in range(n):
            ts += draw(st.sampled_from([0, 1, 1_000_000, 60_000_000]))
            eid += 1
            rows.append(
                (
                    eid,
                    ts,
                    u,
                    draw(st.sampled_from(["view", "click", "purchase"])),
                    draw(st.sampled_from([-3.25, 0.0, 1.5, 99.99])),
                    "{}",
                )
            )
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["user_id"] = df["user_id"].astype(np.int64)
    return df.sample(frac=1.0, random_state=draw(st.integers(0, 999)))


def _cmp(got: pd.DataFrame, odf: pd.DataFrame) -> None:
    if len(got) == 0 and len(odf) == 0:
        # a zero-row Ray dataset loses its schema on to_pandas (systemic
        # Ray Data behavior); empty == empty is a match
        return
    cols = sorted(got.columns)
    assert sorted(odf.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_frames())
def test_fuzz_event_ops_match_oracle(ray_session, df):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events.parquet")
        df.to_parquet(path, index=False)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")

        got = ev.events_markov(path)
        _cmp(got, con.sql(ev.events_markov_sql()).df())

        got = ev.events_time_weighted_avg(path).to_pandas()
        _cmp(got, con.sql(ev.events_time_weighted_avg_sql()).df())

        got = ev.events_max_concurrency(path)
        _cmp(got, con.sql(ev.events_max_concurrency_sql()).df())
        con.close()
