"""Round-3 third-wave operators: hopping (overlapping) event-time windows,
NTILE equal-frequency bucketing, and the TPC-H Q9 profit join shape — each
pinned exactly against its DuckDB oracle at sf0.01 (the driver's comparison
semantics: sorted columns, sorted rows, exact equality)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def assert_matches(got, ref):
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    assert len(got) == len(ref), f"rowcount {len(got)} != {len(ref)}"
    cols = sorted(got.columns)
    assert cols == sorted(ref.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    r = ref[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        a, b = g[c].to_numpy(), r[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a, b = a.astype(np.float64), b.astype(np.float64)
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            eq = a == b
        assert np.asarray(eq).all(), f"col {c} mismatch"


def test_hopping_windows_matches_oracle(ray_session, con):
    from quant_feature_pipeline_ray.pipelines.events import (
        events_hopping_windows,
        events_hopping_windows_sql,
    )

    got = events_hopping_windows(f"{SF}/events.parquet").to_pandas()
    ref = con.sql(events_hopping_windows_sql()).df()
    assert_matches(got, ref)
    # every event contributes to exactly window_s/hop_s = 4 windows
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert got["n"].sum() == 4 * n_events
    # window starts are hop-aligned
    assert (got["w_start_us"].to_numpy() % (900 * 1_000_000) == 0).all()


def test_hopping_windows_rejects_non_divisible():
    from quant_feature_pipeline_ray.pipelines.events import events_hopping_windows

    with pytest.raises(ValueError):
        events_hopping_windows(f"{SF}/events.parquet", window_s=3600, hop_s=700)


def test_ntile_matches_oracle(ray_session, con):
    from quant_feature_pipeline_ray.pipelines.events import events_ntile, events_ntile_sql

    got = events_ntile(f"{SF}/events.parquet").to_pandas()
    ref = con.sql(events_ntile_sql()).df()
    assert_matches(got, ref)
    # per event_type: tile sizes differ by at most 1 (equal-frequency)
    sizes = got.groupby(["event_type", "tile"]).size()
    for et, sub in sizes.groupby(level=0):
        assert sub.max() - sub.min() <= 1, et


def test_profit_by_nation_year_matches_oracle(ray_session, con):
    from quant_feature_pipeline_ray.pipelines.tpch import (
        profit_by_nation_year,
        profit_by_nation_year_sql,
    )

    got = profit_by_nation_year(SF)
    ref = con.sql(profit_by_nation_year_sql(SF)).df()
    assert_matches(got, ref)
    # output is (nation asc, year desc) like the canonical Q9
    expected = got.sort_values(
        ["nation", "o_year"], ascending=[True, False], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, expected)
