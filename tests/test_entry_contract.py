"""Driver-contract smoke: __ray_entry__ entry/queries/oracle_sql stay wired.

The full oracle sweep lives in scripts/check_contract.py (sf0.01); this is
the fast in-suite guard at sf0.001 so a refactor can't silently break the
driver surface."""

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
FAST_ORACLED = ["t_turn_base", "t_rolling", "t_window_agg_300", "t_asof_features",
                "t_session_stats", "t_time_windows"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


def test_entry_smoke(entrymod):
    out = entrymod.entry().to_pandas()
    assert len(out) > 0
    assert {"conv_id", "turn_idx", "text", "dt_secs"} <= set(out.columns)


def test_every_query_has_callable_and_sql_keys_match(entrymod):
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    missing = set(sqls) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


@pytest.mark.parametrize("name", FAST_ORACLED)
def test_fast_queries_match_oracle_at_sf0001(entrymod, name):
    from quant_feature_pipeline_ray import oracle
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    path = ensure_transcripts(SF)
    sql_builders = {
        "t_turn_base": oracle.sql_turn_base,
        "t_rolling": oracle.sql_rolling,
        "t_window_agg_300": lambda p: oracle.sql_window_agg(p, 300),
        "t_asof_features": oracle.sql_asof_features,
        "t_session_stats": oracle.sql_session_stats,
        "t_time_windows": oracle.sql_time_windows,
    }
    got = entrymod.queries()[name](SF)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    con = duckdb.connect()
    ref = con.sql(sql_builders[name](path)).df()
    con.close()
    assert len(got) == len(ref)
    cols = sorted(got.columns)
    assert cols == sorted(ref.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    r = ref[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        a, b = g[c].to_numpy(), r[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a, b = a.astype(np.float64), b.astype(np.float64)
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"{name}: column {c} mismatches oracle"
