"""Agent tool-loop detection (t_loop_detect): exact parity vs a pure-Python
straight-line implementation (sort → dedup keep-last → itertools.groupby
run-length encoding) over the sf0.001 transcript fixture, plus
non-vacuousness (the fixture does contain loops) and invariant checks."""

import itertools
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
MIN_RUN = 3


def straight_loop_stats(path: str) -> pd.DataFrame:
    import glob

    df = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(os.path.join(path, "*.parquet")))],
        ignore_index=True,
    )
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df[~df.duplicated(["conv_id", "turn_idx"], keep="last")]
    rows = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        steps = (g["role"] + "|" + g["tool"]).tolist()
        rls = [len(list(grp)) for _, grp in itertools.groupby(steps)]
        turns = sum(rls)
        looped = sum(r for r in rls if r >= MIN_RUN)
        rows.append(
            {
                "conv_id": conv_id,
                "turns": turns,
                "max_run": max(rls),
                "n_loops": sum(1 for r in rls if r >= MIN_RUN),
                "looped_turns": looped,
                "loop_frac": looped / turns,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def loops(ray_session):
    import __ray_entry__ as entrymod
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    path = ensure_transcripts(SF)
    got = (
        entrymod.queries()["t_loop_detect"](SF)
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    return got, straight_loop_stats(path)


def test_matches_straight_line(loops):
    got, exp = loops
    assert len(got) == len(exp)
    for c in ["conv_id", "turns", "max_run", "n_loops", "looped_turns"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["loop_frac"].to_numpy() == exp["loop_frac"].to_numpy()).all()


def test_fixture_contains_loops(loops):
    got, _ = loops
    assert (got["n_loops"] > 0).any(), "fixture has no runs >= 3 — test is vacuous"
    assert (got["max_run"] >= MIN_RUN).any()


def test_invariants(loops):
    got, _ = loops
    assert (got["looped_turns"] <= got["turns"]).all()
    assert (got["max_run"] >= 1).all()
    assert got["loop_frac"].between(0.0, 1.0).all()
    # a conv with no loops has zero looped turns and frac
    none = got[got["n_loops"] == 0]
    assert (none["looped_turns"] == 0).all()
    assert (none["loop_frac"] == 0.0).all()
