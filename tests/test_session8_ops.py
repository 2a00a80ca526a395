"""Round-4 session-8 operators: role/tool transition matrix, sessionize
threshold sweep, as-of staleness/leak audit (and later session-8 additions).

Each op has an exact DuckDB oracle (scripts/check_contract.py); these tests
pin the invariants the oracle can't state — probability-mass closure,
monotonicity across thresholds, the zero-leak guarantee itself — plus
straight-line pandas recomputes at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _deduped_turns() -> pd.DataFrame:
    """Keep-last (conv, turn) dedup + sort — the base_cte semantics."""
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts

    import pyarrow.parquet as pq
    import os

    path = ensure_transcripts(SF)
    frames = [
        pq.read_table(os.path.join(path, f)).to_pandas()
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    df = pd.concat(frames, ignore_index=True)
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)


def test_role_transitions_mass_and_straightline(ray_session):
    import __ray_entry__ as em

    got = em.queries()["t_role_transitions"](SF)
    # row-normalized probabilities close to 1 per from_role (exact integer
    # ratio sums: n_i / tot with tot = Σ n_i)
    mass = got.groupby("from_role")["p_row"].sum()
    assert np.allclose(mass.to_numpy(), 1.0)
    # straight-line recompute
    df = _deduped_turns()
    same = df["conv_id"].to_numpy()[1:] == df["conv_id"].to_numpy()[:-1]
    role, tool = df["role"].to_numpy(), df["tool"].to_numpy()
    exp = (
        pd.DataFrame(
            {
                "from_role": role[:-1][same],
                "to_role": role[1:][same],
                "tool_sw": (tool[1:][same] != tool[:-1][same]).astype(np.int64),
            }
        )
        .groupby(["from_role", "to_role"], as_index=False)
        .agg(n=("tool_sw", "size"), n_tool_switch=("tool_sw", "sum"))
        .sort_values(["from_role", "to_role"], ignore_index=True)
    )
    assert (got["from_role"] == exp["from_role"]).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["n_tool_switch"].to_numpy() == exp["n_tool_switch"].to_numpy()).all()
    assert ((got["tool_switch_rate"] >= 0) & (got["tool_switch_rate"] <= 1)).all()


def test_session_threshold_sweep_monotone(ray_session):
    import __ray_entry__ as em

    got = em.queries()["t_session_threshold_sweep"](SF)
    df = _deduped_turns()
    n_convs = df["conv_id"].nunique()
    # sessions shrink (weakly) as the gap threshold grows; floor = 1/conv
    ns = got.sort_values("tau_s")["n_sessions"].to_numpy()
    assert (np.diff(ns) <= 0).all()
    assert (got["n_sessions"] >= n_convs).all()
    assert (got["n_turns"] == len(df)).all()
    # straight-line recompute at one threshold
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    same = df["conv_id"].to_numpy()[1:] == df["conv_id"].to_numpy()[:-1]
    dt = (ts[1:] - ts[:-1])[same]
    for tau in (60, 1800):
        exp = n_convs + int((dt > tau * 1_000_000).sum())
        assert int(got.loc[got["tau_s"] == tau, "n_sessions"].iloc[0]) == exp


def test_asof_staleness_zero_leaks(ray_session):
    import __ray_entry__ as em
    from quant_feature_pipeline_ray.config import DEFAULT_CONFIG

    got = em.queries()["t_asof_staleness"](SF)
    assert list(got["window_s"]) == sorted(DEFAULT_CONFIG.agg_windows_s)
    # the north-star leak-free gate: no matched window may end after its turn
    assert (got["n_leaks"] == 0).all()
    assert (got["stale_min_us"] >= 0).all()
    assert (got["n_matched"] <= got["n_turns"]).all()
    assert ((got["match_rate"] > 0) & (got["match_rate"] <= 1)).all()
    assert (got["stale_max_us"] >= got["stale_min_us"]).all()
