"""Boundary-anchored momentum family vs a straight-line per-row oracle."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.momentum import rolling_window_momentum


def _straight_line(df, p_s, L, a_s):
    p, a = p_s * 1_000_000, a_s * 1_000_000
    rows = []
    for conv, g in df.groupby("conv_id", sort=False):
        ts = g["ts_us"].to_numpy()
        x = g["dt_secs"].to_numpy()
        dt_us = np.round(x * 1e6).astype(np.int64)
        w = (ts - a) // p
        for i in range(len(g)):
            # point
            cand = np.flatnonzero(ts <= ts[i] - L * p)
            mp, hp = (x[i] - x[cand[-1]], 1) if len(cand) else (0.0, 0)
            # boundary
            cand2 = np.flatnonzero(w <= w[i] - L)
            mb, hb = (x[i] - x[cand2[-1]], 1) if len(cand2) else (0.0, 0)
            # intra_avg
            inw = np.flatnonzero(w == w[i] - L)
            if len(inw):
                ref = dt_us[inw].sum() / (len(inw) * 1e6)
                mi, hi = x[i] - ref, 1
            else:
                mi, hi = 0.0, 0
            rows.append((conv, int(g["turn_idx"].iloc[i]), mp, hp, mb, hb, mi, hi))
    return pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "mom_point", "hit_point",
                 "mom_boundary", "hit_boundary", "mom_intra", "hit_intra"],
    )


def test_momentum_all_methods_vs_straight_line():
    rng = np.random.default_rng(17)
    rows = []
    for c in range(6):
        n = int(rng.integers(5, 120))
        dts = np.concatenate([[0], rng.integers(0, 400_000_000, n - 1)])  # us
        ts = 1_700_000_000_000_000 + np.cumsum(dts)
        for i in range(n):
            rows.append((f"c{c}", i, int(ts[i]), dts[i] / 1e6))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs"])

    got = rolling_window_momentum(df, period_s=120, lookback=3, anchor_offset_s=30)
    want = _straight_line(df, 120, 3, 30)
    merged = got.merge(want, on=["conv_id", "turn_idx"], suffixes=("", "_w"))
    assert len(merged) == len(df)
    for m in ("point", "boundary", "intra"):
        assert (merged[f"hit_{m}"].to_numpy() == merged[f"hit_{m}_w"].to_numpy()).all(), m
        a = merged[f"mom_{m}"].to_numpy()
        b = merged[f"mom_{m}_w"].to_numpy()
        assert (a == b).all(), (m, np.abs(a - b).max())


def test_momentum_empty_and_single_row():
    empty = pd.DataFrame(
        {"conv_id": pd.Series(dtype=object), "turn_idx": pd.Series(dtype="int64"),
         "ts_us": pd.Series(dtype="int64"), "dt_secs": pd.Series(dtype="float64")}
    )
    out = rolling_window_momentum(empty)
    assert len(out) == 0 and "mom_point" in out.columns
    one = pd.DataFrame(
        {"conv_id": ["c"], "turn_idx": [0], "ts_us": [1_700_000_000_000_000],
         "dt_secs": [0.0]}
    )
    out1 = rolling_window_momentum(one)
    assert out1["hit_point"].tolist() == [0] and out1["mom_point"].tolist() == [0.0]
