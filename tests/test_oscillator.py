"""Ratio-of-moves oscillator vs a straight-line per-row oracle."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.oscillator import oscillator_frame


def _straight_line(df, window, threshold, min_persist):
    rows = []
    for conv, g in df.groupby("conv_id", sort=False):
        dt_us = np.round(g["dt_secs"].to_numpy() * 1e6).astype(np.int64)
        delta = np.diff(dt_us, prepend=dt_us[:1])
        delta[0] = 0
        run_hi = run_lo = 0
        for i in range(len(g)):
            lo = max(0, i - window + 1)
            up = int(np.maximum(delta[lo : i + 1], 0).sum())
            down = int(np.maximum(-delta[lo : i + 1], 0).sum())
            osc = round(100.0 * (up - down) / (up + down), 6) if up + down > 0 else 0.0
            ob = int(osc >= threshold)
            os_ = int(osc <= -threshold)
            run_hi = run_hi + 1 if (ob and i > 0) else 0
            run_lo = run_lo + 1 if (os_ and i > 0) else 0
            # the kernel counts the run from the last break (or conv start),
            # and the conv-start row itself never fires
            ev = (1 if (ob and run_hi >= min_persist) else 0) - (
                1 if (os_ and run_lo >= min_persist) else 0
            )
            rows.append((conv, int(g["turn_idx"].iloc[i]), osc, ob, os_, ev))
    return pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "osc14", "osc_overbought", "osc_oversold", "osc_event"],
    )


def test_oscillator_vs_straight_line():
    rng = np.random.default_rng(29)
    rows = []
    for c in range(8):
        n = int(rng.integers(3, 150))
        dts = np.concatenate([[0], rng.integers(0, 30_000_000, n - 1)])  # us
        ts = 1_700_000_000_000_000 + np.cumsum(dts)
        for i in range(n):
            rows.append((f"c{c}", i, int(ts[i]), dts[i] / 1e6))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs"])

    got = oscillator_frame(df, window=14, threshold=40.0, min_persist=2)
    want = _straight_line(df, 14, 40.0, 2)
    merged = got.merge(want, on=["conv_id", "turn_idx"], suffixes=("", "_w"))
    assert len(merged) == len(df)
    for c in ("osc14", "osc_overbought", "osc_oversold", "osc_event"):
        a, b = merged[c].to_numpy(), merged[f"{c}_w"].to_numpy()
        assert (a == b).all(), (c, np.abs(a - b).max())


def test_oscillator_bounded_and_flagged():
    # monotonically rising latency -> osc pins at +100, overbought fires
    # after min_persist consecutive turns
    n = 10
    dt = np.arange(n, dtype=float)  # strictly increasing moves
    df = pd.DataFrame(
        {
            "conv_id": ["c"] * n,
            "turn_idx": np.arange(n),
            "ts_us": np.cumsum(dt * 1e6).astype(np.int64),
            "dt_secs": dt,
        }
    )
    out = oscillator_frame(df, window=14, threshold=40.0, min_persist=2)
    assert out["osc14"].max() <= 100.0 and out["osc14"].min() >= -100.0
    assert (out["osc14"].to_numpy()[1:] == 100.0).all()
    assert (out["osc_overbought"].to_numpy()[1:] == 1).all()
    assert out["osc_event"].to_numpy()[0] == 0
    assert (out["osc_event"].to_numpy()[3:] == 1).all()
