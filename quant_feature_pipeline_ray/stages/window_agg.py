"""Leak-free fixed-window aggregates (W1 resample analogue).

The reference resamples 1m bars to {3m,15m,30m,2h} K-lines with
first/max/min/last/sum (step2_resample.py:220-244) — and its own TODO flags
the `closed='right'` variant as a look-ahead leak (step2_resample.py:237-239).
This engine is leak-free by construction: a window labeled W aggregates turns
with ts in [W - p, W), so every contributing row is strictly earlier than the
label, and an as-of read at ts >= W can never see the future.

window label:  w_end_us = (ts_us // p + 1) * p     (right-open, right edge)

Aggregates per (conv_id, w_end_us): turn count, tool-turn count, text chars,
latency sum/mean, first/last turn_idx — integer sums, so the DuckDB GROUP BY
oracle matches bitwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def window_end_us(ts_us: np.ndarray, window_s: int) -> np.ndarray:
    p = np.int64(window_s) * 1_000_000
    return (ts_us // p + 1) * p


def window_aggregate_frame(turns: pd.DataFrame, window_s: int) -> pd.DataFrame:
    """Per-(conv_id, window) aggregates from a turn-feature frame.

    `turns` must carry conv_id, ts_us, dt_secs-producing dt (we re-derive the
    integer sum from ts ordering), is_tool, text_len, turn_idx.
    """
    w_end = window_end_us(turns["ts_us"].to_numpy(), window_s)
    df = pd.DataFrame(
        {
            "conv_id": turns["conv_id"].to_numpy(),
            "w_end_us": w_end,
            "is_tool": turns["is_tool"].to_numpy(),
            "text_len": turns["text_len"].to_numpy(),
            "turn_idx": turns["turn_idx"].to_numpy().astype(np.int64),
            "dt_us": (turns["dt_secs"].to_numpy() * 1e6).round().astype(np.int64),
        }
    )
    g = df.groupby(["conv_id", "w_end_us"], sort=True, as_index=False)
    agg = g.agg(
        turns=("turn_idx", "size"),
        tool_turns=("is_tool", "sum"),
        text_chars=("text_len", "sum"),
        dt_sum_us=("dt_us", "sum"),
        first_turn=("turn_idx", "min"),
        last_turn=("turn_idx", "max"),
    )
    agg["dt_mean"] = agg["dt_sum_us"] / (agg["turns"] * 1e6)
    agg["turns"] = agg["turns"].astype(np.int64)
    agg["tool_turns"] = agg["tool_turns"].astype(np.int64)
    agg["text_chars"] = agg["text_chars"].astype(np.int64)
    agg["dt_sum_us"] = agg["dt_sum_us"].astype(np.int64)
    return agg
