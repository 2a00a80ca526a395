"""Straight-line per-conversation reference implementations (slow, obvious).

The allclose oracle for every kernel that has no SQL expression — mirrors
the reference pipeline's per-symbol pandas semantics (SURVEY.md §5: pytest
unit tests per rolling kernel vs a trivially-correct re-implementation)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def per_conv_oracle(df: pd.DataFrame, cfg) -> pd.DataFrame:
    """df: raw transcript rows. Returns a frame indexed like the engine
    output (sorted conv_id, turn_idx; dedup keep-last-by-ts) with oracle
    columns computed by plain loops/pandas built-ins per conversation."""
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df[~df.duplicated(["conv_id", "turn_idx"], keep="last")].reset_index(drop=True)
    rows = []
    for conv_id, g in df.groupby("conv_id", sort=True):
        g = g.reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        dt = np.zeros(len(g))
        dt[1:] = (ts[1:] - ts[:-1]) / 1e6
        s = pd.Series(dt)
        out = pd.DataFrame({"conv_id": conv_id, "turn_idx": g["turn_idx"], "dt_secs": dt})
        for span in cfg.ema_spans:
            alpha = 2.0 / (span + 1.0)
            ema = np.zeros(len(g))
            for i in range(len(g)):
                ema[i] = dt[i] if i == 0 else alpha * dt[i] + (1 - alpha) * ema[i - 1]
            out[f"lat_ema_{span}"] = ema
        w = cfg.rank_window
        rank = np.zeros(len(g))
        for i in range(len(g)):
            lo = max(0, i - w + 1)
            win = dt[lo : i + 1]
            r = (np.sum(win < dt[i]) + 0.5 * np.sum(win == dt[i]) + 0.5) / len(win)
            rank[i] = r
        out[f"lat_rank_{w}"] = np.clip(rank, cfg.rank_clip[0], cfg.rank_clip[1])
        # run-length persistence
        run, ev = 0, np.zeros(len(g), dtype=np.int64)
        for i in range(len(g)):
            run = run + 1 if dt[i] > cfg.gap_event_threshold_s else 0
            ev[i] = 1 if run >= cfg.gap_event_min_persist else 0
        out["gap_event"] = ev
        # sessionize
        sid, st = 0, 0
        sids, sts = [], []
        for i in range(len(g)):
            if i > 0 and dt[i] > cfg.session_gap_s:
                sid += 1
                st = 0
            st += 1
            sids.append(sid)
            sts.append(st)
        out["session_id"] = sids
        out["session_turn"] = sts
        # rolling mean/std (pandas built-ins as a second independent check).
        # lat_std is contractually the std of centisecond-quantized latency
        # (exact int64 window sums in engine and SQL), so quantize here too.
        dt_q = pd.Series(np.floor(np.round(dt * 1e6) / 1e4) / 100.0)
        for wN in cfg.sma_windows:
            out[f"lat_sma_{wN}"] = s.rolling(wN, min_periods=1).mean().to_numpy()
            out[f"lat_std_{wN}"] = (
                dt_q.rolling(wN, min_periods=1).std(ddof=1).fillna(0.0).to_numpy()
            )
        rows.append(out)
    return pd.concat(rows, ignore_index=True)
