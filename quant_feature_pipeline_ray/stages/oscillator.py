"""Bounded ratio-of-moves oscillator (the reference's RSI contract).

Reference semantics re-derived for the transcript domain: the reference
ships a 4-column RSI contract — a bounded oscillator in [-100, +100] with
threshold +/-40 events that fire only after `min_persist` consecutive
over-threshold turns, plus raw overbought/oversold flags
(`rsi14/rsi_event/rsi_overbought/rsi_oversold`; 📊 重塑 rsi.md:9-12,
verify_rsi_realtime.py:54, step5_featueres_unified.py:907-1008, params
congfigs/base_indicators.yaml:19-25).

Transposed to inter-turn dynamics: the "move" is the change in inter-turn
latency, delta_i = dt_us_i − dt_us_{i−1} within a conversation (first turn
of a conv has delta 0 — the same convention as dt itself). Over the
trailing `window` turns

    up   = Σ max(delta, 0)        (integer µs — exact in int64)
    down = Σ max(−delta, 0)
    osc  = 100·(up − down) / (up + down)   ∈ [−100, +100]; 0 when flat

so osc > 0 means latency has been predominantly RISING over the window
(the conversation is slowing down), osc < 0 falling. Events:

    osc_overbought = 1 iff osc >=  +threshold        (raw flag)
    osc_oversold   = 1 iff osc <=  −threshold
    osc_event      = +1 / −1 iff the flag held for >= min_persist
                     consecutive turns (run-length persistence — the same
                     _run_length_event machinery as gap_event / W11)

Numerical-parity discipline: up/down are exact int64 window sums; osc is
ONE float64 division of exact integers (100·(up−down) < 2^53 for any sane
latency), so the DuckDB window-sum oracle matches bitwise; round(...,6)
on both sides absorbs nothing but belt-and-braces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.turn_features import (
    _conv_segments,
    _run_length_event,
    _windowed_sum_int,
)


def oscillator_frame(
    turns: pd.DataFrame,
    window: int = 14,
    threshold: float = 40.0,
    min_persist: int = 2,
) -> pd.DataFrame:
    """One bucket of compute_turn_features output (sorted by conv, turn) →
    the 4-column oscillator contract. O(N) numpy; no per-row Python."""
    n = len(turns)
    out = turns[["conv_id", "turn_idx", "ts_us"]].copy()
    if n == 0:
        out["osc14"] = pd.Series(dtype="float64")
        out["osc_overbought"] = pd.Series(dtype="int64")
        out["osc_oversold"] = pd.Series(dtype="int64")
        out["osc_event"] = pd.Series(dtype="int64")
        return out

    conv = turns["conv_id"].to_numpy()
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    new_conv, rn = _conv_segments(conv)

    # latency move: delta_i = dt_i - dt_{i-1} within conv, 0 at conv start
    delta = np.diff(dt_us, prepend=dt_us[:1])
    delta[new_conv] = 0

    up, _ = _windowed_sum_int(np.maximum(delta, 0), rn, window)
    down, _ = _windowed_sum_int(np.maximum(-delta, 0), rn, window)
    tot = up + down
    with np.errstate(invalid="ignore", divide="ignore"):
        osc = np.where(tot > 0, np.round(100.0 * (up - down) / tot, 6), 0.0)

    overbought = (osc >= threshold).astype(np.int64)
    oversold = (osc <= -threshold).astype(np.int64)
    ev_hi = _run_length_event(overbought.astype(bool), conv, min_persist)
    ev_lo = _run_length_event(oversold.astype(bool), conv, min_persist)
    out["osc14"] = osc
    out["osc_overbought"] = overbought
    out["osc_oversold"] = oversold
    out["osc_event"] = ev_hi - ev_lo  # flags are mutually exclusive
    return out


def sql_oscillator(
    base_cte: str,
    window: int = 14,
    threshold: float = 40.0,
    min_persist: int = 2,
) -> str:
    """DuckDB oracle: the identical integer window sums + the identical
    float expression; persistence via the same running-break-count trick
    as the gap_event oracle (oracle.sql_rolling)."""
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         COALESCE(dt_us - lag(dt_us) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0) AS delta
  FROM t
), s AS (
  SELECT conv_id, turn_idx, ts_us,
         SUM(greatest(delta, 0))  OVER {win} AS up,
         SUM(greatest(-delta, 0)) OVER {win} AS down
  FROM d
), o AS (
  SELECT conv_id, turn_idx, ts_us,
         CASE WHEN up + down > 0
              THEN round(100.0 * (up - down) / (up + down), 6) ELSE 0.0 END AS osc14
  FROM s
), f AS (
  SELECT *,
         CAST(osc14 >=  {threshold} AS BIGINT) AS osc_overbought,
         CAST(osc14 <= -{threshold} AS BIGINT) AS osc_oversold
  FROM o
), runs AS (
  SELECT *,
         SUM(CASE WHEN osc_overbought = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS _ghi,
         SUM(CASE WHEN osc_oversold = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS _glo
  FROM f
)
SELECT conv_id, turn_idx, ts_us, osc14, osc_overbought, osc_oversold,
       CAST(CASE WHEN osc_overbought = 1
                  AND row_number() OVER (PARTITION BY conv_id, _ghi ORDER BY turn_idx) - 1
                      >= {min_persist} THEN 1 ELSE 0 END
          - CASE WHEN osc_oversold = 1
                  AND row_number() OVER (PARTITION BY conv_id, _glo ORDER BY turn_idx) - 1
                      >= {min_persist} THEN 1 ELSE 0 END AS BIGINT) AS osc_event
FROM runs ORDER BY conv_id, turn_idx"""
