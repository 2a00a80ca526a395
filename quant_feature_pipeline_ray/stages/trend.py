"""ATR / SuperTrend analogues — the last two members of the reference's
Step3 indicator battery (W12) re-derived for the transcript domain.

Reference observable contract (implementation external to the reference
repo): ATR(14) + `atr_pct`, SuperTrend(10, 3.0) -> `supertrend_direction`
(params `congfigs/base_indicators.yaml:1-52`, enabled list
`congfigs/main_config.yaml:100`, invoked `step3_generate_indicators.py:240,
259`).

Transcript transposition (same discipline as stages/oscillator.py): the
per-turn series is inter-turn latency `dt_us` (int64 µs, 0 at conv start).

ATR analogue
    tr_i  = |dt_i − dt_{i−1}|  within a conversation (0 at conv start) —
            the single-series degenerate of true range (no high/low here)
    atr   = trailing-window mean of tr (exact int64 window sum, partial
            warm-up windows like the reference's expanding-start SMA, W8)
    atr_pct = atr / sma(dt) over the same window (the `atr_pct = atr/close`
            shape), 0 when the latency mean is 0
    Both are ONE raw float division of exact int64 sums → bitwise DuckDB
    window-sum oracle. NO round(): tr_sum/n_in is a small-denominator
    rational that lands on .5 ties constantly, where numpy (half-even)
    and DuckDB (half-away) disagree; the unrounded IEEE quotient of the
    same integers is bitwise-identical on both sides.

SuperTrend analogue (recursive — the battery's only band-ratchet state)
    mid   = sma_w(dt);  basic bands  bu = mid + m·atr,  bl = mid − m·atr
    final_ub_i = bu_i  if bu_i < final_ub_{i−1} or dt_{i−1} > final_ub_{i−1}
                 else final_ub_{i−1}                       (upper ratchets DOWN)
    final_lb_i = bl_i  if bl_i > final_lb_{i−1} or dt_{i−1} < final_lb_{i−1}
                 else final_lb_{i−1}                       (lower ratchets UP)
    dir_i = +1 if dt_i > final_ub_i; −1 if dt_i < final_lb_i;
            else dir_{i−1}   (dir_0 = +1 — "latency trending up" = slowing)
    The ratchet recursion is data-dependent and strictly sequential per
    conversation — the one battery member that cannot be a window
    expression. It runs as a per-bucket scan inside the conversation
    exchange (state never crosses conversations, so buckets parallelize);
    correctness is pinned by a straight-line per-conversation reference in
    tests AND an exact DuckDB `WITH RECURSIVE` oracle (sql_supertrend) that
    replays the ratchet one turn-level per iteration — the same recursive-
    CTE discipline as the doc_dup_clusters connected-components oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.turn_features import (
    _conv_segments,
    _windowed_sum_int,
)


def atr_frame(turns: pd.DataFrame, window: int = 14) -> pd.DataFrame:
    """One bucket of compute_turn_features output → (atr, atr_pct). O(N)."""
    out = turns[["conv_id", "turn_idx", "ts_us"]].copy()
    n = len(turns)
    if n == 0:
        out["atr14"] = pd.Series(dtype="float64")
        out["atr_pct"] = pd.Series(dtype="float64")
        return out
    conv = turns["conv_id"].to_numpy()
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    new_conv, rn = _conv_segments(conv)
    tr = np.abs(np.diff(dt_us, prepend=dt_us[:1]))
    tr[new_conv] = 0
    tr_sum, n_in = _windowed_sum_int(tr, rn, window)
    dt_sum, _ = _windowed_sum_int(dt_us, rn, window)
    atr = tr_sum / (n_in * 1e6)  # seconds
    with np.errstate(invalid="ignore", divide="ignore"):
        atr_pct = np.where(dt_sum > 0, tr_sum / dt_sum, 0.0)
    out["atr14"] = atr
    out["atr_pct"] = atr_pct
    return out


def sql_atr(base_cte: str, window: int = 14) -> str:
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         dt_us,
         abs(COALESCE(dt_us - lag(dt_us) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0)) AS tr
  FROM t
), s AS (
  SELECT conv_id, turn_idx, ts_us,
         SUM(tr)    OVER {win} AS tr_sum,
         SUM(dt_us) OVER {win} AS dt_sum,
         COUNT(*)   OVER {win} AS n_in
  FROM d
)
SELECT conv_id, turn_idx, ts_us,
       CAST(tr_sum AS DOUBLE) / (n_in * 1000000.0) AS atr14,
       CASE WHEN dt_sum > 0 THEN CAST(tr_sum AS DOUBLE) / CAST(dt_sum AS DOUBLE) ELSE 0.0 END AS atr_pct
FROM s ORDER BY conv_id, turn_idx"""


def supertrend_frame(
    turns: pd.DataFrame, window: int = 10, mult: float = 3.0
) -> pd.DataFrame:
    """One bucket → supertrend_direction ∈ {+1, −1} with ratcheting bands.

    The band inputs (mid, atr) are the vectorized kernels above; only the
    ratchet/direction recursion is a sequential scan (restarted at each
    conversation boundary — `new_conv` resets the carried state)."""
    out = turns[["conv_id", "turn_idx", "ts_us"]].copy()
    n = len(turns)
    if n == 0:
        out["supertrend_direction"] = pd.Series(dtype="int64")
        return out
    conv = turns["conv_id"].to_numpy()
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    new_conv, rn = _conv_segments(conv)
    tr = np.abs(np.diff(dt_us, prepend=dt_us[:1]))
    tr[new_conv] = 0
    tr_sum, n_in = _windowed_sum_int(tr, rn, window)
    dt_sum, _ = _windowed_sum_int(dt_us, rn, window)
    mid = dt_sum / n_in
    atr = tr_sum / n_in
    bu = mid + mult * atr
    bl = mid - mult * atr

    # float math written to be IEEE-identical to sql_supertrend:
    # mid/atr are each ONE double division of exact int64 window sums;
    # bu/bl are mid ± (mult · atr) in that association order.
    direction = np.empty(n, dtype=np.int64)
    dt_f = dt_us.astype(np.float64)
    fub = flb = 0.0
    prev_dt = 0.0
    d = 1
    for i in range(n):
        if new_conv[i]:
            fub, flb, d = bu[i], bl[i], 1
        else:
            fub = bu[i] if (bu[i] < fub or prev_dt > fub) else fub
            flb = bl[i] if (bl[i] > flb or prev_dt < flb) else flb
            if dt_f[i] > fub:
                d = 1
            elif dt_f[i] < flb:
                d = -1
        direction[i] = d
        prev_dt = dt_f[i]
    out["supertrend_direction"] = direction
    return out


def sql_supertrend(base_cte: str, window: int = 10, mult: float = 3.0) -> str:
    """Exact DuckDB oracle for the ratchet recursion: a WITH RECURSIVE scan
    that advances every conversation by one turn per iteration (working
    table = previous level only), carrying (final_ub, final_lb, dir,
    prev dt). Band inputs use the identical double expressions as
    supertrend_frame, so every float comparison takes the same branch."""
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    return rec + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
         abs(COALESCE(dt_us - lag(dt_us) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0)) AS tr
  FROM t
), b AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: DuckDB otherwise inlines the whole
  -- parquet-read + window chain into the recursive branch and re-evaluates
  -- it once per recursion level (= max conversation length, ~4e3 here)
  SELECT conv_id, turn_idx, ts_us, rn,
         CAST(dt_us AS DOUBLE) AS dt_f,
         CAST(SUM(dt_us) OVER {win} AS DOUBLE) / CAST(COUNT(*) OVER {win} AS DOUBLE)
           + {mult!r} * (CAST(SUM(tr) OVER {win} AS DOUBLE) / CAST(COUNT(*) OVER {win} AS DOUBLE)) AS bu,
         CAST(SUM(dt_us) OVER {win} AS DOUBLE) / CAST(COUNT(*) OVER {win} AS DOUBLE)
           - {mult!r} * (CAST(SUM(tr) OVER {win} AS DOUBLE) / CAST(COUNT(*) OVER {win} AS DOUBLE)) AS bl
  FROM d
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn, dt_f, bu AS fub, bl AS flb, 1 AS dir
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn, b.dt_f,
         CASE WHEN b.bu < r.fub OR r.dt_f > r.fub THEN b.bu ELSE r.fub END,
         CASE WHEN b.bl > r.flb OR r.dt_f < r.flb THEN b.bl ELSE r.flb END,
         CASE WHEN b.dt_f > (CASE WHEN b.bu < r.fub OR r.dt_f > r.fub THEN b.bu ELSE r.fub END) THEN 1
              WHEN b.dt_f < (CASE WHEN b.bl > r.flb OR r.dt_f < r.flb THEN b.bl ELSE r.flb END) THEN -1
              ELSE r.dir END
  FROM b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, CAST(dir AS BIGINT) AS supertrend_direction
FROM r ORDER BY conv_id, turn_idx"""
