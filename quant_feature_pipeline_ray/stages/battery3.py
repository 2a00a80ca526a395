"""Third indicator battery — trend-location (Aroon) and trend-direction
(Vortex) analogues for the transcript domain.

Both are classic battery members the reference's indicator config reserves
room for but does not implement (`congfigs/base_indicators.yaml:36-52`
ends its placeholder list with "more oscillators / trend strength"); a
reference user migrating here gets them as first-class members under the
same transposition discipline as stages/battery2.py:

  per-turn "price" = inter-turn latency dt_us (int64 µs, 0 at conv start)

Aroon analogue (window w=25)
    k_max = rows since the MOST RECENT occurrence of the trailing-window
            max of dt_us (ties -> most recent, pinned on both sides);
    aroon_up   = 100·(n−1−k_max)/(n−1)   (100.0 when the window has 1 row)
    aroon_down = same over the window min
    aroon_osc  = aroon_up − aroon_down
    All divisions are single IEEE quotients of exact int64s; the DuckDB
    oracle resolves the argmax with a window self-join + conditional MAX
    of the row number (sql_aroon), the same discipline as battery2.sql_cci.

Vortex analogue (micro-bar m=3, window w=14)
    The single-series degenerate of Vortex (high=low=close) collapses to
    VI≡1, so each turn carries a MICRO-BAR: h = max(dt) and l = min(dt)
    over the last m=3 rows (partial warm-ups), c = dt.
    vm_plus  = |h_i − l_{i−1}|        (0 at conv start — no previous bar)
    vm_minus = |l_i − h_{i−1}|
    tr       = max(h_i, c_{i−1}) − min(l_i, c_{i−1})
    vi_plus  = Σ_w vm_plus / Σ_w tr   (0.0 on a flat window)
    vi_minus = Σ_w vm_minus / Σ_w tr
    Integer window sums, one float division each → bitwise DuckDB oracle.

Every kernel is O(N) or O(N·w) vectorized numpy over one conversation-hash
bucket; nothing crosses conversation boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery2 import _rolling_minmax, _shift_in_conv
from quant_feature_pipeline_ray.stages.turn_features import (
    _conv_segments,
    _windowed_sum_int,
)

_KEYS = ["conv_id", "turn_idx", "ts_us"]


def aroon_frame(turns: pd.DataFrame, window: int = 25) -> pd.DataFrame:
    """Aroon up/down/oscillator over the trailing latency window.

    Ties in the window extremum resolve to the MOST RECENT occurrence
    (smallest rows-since), matching sql_aroon's MAX(row_number) resolution.
    O(N·w) — w shifted vectorized passes, like battery2.cci_frame."""
    out = turns[_KEYS].copy()
    n_rows = len(turns)
    if n_rows == 0:
        for c in ("aroon_up", "aroon_down", "aroon_osc"):
            out[c] = pd.Series(dtype="float64")
        return out
    conv = turns["conv_id"].to_numpy()
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    _, rn = _conv_segments(conv)
    mn, mx = _rolling_minmax(conv, dt_us, window)
    k_max = np.full(n_rows, -1, dtype=np.int64)
    k_min = np.full(n_rows, -1, dtype=np.int64)
    for k in range(window):
        xk, ok = _shift_in_conv(dt_us, rn, k)
        hit_max = (k_max < 0) & ok & (xk == mx)
        hit_min = (k_min < 0) & ok & (xk == mn)
        k_max[hit_max] = k
        k_min[hit_min] = k
        if (k_max >= 0).all() and (k_min >= 0).all():
            break
    n = np.minimum(rn + 1, window)
    denom = (n - 1).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        up = np.where(n > 1, 100.0 * (n - 1 - k_max) / denom, 100.0)
        down = np.where(n > 1, 100.0 * (n - 1 - k_min) / denom, 100.0)
    out["aroon_up"] = up
    out["aroon_down"] = down
    out["aroon_osc"] = up - down
    return out


def sql_aroon(base_cte: str, window: int = 25) -> str:
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) - 1 AS rn
  FROM t
), s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, rn,
         MIN(dt_us) OVER {win} AS mn,
         MAX(dt_us) OVER {win} AS mx,
         CAST(COUNT(*) OVER {win} AS BIGINT) AS n
  FROM d
), m AS (
  SELECT a.conv_id, a.turn_idx, a.ts_us, a.n,
         a.rn - MAX(CASE WHEN b.dt_us = a.mx THEN b.rn END) AS kmax,
         a.rn - MAX(CASE WHEN b.dt_us = a.mn THEN b.rn END) AS kmin
  FROM s a JOIN d b
    ON a.conv_id = b.conv_id AND b.rn BETWEEN a.rn - {w - 1} AND a.rn
  GROUP BY a.conv_id, a.turn_idx, a.ts_us, a.n, a.rn, a.mx, a.mn
), r AS (
  SELECT conv_id, turn_idx, ts_us,
         CASE WHEN n > 1 THEN 100.0 * CAST(n - 1 - kmax AS DOUBLE) / CAST(n - 1 AS DOUBLE) ELSE 100.0 END AS aroon_up,
         CASE WHEN n > 1 THEN 100.0 * CAST(n - 1 - kmin AS DOUBLE) / CAST(n - 1 AS DOUBLE) ELSE 100.0 END AS aroon_down
  FROM m
)
SELECT conv_id, turn_idx, ts_us, aroon_up, aroon_down,
       aroon_up - aroon_down AS aroon_osc
FROM r ORDER BY conv_id, turn_idx"""


def vortex_frame(turns: pd.DataFrame, window: int = 14, bar: int = 3) -> pd.DataFrame:
    """Vortex VI+/VI− over micro-bars of the latency series. O(N)."""
    out = turns[_KEYS].copy()
    n_rows = len(turns)
    if n_rows == 0:
        out["vi_plus"] = pd.Series(dtype="float64")
        out["vi_minus"] = pd.Series(dtype="float64")
        return out
    conv = turns["conv_id"].to_numpy()
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    _, rn = _conv_segments(conv)
    lo, hi = _rolling_minmax(conv, dt_us, bar)
    h_prev, ok1 = _shift_in_conv(hi, rn, 1)
    l_prev, _ = _shift_in_conv(lo, rn, 1)
    c_prev, _ = _shift_in_conv(dt_us, rn, 1)
    vmp = np.where(ok1, np.abs(hi - l_prev), 0)
    vmm = np.where(ok1, np.abs(lo - h_prev), 0)
    tr = np.where(ok1, np.maximum(hi, c_prev) - np.minimum(lo, c_prev), 0)
    svmp, _ = _windowed_sum_int(vmp, rn, window)
    svmm, _ = _windowed_sum_int(vmm, rn, window)
    str_, _ = _windowed_sum_int(tr, rn, window)
    with np.errstate(invalid="ignore", divide="ignore"):
        out["vi_plus"] = np.where(str_ > 0, svmp / str_, 0.0)
        out["vi_minus"] = np.where(str_ > 0, svmm / str_, 0.0)
    return out


def sql_vortex(base_cte: str, window: int = 14, bar: int = 3) -> str:
    w, m = window, bar
    bwin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW)"
    )
    swin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, b AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         MIN(dt_us) OVER {bwin} AS lo,
         MAX(dt_us) OVER {bwin} AS hi
  FROM t
), d AS (
  SELECT conv_id, turn_idx, ts_us,
         CASE WHEN lag(hi) OVER cw IS NULL THEN 0
              ELSE abs(hi - lag(lo) OVER cw) END AS vmp,
         CASE WHEN lag(hi) OVER cw IS NULL THEN 0
              ELSE abs(lo - lag(hi) OVER cw) END AS vmm,
         CASE WHEN lag(hi) OVER cw IS NULL THEN 0
              ELSE greatest(hi, lag(dt_us) OVER cw) - least(lo, lag(dt_us) OVER cw) END AS tr
  FROM b WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), s AS (
  SELECT conv_id, turn_idx, ts_us,
         SUM(vmp) OVER {swin} AS svmp,
         SUM(vmm) OVER {swin} AS svmm,
         SUM(tr) OVER {swin} AS str
  FROM d
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN str > 0 THEN CAST(svmp AS DOUBLE) / CAST(str AS DOUBLE) ELSE 0.0 END AS vi_plus,
       CASE WHEN str > 0 THEN CAST(svmm AS DOUBLE) / CAST(str AS DOUBLE) ELSE 0.0 END AS vi_minus
FROM s ORDER BY conv_id, turn_idx"""
