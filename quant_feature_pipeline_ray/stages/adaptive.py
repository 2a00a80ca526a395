"""Recursive adaptive smoothers — TRIX and KAMA analogues for the
transcript domain.

These are the two classic battery members whose state is a *smoothing
recursion* rather than a window expression (the reference's EMA family,
`step5_featueres_unified.py` ema spans / `congfigs/base_indicators.yaml`),
so they follow the stages/trend.py SuperTrend discipline: the vectorizable
parts (window sums, efficiency ratios, smoothing constants) are exact
integer / pinned-association kernels, and only the per-conversation
recursion itself is a sequential scan inside the conversation exchange —
state never crosses conversations, so buckets parallelize. Correctness is
pinned by a straight-line per-conversation reference in tests AND an exact
DuckDB `WITH RECURSIVE` oracle that replays the recursion one turn-level
per iteration with IDENTICAL double expressions (every add / multiply in
the same association order, so each IEEE op lands on the same bits).

  per-turn "price" = inter-turn latency dt_us (int64 µs, 0 at conv start)

TRIX analogue (span=15 → α = 2/16 = 0.125, exactly representable)
    e1 = e1' + α·(x − e1');  e2 = e2' + α·(e1 − e2');  e3 = e3' + α·(e2 − e3')
    (all seeded at x on the first turn of a conversation)
    trix = 100·(e3 − e3')/e3'   (0 on the first turn or a zero base)

KAMA analogue (er_window=10, fast=2, slow=30)
    change = |x − first(window)|  (exact int64; window = last er_window
             moves, truncated at the conversation start)
    vol    = Σ_window |Δx|        (exact int64 sum; Δ = 0 at conv start)
    er     = change / vol         (0 on zero movement)
    sc     = (er·(fsc − ssc) + ssc)²,  fsc = 2/(fast+1), ssc = 2/(slow+1)
    kama   = kama' + sc·(x − kama')   (seeded at x)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery2 import _prep, _shift_in_conv
from quant_feature_pipeline_ray.stages.turn_features import _windowed_sum_int

_KEYS = ["conv_id", "turn_idx", "ts_us"]


def trix_frame(turns: pd.DataFrame, span: int = 15) -> pd.DataFrame:
    """Triple-EMA rate of change. The only loop is the 3-register linear
    recursion (inherently sequential per conversation, like the SuperTrend
    ratchet); everything else is O(N) setup."""
    out = turns[_KEYS].copy()
    n = len(turns)
    if n == 0:
        out["trix"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    alpha = 2.0 / (span + 1.0)
    x = dt_us.astype(np.float64)
    trix = np.empty(n, dtype=np.float64)
    e1 = e2 = e3 = 0.0
    for i in range(n):
        if new_conv[i]:
            e1 = e2 = e3 = x[i]
            trix[i] = 0.0
            continue
        e3p = e3
        e1 = e1 + alpha * (x[i] - e1)
        e2 = e2 + alpha * (e1 - e2)
        e3 = e3 + alpha * (e2 - e3)
        trix[i] = 100.0 * (e3 - e3p) / e3p if e3p != 0.0 else 0.0
    out["trix"] = trix
    return out


def sql_trix(base_cte: str, span: int = 15) -> str:
    """Exact WITH RECURSIVE replay: carries (e1, e2, e3) per conversation
    and advances one turn-level per iteration (stages/trend.py:152-194
    discipline — MATERIALIZED base, join on rn + 1)."""
    a = repr(2.0 / (span + 1.0))
    e1n = f"(r.e1 + {a} * (b.dt_f - r.e1))"
    e2n = f"(r.e2 + {a} * ({e1n} - r.e2))"
    e3n = f"(r.e3 + {a} * ({e2n} - r.e3))"
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    return rec + f"""
, d AS MATERIALIZED (
  SELECT conv_id, turn_idx, ts_us, CAST(dt_us AS DOUBLE) AS dt_f,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM t
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn, dt_f,
         dt_f AS e1, dt_f AS e2, dt_f AS e3, CAST(0.0 AS DOUBLE) AS trix
  FROM d WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn, b.dt_f,
         {e1n}, {e2n}, {e3n},
         CASE WHEN r.e3 <> 0.0 THEN 100.0 * ({e3n} - r.e3) / r.e3 ELSE 0.0 END
  FROM d b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, trix
FROM r ORDER BY conv_id, turn_idx"""


def kama_frame(
    turns: pd.DataFrame, er_window: int = 10, fast: int = 2, slow: int = 30
) -> pd.DataFrame:
    """Kaufman adaptive moving average. er / sc are vectorized exact
    kernels; only the kama register recursion is a sequential scan."""
    out = turns[_KEYS].copy()
    n = len(turns)
    if n == 0:
        out["er"] = pd.Series(dtype="float64")
        out["kama"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    w = er_window
    tr = np.abs(np.diff(dt_us, prepend=dt_us[:1]))
    tr[new_conv] = 0
    vol, _ = _windowed_sum_int(tr, rn, w)
    # base of the change span: x[i-w], truncated to the conversation start
    shifted, okw = _shift_in_conv(dt_us, rn, w)
    idx = np.arange(n)
    seg_start = np.maximum.accumulate(np.where(new_conv, idx, 0))
    base = np.where(okw, shifted, dt_us[seg_start])
    change = np.abs(dt_us - base)
    with np.errstate(invalid="ignore", divide="ignore"):
        er = np.where(vol > 0, change / vol, 0.0)
    fsc = 2.0 / (fast + 1.0)
    ssc = 2.0 / (slow + 1.0)
    sc = er * (fsc - ssc) + ssc
    sc = sc * sc
    x = dt_us.astype(np.float64)
    kama = np.empty(n, dtype=np.float64)
    k = 0.0
    for i in range(n):
        k = x[i] if new_conv[i] else k + sc[i] * (x[i] - k)
        kama[i] = k
    out["er"] = er
    out["kama"] = kama
    return out


def sql_kama(base_cte: str, er_window: int = 10, fast: int = 2, slow: int = 30) -> str:
    w = er_window
    fsc = repr(2.0 / (fast + 1.0))
    ssc = repr(2.0 / (slow + 1.0))
    twin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    fwin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w} PRECEDING AND CURRENT ROW)"
    )
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    return rec + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
         abs(COALESCE(dt_us - lag(dt_us) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0)) AS tr
  FROM t
), s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, rn,
         SUM(tr) OVER {twin} AS vol,
         abs(dt_us - FIRST_VALUE(dt_us) OVER {fwin}) AS change
  FROM d
), e AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, rn,
         CASE WHEN vol > 0 THEN CAST(change AS DOUBLE) / CAST(vol AS DOUBLE)
              ELSE 0.0 END AS er
  FROM s
), b AS MATERIALIZED (
  SELECT conv_id, turn_idx, ts_us, rn, er, CAST(dt_us AS DOUBLE) AS dt_f,
         (er * ({fsc} - {ssc}) + {ssc}) * (er * ({fsc} - {ssc}) + {ssc}) AS sc
  FROM e
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn, er, dt_f AS kama
  FROM b WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn, b.er,
         r.kama + b.sc * (b.dt_f - r.kama)
  FROM b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, er, kama
FROM r ORDER BY conv_id, turn_idx"""
