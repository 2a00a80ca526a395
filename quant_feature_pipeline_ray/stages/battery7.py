"""Seventh indicator battery — volume-pressure and smoothed-momentum
analogues for the transcript domain: Elder's Force Index, Elder Ray
bull/bear power, and a Coppock-style dual-horizon momentum curve.

Same transposition discipline as stages/battery2-6.py:

  per-turn "price"  = inter-turn latency dt_us (int64 µs, 0 at conv start)
  per-turn "volume" = text_len (message length in chars)
  micro-bar (m=3)   = trailing {min,max} of dt_us (battery2._rolling_minmax)

Force Index (span=13)
    fr_i = text_len_i · (dt_us_i − dt_us_{i−1})   (exact int64, 0 at conv
    start; envelope: text_len ≤ ~2.2·10³, |Δdt_us| ≤ ~3·10¹⁰ ⇒ < 2⁶³)
    force = EMA_span(fr), seeded at the first row's fr. The single-register
    recursion is replayed bitwise by a WITH RECURSIVE oracle whose UNION ALL
    repeats the identical double expression (the sql_trix discipline); the
    smoothing constant is injected as CAST(2 AS DOUBLE)/CAST(14 AS DOUBLE) —
    never a bare 17-digit literal (the DECIMAL(18,17) ulp landmine,
    NOTES_ROUND3).

Elder Ray (span=13, bar=3)
    e = EMA_span(dt_us) seeded at the first row; bull = hi − e,
    bear = lo − e over the m-bar band. One recursion register; the
    subtractions are single IEEE ops on exactly-converted int64s.

Coppock analogue (r1=14, r2=11, w=10)
    The classic Coppock is WMA_10(ROC_14 + ROC_11); percent-ROC over a
    latency series divides by values that are legitimately 0, and a WMA of
    arbitrary doubles cannot carry a bitwise window-SUM oracle (DuckDB's
    float window accumulation order is unspecified). The transcript
    transposition therefore uses DIFFERENCE momentum mom_L = x − x_{−L}
    (exact int64, 0 during warm-up; the percent form already exists as
    battery4 roc): c_raw = mom_14 + mom_11, coppock = WMA_w(c_raw) via the
    battery5 two-window-sum identity — integer arithmetic end-to-end with
    ONE final division ⇒ bitwise oracle with plain window sums.

Every vectorizable part is O(N) numpy over one conversation-hash bucket;
the two EMA recursions are the only sequential folds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery2 import (
    _prep,
    _rolling_minmax,
    _shift_in_conv,
)
from quant_feature_pipeline_ray.stages.turn_features import _windowed_sum_int

_KEYS = ["conv_id", "turn_idx", "ts_us"]


def _empty(out: pd.DataFrame, float_cols=(), int_cols=()) -> pd.DataFrame:
    for c in float_cols:
        out[c] = pd.Series(dtype="float64")
    for c in int_cols:
        out[c] = pd.Series(dtype="int64")
    return out


def force_frame(turns: pd.DataFrame, span: int = 13) -> pd.DataFrame:
    """Force Index analogue: EMA(span) of text_len · Δlatency."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, (f"force_{span}",), ("fr",))
    conv, dt_us, new_conv, rn = _prep(turns)
    tl = turns["text_len"].to_numpy().astype(np.int64)
    prev, ok = _shift_in_conv(dt_us, rn, 1)
    fr = np.where(ok, tl * (dt_us - prev), 0)
    a = 2.0 / (span + 1.0)
    N = len(turns)
    force = np.empty(N)
    e = 0.0
    for i in range(N):
        if new_conv[i]:
            e = float(fr[i])
        else:
            e = e + a * (fr[i] - e)
        force[i] = e
    out["fr"] = fr
    out[f"force_{span}"] = force
    return out


def sql_force(base_cte: str, span: int = 13) -> str:
    a = f"(CAST(2 AS DOUBLE) / CAST({span + 1} AS DOUBLE))"
    en = f"(r.e + {a} * (b.frd - r.e))"
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    return rec + f"""
, d AS MATERIALIZED (
  SELECT conv_id, turn_idx, ts_us, rn, fr, CAST(fr AS DOUBLE) AS frd
  FROM (
    SELECT conv_id, turn_idx, ts_us,
           row_number() OVER cw AS rn,
           CAST(CASE WHEN row_number() OVER cw > 1
                THEN text_len * (dt_us - lag(dt_us) OVER cw) ELSE 0 END
                AS BIGINT) AS fr
    FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
  )
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn, fr, frd, frd AS e
  FROM d WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn, b.fr, b.frd, {en}
  FROM d b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, fr, e AS force_{span}
FROM r ORDER BY conv_id, turn_idx"""


def elder_frame(turns: pd.DataFrame, span: int = 13, bar: int = 3) -> pd.DataFrame:
    """Elder Ray analogue: micro-bar extremes minus the latency EMA."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, (f"ema_{span}", "bull_power", "bear_power"))
    conv, dt_us, new_conv, rn = _prep(turns)
    lo, hi = _rolling_minmax(conv, dt_us, bar)
    a = 2.0 / (span + 1.0)
    N = len(turns)
    ema = np.empty(N)
    e = 0.0
    for i in range(N):
        if new_conv[i]:
            e = float(dt_us[i])
        else:
            e = e + a * (dt_us[i] - e)
        ema[i] = e
    out[f"ema_{span}"] = ema
    out["bull_power"] = hi - ema
    out["bear_power"] = lo - ema
    return out


def sql_elder(base_cte: str, span: int = 13, bar: int = 3) -> str:
    a = f"(CAST(2 AS DOUBLE) / CAST({span + 1} AS DOUBLE))"
    en = f"(r.e + {a} * (b.dtd - r.e))"
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    bwin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {bar - 1} PRECEDING AND CURRENT ROW)"
    )
    return rec + f"""
, d AS MATERIALIZED (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         CAST(dt_us AS DOUBLE) AS dtd,
         row_number() OVER cw AS rn,
         MIN(dt_us) OVER {bwin} AS lo,
         MAX(dt_us) OVER {bwin} AS hi
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn, lo, hi, dtd, dtd AS e
  FROM d WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn, b.lo, b.hi, b.dtd, {en}
  FROM d b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, e AS ema_{span},
       hi - e AS bull_power,
       lo - e AS bear_power
FROM r ORDER BY conv_id, turn_idx"""


def coppock_frame(
    turns: pd.DataFrame, r1: int = 14, r2: int = 11, w: int = 10
) -> pd.DataFrame:
    """Coppock-style curve: truncated-recency WMA of dual-horizon momentum."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("coppock",), ("mom_sum",))
    conv, dt_us, new_conv, rn = _prep(turns)

    def mom(L: int) -> np.ndarray:
        prev, ok = _shift_in_conv(dt_us, rn, L)
        return np.where(ok, dt_us - prev, 0)

    c_raw = mom(r1) + mom(r2)
    sx, n_in = _windowed_sum_int(c_raw, rn, w)
    tx, _ = _windowed_sum_int(rn * c_raw, rn, w)
    sr, _ = _windowed_sum_int(rn, rn, w)
    num = (w - rn) * sx + tx
    den = (w - rn) * n_in + sr
    out["mom_sum"] = c_raw
    out["coppock"] = num / den
    return out


def sql_coppock(base_cte: str, r1: int = 14, r2: int = 11, w: int = 10) -> str:
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, q AS (
  SELECT conv_id, turn_idx, ts_us,
         CAST(row_number() OVER cw - 1 AS BIGINT) AS rq,
         CAST(CASE WHEN row_number() OVER cw > {r1}
              THEN dt_us - lag(dt_us, {r1}) OVER cw ELSE 0 END
            + CASE WHEN row_number() OVER cw > {r2}
              THEN dt_us - lag(dt_us, {r2}) OVER cw ELSE 0 END
              AS BIGINT) AS c_raw
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), a AS (
  SELECT conv_id, turn_idx, ts_us, c_raw,
         ({w} - rq) * SUM(c_raw)    OVER {win}
              + SUM(rq * c_raw)     OVER {win} AS num,
         ({w} - rq) * COUNT(*)      OVER {win}
              + SUM(rq)             OVER {win} AS den
  FROM q
)
SELECT conv_id, turn_idx, ts_us, c_raw AS mom_sum,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS coppock
FROM a ORDER BY conv_id, turn_idx"""
