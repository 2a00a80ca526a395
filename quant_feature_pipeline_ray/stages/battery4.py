"""Fourth indicator battery — channel / displacement analogues for the
transcript domain: Donchian channel, Ichimoku lines, ROC + Chande momentum
oscillator, and the original (pre-ATR) Keltner channel.

Like stages/battery2.py / battery3.py these fill the reference's reserved
indicator slots (`congfigs/base_indicators.yaml:36-52` ends with "more
oscillators / trend strength"; the channel family is the classic next tier)
under the same transposition discipline:

  per-turn "price" = inter-turn latency dt_us (int64 µs, 0 at conv start)

Donchian analogue (window w=20)
    dc_mid = (max_w + min_w)/2 ; dc_pos = (dt − min_w)/(max_w − min_w)
    breakout_up/down: dt strictly outside the PREVIOUS row's channel
    (lagged rolling extrema — the no-lookahead breakout definition).
    Integer extrema, one IEEE division each → bitwise DuckDB oracle.

Ichimoku analogue (9 / 26 / 52, displacement 26)
    tenkan = (max_9+min_9)/2, kijun = (max_26+min_26)/2,
    span_a = (tenkan + kijun)/2, span_b = (max_52+min_52)/2,
    chikou = dt displaced 26 turns FORWARD (lead; NULL at the segment
    tail — the only non-causal column in the battery, emitted for parity
    with the classic line set and excluded from any leak-audited contract,
    same policy as lat_lead_* in the flagship, SURVEY.md §2 W3).
    All halves of exact int64 extrema → bitwise oracle.

ROC / CMO analogue (roc_w=12, cmo_w=14)
    roc = 100·(dt − dt_{i−w})/dt_{i−w}  (0 when no full lookback or a zero
    base); cmo = 100·(Σup − Σdn)/(Σup + Σdn) over the trailing window of
    latency moves (0 on zero total movement) — Chande's bounded [−100,100]
    momentum. Integer window sums → bitwise oracle.

Keltner analogue (w=20, micro-bar m=3, mult=2)
    Chester Keltner's ORIGINAL channel (typical-price SMA ± SMA of bar
    range — no EMA/ATR recursion, so it stays window-expressible): each
    turn carries the m=3 micro-bar (h, l) as in battery3.vortex_frame;
    center = Σ_w(h+l+c) / (3n), band = mult·(Σ_w(h−l) / n),
    kc_pos = (dt − (center−band)) / ((center+band) − (center−band)).
    Explicitly-associated expressions over exact int64 sums → bitwise
    oracle (association pinned on both sides, stages/trend.py:13-24).

Every kernel is O(N) or O(N·w) vectorized numpy over one conversation-hash
bucket; nothing crosses conversation boundaries.
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


def _empty(out: pd.DataFrame, float_cols, int_cols=()) -> pd.DataFrame:
    for c in float_cols:
        out[c] = pd.Series(dtype="float64")
    for c in int_cols:
        out[c] = pd.Series(dtype="int64")
    return out


def donchian_frame(turns: pd.DataFrame, window: int = 20) -> pd.DataFrame:
    """Donchian channel midline / position + lagged-channel breakouts."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("dc_mid", "dc_pos"), ("dc_break_up", "dc_break_down"))
    conv, dt_us, new_conv, rn = _prep(turns)
    mn, mx = _rolling_minmax(conv, dt_us, window)
    rng = mx - mn
    with np.errstate(invalid="ignore", divide="ignore"):
        pos = np.where(rng > 0, (dt_us - mn) / rng, 0.0)
    mx1, ok1 = _shift_in_conv(mx, rn, 1)
    mn1, _ = _shift_in_conv(mn, rn, 1)
    out["dc_mid"] = (mx + mn) / 2.0
    out["dc_pos"] = pos
    out["dc_break_up"] = (ok1 & (dt_us > mx1)).astype(np.int64)
    out["dc_break_down"] = (ok1 & (dt_us < mn1)).astype(np.int64)
    return out


def sql_donchian(base_cte: str, window: int = 20) -> str:
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         MIN(dt_us) OVER {win} AS mn,
         MAX(dt_us) OVER {win} AS mx
  FROM t
), l AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, mn, mx,
         lag(mx) OVER cw AS mx1,
         lag(mn) OVER cw AS mn1
  FROM s WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, ts_us,
       (mx + mn) / 2.0 AS dc_mid,
       CASE WHEN mx - mn > 0
            THEN CAST(dt_us - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
            ELSE 0.0 END AS dc_pos,
       CAST(CASE WHEN mx1 IS NOT NULL AND dt_us > mx1 THEN 1 ELSE 0 END AS BIGINT) AS dc_break_up,
       CAST(CASE WHEN mn1 IS NOT NULL AND dt_us < mn1 THEN 1 ELSE 0 END AS BIGINT) AS dc_break_down
FROM l ORDER BY conv_id, turn_idx"""


def ichimoku_frame(
    turns: pd.DataFrame, p1: int = 9, p2: int = 26, p3: int = 52, disp: int = 26
) -> pd.DataFrame:
    """Ichimoku line set over the latency series (chikou is the displaced
    raw series — non-causal by definition, see module docstring)."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("tenkan", "kijun", "span_a", "span_b", "chikou"))
    conv, dt_us, new_conv, rn = _prep(turns)
    mn1, mx1 = _rolling_minmax(conv, dt_us, p1)
    mn2, mx2 = _rolling_minmax(conv, dt_us, p2)
    mn3, mx3 = _rolling_minmax(conv, dt_us, p3)
    tenkan = (mx1 + mn1) / 2.0
    kijun = (mx2 + mn2) / 2.0
    out["tenkan"] = tenkan
    out["kijun"] = kijun
    out["span_a"] = (tenkan + kijun) / 2.0
    out["span_b"] = (mx3 + mn3) / 2.0
    # chikou: dt displaced `disp` rows forward within the conversation
    n = len(dt_us)
    lead = np.full(n, np.nan)
    if n > disp:
        same = conv[disp:] == conv[:-disp]
        lead[: n - disp] = np.where(same, dt_us[disp:].astype(np.float64), np.nan)
    out["chikou"] = lead
    return out


def sql_ichimoku(
    base_cte: str, p1: int = 9, p2: int = 26, p3: int = 52, disp: int = 26
) -> str:
    def win(w):
        return (
            f"(PARTITION BY conv_id ORDER BY turn_idx "
            f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
        )

    return base_cte + f"""
, s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         MIN(dt_us) OVER {win(p1)} AS mn1, MAX(dt_us) OVER {win(p1)} AS mx1,
         MIN(dt_us) OVER {win(p2)} AS mn2, MAX(dt_us) OVER {win(p2)} AS mx2,
         MIN(dt_us) OVER {win(p3)} AS mn3, MAX(dt_us) OVER {win(p3)} AS mx3,
         CAST(lead(dt_us, {disp}) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS DOUBLE) AS chikou
  FROM t
)
SELECT conv_id, turn_idx, ts_us,
       (mx1 + mn1) / 2.0 AS tenkan,
       (mx2 + mn2) / 2.0 AS kijun,
       ((mx1 + mn1) / 2.0 + (mx2 + mn2) / 2.0) / 2.0 AS span_a,
       (mx3 + mn3) / 2.0 AS span_b,
       chikou
FROM s ORDER BY conv_id, turn_idx"""


def roc_cmo_frame(
    turns: pd.DataFrame, roc_window: int = 12, cmo_window: int = 14
) -> pd.DataFrame:
    """Rate-of-change + Chande momentum oscillator over latency moves."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("roc", "cmo"))
    conv, dt_us, new_conv, rn = _prep(turns)
    lagw, okw = _shift_in_conv(dt_us, rn, roc_window)
    with np.errstate(invalid="ignore", divide="ignore"):
        roc = np.where(okw & (lagw > 0), 100.0 * (dt_us - lagw) / lagw, 0.0)
    delta = np.diff(dt_us, prepend=dt_us[:1])
    delta[new_conv] = 0
    up = np.maximum(delta, 0)
    dn = np.maximum(-delta, 0)
    su, _ = _windowed_sum_int(up, rn, cmo_window)
    sd, _ = _windowed_sum_int(dn, rn, cmo_window)
    tot = su + sd
    with np.errstate(invalid="ignore", divide="ignore"):
        cmo = np.where(tot > 0, 100.0 * (su - sd) / tot, 0.0)
    out["roc"] = roc
    out["cmo"] = cmo
    return out


def sql_roc_cmo(base_cte: str, roc_window: int = 12, cmo_window: int = 14) -> str:
    w = cmo_window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         lag(dt_us, {roc_window}) OVER cw AS lagw,
         COALESCE(dt_us - lag(dt_us) OVER cw, 0) AS delta
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, lagw,
         SUM(greatest(delta, 0))  OVER {win} AS su,
         SUM(greatest(-delta, 0)) OVER {win} AS sd
  FROM d
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN lagw IS NOT NULL AND lagw > 0
            THEN 100.0 * CAST(dt_us - lagw AS DOUBLE) / CAST(lagw AS DOUBLE)
            ELSE 0.0 END AS roc,
       CASE WHEN su + sd > 0
            THEN 100.0 * CAST(su - sd AS DOUBLE) / CAST(su + sd AS DOUBLE)
            ELSE 0.0 END AS cmo
FROM s ORDER BY conv_id, turn_idx"""


def keltner_frame(
    turns: pd.DataFrame, window: int = 20, bar: int = 3, mult: float = 2.0
) -> pd.DataFrame:
    """Original Keltner channel over m-row micro-bars of the latency series."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("kc_center", "kc_band", "kc_pos"))
    conv, dt_us, new_conv, rn = _prep(turns)
    lo, hi = _rolling_minmax(conv, dt_us, bar)
    tp3 = hi + lo + dt_us  # 3 x typical price, exact int64
    rng = hi - lo
    s_tp, n_in = _windowed_sum_int(tp3, rn, window)
    s_r, _ = _windowed_sum_int(rng, rn, window)
    center = s_tp / (3.0 * n_in)
    band = mult * (s_r / n_in)
    lower = center - band
    upper = center + band
    dt_f = dt_us.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        pos = np.where(s_r > 0, (dt_f - lower) / (upper - lower), 0.0)
    out["kc_center"] = center
    out["kc_band"] = band
    out["kc_pos"] = pos
    return out


def sql_keltner(base_cte: str, window: int = 20, bar: int = 3, mult: float = 2.0) -> str:
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
), s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         SUM(hi + lo + dt_us) OVER {swin} AS s_tp,
         SUM(hi - lo)         OVER {swin} AS s_r,
         CAST(COUNT(*)        OVER {swin} AS BIGINT) AS n_in
  FROM b
)
SELECT conv_id, turn_idx, ts_us,
       CAST(s_tp AS DOUBLE) / (3.0 * n_in) AS kc_center,
       {mult!r} * (CAST(s_r AS DOUBLE) / CAST(n_in AS DOUBLE)) AS kc_band,
       CASE WHEN s_r > 0
            THEN (CAST(dt_us AS DOUBLE)
                  - (CAST(s_tp AS DOUBLE) / (3.0 * n_in)
                     - {mult!r} * (CAST(s_r AS DOUBLE) / CAST(n_in AS DOUBLE))))
                 / ((CAST(s_tp AS DOUBLE) / (3.0 * n_in)
                     + {mult!r} * (CAST(s_r AS DOUBLE) / CAST(n_in AS DOUBLE)))
                    - (CAST(s_tp AS DOUBLE) / (3.0 * n_in)
                       - {mult!r} * (CAST(s_r AS DOUBLE) / CAST(n_in AS DOUBLE))))
            ELSE 0.0 END AS kc_pos
FROM s ORDER BY conv_id, turn_idx"""
