"""Sixth indicator battery — distribution-shape and change-point analogues
for the transcript domain: rolling higher moments (skewness / excess
kurtosis) and a two-sided CUSUM drift detector over message length.

Fills the reference's remaining reserved statistical slots
(`congfigs/base_indicators.yaml:36-52` "distribution features / regime
detection"); same transposition discipline as stages/battery2-5.py:

  per-turn series = text_len (message length in chars, exact int64)

Rolling moments (w=20)
    The four power sums S₁..S₄ = Σ xᵏ over the trailing window are exact
    int64 (_windowed_sum_int; envelope: text_len ≤ ~2.2·10³ ⇒
    S₄ ≤ 20·(2.2·10³)⁴ ≈ 4.5·10¹⁴ < 2⁶³). Central moments come from the
    explicitly-associated float expressions
        mean = S₁/n
        m2 = S₂/n − mean·mean
        m3 = S₂/n-form:  S₃/n − (3·mean)·(S₂/n) + (2·mean)·(mean·mean)
        m4 = S₄/n − (4·mean)·(S₃/n) + (6·(mean·mean))·(S₂/n)
                   − ((3·mean)·mean)·(mean·mean)
        skew = m3 / (m2·sqrt(m2)),  kurt = m4/(m2·m2) − 3    (0 when m2 ≤ 0)
    — every IEEE op is replayed textually by the SQL oracle, so the result
    is bitwise (population moments; the n-vs-n−1 correction is a constant
    the caller can apply).

Two-sided CUSUM (k_up, k_dn, h)
    The classic recursion s_i = max(0, s_{i−1} + d_i) has the closed form
        s_i = c_i − min(0, min_{j≤i} c_j),   c = prefix-sum(d)
    (the reflected random walk is the walk minus its running minimum), so
    the detector is two vectorized prefix scans per side — NO sequential
    loop and NO recursive-CTE oracle, exact int64 end-to-end. Alarm flags
    fire while the statistic exceeds h (no reset; the flag run-length is
    the alarm duration). d_up = x − k_up (upward drift in message length),
    d_dn = k_dn − x (drying-up messages).

Defaults bracket the fixture's text_len mean (~146): k_up=180/h_up=1500 and
k_dn=140/h_dn=900 give ~4-6% alarm occupancy per side on the fixture, so
both detectors exercise their full state space in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.turn_features import (
    _conv_segments,
    _windowed_sum_int,
)

_KEYS = ["conv_id", "turn_idx", "ts_us"]


def _empty(out: pd.DataFrame, float_cols=(), int_cols=()) -> pd.DataFrame:
    for c in float_cols:
        out[c] = pd.Series(dtype="float64")
    for c in int_cols:
        out[c] = pd.Series(dtype="int64")
    return out


def moments_frame(turns: pd.DataFrame, w: int = 20) -> pd.DataFrame:
    """Rolling population skewness / excess kurtosis of text_len (w=20)."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, (f"skew_{w}", f"kurt_{w}"))
    conv = turns["conv_id"].to_numpy()
    x = turns["text_len"].to_numpy().astype(np.int64)
    _, rn = _conv_segments(conv)
    s1, n = _windowed_sum_int(x, rn, w)
    x2 = x * x
    s2, _ = _windowed_sum_int(x2, rn, w)
    s3, _ = _windowed_sum_int(x2 * x, rn, w)
    s4, _ = _windowed_sum_int(x2 * x2, rn, w)
    nf = n.astype(np.float64)
    mean = s1 / nf
    m2 = s2 / nf - mean * mean
    m3 = s3 / nf - (3.0 * mean) * (s2 / nf) + (2.0 * mean) * (mean * mean)
    m4 = (
        s4 / nf
        - (4.0 * mean) * (s3 / nf)
        + (6.0 * (mean * mean)) * (s2 / nf)
        - ((3.0 * mean) * mean) * (mean * mean)
    )
    pos = m2 > 0.0
    m2s = np.where(pos, m2, 1.0)
    out[f"skew_{w}"] = np.where(pos, m3 / (m2s * np.sqrt(m2s)), 0.0)
    out[f"kurt_{w}"] = np.where(pos, m4 / (m2s * m2s) - 3.0, 0.0)
    return out


def sql_moments(base_cte: str, w: int = 20) -> str:
    """Bitwise oracle: identical association over exact int64 window sums."""
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         CAST(SUM(text_len) OVER cw AS BIGINT) AS s1,
         CAST(SUM(text_len * text_len) OVER cw AS BIGINT) AS s2,
         CAST(SUM((text_len * text_len) * text_len) OVER cw AS BIGINT) AS s3,
         CAST(SUM((text_len * text_len) * (text_len * text_len)) OVER cw AS BIGINT) AS s4,
         CAST(COUNT(*) OVER cw AS BIGINT) AS n
  FROM t
  WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
), m AS (
  SELECT conv_id, turn_idx, ts_us,
         CAST(s2 AS DOUBLE) / n - mean * mean AS m2,
         CAST(s3 AS DOUBLE) / n - (3.0 * mean) * (CAST(s2 AS DOUBLE) / n)
           + (2.0 * mean) * (mean * mean) AS m3,
         CAST(s4 AS DOUBLE) / n - (4.0 * mean) * (CAST(s3 AS DOUBLE) / n)
           + (6.0 * (mean * mean)) * (CAST(s2 AS DOUBLE) / n)
           - ((3.0 * mean) * mean) * (mean * mean) AS m4
  FROM (SELECT *, CAST(s1 AS DOUBLE) / n AS mean FROM d)
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN m2 > 0.0 THEN m3 / (m2 * sqrt(m2)) ELSE 0.0 END AS skew_{w},
       CASE WHEN m2 > 0.0 THEN m4 / (m2 * m2) - 3.0 ELSE 0.0 END AS kurt_{w}
FROM m ORDER BY conv_id, turn_idx"""


def cusum_frame(
    turns: pd.DataFrame,
    k_up: int = 180,
    k_dn: int = 140,
    h_up: int = 1500,
    h_dn: int = 900,
) -> pd.DataFrame:
    """Two-sided CUSUM over text_len via the reflected-walk closed form."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, (), ("cusum_up", "cusum_dn", "alarm_up", "alarm_dn"))
    conv = pd.Series(turns["conv_id"].to_numpy())
    x = turns["text_len"].to_numpy().astype(np.int64)

    def side(d: np.ndarray) -> np.ndarray:
        c = pd.Series(d).groupby(conv, sort=False).cumsum().to_numpy()
        m = pd.Series(c).groupby(conv, sort=False).cummin().to_numpy()
        return c - np.minimum(m, 0)

    s_up = side(x - k_up)
    s_dn = side(k_dn - x)
    out["cusum_up"] = s_up
    out["cusum_dn"] = s_dn
    out["alarm_up"] = (s_up > h_up).astype(np.int64)
    out["alarm_dn"] = (s_dn > h_dn).astype(np.int64)
    return out


def sql_cusum(
    base_cte: str, k_up: int = 180, k_dn: int = 140, h_up: int = 1500, h_dn: int = 900
) -> str:
    """Exact-integer oracle: prefix sum minus clamped running minimum."""
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         CAST(SUM(text_len - {k_up}) OVER cw AS BIGINT) AS cu,
         CAST(SUM({k_dn} - text_len) OVER cw AS BIGINT) AS cd
  FROM t
  WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)
), e AS (
  SELECT conv_id, turn_idx, ts_us,
         cu - LEAST(CAST(0 AS BIGINT), MIN(cu) OVER cw2) AS cusum_up,
         cd - LEAST(CAST(0 AS BIGINT), MIN(cd) OVER cw2) AS cusum_dn
  FROM d
  WINDOW cw2 AS (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)
)
SELECT conv_id, turn_idx, ts_us, cusum_up, cusum_dn,
       CAST(cusum_up > {h_up} AS BIGINT) AS alarm_up,
       CAST(cusum_dn > {h_dn} AS BIGINT) AS alarm_dn
FROM e ORDER BY conv_id, turn_idx"""
