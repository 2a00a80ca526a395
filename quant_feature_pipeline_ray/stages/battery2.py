"""Second indicator battery — the reference's *reserved* indicator slots
re-derived for the transcript domain.

The reference's indicator config reserves placeholder sections for a set of
indicators it has not implemented yet (`congfigs/base_indicators.yaml:36-52`:
volatility rv windows, roc, stochastic, volume_indicators, mfi,
linear_deviation, williams_r, cci, ultimate_oscillator). A user of the
reference switching to this engine gets them here as first-class battery
members, same transposition discipline as stages/oscillator.py and
stages/trend.py:

  per-turn "price"  = inter-turn latency dt_us (int64 µs, 0 at conv start)
  per-turn "volume" = text_len (message length in chars)

Every kernel is O(N) (or O(N·w) with w a small constant) vectorized numpy
over one conversation-hash bucket, and every emitted float is EITHER a
single IEEE division of exact int64 window sums OR an explicitly-associated
expression over such quotients — so each feature carries a bitwise DuckDB
oracle (the sql_* builders below), the same no-tolerance discipline as the
rest of the engine (stages/trend.py:13-24).

Kernels:
  stochastic_frame  %K / %D / Williams %R over rolling latency min-max
  cci_frame         commodity-channel analogue via integer-rational mean
                    absolute deviation: cci = n(nx−S) / (0.015·Σ|n·x_j−S|)
  mfi_frame         money-flow analogue: volume-weighted up/down latency
                    flow ratio, [0,100], 50 at zero flow
  obv_frame         on-balance-volume analogue: Σ sign(Δdt)·text_len
  volatility_frame  realized volatility rv_w = sqrt(Σ Δ² / n), reference
                    windows (20, 50, 100)
  linreg_frame      rolling OLS slope + deviation-from-fit via all-integer
                    numerators (linear_deviation slot)
  ultimate_frame    3-horizon buying-pressure / true-range blend (7/14/28)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.turn_features import (
    _conv_segments,
    _windowed_sum_int,
)

_KEYS = ["conv_id", "turn_idx", "ts_us"]


def _prep(turns: pd.DataFrame):
    """Shared per-bucket preamble: int64 latency series + segment geometry."""
    conv = turns["conv_id"].to_numpy()
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    new_conv, rn = _conv_segments(conv)
    return conv, dt_us, new_conv, rn


def _rolling_minmax(conv: np.ndarray, x: np.ndarray, w: int):
    """Trailing-window min/max of int64 `x` within contiguous conv segments
    (partial warm-up windows). pandas' C deque kernel; exact — every value
    round-trips float64 (|x| < 2^53 guarded by the caller's domain)."""
    s = pd.Series(x)
    g = s.groupby(pd.Series(conv), sort=False)
    mn = g.rolling(w, min_periods=1).min().to_numpy().astype(np.int64)
    mx = g.rolling(w, min_periods=1).max().to_numpy().astype(np.int64)
    return mn, mx


def _shift_in_conv(x: np.ndarray, rn: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(x shifted by k rows, valid mask) — invalid where the shift would
    cross a conversation boundary (rn < k)."""
    out = np.empty_like(x)
    if k > 0:
        out[k:] = x[:-k]
        out[:k] = 0
    else:
        out[:] = x
    return out, rn >= k


def stochastic_frame(
    turns: pd.DataFrame, window: int = 14, d_window: int = 3
) -> pd.DataFrame:
    """%K / %D / Williams %R over the rolling latency band.

    k = 100·(dt − min_w)/(max_w − min_w) ∈ [0,100] (0 on a flat band);
    %D = explicitly-associated warm-up-aware mean of the last 3 %K values
    ((k₋₂ + k₋₁) + k)/3 — the association is pinned so the SQL oracle's
    identical expression is bitwise-equal; %R = −100·(max−dt)/(max−min).
    d_window is fixed at 3 (the classic %D) for the pinned association.
    """
    assert d_window == 3, "stoch_d association is pinned for the 3-row form"
    out = turns[_KEYS].copy()
    n = len(turns)
    if n == 0:
        for c in ("stoch_k", "stoch_d", "williams_r"):
            out[c] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    mn, mx = _rolling_minmax(conv, dt_us, window)
    rng = mx - mn
    dt_f = dt_us.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        k = np.where(rng > 0, 100.0 * (dt_us - mn) / rng, 0.0)
        wr = np.where(rng > 0, -100.0 * (mx - dt_us) / rng, 0.0)
    k1, ok1 = _shift_in_conv(k, rn, 1)
    k2, ok2 = _shift_in_conv(k, rn, 2)
    d = np.where(
        ok2, ((k2 + k1) + k) / 3.0, np.where(ok1, (k1 + k) / 2.0, k)
    )
    out["stoch_k"] = k
    out["stoch_d"] = d
    out["williams_r"] = wr
    return out


def sql_stochastic(base_cte: str, window: int = 14) -> str:
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, s AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         CAST(row_number() OVER cw AS BIGINT) - 1 AS rn,
         MIN(dt_us) OVER {win} AS mn,
         MAX(dt_us) OVER {win} AS mx
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), k AS (
  SELECT conv_id, turn_idx, ts_us, rn,
         CASE WHEN mx > mn THEN 100.0 * CAST(dt_us - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE) ELSE 0.0 END AS stoch_k,
         CASE WHEN mx > mn THEN -100.0 * CAST(mx - dt_us AS DOUBLE) / CAST(mx - mn AS DOUBLE) ELSE 0.0 END AS williams_r
  FROM s
)
SELECT conv_id, turn_idx, ts_us, stoch_k,
       CASE WHEN rn >= 2 THEN ((lag(stoch_k, 2) OVER cw + lag(stoch_k, 1) OVER cw) + stoch_k) / 3.0
            WHEN rn = 1  THEN (lag(stoch_k, 1) OVER cw + stoch_k) / 2.0
            ELSE stoch_k END AS stoch_d,
       williams_r
FROM k WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
ORDER BY conv_id, turn_idx"""


def cci_frame(turns: pd.DataFrame, window: int = 14) -> pd.DataFrame:
    """CCI analogue, integer-rational exact.

    cci = (x − m)/(0.015·mad) with m = S/n and mad = (1/n²)·Σ_j|n·x_j − S|
    rewritten so the only float op is ONE division of exact int64s:
    cci = n·(n·x − S) / (0.015·M), M = Σ_{j∈win}|n·x_j − S|  (0 → cci 0).
    The inner Σ is i-dependent (n_i, S_i) so it is w shifted vectorized
    passes, not a plain window sum — O(N·w) with w=14.
    """
    out = turns[_KEYS].copy()
    n_rows = len(turns)
    if n_rows == 0:
        out["cci"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    S, n = _windowed_sum_int(dt_us, rn, window)
    M = np.zeros(n_rows, dtype=np.int64)
    for k in range(window):
        xk, ok = _shift_in_conv(dt_us, rn, k)
        M += np.where(ok, np.abs(n * xk - S), 0)
    num = n * (n * dt_us - S)
    with np.errstate(invalid="ignore", divide="ignore"):
        cci = np.where(M > 0, num / (0.015 * M), 0.0)
    out["cci"] = cci
    return out


def sql_cci(base_cte: str, window: int = 14) -> str:
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
         SUM(dt_us) OVER {win} AS S,
         CAST(COUNT(*) OVER {win} AS BIGINT) AS n
  FROM d
), m AS (
  SELECT a.conv_id, a.turn_idx, a.ts_us,
         a.n * (a.n * a.dt_us - a.S) AS num,
         SUM(abs(a.n * b.dt_us - a.S)) AS M
  FROM s a JOIN d b
    ON a.conv_id = b.conv_id AND b.rn BETWEEN a.rn - {w - 1} AND a.rn
  GROUP BY a.conv_id, a.turn_idx, a.ts_us, a.n, a.dt_us, a.S
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN M > 0 THEN CAST(num AS DOUBLE) / (0.015 * CAST(M AS DOUBLE)) ELSE 0.0 END AS cci
FROM m ORDER BY conv_id, turn_idx"""


def mfi_frame(turns: pd.DataFrame, window: int = 14) -> pd.DataFrame:
    """Money-flow analogue: flow = text_len·(dt_us // 10⁴), counted positive
    on latency up-moves, negative on down-moves (conv-start move = 0 →
    neither). mfi = 100·P/(P+N) over the trailing window, 50.0 when no flow
    moved. Centisecond quantization keeps 14·max(flow) inside int64."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        out["mfi"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    text_len = turns["text_len"].to_numpy().astype(np.int64)
    delta = np.diff(dt_us, prepend=dt_us[:1])
    delta[new_conv] = 0
    flow = text_len * (dt_us // 10_000)
    P, _ = _windowed_sum_int(np.where(delta > 0, flow, 0), rn, window)
    N, _ = _windowed_sum_int(np.where(delta < 0, flow, 0), rn, window)
    tot = P + N
    with np.errstate(invalid="ignore", divide="ignore"):
        mfi = np.where(tot > 0, 100.0 * P / tot, 50.0)
    out["mfi"] = mfi
    return out


def sql_mfi(base_cte: str, window: int = 14) -> str:
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         text_len * (dt_us // 10000) AS flow,
         COALESCE(dt_us - lag(dt_us) OVER cw, 0) AS delta
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), s AS (
  SELECT conv_id, turn_idx, ts_us,
         SUM(CASE WHEN delta > 0 THEN flow ELSE 0 END) OVER {win} AS P,
         SUM(CASE WHEN delta < 0 THEN flow ELSE 0 END) OVER {win} AS N
  FROM d
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN P + N > 0 THEN 100.0 * CAST(P AS DOUBLE) / CAST(P + N AS DOUBLE) ELSE 50.0 END AS mfi
FROM s ORDER BY conv_id, turn_idx"""


def obv_frame(turns: pd.DataFrame) -> pd.DataFrame:
    """On-balance-volume analogue: running Σ sign(Δdt)·text_len per
    conversation (int64-exact cumulative sum, reset at conv start)."""
    out = turns[_KEYS].copy()
    n = len(turns)
    if n == 0:
        out["obv"] = pd.Series(dtype="int64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    text_len = turns["text_len"].to_numpy().astype(np.int64)
    delta = np.diff(dt_us, prepend=dt_us[:1])
    delta[new_conv] = 0
    contrib = np.sign(delta) * text_len
    cs = np.cumsum(contrib)
    seg_start = np.arange(n, dtype=np.int64) - rn
    base = np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0)
    out["obv"] = cs - base
    return out


def sql_obv(base_cte: str) -> str:
    return base_cte + """
, d AS (
  SELECT conv_id, turn_idx, ts_us, text_len,
         COALESCE(dt_us - lag(dt_us) OVER cw, 0) AS delta
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, ts_us,
       SUM(CASE WHEN delta > 0 THEN text_len WHEN delta < 0 THEN -text_len ELSE 0 END)
         OVER (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv
FROM d ORDER BY conv_id, turn_idx"""


_RV_WINDOWS = (20, 50, 100)


def volatility_frame(
    turns: pd.DataFrame, windows: tuple[int, ...] = _RV_WINDOWS
) -> pd.DataFrame:
    """Realized-volatility ladder (reference volatility slot: rv_win20/50/100,
    congfigs/base_indicators.yaml:38-41): rv_w = sqrt(Σ_win Δ² / n) over
    decisecond-quantized latency moves. Exactness bound: w·max(Δds)² < 2⁶³,
    i.e. |Δdt| < ~347 days at w=100 — fail fast beyond it."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        for w in windows:
            out[f"rv_{w}"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    delta = np.diff(dt_us, prepend=dt_us[:1])
    delta[new_conv] = 0
    d_ds = np.abs(delta) // 100_000
    wmax = max(windows)
    if d_ds.size and int(d_ds.max()) > int(np.sqrt(2**63 / wmax)):
        raise ValueError("volatility_frame: |Δdt| too large for int64-exact Σ Δ²")
    sq = d_ds * d_ds
    for w in windows:
        ssq, n = _windowed_sum_int(sq, rn, w)
        out[f"rv_{w}"] = np.sqrt(ssq / n)
    return out


def sql_volatility(base_cte: str, windows: tuple[int, ...] = _RV_WINDOWS) -> str:
    cols = []
    for w in windows:
        win = (
            f"(PARTITION BY conv_id ORDER BY turn_idx "
            f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
        )
        cols.append(
            f"sqrt(CAST(SUM(sq) OVER {win} AS DOUBLE) / CAST(COUNT(*) OVER {win} AS DOUBLE)) AS rv_{w}"
        )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         (abs(COALESCE(dt_us - lag(dt_us) OVER cw, 0)) // 100000)
           * (abs(COALESCE(dt_us - lag(dt_us) OVER cw, 0)) // 100000) AS sq
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, ts_us,
       {', '.join(cols)}
FROM d ORDER BY conv_id, turn_idx"""


def linreg_frame(turns: pd.DataFrame, window: int = 14) -> pd.DataFrame:
    """Rolling OLS over the trailing window (linear_deviation slot):
    y = centisecond latency, x = 0..n−1 position inside the window.

    slope = A/B and dev = (B·(n·y − Sy) + A·(Sx − n·(n−1))) / (n·B) with
    A = n·Σxy − Sx·Sy, B = n·Σxx − Sx² all exact int64 (Σxy folded from
    window sums of rn·y and y, so no inner loop) — each output is ONE
    float division of integers. n = 1 (or a constant window) → B = 0 →
    slope = dev = 0."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        out["linreg_slope"] = pd.Series(dtype="float64")
        out["linreg_dev"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    y = dt_us // 10_000  # centiseconds: rn·y and n·Σxy stay int64-exact
    Sy, n = _windowed_sum_int(y, rn, window)
    Sry, _ = _windowed_sum_int(rn * y, rn, window)
    rs = rn - n + 1  # window-start row number
    Sxy = Sry - rs * Sy
    Sx = n * (n - 1) // 2
    Sxx = (n - 1) * n * (2 * n - 1) // 6
    A = n * Sxy - Sx * Sy
    B = n * Sxx - Sx * Sx
    Ndev = B * (n * y - Sy) + A * (Sx - n * (n - 1))
    D = n * B
    with np.errstate(invalid="ignore", divide="ignore"):
        out["linreg_slope"] = np.where(B > 0, A / B, 0.0)
        out["linreg_dev"] = np.where(D > 0, Ndev / D, 0.0)
    return out


def sql_linreg(base_cte: str, window: int = 14) -> str:
    w = window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         dt_us // 10000 AS y,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) - 1 AS rn
  FROM t
), s AS (
  SELECT conv_id, turn_idx, ts_us, y, rn,
         SUM(y) OVER {win} AS Sy,
         SUM(rn * y) OVER {win} AS Sry,
         CAST(COUNT(*) OVER {win} AS BIGINT) AS n
  FROM d
), e AS (
  SELECT conv_id, turn_idx, ts_us, y, Sy, n,
         (Sry - (rn - n + 1) * Sy) AS Sxy,
         n * (n - 1) // 2 AS Sx,
         (n - 1) * n * (2 * n - 1) // 6 AS Sxx
  FROM s
), f AS (
  SELECT conv_id, turn_idx, ts_us, y, Sy, n, Sx,
         n * Sxy - Sx * Sy AS A,
         n * Sxx - Sx * Sx AS B
  FROM e
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN B > 0 THEN CAST(A AS DOUBLE) / CAST(B AS DOUBLE) ELSE 0.0 END AS linreg_slope,
       CASE WHEN n * B > 0
            THEN CAST(B * (n * y - Sy) + A * (Sx - n * (n - 1)) AS DOUBLE) / CAST(n * B AS DOUBLE)
            ELSE 0.0 END AS linreg_dev
FROM f ORDER BY conv_id, turn_idx"""


_UO_WINDOWS = (7, 14, 28)


def ultimate_frame(
    turns: pd.DataFrame, windows: tuple[int, int, int] = _UO_WINDOWS
) -> pd.DataFrame:
    """Ultimate-oscillator analogue: the single-series degenerate has
    BP = dt − min(dt, prev) and TR = |dt − prev| (prev = dt at conv start →
    both 0). a_w = ΣBP/ΣTR per horizon (0 on a flat window);
    uo = 100·((4·a₇ + 2·a₁₄) + a₂₈)/7 — association pinned to match SQL."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        out["uo"] = pd.Series(dtype="float64")
        return out
    conv, dt_us, new_conv, rn = _prep(turns)
    prev = np.empty_like(dt_us)
    prev[1:] = dt_us[:-1]
    prev[0] = dt_us[0]
    prev[new_conv] = dt_us[new_conv]
    bp = dt_us - np.minimum(dt_us, prev)
    tr = np.abs(dt_us - prev)
    a = []
    for w in windows:
        bs, _ = _windowed_sum_int(bp, rn, w)
        ts_, _ = _windowed_sum_int(tr, rn, w)
        with np.errstate(invalid="ignore", divide="ignore"):
            a.append(np.where(ts_ > 0, bs / ts_, 0.0))
    out["uo"] = 100.0 * ((4.0 * a[0] + 2.0 * a[1]) + a[2]) / 7.0
    return out


def sql_ultimate(base_cte: str, windows: tuple[int, int, int] = _UO_WINDOWS) -> str:
    terms = []
    for w in windows:
        win = (
            f"(PARTITION BY conv_id ORDER BY turn_idx "
            f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
        )
        terms.append(
            f"CASE WHEN SUM(tr) OVER {win} > 0 "
            f"THEN CAST(SUM(bp) OVER {win} AS DOUBLE) / CAST(SUM(tr) OVER {win} AS DOUBLE) "
            f"ELSE 0.0 END"
        )
    return base_cte + f"""
, d AS (
  SELECT conv_id, turn_idx, ts_us,
         dt_us - least(dt_us, COALESCE(lag(dt_us) OVER cw, dt_us)) AS bp,
         abs(dt_us - COALESCE(lag(dt_us) OVER cw, dt_us)) AS tr
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), s AS (
  SELECT conv_id, turn_idx, ts_us,
         {terms[0]} AS a1, {terms[1]} AS a2, {terms[2]} AS a3
  FROM d
)
SELECT conv_id, turn_idx, ts_us,
       100.0 * ((4.0 * a1 + 2.0 * a2) + a3) / 7.0 AS uo
FROM s ORDER BY conv_id, turn_idx"""
