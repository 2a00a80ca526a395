"""Fifth indicator battery — trend-strength and flow-accumulation analogues
for the transcript domain: ADX/DMI (Wilder), weighted / Hull moving
averages, and the Chaikin accumulation-distribution line + oscillator.

Together with stages/battery2-4.py these complete the classic indicator
tier the reference reserves slots for (`congfigs/base_indicators.yaml:36-52`
"more oscillators / trend strength"); ADX *is* the canonical trend-strength
member. Same transposition discipline as stages/oscillator.py /
stages/trend.py:

  per-turn "price"  = inter-turn latency dt_us (int64 µs, 0 at conv start)
  per-turn "volume" = text_len (message length in chars)
  micro-bar (m=3)   = trailing {min,max} of dt_us, as in battery3.vortex

ADX / DMI analogue (n=14, micro-bar m=3)
    up = hi − hi₋₁ ; dn = lo₋₁ − lo   (0 at conversation starts)
    +DM = up·[up>dn ∧ up>0] ; −DM = dn·[dn>up ∧ dn>0]   (exact int64)
    TR  = max(hi−lo, |hi−c₋₁|, |lo−c₋₁|)                (exact int64)
    Wilder smoothing s ← s + α(x − s), α = 1/n, per conversation; at a
    conversation's first row the m-bar is a single point (hi=lo=c), so
    +DM=−DM=TR=0 and every register seeds at 0.
    +DI = 100·s₊/s_TR (0 on zero TR), −DI likewise,
    DX  = 100·|+DI − −DI|/(+DI + −DI) (0 on zero sum), ADX ← ADX + α(DX−ADX).
    The three-register recursion is sequential per conversation (the
    stages/adaptive.py discipline); the DuckDB oracle replays it with a
    WITH RECURSIVE whose UNION ALL repeats IDENTICAL double expressions, so
    every IEEE op lands on the same bits.

WMA / HMA analogue (w=10, half h=5, outer s=3)
    Truncated-recency weights: the row at lag j gets weight (w − j), so a
    warm-up row with only k<w predecessors uses weights w..w−k+1. The
    windowed weighted sum is computed WITHOUT a self-join via the identity
        Σ_b (w − (rnₐ − rn_b))·x_b = (w − rnₐ)·Σx + Σ(rn_b·x_b)
    — two exact int64 window sums (rn is the 0-based row number within the
    conversation). wma = num/den is one IEEE division of exact integers.
    hma (Hull) is emitted only where every constituent window is full
    (rn ≥ w+s−2, flagged by hma_ok): there the denominators are constants
    (den_w=Σ1..w=55, den_h=15, den_s=6), so
        raw_int = 2·num_h·den_w − num_w·den_h          (exact int64)
        hma     = wma_s(raw_int) / (den_s·den_h·den_w) = num_o / 4950.0
    — integer arithmetic end-to-end with ONE final division → bitwise
    oracle. int64 envelope: dt_us < 2⁴⁵ and conversation length < 2¹⁵ keep
    every product under 2⁶² (fixtures: dt_us ≤ ~3·10¹⁰, convs ≤ ~10³).

Chaikin A/D analogue (micro-bar m=3, spans 3/10)
    mult = (2c − hi − lo)/(hi − lo)  (0 when hi=lo; ONE IEEE division of
           exact int64s) ;  mfv = mult · text_len
    adl  = per-conversation running sum of mfv (sequential fold)
    chaikin = ema₃(adl) − ema₁₀(adl), both registers seeded at the first
    row's adl. The (adl, e3, e10) recursion is replayed bitwise by the
    recursive-CTE oracle exactly as in sql_trix.

Every vectorizable part is O(N) or O(N·w) numpy over one conversation-hash
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


def adx_frame(turns: pd.DataFrame, n: int = 14, bar: int = 3) -> pd.DataFrame:
    """Directional movement (+DI/−DI) and ADX over latency micro-bars."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("di_plus", "di_minus", "adx"))
    conv, dt_us, new_conv, rn = _prep(turns)
    lo, hi = _rolling_minmax(conv, dt_us, bar)
    hi1, ok1 = _shift_in_conv(hi, rn, 1)
    lo1, _ = _shift_in_conv(lo, rn, 1)
    c1, _ = _shift_in_conv(dt_us, rn, 1)
    up = np.where(ok1, hi - hi1, 0)
    dn = np.where(ok1, lo1 - lo, 0)
    pdm = np.where((up > dn) & (up > 0), up, 0).astype(np.float64)
    ndm = np.where((dn > up) & (dn > 0), dn, 0).astype(np.float64)
    tr = np.where(
        ok1,
        np.maximum(hi - lo, np.maximum(np.abs(hi - c1), np.abs(lo - c1))),
        hi - lo,
    ).astype(np.float64)
    alpha = 1.0 / n
    N = len(turns)
    dip = np.empty(N)
    din = np.empty(N)
    adx = np.empty(N)
    sp = sn = st = ax = 0.0
    for i in range(N):
        if new_conv[i]:
            # first m-bar is a single point: pdm=ndm=tr=0 (asserted by
            # construction above) — all registers seed at 0
            sp = sn = st = ax = 0.0
            dip[i] = din[i] = adx[i] = 0.0
            continue
        sp = sp + alpha * (pdm[i] - sp)
        sn = sn + alpha * (ndm[i] - sn)
        st = st + alpha * (tr[i] - st)
        p = 100.0 * sp / st if st > 0.0 else 0.0
        q = 100.0 * sn / st if st > 0.0 else 0.0
        dx = 100.0 * abs(p - q) / (p + q) if p + q > 0.0 else 0.0
        ax = ax + alpha * (dx - ax)
        dip[i] = p
        din[i] = q
        adx[i] = ax
    out["di_plus"] = dip
    out["di_minus"] = din
    out["adx"] = adx
    return out


def sql_adx(base_cte: str, n: int = 14, bar: int = 3) -> str:
    """Exact WITH RECURSIVE replay of the 4-register Wilder recursion
    (stages/adaptive.py:72-97 discipline — MATERIALIZED base, rn+1 join,
    textual duplication pins every IEEE op's association).

    Smoothing constants are injected as CAST(i AS DOUBLE)/CAST(j AS DOUBLE)
    — NOT as repr() literals: DuckDB parses a bare 17-significant-digit
    literal as DECIMAL(18,17), whose mantissa exceeds 2^53, and the
    decimal→double conversion lands one ulp away from Python's correctly
    rounded parse (observed: 0.18181818181818182 → 20.54545454545455·113
    vs 20.545454545454547). The division form reproduces the Python
    constant bit-for-bit."""
    a = f"(CAST(1 AS DOUBLE) / CAST({n} AS DOUBLE))"
    m = bar
    bwin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW)"
    )
    spn = f"(r.sp + {a} * (b.pdm - r.sp))"
    snn = f"(r.sn + {a} * (b.ndm - r.sn))"
    stn = f"(r.st + {a} * (b.tr - r.st))"
    dipn = f"(CASE WHEN {stn} > 0.0 THEN 100.0 * {spn} / {stn} ELSE 0.0 END)"
    dinn = f"(CASE WHEN {stn} > 0.0 THEN 100.0 * {snn} / {stn} ELSE 0.0 END)"
    dxn = (
        f"(CASE WHEN {dipn} + {dinn} > 0.0 "
        f"THEN 100.0 * abs({dipn} - {dinn}) / ({dipn} + {dinn}) ELSE 0.0 END)"
    )
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    return rec + f"""
, bb AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         row_number() OVER cw AS rn,
         MIN(dt_us) OVER {bwin} AS lo,
         MAX(dt_us) OVER {bwin} AS hi
  FROM t WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx)
), d AS MATERIALIZED (
  -- NOTE: WITH RECURSIVE flattens window namespaces across CTEs in DuckDB,
  -- so this window must NOT reuse bb's name
  SELECT conv_id, turn_idx, ts_us, rn,
         CAST(CASE WHEN rn > 1 AND (hi - lag(hi) OVER cw2) > (lag(lo) OVER cw2 - lo)
                        AND (hi - lag(hi) OVER cw2) > 0
              THEN hi - lag(hi) OVER cw2 ELSE 0 END AS DOUBLE) AS pdm,
         CAST(CASE WHEN rn > 1 AND (lag(lo) OVER cw2 - lo) > (hi - lag(hi) OVER cw2)
                        AND (lag(lo) OVER cw2 - lo) > 0
              THEN lag(lo) OVER cw2 - lo ELSE 0 END AS DOUBLE) AS ndm,
         CAST(CASE WHEN rn > 1
              THEN greatest(hi - lo, abs(hi - lag(dt_us) OVER cw2),
                            abs(lo - lag(dt_us) OVER cw2))
              ELSE hi - lo END AS DOUBLE) AS tr
  FROM bb WINDOW cw2 AS (PARTITION BY conv_id ORDER BY turn_idx)
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn,
         CAST(0.0 AS DOUBLE) AS sp, CAST(0.0 AS DOUBLE) AS sn,
         CAST(0.0 AS DOUBLE) AS st, CAST(0.0 AS DOUBLE) AS adx,
         CAST(0.0 AS DOUBLE) AS di_plus, CAST(0.0 AS DOUBLE) AS di_minus
  FROM d WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn,
         {spn}, {snn}, {stn},
         (r.adx + {a} * ({dxn} - r.adx)),
         {dipn}, {dinn}
  FROM d b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, di_plus, di_minus, adx
FROM r ORDER BY conv_id, turn_idx"""


def wma_frame(turns: pd.DataFrame, w: int = 10, h: int = 5, s: int = 3) -> pd.DataFrame:
    """Truncated-recency WMA + full-window Hull MA, all-integer numerators."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("wma", "hma"), ("hma_ok",))
    conv, dt_us, new_conv, rn = _prep(turns)

    def _wnum(x: np.ndarray, win: int) -> tuple[np.ndarray, np.ndarray]:
        # Σ_b (win − (rn_a − rn_b))·x_b over the trailing window, via the
        # two-window-sum identity in the module docstring — no self-join
        sx, n_in = _windowed_sum_int(x, rn, win)
        tx, _ = _windowed_sum_int(rn * x, rn, win)
        sr, _ = _windowed_sum_int(rn, rn, win)
        num = (win - rn) * sx + tx
        den = (win - rn) * n_in + sr
        return num, den

    numw, denw = _wnum(dt_us, w)
    numh, _ = _wnum(dt_us, h)
    den_w = w * (w + 1) // 2
    den_h = h * (h + 1) // 2
    den_s = s * (s + 1) // 2
    r_int = 2 * numh * den_w - numw * den_h
    numo, _ = _wnum(r_int, s)
    full = rn >= (w + s - 2)
    out["wma"] = numw / denw
    out["hma"] = np.where(full, numo / float(den_s * den_h * den_w), 0.0)
    out["hma_ok"] = full.astype(np.int64)
    return out


def sql_wma(base_cte: str, w: int = 10, h: int = 5, s: int = 3) -> str:
    den_w = w * (w + 1) // 2
    den_h = h * (h + 1) // 2
    den_s = s * (s + 1) // 2

    def win(k):
        return (
            f"(PARTITION BY conv_id ORDER BY turn_idx "
            f"ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)"
        )

    return base_cte + f"""
, q AS (
  SELECT conv_id, turn_idx, ts_us, dt_us,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
              AS BIGINT) AS rq
  FROM t
), a AS (
  SELECT conv_id, turn_idx, ts_us, rq,
         ({w} - rq) * SUM(dt_us)      OVER {win(w)}
              + SUM(rq * dt_us)       OVER {win(w)} AS numw,
         ({w} - rq) * COUNT(*)        OVER {win(w)}
              + SUM(rq)               OVER {win(w)} AS denw,
         ({h} - rq) * SUM(dt_us)      OVER {win(h)}
              + SUM(rq * dt_us)       OVER {win(h)} AS numh
  FROM q
), b AS (
  SELECT conv_id, turn_idx, ts_us, rq, numw, denw,
         2 * numh * {den_w} - numw * {den_h} AS r_int
  FROM a
), c AS (
  SELECT conv_id, turn_idx, ts_us, rq, numw, denw,
         ({s} - rq) * SUM(r_int) OVER {win(s)}
              + SUM(rq * r_int)  OVER {win(s)} AS numo
  FROM b
)
SELECT conv_id, turn_idx, ts_us,
       CAST(numw AS DOUBLE) / CAST(denw AS DOUBLE) AS wma,
       CASE WHEN rq >= {w + s - 2}
            THEN CAST(numo AS DOUBLE) / {float(den_s * den_h * den_w)!r}
            ELSE 0.0 END AS hma,
       CAST(CASE WHEN rq >= {w + s - 2} THEN 1 ELSE 0 END AS BIGINT) AS hma_ok
FROM c ORDER BY conv_id, turn_idx"""


def chaikin_frame(
    turns: pd.DataFrame, bar: int = 3, fast: int = 3, slow: int = 10
) -> pd.DataFrame:
    """Accumulation/distribution line + Chaikin oscillator over micro-bars."""
    out = turns[_KEYS].copy()
    if len(turns) == 0:
        return _empty(out, ("adl", "chaikin"))
    conv, dt_us, new_conv, rn = _prep(turns)
    text_len = turns["text_len"].to_numpy().astype(np.int64)
    lo, hi = _rolling_minmax(conv, dt_us, bar)
    rng = hi - lo
    num = 2 * dt_us - hi - lo
    with np.errstate(invalid="ignore", divide="ignore"):
        mult = np.where(rng > 0, num / rng, 0.0)
    mfv = mult * text_len.astype(np.float64)
    af = 2.0 / (fast + 1.0)
    as_ = 2.0 / (slow + 1.0)
    N = len(turns)
    adl_out = np.empty(N)
    chk = np.empty(N)
    adl = e3 = e10 = 0.0
    for i in range(N):
        if new_conv[i]:
            adl = mfv[i]
            e3 = e10 = adl
            adl_out[i] = adl
            chk[i] = 0.0
            continue
        adl = adl + mfv[i]
        e3 = e3 + af * (adl - e3)
        e10 = e10 + as_ * (adl - e10)
        adl_out[i] = adl
        chk[i] = e3 - e10
    out["adl"] = adl_out
    out["chaikin"] = chk
    return out


def sql_chaikin(base_cte: str, bar: int = 3, fast: int = 3, slow: int = 10) -> str:
    # CAST-division constants, not repr() literals — see sql_adx docstring
    af = f"(CAST(2 AS DOUBLE) / CAST({fast + 1} AS DOUBLE))"
    as_ = f"(CAST(2 AS DOUBLE) / CAST({slow + 1} AS DOUBLE))"
    m = bar
    bwin = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW)"
    )
    adln = "(r.adl + b.mfv)"
    e3n = f"(r.e3 + {af} * ({adln} - r.e3))"
    e10n = f"(r.e10 + {as_} * ({adln} - r.e10))"
    rec = base_cte.replace("WITH raw AS", "WITH RECURSIVE raw AS", 1)
    return rec + f"""
, bb AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, text_len,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn,
         MIN(dt_us) OVER {bwin} AS lo,
         MAX(dt_us) OVER {bwin} AS hi
  FROM t
), d AS MATERIALIZED (
  SELECT conv_id, turn_idx, ts_us, rn,
         (CASE WHEN hi - lo > 0
               THEN CAST(2 * dt_us - hi - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
               ELSE 0.0 END) * CAST(text_len AS DOUBLE) AS mfv
  FROM bb
), r AS (
  SELECT conv_id, turn_idx, ts_us, rn,
         mfv AS adl, mfv AS e3, mfv AS e10, CAST(0.0 AS DOUBLE) AS chaikin
  FROM d WHERE rn = 1
  UNION ALL
  SELECT b.conv_id, b.turn_idx, b.ts_us, b.rn,
         {adln}, {e3n}, {e10n},
         ({e3n} - {e10n})
  FROM d b JOIN r ON b.conv_id = r.conv_id AND b.rn = r.rn + 1
)
SELECT conv_id, turn_idx, ts_us, adl, chaikin
FROM r ORDER BY conv_id, turn_idx"""
