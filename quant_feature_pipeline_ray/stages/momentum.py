"""Boundary-anchored momentum family (W5 completion).

Reference semantics re-derived: `calc_rolling_window_momentum`
(step5_featueres_unified.py:320-424) — configurable `ref_method` in
{point, boundary, boundary_intra_avg}, `anchor_offset`, L-period
lookback — transposed to the transcript domain over inter-turn latency.

Definitions (p = period_s in µs, a = anchor_offset_s in µs, L = lookback,
window index w_i = (ts_i - a) // p, all integer arithmetic):

  point      ref = x at the LATEST turn with ts <= ts_i - L*p
             (pure time-shifted as-of; ties on ts resolve to the max
             turn_idx — ts is monotone per conv, so "latest turn")
  boundary   ref = x at the latest turn in any window <= w_i - L, i.e.
             the value standing AT the anchored boundary
             B_i = (w_i - L + 1)*p + a
  intra_avg  ref = exact mean of x over the single anchor window
             w_i - L (integer dt_us sum / (n * 1e6) — bitwise SQL-safe)

momentum = x_i - ref (0.0 on miss, with a hit flag per method). All three
are vectorized searchsorted/reduceat passes per conversation segment —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rolling_window_momentum(
    turns: pd.DataFrame,
    period_s: int = 300,
    lookback: int = 2,
    anchor_offset_s: int = 0,
    col: str = "dt_secs",
) -> pd.DataFrame:
    """One bucket of compute_turn_features output (sorted by conv, turn) →
    momentum columns for all three ref_methods at one (p, L, a) setting."""
    n = len(turns)
    out = turns[["conv_id", "turn_idx", "ts_us"]].copy()
    x = turns[col].to_numpy()
    out[col] = x
    if n == 0:
        for m in ("point", "boundary", "intra"):
            out[f"mom_{m}"] = pd.Series(dtype="float64")
            out[f"hit_{m}"] = pd.Series(dtype="int64")
        return out

    conv = turns["conv_id"].to_numpy()
    ts = turns["ts_us"].to_numpy().astype(np.int64)
    dt_us = np.round(turns["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    p = np.int64(period_s) * 1_000_000
    a = np.int64(anchor_offset_s) * 1_000_000
    L = int(lookback)
    w = (ts - a) // p

    new_conv = np.empty(n, dtype=bool)
    new_conv[0] = True
    np.not_equal(conv[1:], conv[:-1], out=new_conv[1:])
    starts = np.flatnonzero(new_conv)
    ends = np.append(starts[1:], n)

    ref_point = np.zeros(n, dtype=np.float64)
    hit_point = np.zeros(n, dtype=np.int64)
    ref_bound = np.zeros(n, dtype=np.float64)
    hit_bound = np.zeros(n, dtype=np.int64)
    ref_intra = np.zeros(n, dtype=np.float64)
    hit_intra = np.zeros(n, dtype=np.int64)

    for s0, s1 in zip(starts, ends):
        ts_seg, w_seg, x_seg = ts[s0:s1], w[s0:s1], x[s0:s1]
        # point: last row with ts <= ts_i - L*p
        j = np.searchsorted(ts_seg, ts_seg - L * p, side="right") - 1
        hp = j >= 0
        ref_point[s0:s1] = np.where(hp, x_seg[np.maximum(j, 0)], 0.0)
        hit_point[s0:s1] = hp
        # boundary: last row in any window <= w_i - L (w monotone in turn)
        j2 = np.searchsorted(w_seg, w_seg - L, side="right") - 1
        hb = j2 >= 0
        ref_bound[s0:s1] = np.where(hb, x_seg[np.maximum(j2, 0)], 0.0)
        hit_bound[s0:s1] = hb
        # intra_avg: exact mean over the single anchor window w_i - L
        gb = np.empty(s1 - s0, dtype=bool)
        gb[0] = True
        gb[1:] = w_seg[1:] != w_seg[:-1]
        gstarts = np.flatnonzero(gb)
        g_w = w_seg[gstarts]
        g_n = np.diff(np.append(gstarts, s1 - s0))
        g_sum = np.add.reduceat(dt_us[s0:s1], gstarts)
        pos = np.searchsorted(g_w, w_seg - L)
        pos_c = np.minimum(pos, len(g_w) - 1)
        hi = (g_w[pos_c] == w_seg - L) & (pos < len(g_w))
        mean = g_sum[pos_c] / (g_n[pos_c] * 1e6)
        ref_intra[s0:s1] = np.where(hi, mean, 0.0)
        hit_intra[s0:s1] = hi

    out["mom_point"] = np.where(hit_point == 1, x - ref_point, 0.0)
    out["hit_point"] = hit_point
    out["mom_boundary"] = np.where(hit_bound == 1, x - ref_bound, 0.0)
    out["hit_boundary"] = hit_bound
    out["mom_intra"] = np.where(hit_intra == 1, x - ref_intra, 0.0)
    out["hit_intra"] = hit_intra
    return out


def sql_momentum(
    base_cte: str,
    period_s: int = 300,
    lookback: int = 2,
    anchor_offset_s: int = 0,
) -> str:
    """DuckDB oracle for all three ref_methods — point/boundary as
    arg_max over RANGE frames (constant offsets in ts / window-index
    units), intra_avg as a join against the per-(conv, window) integer
    aggregate. Same float expressions as the engine."""
    p = period_s * 1_000_000
    a = anchor_offset_s * 1_000_000
    L = lookback
    return base_cte + f"""
, m AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, (ts_us - {a}) // {p} AS w
  FROM t
), wagg AS (
  SELECT conv_id, (ts_us - {a}) // {p} AS w,
         CAST(SUM(dt_us) AS BIGINT) AS s, COUNT(*) AS n
  FROM t GROUP BY 1, 2
), refs AS (
  SELECT conv_id, turn_idx, ts_us, dt_us, w,
         arg_max(dt_us, turn_idx) OVER (
           PARTITION BY conv_id ORDER BY ts_us
           RANGE BETWEEN UNBOUNDED PRECEDING AND {L * p} PRECEDING
         ) AS ref_point_us,
         arg_max(dt_us, turn_idx) OVER (
           PARTITION BY conv_id ORDER BY w
           RANGE BETWEEN UNBOUNDED PRECEDING AND {L} PRECEDING
         ) AS ref_bound_us
  FROM m
)
SELECT r.conv_id, r.turn_idx, r.ts_us, r.dt_us / 1000000.0 AS dt_secs,
       CASE WHEN r.ref_point_us IS NULL THEN 0.0
            ELSE r.dt_us / 1000000.0 - r.ref_point_us / 1000000.0 END AS mom_point,
       CAST(r.ref_point_us IS NOT NULL AS BIGINT) AS hit_point,
       CASE WHEN r.ref_bound_us IS NULL THEN 0.0
            ELSE r.dt_us / 1000000.0 - r.ref_bound_us / 1000000.0 END AS mom_boundary,
       CAST(r.ref_bound_us IS NOT NULL AS BIGINT) AS hit_boundary,
       CASE WHEN g.w IS NULL THEN 0.0
            ELSE r.dt_us / 1000000.0 - g.s / (g.n * 1000000.0) END AS mom_intra,
       CAST(g.w IS NOT NULL AS BIGINT) AS hit_intra
FROM refs r
LEFT JOIN wagg g ON g.conv_id = r.conv_id AND g.w = r.w - {L}
ORDER BY r.conv_id, r.turn_idx"""
