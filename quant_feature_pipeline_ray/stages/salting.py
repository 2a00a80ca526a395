"""Skew handling: salted mega-conversation split with exact state handoff.

One conversation with 10^7+ turns would make its bucket a straggler: the
per-turn kernels run at ~0.5-2.6 us/row, so a mega-conv pins one core for
tens of seconds while the rest of the cluster idles (SURVEY.md §4.2.3).

The salted path splits the conversation's sorted rows into S-row chunks and
recomputes the expensive bounded-window kernels per chunk IN PARALLEL
(nested Ray tasks — one of the few places the Dataset API can't express the
semantics), while the cheap O(n) vectorized kernels and every
unbounded-horizon state stay in a single exact pass:

  * carry-in overlap: each chunk's input is prefixed with the previous
    chunk's last `max_lookback_turns` rows (ring-buffer state handoff in
    data form) and suffixed with the next chunk's first `max(lead)` rows,
    so rolling mean/std/rank/lag/lead reproduce the unsalted values
    BITWISE — the overlap rows' outputs are discarded;
  * global pass (cheap cumsum/shift numpy, single worker): dt, sessionize,
    cum_turns, run-length events, window aggregate tables (+ as-of via
    searchsorted), time encodings — these have unbounded lookback horizons,
    and recombining them across chunks in floating point would break
    bitwise equality, so they are computed once on the full sequence
    (~0.1-0.3 us/row — never the straggler);
  * EMA registers: exact sequential recurrence via the same cython ewm the
    unsalted path uses, on the full dt vector (float64 per row — tiny).

tests/test_salting.py pins salted == unsalted bitwise at every turn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
from quant_feature_pipeline_ray.stages.turn_features import rolling_mean_std_int
from quant_feature_pipeline_ray.stages.turn_features_arrow import featurize_bucket_arrow


def _chunk_kernels(dt_secs: np.ndarray, dt_us: np.ndarray, rn: np.ndarray, cfg: FeatureConfig) -> dict[str, np.ndarray]:
    """The bounded-window kernels over one chunk (with overlap included).
    rn carries GLOBAL row numbers within the conversation, so warm-up
    clamping at the true conversation start stays exact."""
    out: dict[str, np.ndarray] = {}
    for w in cfg.sma_windows:
        out[f"lat_sma_{w}"], out[f"lat_std_{w}"] = rolling_mean_std_int(dt_us, rn, w)
    # rolling percentile rank (the O(N*w) kernel — the real straggler cost)
    rk = (
        pd.Series(dt_secs)
        .rolling(cfg.rank_window, min_periods=1)
        .rank(method="average", pct=True)
        .to_numpy()
    )
    # warm-up rows (rn < window) must rank within [conv_start, i], which the
    # overlap prefix already guarantees because chunks beyond the first have
    # rn >= overlap >= rank_window
    out[f"lat_rank_{cfg.rank_window}"] = np.clip(rk, cfg.rank_clip[0], cfg.rank_clip[1])

    # band-width composite + its dual-window rank fuse: composed horizon is
    # bw_window-1 (std/sma lookback) + rank window - 1, which
    # cfg.max_lookback_turns() covers — so the overlap prefix again makes
    # every kept row's value exact. (The macd/signal EMA chain is NOT
    # chunk-recomputable without float drift; it stays in the single full
    # pass — one float64 recurrence per row, never the straggler.)
    w_bw = cfg.bw_window
    if w_bw in cfg.sma_windows:
        sma, std = out[f"lat_sma_{w_bw}"], out[f"lat_std_{w_bw}"]
    else:
        sma, std = rolling_mean_std_int(dt_us, rn, w_bw)
    with np.errstate(invalid="ignore", divide="ignore"):
        bw = np.where(sma > 0, 4.0 * std / sma, 0.0)
    out[f"band_width_{w_bw}"] = bw
    rks = []
    for rw in cfg.bw_rank_windows:
        r = pd.Series(bw).rolling(rw, min_periods=1).rank(method="average", pct=True).to_numpy()
        rks.append(np.clip(r, cfg.rank_clip[0], cfg.rank_clip[1]))
    out["bw_rank_fuse"] = 0.5 * (rks[0] + rks[1])
    return out


@ray.remote
def _chunk_task(dt_secs, dt_us, rn, cfg):
    return _chunk_kernels(dt_secs, dt_us, rn, cfg)


def featurize_conversation_salted(
    tbl: pa.Table,
    cfg: FeatureConfig = DEFAULT_CONFIG,
    chunk_rows: int = 100_000,
    parallel: bool = True,
) -> pa.Table:
    """Featurize ONE conversation, chunk-parallel, bitwise == unsalted.

    `tbl` must contain exactly one conv_id's raw rows (any order; the
    canonical sort/dedup happens inside via the unsalted kernel on the
    cheap path). Strategy: run the full unsalted arrow kernel ONCE for all
    cheap/global columns, then OVERWRITE the expensive bounded-window
    columns with chunk-parallel recomputation (exact, overlap-seeded).
    """
    full = featurize_bucket_arrow(tbl, cfg)
    n = full.num_rows
    if n <= chunk_rows:
        return full

    dt_secs = full["dt_secs"].to_numpy(zero_copy_only=False)
    ts_us = full["ts_us"].to_numpy(zero_copy_only=False)
    dt_us = np.round(dt_secs * 1e6).astype(np.int64)
    overlap = max(cfg.max_lookback_turns(), cfg.rank_window)

    chunks = []
    for start in range(0, n, chunk_rows):
        stop = min(start + chunk_rows, n)
        lo = max(0, start - overlap)
        rn_slice = np.arange(lo, stop, dtype=np.int64)  # global row numbers
        chunks.append((start, stop, lo, rn_slice))

    if parallel and len(chunks) > 1:
        cfg_ref = ray.put(cfg)
        futs = [
            _chunk_task.remote(dt_secs[lo:stop], dt_us[lo:stop], rn_slice, cfg_ref)
            for (start, stop, lo, rn_slice) in chunks
        ]
        results = ray.get(futs)
    else:
        results = [
            _chunk_kernels(dt_secs[lo:stop], dt_us[lo:stop], rn_slice, cfg)
            for (start, stop, lo, rn_slice) in chunks
        ]

    patched: dict[str, np.ndarray] = {}
    cols = (
        [f"lat_sma_{w}" for w in cfg.sma_windows]
        + [f"lat_std_{w}" for w in cfg.sma_windows]
        + [f"lat_rank_{cfg.rank_window}", f"band_width_{cfg.bw_window}", "bw_rank_fuse"]
    )
    for c in cols:
        patched[c] = np.empty(n, dtype=np.float64)
    for (start, stop, lo, _), res in zip(chunks, results):
        skip = start - lo  # discard the overlap rows' outputs
        for c in cols:
            patched[c][start:stop] = res[c][skip:]

    out_cols = []
    for name in full.column_names:
        if name in patched:
            out_cols.append(pa.array(patched[name]))
        else:
            out_cols.append(full[name])
    return pa.Table.from_arrays(out_cols, names=full.column_names)
