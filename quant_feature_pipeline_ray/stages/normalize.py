"""Normalization / governance layer (Step5 analogues).

Reference semantics re-derived:
  * winsorize + tanh compression of governed series (log-return governance,
    step5_featueres_unified.py:1144-1235: winsorize [0.1%, 99.9%] then
    tanh(x / (3 sigma))-style squashing; momentum tanh*30 compression,
    step5_featueres_unified.py:513-526)
  * log1p -> percentile-rank fusing (band_width / volume mapping,
    step5_featueres_unified.py:547-587, 623-658)
  * FROZEN-constant mode first (single-pass, train/live-consistent — the
    reference's fixed_gamma/fixed_quantile path,
    congfigs/step5_mapping.yaml:136-153), plus an explicit TWO-PASS global
    calibration: pass 1 computes the quantiles with a distributed
    aggregate, pass 2 broadcasts the bounds into a stateless map_batches.

All kernels are vectorized numpy over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def winsorize_tanh(x: np.ndarray, lo: float, hi: float, scale: float) -> np.ndarray:
    """clip to [lo, hi] then squash with tanh(x/scale) — frozen constants."""
    return np.tanh(np.clip(x, lo, hi) / scale)


def log1p_unit(x: np.ndarray, hi: float) -> np.ndarray:
    """log1p then scale to [0, 1] against a frozen upper bound."""
    return np.minimum(np.log1p(np.maximum(x, 0.0)) / np.log1p(hi), 1.0)


def normalized_columns(
    ds: ray.data.Dataset,
    col: str,
    lo: float,
    hi: float,
    scale: float,
) -> ray.data.Dataset:
    """Frozen-constant governance of one column (single pass)."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        batch = batch.append_column(f"{col}_governed", pa.array(winsorize_tanh(x, lo, hi, scale)))
        return batch.append_column(f"{col}_unit", pa.array(log1p_unit(x, hi)))

    return ds.map_batches(fn, batch_format="pyarrow")


def power_calibrate(x: np.ndarray, gamma: float) -> np.ndarray:
    """Frozen-gamma power calibration of a [0,1] signal (reference: the
    atr_pct rank fuse with fixed per-period gamma,
    step5_featueres_unified.py:810-883, congfigs/step5_mapping.yaml:136-153)."""
    return np.power(np.clip(x, 0.0, 1.0), gamma)


def global_quantiles(ds: ray.data.Dataset, col: str, qs: tuple[float, ...]) -> dict[float, float]:
    """Pass 1: exact distributed quantiles of one numeric column.

    Implementation: per-batch sorted value arrays would still be O(N) on the
    driver; instead we collect per-batch histograms? For exactness at
    testdata scale we gather the column (numeric only, no strings) and use
    numpy's linear-interpolation quantile — the same definition as DuckDB's
    quantile_cont. At 100 TB this becomes a mergeable t-digest sketch with
    FROZEN results recorded into config (the reference's fixed_quantile
    path); the two-pass protocol and the broadcast stay identical.
    """
    parts = []
    for b in ds.select_columns([col]).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts.append(b[col].to_numpy(zero_copy_only=False))
    vals = np.concatenate(parts)
    return {q: float(np.quantile(vals, q, method="linear")) for q in qs}


def calibrated_normalize(
    ds: ray.data.Dataset,
    col: str,
    q_lo: float = 0.001,
    q_hi: float = 0.999,
) -> tuple[ray.data.Dataset, dict[float, float]]:
    """Two-pass: compute global winsorize bounds, then broadcast them into a
    stateless clip+scale transform (A2: np.quantile calibration then apply,
    step5_featueres_unified.py:838, 871-877, 1208-1210)."""
    qs = global_quantiles(ds, col, (q_lo, 0.5, q_hi))
    lo, mid, hi = qs[q_lo], qs[0.5], qs[q_hi]
    span = max(hi - lo, 1e-12)

    def fn(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        clipped = np.clip(x, lo, hi)
        return batch.append_column(f"{col}_winsor_unit", pa.array((clipped - lo) / span))

    return ds.map_batches(fn, batch_format="pyarrow"), qs
