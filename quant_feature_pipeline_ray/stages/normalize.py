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


def _lerp_quantile(vals: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Exact linear-interpolated quantile from a merged (value, count)
    histogram — BITWISE identical to np.quantile(full_array, q,
    method='linear') (and to DuckDB quantile_cont on the same data).

    Replicates numpy's _lerp including its t >= 0.5 fix-up so the float
    expression, not just the math, matches."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    cum = np.cumsum(counts)
    h = q * (n - 1)  # numpy: quantiles * (count - 1)
    i = int(np.floor(h))
    t = h - i
    lo = float(vals[np.searchsorted(cum, i, side="right")])
    hi = float(vals[np.searchsorted(cum, min(i + 1, n - 1), side="right")])
    d = hi - lo
    r = lo + d * t
    if t >= 0.5:
        r = hi - d * (1 - t)
    return float(r)


def global_value_counts(ds: ray.data.Dataset, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Exact DISTRIBUTED value-counts histogram of one numeric column —
    the mergeable sketch behind global quantiles and global rank.

    Per-batch np.unique(value, count) partials -> groupby(value) Sum (one
    shuffle of cardinality-bounded rows) -> (sorted values, counts) on the
    driver. Valid whenever the column's VALUE CARDINALITY is bounded
    (dt-like quantized measures, integer-cent money, fixed-resolution
    timestamps) — the common case for governance bounds. For genuinely
    unbounded continuous columns, freeze the bounds from a calibration run
    instead (the reference's fixed_quantile path,
    congfigs/step5_mapping.yaml:136-153); a lossy t-digest would silently
    break the bitwise train/live contract this module guarantees."""
    import pandas as pd

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    def vc(batch: pa.Table) -> "pd.DataFrame":
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals, cnt = np.unique(v, return_counts=True)
        return pd.DataFrame({"v": vals, "n": cnt.astype(np.int64)})

    # grouped_aggregate, not groupby().aggregate(): the histogram keyspace
    # is value-cardinality-sized, and Ray's native sort-aggregate pays ~1 ms
    # of per-GROUP reduce overhead (measured; stages/hash_aggregate.py)
    hist = (
        grouped_aggregate(
            ds.select_columns([col]).map_batches(vc, batch_format="pyarrow"),
            "v",
            {"n": ("n", "sum")},
        )
        .to_pandas()  # cardinality-bounded, NOT row-bounded
        .sort_values("v", ignore_index=True)
    )
    return hist["v"].to_numpy(), hist["n"].to_numpy()


def global_quantiles(
    ds: ray.data.Dataset, col: str, qs: tuple[float, ...]
) -> dict[float, float]:
    """Pass 1: exact distributed quantiles from the value-counts histogram;
    nothing row-scaled reaches the driver (see global_value_counts)."""
    vals, counts = global_value_counts(ds, col)
    return {q: _lerp_quantile(vals, counts, q) for q in qs}


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


def approx_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: tuple[float, ...],
    max_centroids: int = 512,
) -> dict[float, float]:
    """Distributed approximate quantiles for UNBOUNDED float columns — the
    100 TB path when the exact value-counts histogram (global_quantiles)
    can't bound its keyspace (every value distinct => the histogram IS the
    column).

    Per-batch qdigest partials (<= max_centroids rows each) -> ONE driver
    merge over block-count * max_centroids rows (a few MB at any data
    scale; tree-reduce via Ray tasks if block count ever makes even that
    large). Rank error <= 1/max_centroids of the mass per query — pytest
    gates it on skewed data (tests/test_training_data.py)."""
    import pandas as pd

    from quant_feature_pipeline_ray.functions.sketches import (
        qdigest_merge,
        qdigest_partial,
        qdigest_quantile,
    )

    def part(batch: pa.Table) -> pd.DataFrame:
        d = qdigest_partial(
            batch[col].to_numpy(zero_copy_only=False), max_centroids=max_centroids
        )
        return pd.DataFrame({"mean": d[:, 0], "weight": d[:, 1]})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    digest = qdigest_merge(
        [parts[["mean", "weight"]].to_numpy()], max_centroids=max_centroids
    )
    return {q: qdigest_quantile(digest, q) for q in qs}
