"""Data-quality metrics and health gates.

Reference analogues:
  * continuity metrics — max gap / missing ratio checks after Step1
    (run1_step1_data.py:30-46, 49-112) → per-conversation gap/span/turn
    metrics emitted as a small aggregate Dataset;
  * health_check_features — per-group range gates + out-of-range ratios
    before export (tools/export_utils.py:174-225) → vectorized per-batch
    partial counts merged on the driver, gate raises on violation;
  * value-counts balance warning (step5_featueres_unified.py:292-313).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# feature -> (lo, hi) inclusive bounds; mirrors the reference's per-group
# gates (market_state ∈ [-1,1], ratios ∈ [0,1], prices >= 0)
DEFAULT_BOUNDS: dict[str, tuple[float, float]] = {
    "dt_secs": (0.0, math.inf),
    "lat_rank_20": (0.01, 0.99),
    "tool_rate_20": (0.0, 1.0),
    "role_change_rate_20": (0.0, 1.0),
    "gap_event": (0.0, 1.0),
    "session_id": (0.0, math.inf),
    "hour_sin": (-1.0, 1.0),
    "hour_cos": (-1.0, 1.0),
}


def continuity_metrics(turns: ray.data.Dataset, session_gap_s: float = 1800.0) -> ray.data.Dataset:
    """Per-conversation continuity rollup from a turn-feature Dataset."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_numpy(zero_copy_only=False),
                "dt_us": np.round(
                    batch["dt_secs"].to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64),
                "ts_us": batch["ts_us"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("conv_id", as_index=False)
        gap_us = np.int64(session_gap_s * 1e6)
        out = g.agg(
            turns=("ts_us", "size"),
            max_gap_us=("dt_us", "max"),
            min_ts=("ts_us", "min"),
            max_ts=("ts_us", "max"),
        )
        out["n_gaps"] = df.assign(isgap=(df["dt_us"] > gap_us).astype(np.int64)).groupby(
            "conv_id", as_index=False
        )["isgap"].sum()["isgap"]
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    partials = turns.map_batches(partial, batch_format="pyarrow")
    # conv_id is a corpus-cardinality key — hash-partitioned pandas reduce,
    # never Ray's per-group sort-aggregate (stages/hash_aggregate.py)
    agg = grouped_aggregate(
        partials,
        "conv_id",
        {
            "turns": ("turns", "sum"),
            "max_gap_us": ("max_gap_us", "max"),
            "min_ts": ("min_ts", "min"),
            "max_ts": ("max_ts", "max"),
            "n_sessions_minus_1": ("n_gaps", "sum"),
        },
    )

    def finalize(batch: pa.Table) -> pa.Table:
        span = pa.compute.subtract(batch["max_ts"], batch["min_ts"])
        out = batch.append_column("span_us", span)
        return out.drop_columns(["min_ts", "max_ts"])

    return agg.map_batches(finalize, batch_format="pyarrow")


def health_check(
    features: ray.data.Dataset,
    bounds: dict[str, tuple[float, float]] | None = None,
    max_oob_ratio: float = 0.0,
    max_nan_ratio: float = 1e-6,
) -> dict:
    """Range/NaN gates over a feature Dataset; raises on violation.

    Partial counts per batch (vectorized), merged on the driver — the
    dataset is never materialized."""
    bounds = bounds or DEFAULT_BOUNDS
    cols = [c for c in bounds if c in features.schema().names]

    def partial(batch: pa.Table) -> pd.DataFrame:
        row = {"n": np.array([len(batch)], dtype=np.int64)}
        for c in cols:
            x = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            lo, hi = bounds[c]
            row[f"nan_{c}"] = np.array([int(np.isnan(x).sum())], dtype=np.int64)
            row[f"oob_{c}"] = np.array(
                [int(((x < lo) | (x > hi)) .sum())], dtype=np.int64
            )
        return pd.DataFrame(row)

    from ray.data.aggregate import Sum

    partials = features.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n")]
    for c in cols:
        aggs += [Sum(f"nan_{c}", alias_name=f"nan_{c}"), Sum(f"oob_{c}", alias_name=f"oob_{c}")]
    tot = partials.aggregate(*aggs)
    n = tot["n"]
    report: dict = {"rows": int(n), "columns": {}}
    violations = []
    for c in cols:
        nan_r = tot[f"nan_{c}"] / max(n, 1)
        oob_r = tot[f"oob_{c}"] / max(n, 1)
        report["columns"][c] = {"nan_ratio": nan_r, "oob_ratio": oob_r}
        if nan_r > max_nan_ratio:
            violations.append(f"{c}: nan_ratio {nan_r:.2e}")
        if oob_r > max_oob_ratio:
            violations.append(f"{c}: oob_ratio {oob_r:.2e}")
    report["ok"] = not violations
    if violations:
        raise ValueError("health check failed: " + "; ".join(violations))
    return report
