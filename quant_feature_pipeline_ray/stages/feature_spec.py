"""Per-feature-group normalization mapping + offline/online alignment
validation — the reference's main user-facing extension point.

Reference semantics re-derived (NOT copied):
  * feature-group -> normalization mode with frozen per-period constants:
    congfigs/step5_mapping.yaml:83-153 (mode: rank / tanh / power with
    fixed_gamma / fixed_quantile constants per feature group);
  * offline<->online config cross-check that fails fast on any drift:
    congfigs/config_loader.py:96-168 `validate_live_alignment` (column
    set, mode and constant equality between the training-time spec and
    the serving-time spec).

Modes (all single-pass once calibrated; constants are FROZEN in the spec
so train and live apply the identical function):
  tanh   y = tanh(clip(x, lo, hi) / scale)          (winsorized squash)
  unit   y = min(log1p(max(x,0)) / log1p(hi), 1)    (log-compress to [0,1])
  power  y = clip(x / hi, 0, 1) ** gamma            (gamma calibration)
  rank   y = cume_dist(x) = #(v <= x) / N           (global CDF rank,
         calibrated once via the distributed value-counts histogram and
         broadcast — stages/normalize.global_value_counts)
  none   passthrough

Every output is round(..., 6) so engine and any SQL oracle agree bitwise.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa

import ray
import ray.data


@dataclass(frozen=True)
class GroupNorm:
    """Normalization of ONE feature group: a mode + frozen constants."""

    mode: str  # tanh | unit | power | rank | none
    lo: float = 0.0
    hi: float = 1.0
    scale: float = 1.0
    gamma: float = 1.0

    def __post_init__(self):
        if self.mode not in ("tanh", "unit", "power", "rank", "none"):
            raise ValueError(f"unknown normalization mode {self.mode!r}")


@dataclass(frozen=True)
class NormalizationSpec:
    """column -> feature group, feature group -> GroupNorm."""

    groups: dict[str, GroupNorm] = field(default_factory=dict)
    columns: dict[str, str] = field(default_factory=dict)  # column -> group

    def __post_init__(self):
        missing = {g for g in self.columns.values() if g not in self.groups}
        if missing:
            raise ValueError(f"columns reference undefined groups: {sorted(missing)}")

    def norm_for(self, col: str) -> GroupNorm:
        return self.groups[self.columns[col]]

    def to_json(self) -> str:
        return json.dumps(
            {"groups": {k: asdict(v) for k, v in self.groups.items()},
             "columns": dict(self.columns)},
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "NormalizationSpec":
        d = json.loads(s)
        return cls(
            groups={k: GroupNorm(**v) for k, v in d["groups"].items()},
            columns=dict(d["columns"]),
        )

    def spec_sha(self) -> str:
        """Content hash — the one-line alignment check (cf. the feature
        contract's schema_sha, tools/export_utils.py:47-50)."""
        return hashlib.sha1(self.to_json().encode()).hexdigest()


def validate_alignment(offline: NormalizationSpec, online: NormalizationSpec) -> None:
    """Fail fast when the serving-time spec drifts from the training-time
    spec — collects EVERY mismatch before raising (reference:
    congfigs/config_loader.py:96-168 validate_live_alignment)."""
    problems: list[str] = []
    off_cols, on_cols = set(offline.columns), set(online.columns)
    for c in sorted(off_cols - on_cols):
        problems.append(f"column {c!r} normalized offline but missing online")
    for c in sorted(on_cols - off_cols):
        problems.append(f"column {c!r} normalized online but not offline")
    for c in sorted(off_cols & on_cols):
        if offline.columns[c] != online.columns[c]:
            problems.append(
                f"column {c!r} group mismatch: offline {offline.columns[c]!r} "
                f"vs online {online.columns[c]!r}"
            )
            continue
        a, b = offline.norm_for(c), online.norm_for(c)
        if a.mode != b.mode:
            problems.append(f"column {c!r} mode mismatch: {a.mode!r} vs {b.mode!r}")
        else:
            for fld in ("lo", "hi", "scale", "gamma"):
                if getattr(a, fld) != getattr(b, fld):
                    problems.append(
                        f"column {c!r} constant {fld} mismatch: "
                        f"{getattr(a, fld)} vs {getattr(b, fld)}"
                    )
    if problems:
        raise ValueError(
            "offline/online normalization specs are NOT aligned:\n  "
            + "\n  ".join(problems)
        )


def _apply_mode(x: np.ndarray, gn: GroupNorm, rank_table=None) -> np.ndarray:
    if gn.mode == "tanh":
        return np.round(np.tanh(np.clip(x, gn.lo, gn.hi) / gn.scale), 6)
    if gn.mode == "unit":
        return np.round(
            np.minimum(np.log1p(np.maximum(x, 0.0)) / np.log1p(gn.hi), 1.0), 6
        )
    if gn.mode == "power":
        return np.round(np.power(np.clip(x / gn.hi, 0.0, 1.0), gn.gamma), 6)
    if gn.mode == "rank":
        vals, cum = rank_table
        idx = np.searchsorted(vals, x, side="right")
        n = cum[-1]
        return np.round(np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0) / n, 6)
    return x


def apply_group_normalization(
    ds: ray.data.Dataset, spec: NormalizationSpec, suffix: str = "_norm"
) -> ray.data.Dataset:
    """Append `<col><suffix>` for every mapped column, per its group's mode.

    rank-mode columns are calibrated FIRST with one distributed
    value-counts pass each; the (values, cumcounts) tables are broadcast
    via ray.put and the apply stage is a stateless map_batches — the
    two-pass + broadcast protocol of stages/normalize.calibrated_normalize."""
    from quant_feature_pipeline_ray.stages.normalize import global_value_counts

    rank_tables: dict[str, object] = {}
    for col in spec.columns:
        if spec.norm_for(col).mode == "rank":
            vals, counts = global_value_counts(ds, col)
            rank_tables[col] = ray.put((vals, np.cumsum(counts)))

    col_specs = {c: spec.norm_for(c) for c in spec.columns}

    def fn(batch: pa.Table) -> pa.Table:
        for col, gn in col_specs.items():
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            rt = rank_tables.get(col)
            if rt is not None and isinstance(rt, ray.ObjectRef):
                rt = ray.get(rt)
            batch = batch.append_column(f"{col}{suffix}", pa.array(_apply_mode(x, gn, rt)))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
