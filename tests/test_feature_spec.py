"""Per-group normalization spec + offline/online alignment validation."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.stages.feature_spec import (
    GroupNorm,
    NormalizationSpec,
    apply_group_normalization,
    validate_alignment,
)


def _spec(**overrides):
    groups = {
        "latency": GroupNorm(mode="tanh", lo=0.0, hi=3600.0, scale=120.0),
        "volume": GroupNorm(mode="unit", hi=2000.0),
    }
    columns = {"dt_secs": "latency", "text_len": "volume"}
    groups.update(overrides.get("groups", {}))
    columns.update(overrides.get("columns", {}))
    return NormalizationSpec(groups=groups, columns=columns)


def test_aligned_specs_pass_and_sha_stable():
    a, b = _spec(), _spec()
    validate_alignment(a, b)  # no raise
    assert a.spec_sha() == b.spec_sha()
    assert NormalizationSpec.from_json(a.to_json()).spec_sha() == a.spec_sha()


def test_constant_drift_raises_with_every_mismatch():
    offline = _spec()
    online = NormalizationSpec(
        groups={
            "latency": GroupNorm(mode="tanh", lo=0.0, hi=1800.0, scale=60.0),
            "volume": GroupNorm(mode="rank"),
        },
        columns={"dt_secs": "latency", "text_len": "volume", "extra": "volume"},
    )
    with pytest.raises(ValueError) as ei:
        validate_alignment(offline, online)
    msg = str(ei.value)
    assert "hi mismatch" in msg and "scale mismatch" in msg
    assert "mode mismatch" in msg
    assert "'extra'" in msg  # online-only column reported too


def test_missing_column_raises():
    offline = _spec()
    online = NormalizationSpec(
        groups={"latency": GroupNorm(mode="tanh", lo=0.0, hi=3600.0, scale=120.0)},
        columns={"dt_secs": "latency"},
    )
    with pytest.raises(ValueError, match="missing online"):
        validate_alignment(offline, online)


def test_unknown_mode_and_undefined_group_rejected():
    with pytest.raises(ValueError, match="unknown normalization mode"):
        GroupNorm(mode="zscore")
    with pytest.raises(ValueError, match="undefined groups"):
        NormalizationSpec(groups={}, columns={"x": "nope"})


def test_apply_modes_match_straight_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "dt_secs": np.round(rng.exponential(100.0, 5000), 3),
            "text_len": rng.integers(0, 3000, 5000),
            "depth": rng.integers(1, 80, 5000),
            "st": rng.integers(1, 30, 5000),
        }
    )
    spec = NormalizationSpec(
        groups={
            "latency": GroupNorm(mode="tanh", lo=0.0, hi=3600.0, scale=120.0),
            "volume": GroupNorm(mode="unit", hi=2000.0),
            "deep": GroupNorm(mode="power", hi=50.0, gamma=0.7),
            "structure": GroupNorm(mode="rank"),
        },
        columns={"dt_secs": "latency", "text_len": "volume", "depth": "deep", "st": "structure"},
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = apply_group_normalization(ds, spec).to_pandas().sort_index()
    out = out.sort_values(["dt_secs", "text_len", "depth", "st"], ignore_index=True)
    ref = df.sort_values(["dt_secs", "text_len", "depth", "st"], ignore_index=True)
    x = ref["dt_secs"].to_numpy()
    assert (out["dt_secs_norm"].to_numpy()
            == np.round(np.tanh(np.clip(x, 0.0, 3600.0) / 120.0), 6)).all()
    v = ref["text_len"].to_numpy().astype(np.float64)
    assert (out["text_len_norm"].to_numpy()
            == np.round(np.minimum(np.log1p(np.maximum(v, 0.0)) / np.log1p(2000.0), 1.0), 6)).all()
    d = ref["depth"].to_numpy().astype(np.float64)
    assert (out["depth_norm"].to_numpy()
            == np.round(np.power(np.clip(d / 50.0, 0.0, 1.0), 0.7), 6)).all()
    s = ref["st"].to_numpy()
    # rank == global CDF: count(v <= x) / N
    expect = np.round(
        np.searchsorted(np.sort(s), s, side="right") / len(s), 6
    )
    assert (out["st_norm"].to_numpy() == expect).all()
