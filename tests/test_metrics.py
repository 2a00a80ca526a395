import math

import numpy as np
import pytest

from quant_feature_pipeline_ray.functions.windows import parse_window, window_label
from quant_feature_pipeline_ray.manifest import export_contract, validate_contract


def test_parse_window():
    assert parse_window("5m") == 300
    assert parse_window("2h") == 7200
    assert parse_window("90s") == 90
    assert parse_window("1d") == 86400
    assert parse_window(1800) == 1800
    assert window_label(300) == "5m"
    assert window_label(7200) == "2h"
    with pytest.raises(ValueError):
        parse_window("5 bananas")


def test_contract_roundtrip(tmp_path):
    out = str(tmp_path)
    c = export_contract(out)
    assert c["n_features"] == len(c["feature_names"]) > 40
    assert len(c["schema_sha"]) == 40
    validate_contract(out)  # no raise
    import json, os

    path = os.path.join(out, "contract.json")
    stored = json.load(open(path))
    stored["schema_sha"] = "0" * 40
    json.dump(stored, open(path, "w"))
    with pytest.raises(ValueError, match="contract mismatch"):
        validate_contract(out)


def test_health_check_gate(ray_session, sf001_transcripts):
    import ray.data

    from quant_feature_pipeline_ray.metrics import health_check
    from quant_feature_pipeline_ray.pipelines.flagship import transcript_features

    ds = transcript_features(sf001_transcripts)
    report = health_check(ds)
    assert report["ok"] and report["rows"] > 0
    with pytest.raises(ValueError, match="health check failed"):
        health_check(ds, bounds={"dt_secs": (0.0, 1.0)})  # absurd bound trips the gate


def test_power_calibrate_and_governance():
    from quant_feature_pipeline_ray.stages.normalize import (
        log1p_unit,
        power_calibrate,
        winsorize_tanh,
    )

    x = np.array([-1.0, 0.0, 0.25, 1.0, 2.0])
    p = power_calibrate(x, 0.5)
    assert p[0] == 0.0 and p[3] == 1.0 and p[4] == 1.0
    assert np.isclose(p[2], 0.5)
    g = winsorize_tanh(np.array([0.0, 1e9]), 0.0, 3600.0, 120.0)
    assert g[0] == 0.0 and g[1] < 1.0 + 1e-12
    u = log1p_unit(np.array([0.0, 3600.0, 1e9]), 3600.0)
    assert u[0] == 0.0 and np.isclose(u[1], 1.0) and u[2] == 1.0


def test_time_window_counts_simple():
    from quant_feature_pipeline_ray.stages.turn_features import time_window_counts

    ts = np.array([0, 100, 250, 400, 1000], dtype=np.int64) * 1_000_000
    new_conv = np.array([True, False, False, False, False])
    out = time_window_counts(ts, new_conv, 300)
    # (ts-300s, ts] windows: row3 at 400s covers (100,400] -> rows at 250,400
    assert out.tolist() == [1, 2, 3, 2, 1]


def test_lerp_quantile_bitwise_vs_numpy():
    """The histogram quantile must equal np.quantile(..., 'linear') BITWISE
    on fuzzed data (including duplicates) — the distributed two-pass
    calibration depends on it."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.normalize import _lerp_quantile

    rng = np.random.default_rng(11)
    for trial in range(50):
        n = int(rng.integers(1, 500))
        # duplicated, quantized values — the bounded-cardinality case
        x = np.round(rng.exponential(10.0, size=n), 2)
        vals, counts = np.unique(x, return_counts=True)
        for q in (0.0, 0.001, 0.25, 0.5, 0.75, 0.999, 1.0):
            a = _lerp_quantile(vals, counts, q)
            b = float(np.quantile(x, q, method="linear"))
            assert a == b, (trial, q, a, b)


def test_global_quantiles_distributed_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from quant_feature_pipeline_ray.stages.normalize import global_quantiles

    rng = np.random.default_rng(3)
    x = np.round(rng.gamma(2.0, 20.0, size=20_000), 3)
    ds = ray.data.from_pandas(pd.DataFrame({"dt": x})).repartition(8)
    qs = global_quantiles(ds, "dt", (0.001, 0.5, 0.999))
    for q, v in qs.items():
        assert v == float(np.quantile(x, q, method="linear")), q
