"""Per-kernel allclose tests vs the straight-line oracle (FIXTURES.md inv 2)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG
from quant_feature_pipeline_ray.stages.turn_features import compute_turn_features
from tests.oracle_pandas import per_conv_oracle


@pytest.fixture(scope="module")
def engine_and_oracle(sf001_transcripts):
    raw = pq.read_table(sf001_transcripts).to_pandas()
    # keep a subset of conversations for the O(N*w) python oracle
    keep = sorted(raw["conv_id"].unique())[:30]
    raw = raw[raw["conv_id"].isin(keep)]
    eng = compute_turn_features(raw, DEFAULT_CONFIG)
    ora = per_conv_oracle(raw, DEFAULT_CONFIG)
    assert len(eng) == len(ora)
    return eng, ora


@pytest.mark.parametrize(
    "col,tol",
    [
        ("dt_secs", 0.0),
        ("lat_ema_5", 1e-9),
        ("lat_ema_20", 1e-9),
        ("lat_rank_20", 1e-12),
        ("gap_event", 0.0),
        ("session_id", 0.0),
        ("session_turn", 0.0),
        ("lat_sma_5", 1e-9),
        ("lat_sma_20", 1e-9),
        ("lat_std_5", 1e-7),
        ("lat_std_20", 1e-7),
    ],
)
def test_kernel_matches_oracle(engine_and_oracle, col, tol):
    eng, ora = engine_and_oracle
    a, b = eng[col].to_numpy(dtype=float), ora[col].to_numpy(dtype=float)
    assert np.allclose(a, b, atol=tol, rtol=tol), (
        f"{col}: max abs diff {np.abs(a - b).max()}"
    )


def test_mega_conversation_present(engine_and_oracle):
    eng, _ = engine_and_oracle
    sizes = eng.groupby("conv_id").size()
    assert sizes.max() > 50 * sizes.median()  # skew fixture reaches the kernels


def test_lag_and_lead(engine_and_oracle):
    eng, _ = engine_and_oracle
    g = eng[eng["conv_id"] == eng["conv_id"].iloc[0]]
    dt = g["dt_secs"].to_numpy()
    lag1 = g["lat_lag_1"].to_numpy()
    lead1 = g["lat_lead_1"].to_numpy()
    assert lag1[0] == 0.0
    assert np.allclose(lag1[1:], dt[:-1])
    assert np.allclose(lead1[:-1], dt[1:])
    assert lead1[-1] == 0.0


def test_rolling_cov_corr_int_matches_loop():
    """rolling_cov_corr_int vs an O(N·w) straight-line loop, exact ints."""
    import numpy as np

    from quant_feature_pipeline_ray.stages.turn_features import (
        _conv_segments,
        rolling_cov_corr_int,
    )

    rng = np.random.default_rng(11)
    conv = np.sort(rng.integers(0, 7, 400))
    dt_us = rng.integers(0, 500_000_000, 400)  # up to 500 s
    y = rng.integers(0, 3000, 400)
    _, rn = _conv_segments(conv)
    w = 9
    cov_num, varx_num, vary_num, corr = rolling_cov_corr_int(dt_us, y, rn, w)
    x = dt_us // 10_000
    for i in range(len(conv)):
        s = i - min(rn[i] + 1, w) + 1
        xs, ys = x[s : i + 1].astype(object), y[s : i + 1].astype(object)
        n = len(xs)
        cn = n * sum(xs * ys) - sum(xs) * sum(ys)
        vx = n * sum(xs * xs) - sum(xs) ** 2
        vy = n * sum(ys * ys) - sum(ys) ** 2
        assert cov_num[i] == cn and varx_num[i] == vx and vary_num[i] == vy
        if n >= 2 and vx > 0 and vy > 0:
            assert corr[i] == cn / np.sqrt(np.float64(vx) * np.float64(vy))
        else:
            assert np.isnan(corr[i])


def test_rolling_cov_corr_int_overflow_guard():
    import numpy as np
    import pytest

    from quant_feature_pipeline_ray.stages.turn_features import rolling_cov_corr_int

    huge = np.array([0, 2**52], dtype=np.int64)  # dt_cs ~ 2^38.7; w²m² > 2^63
    rn = np.array([0, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="int64-exact bound"):
        rolling_cov_corr_int(huge, np.array([1, 1], dtype=np.int64), rn, 20)
