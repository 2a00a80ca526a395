"""events_weighted_quantiles: parity vs a straight-line per-row weighted
quantile, plus weight-sensitivity (a heavy row must pull the quantile)."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.events import events_weighted_quantiles


def straight_wq(df: pd.DataFrame, num: int, den: int) -> dict:
    out = {}
    for et, g in df.groupby("event_type"):
        g = g.sort_values("value")
        w = (g["user_id"] % 10 + 1).to_numpy(dtype=np.int64)
        cw = np.cumsum(w)
        W = int(cw[-1])
        out[et] = float(g["value"].to_numpy()[np.searchsorted(cw * den, W * num)])
    return out


@pytest.fixture(scope="module")
def events_df(ray_session, tmp_path_factory):
    rng = np.random.RandomState(3)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(rng.randint(0, 10**6, n), "s"),
            "user_id": rng.randint(0, 500, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.randn(n) * 10, 2),
            "props": ["{}"] * n,
        }
    )
    sf = tmp_path_factory.mktemp("wq")
    df.to_parquet(sf / "events.parquet")
    got = events_weighted_quantiles(str(sf / "events.parquet"))
    return df, got.set_index("event_type")


def test_matches_straight_line(events_df):
    df, got = events_df
    for num, den, col in ((1, 2, "wq50"), (9, 10, "wq90")):
        exp = straight_wq(df, num, den)
        for et, v in exp.items():
            assert got.loc[et, col] == v, (et, col)


def test_weight_sensitivity(ray_session, tmp_path):
    # one user with weight 10 on a huge value vs nine users w=1 on small
    # values: weighted median must land on the heavy value, the unweighted
    # median would not
    df = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "ts": pd.to_datetime("2026-01-01"),
            "user_id": np.array([9] + [0] * 9, dtype=np.int64),  # w=10 vs w=1
            "event_type": ["x"] * 10,
            "value": np.array([100.0] + list(np.arange(9, dtype=np.float64))),
            "props": ["{}"] * 10,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = events_weighted_quantiles(str(tmp_path / "events.parquet"))
    # W = 19, need cw >= 9.5 -> cw=10 is reached within values 0..8 (w=1
    # each, cw=9) plus the heavy 100 -> median = 100? cw after value 8 is
    # 9 < 9.5, so the pick is the heavy value
    assert got.loc[0, "wq50"] == 100.0
    assert float(np.median(df["value"])) != 100.0
