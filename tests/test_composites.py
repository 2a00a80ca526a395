"""MACD / band-width composites vs straight-line per-conversation oracles."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG
from quant_feature_pipeline_ray.stages.turn_features import compute_turn_features


def _fixture(n_convs=5, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        n = int(rng.integers(5, 200))
        dts = np.concatenate([[0], rng.integers(0, 200_000_000, n - 1)])
        ts = 1_700_000_000_000_000 + np.cumsum(dts)
        for i in range(n):
            rows.append(
                (f"c{c}", i, ["user", "assistant"][i % 2], f"text {c} {i}",
                 "" if i % 3 else "search", ts[i])
            )
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def test_macd_composites_vs_straight_line():
    cfg = DEFAULT_CONFIG
    out = compute_turn_features(_fixture(), cfg)
    fast, slow = cfg.ema_spans[0], cfg.ema_spans[-1]
    a = 2.0 / (cfg.macd_signal_span + 1.0)
    for _, g in out.groupby("conv_id", sort=False):
        macd_w = g[f"lat_ema_{fast}"].to_numpy() - g[f"lat_ema_{slow}"].to_numpy()
        assert (g["macd"].to_numpy() == macd_w).all()
        sig = np.empty(len(g))
        acc = macd_w[0]
        sig[0] = acc
        for i in range(1, len(g)):
            acc = (1 - a) * acc + a * macd_w[i]
            sig[i] = acc
        got = g["macd_signal"].to_numpy()
        assert np.allclose(got, sig, rtol=1e-12, atol=1e-15)
        assert (g["macd_hist"].to_numpy() == g["macd"].to_numpy() - got).all()


def test_band_width_and_rank_fuse_vs_straight_line():
    cfg = DEFAULT_CONFIG
    out = compute_turn_features(_fixture(seed=23), cfg)
    w = cfg.bw_window
    for _, g in out.groupby("conv_id", sort=False):
        sma = g[f"lat_sma_{w}"].to_numpy()
        std = g[f"lat_std_{w}"].to_numpy()
        bw_w = np.where(sma > 0, 4.0 * std / np.where(sma > 0, sma, 1.0), 0.0)
        got_bw = g[f"band_width_{w}"].to_numpy()
        assert (got_bw == bw_w).all()
        # rank fuse: per-row trailing-window mean percentile rank of bw
        fuse_w = np.zeros(len(g))
        for rw in cfg.bw_rank_windows:
            rk = np.empty(len(g))
            for i in range(len(g)):
                win = bw_w[max(0, i - rw + 1) : i + 1]
                rk[i] = ((win < bw_w[i]).sum() + 0.5 * ((win == bw_w[i]).sum() + 1)) / len(win)
            fuse_w += 0.5 * np.clip(rk, cfg.rank_clip[0], cfg.rank_clip[1])
        assert np.allclose(g["bw_rank_fuse"].to_numpy(), fuse_w, rtol=1e-12, atol=1e-12)


def test_flagship_contract_contains_composites():
    from quant_feature_pipeline_ray.pipelines.flagship import feature_schema_names

    names = feature_schema_names()
    for c in ("macd", "macd_signal", "macd_hist",
              f"band_width_{DEFAULT_CONFIG.bw_window}", "bw_rank_fuse"):
        assert c in names, c
