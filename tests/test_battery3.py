"""Third indicator battery (stages/battery3.py) vs per-conversation
straight-line O(N·w) references — Aroon and Vortex analogues over
transcript latency (the DuckDB bitwise oracles live in the driver
contract; these pin the kernel against an independent loop)."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery3 import aroon_frame, vortex_frame


def _mk_turns(groups):
    rows = []
    for cid, dts in groups.items():
        for i, dt in enumerate(dts):
            rows.append((cid, i, i * 1000, float(dt)))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs"])
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _groups(seed=11, n_conv=6, n=60, lo=0, hi=400):
    rng = np.random.default_rng(seed)
    # small value range on purpose: forces ties in the window extrema so the
    # most-recent-occurrence tiebreak is actually exercised
    return {f"c{k}": rng.integers(lo, hi, size=n) / 10.0 for k in range(n_conv)}


def _per_conv(out, cid, col):
    return out[out["conv_id"] == cid].sort_values("turn_idx")[col].to_numpy()


def test_aroon_matches_straightline():
    groups = _groups(3, hi=40)  # heavy ties
    w = 25
    out = aroon_frame(_mk_turns(groups), window=w)
    for cid, dts in groups.items():
        dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        ups, downs = [], []
        for i in range(len(dts)):
            s = max(0, i - (w - 1))
            win = dt_us[s : i + 1]
            n = len(win)
            if n == 1:
                ups.append(100.0)
                downs.append(100.0)
                continue
            # most-recent occurrence of the extremum
            k_max = (n - 1) - int(np.flatnonzero(win == win.max())[-1])
            k_min = (n - 1) - int(np.flatnonzero(win == win.min())[-1])
            ups.append(100.0 * (n - 1 - k_max) / (n - 1))
            downs.append(100.0 * (n - 1 - k_min) / (n - 1))
        np.testing.assert_array_equal(_per_conv(out, cid, "aroon_up"), ups)
        np.testing.assert_array_equal(_per_conv(out, cid, "aroon_down"), downs)
        np.testing.assert_array_equal(
            _per_conv(out, cid, "aroon_osc"), np.asarray(ups) - np.asarray(downs)
        )


def test_aroon_bounds_and_fresh_extremes():
    out = aroon_frame(_mk_turns(_groups(5)), window=25)
    assert (out["aroon_up"] >= 0).all() and (out["aroon_up"] <= 100).all()
    assert (out["aroon_down"] >= 0).all() and (out["aroon_down"] <= 100).all()
    # a row that IS the window max must read aroon_up == 100
    df = _mk_turns({"c": [1.0, 2.0, 3.0, 99.0]})
    got = aroon_frame(df, window=25)
    assert got["aroon_up"].iloc[-1] == 100.0


def test_vortex_matches_straightline():
    groups = _groups(7)
    w, m = 14, 3
    out = vortex_frame(_mk_turns(groups), window=w, bar=m)
    for cid, dts in groups.items():
        dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        n = len(dt_us)
        hi = np.array([dt_us[max(0, i - m + 1) : i + 1].max() for i in range(n)])
        lo = np.array([dt_us[max(0, i - m + 1) : i + 1].min() for i in range(n)])
        vmp = np.zeros(n, dtype=np.int64)
        vmm = np.zeros(n, dtype=np.int64)
        tr = np.zeros(n, dtype=np.int64)
        for i in range(1, n):
            vmp[i] = abs(hi[i] - lo[i - 1])
            vmm[i] = abs(lo[i] - hi[i - 1])
            tr[i] = max(hi[i], dt_us[i - 1]) - min(lo[i], dt_us[i - 1])
        vip, vim = [], []
        for i in range(n):
            s = max(0, i - (w - 1))
            st = tr[s : i + 1].sum()
            vip.append(vmp[s : i + 1].sum() / st if st > 0 else 0.0)
            vim.append(vmm[s : i + 1].sum() / st if st > 0 else 0.0)
        np.testing.assert_array_equal(_per_conv(out, cid, "vi_plus"), vip)
        np.testing.assert_array_equal(_per_conv(out, cid, "vi_minus"), vim)


def test_vortex_conv_start_isolated():
    # two conversations back to back: the second's first row must not see
    # the first's micro-bar (vm/tr are 0 at every conv start)
    df = _mk_turns({"a": [5.0, 9.0, 1.0], "b": [100.0, 2.0]})
    out = vortex_frame(df, window=14, bar=3)
    assert out[out["conv_id"] == "b"]["vi_plus"].iloc[0] == 0.0
    assert out[out["conv_id"] == "b"]["vi_minus"].iloc[0] == 0.0


def test_empty_frames():
    empty = _mk_turns({}).head(0)
    assert list(aroon_frame(empty).columns) == [
        "conv_id", "turn_idx", "ts_us", "aroon_up", "aroon_down", "aroon_osc",
    ]
    assert list(vortex_frame(empty).columns) == [
        "conv_id", "turn_idx", "ts_us", "vi_plus", "vi_minus",
    ]
