"""Second indicator battery (stages/battery2.py) vs per-conversation
straight-line O(N·w) references — the reserved-slot indicators
(congfigs/base_indicators.yaml:36-52) transposed to transcript latency."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery2 import (
    cci_frame,
    linreg_frame,
    mfi_frame,
    obv_frame,
    stochastic_frame,
    ultimate_frame,
    volatility_frame,
)


def _mk_turns(groups):
    rows = []
    for cid, (dts, lens) in groups.items():
        for i, (dt, tl) in enumerate(zip(dts, lens)):
            rows.append((cid, i, i * 1000, float(dt), int(tl)))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs", "text_len"]
    )
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _groups(seed=11, n_conv=6, n=60):
    rng = np.random.default_rng(seed)
    return {
        f"c{k}": (
            rng.integers(0, 400, size=n) / 10.0,
            rng.integers(0, 300, size=n),
        )
        for k in range(n_conv)
    }


def _per_conv(out, cid, col):
    return out[out["conv_id"] == cid].sort_values("turn_idx")[col].to_numpy()


def test_stochastic_matches_straightline():
    groups = _groups(1)
    out = stochastic_frame(_mk_turns(groups), window=14)
    for cid, (dts, _) in groups.items():
        dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        ks, ds_, wrs = [], [], []
        for i in range(len(dts)):
            s = max(0, i - 13)
            win = dt_us[s : i + 1]
            mn, mx = win.min(), win.max()
            k = 100.0 * (dt_us[i] - mn) / (mx - mn) if mx > mn else 0.0
            wr = -100.0 * (mx - dt_us[i]) / (mx - mn) if mx > mn else 0.0
            ks.append(k)
            wrs.append(wr)
            last3 = ks[max(0, i - 2) : i + 1]
            ds_.append(sum(last3) / len(last3))
        assert np.allclose(_per_conv(out, cid, "stoch_k"), ks)
        assert np.allclose(_per_conv(out, cid, "stoch_d"), ds_)
        assert np.allclose(_per_conv(out, cid, "williams_r"), wrs)
    # range invariants
    assert (out["stoch_k"].to_numpy() >= 0).all() and (out["stoch_k"] <= 100).all()
    assert (out["williams_r"].to_numpy() <= 0).all() and (out["williams_r"] >= -100).all()


def test_cci_matches_straightline():
    groups = _groups(2)
    out = cci_frame(_mk_turns(groups), window=14)
    for cid, (dts, _) in groups.items():
        x = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        ref = []
        for i in range(len(x)):
            s = max(0, i - 13)
            win = x[s : i + 1].astype(np.float64)
            m = win.mean()
            mad = np.abs(win - m).mean()
            ref.append((x[i] - m) / (0.015 * mad) if mad > 0 else 0.0)
        assert np.allclose(_per_conv(out, cid, "cci"), ref)


def test_mfi_matches_straightline():
    groups = _groups(3)
    out = mfi_frame(_mk_turns(groups), window=14)
    for cid, (dts, lens) in groups.items():
        dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        flow = np.asarray(lens, dtype=np.int64) * (dt_us // 10_000)
        delta = np.diff(dt_us, prepend=dt_us[:1])
        delta[0] = 0
        ref = []
        for i in range(len(dts)):
            s = max(0, i - 13)
            p = flow[s : i + 1][delta[s : i + 1] > 0].sum()
            n = flow[s : i + 1][delta[s : i + 1] < 0].sum()
            ref.append(100.0 * p / (p + n) if p + n > 0 else 50.0)
        assert np.allclose(_per_conv(out, cid, "mfi"), ref)


def test_obv_matches_straightline():
    groups = _groups(4)
    out = obv_frame(_mk_turns(groups))
    for cid, (dts, lens) in groups.items():
        dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        delta = np.diff(dt_us, prepend=dt_us[:1])
        delta[0] = 0
        ref = np.cumsum(np.sign(delta) * np.asarray(lens, dtype=np.int64))
        assert (_per_conv(out, cid, "obv") == ref).all()


def test_volatility_matches_straightline():
    groups = _groups(5)
    out = volatility_frame(_mk_turns(groups))
    for cid, (dts, _) in groups.items():
        dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        delta = np.diff(dt_us, prepend=dt_us[:1])
        delta[0] = 0
        d = np.abs(delta) // 100_000
        for w in (20, 50, 100):
            ref = []
            for i in range(len(dts)):
                s = max(0, i - w + 1)
                win = d[s : i + 1]
                ref.append(np.sqrt((win.astype(np.float64) ** 2).mean()))
            assert np.allclose(_per_conv(out, cid, f"rv_{w}"), ref)


def test_linreg_matches_polyfit():
    groups = _groups(6)
    out = linreg_frame(_mk_turns(groups), window=14)
    for cid, (dts, _) in groups.items():
        y = (np.round(np.asarray(dts) * 1e6).astype(np.int64) // 10_000).astype(
            np.float64
        )
        slopes, devs = [], []
        for i in range(len(y)):
            s = max(0, i - 13)
            win = y[s : i + 1]
            n = len(win)
            if n == 1 or np.ptp(np.arange(n)) == 0:
                slopes.append(0.0)
                devs.append(0.0)
                continue
            b, a = np.polyfit(np.arange(n), win, 1)
            slopes.append(b)
            devs.append(win[-1] - (a + b * (n - 1)))
        assert np.allclose(_per_conv(out, cid, "linreg_slope"), slopes)
        assert np.allclose(_per_conv(out, cid, "linreg_dev"), devs, atol=1e-8)


def test_ultimate_matches_straightline():
    groups = _groups(7)
    out = ultimate_frame(_mk_turns(groups))
    for cid, (dts, _) in groups.items():
        dt = np.round(np.asarray(dts) * 1e6).astype(np.int64)
        prev = np.concatenate([dt[:1], dt[:-1]])
        bp = dt - np.minimum(dt, prev)
        tr = np.abs(dt - prev)
        ref = []
        for i in range(len(dt)):
            a = []
            for w in (7, 14, 28):
                s = max(0, i - w + 1)
                ts_ = tr[s : i + 1].sum()
                a.append(bp[s : i + 1].sum() / ts_ if ts_ > 0 else 0.0)
            ref.append(100.0 * (4 * a[0] + 2 * a[1] + a[2]) / 7.0)
        assert np.allclose(_per_conv(out, cid, "uo"), ref)


def test_constant_series_all_neutral():
    groups = {"c0": (np.full(30, 5.0), np.full(30, 100))}
    turns = _mk_turns(groups)
    assert (stochastic_frame(turns)["stoch_k"] == 0.0).all()
    assert (cci_frame(turns)["cci"] == 0.0).all()
    assert (mfi_frame(turns)["mfi"] == 50.0).all()
    assert (obv_frame(turns)["obv"] == 0).all()
    assert (volatility_frame(turns)[["rv_20", "rv_50", "rv_100"]] == 0.0).all().all()
    assert (linreg_frame(turns)["linreg_slope"] == 0.0).all()
    assert (ultimate_frame(turns)["uo"] == 0.0).all()


def test_empty_frame_schema_stable():
    empty = _mk_turns({})
    for fn, cols in [
        (stochastic_frame, ["stoch_k", "stoch_d", "williams_r"]),
        (cci_frame, ["cci"]),
        (mfi_frame, ["mfi"]),
        (obv_frame, ["obv"]),
        (volatility_frame, ["rv_20", "rv_50", "rv_100"]),
        (linreg_frame, ["linreg_slope", "linreg_dev"]),
        (ultimate_frame, ["uo"]),
    ]:
        out = fn(empty)
        assert len(out) == 0 and all(c in out.columns for c in cols)
