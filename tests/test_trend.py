"""ATR / SuperTrend analogue kernels (stages/trend.py, W12 battery tail)."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.trend import atr_frame, supertrend_frame


def _mk_turns(groups):
    rows = []
    for cid, dts in groups.items():
        for i, dt in enumerate(dts):
            rows.append((cid, i, i * 1000, float(dt)))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs"])
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _atr_straightline(dts, w):
    dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
    tr = np.abs(np.diff(dt_us, prepend=dt_us[:1]))
    tr[0] = 0
    atr, atr_pct = [], []
    for i in range(len(dts)):
        s = max(0, i - w + 1)
        trs, dts_sum, n = tr[s : i + 1].sum(), dt_us[s : i + 1].sum(), i + 1 - s
        atr.append(trs / (n * 1e6))
        atr_pct.append(trs / dts_sum if dts_sum > 0 else 0.0)
    return atr, atr_pct


def test_atr_matches_straightline_per_conv():
    rng = np.random.default_rng(7)
    groups = {f"c{k}": rng.integers(0, 500, size=40) / 10.0 for k in range(5)}
    out = atr_frame(_mk_turns(groups), window=14)
    for cid, dts in groups.items():
        sub = out[out["conv_id"] == cid].sort_values("turn_idx")
        atr, atr_pct = _atr_straightline(dts, 14)
        assert np.allclose(sub["atr14"].to_numpy(), atr)
        assert np.allclose(sub["atr_pct"].to_numpy(), atr_pct)


def _supertrend_straightline(dts, w, m):
    dt_us = np.round(np.asarray(dts) * 1e6).astype(np.int64)
    tr = np.abs(np.diff(dt_us, prepend=dt_us[:1]))
    tr[0] = 0
    dirs = []
    fub = flb = 0.0
    prev = 0.0
    d = 1
    for i in range(len(dts)):
        s = max(0, i - w + 1)
        n = i + 1 - s
        mid = dt_us[s : i + 1].sum() / n
        atr = tr[s : i + 1].sum() / n
        bu, bl = mid + m * atr, mid - m * atr
        if i == 0:
            fub, flb, d = bu, bl, 1
        else:
            fub = bu if (bu < fub or prev > fub) else fub
            flb = bl if (bl > flb or prev < flb) else flb
            if dt_us[i] > fub:
                d = 1
            elif dt_us[i] < flb:
                d = -1
        dirs.append(d)
        prev = float(dt_us[i])
    return dirs


def test_supertrend_matches_straightline_and_flips():
    # a conversation that trends calm -> spike -> calm must flip direction
    groups = {
        # spike up then a steady descent: tight bands around the ramp make
        # dt_i < final_lb so the direction flips to -1
        "up": [1.0] * 12 + [50.0, 60.0, 70.0] + [float(x) for x in range(40, 15, -1)],
        "flat": [5.0] * 20,
    }
    rng = np.random.default_rng(11)
    groups["noise"] = (rng.integers(0, 300, size=50) / 10.0).tolist()
    out = supertrend_frame(_mk_turns(groups), window=10, mult=3.0)
    for cid, dts in groups.items():
        sub = out[out["conv_id"] == cid].sort_values("turn_idx")
        exp = _supertrend_straightline(dts, 10, 3.0)
        assert sub["supertrend_direction"].tolist() == exp, cid
    spike = out[out["conv_id"] == "up"]["supertrend_direction"].to_numpy()
    assert (spike == 1).any() and (spike == -1).any()  # it actually flips


def test_conv_state_never_leaks_across_conversations():
    # identical conv payloads in one bucket == each computed alone
    payload = [2.0, 3.0, 100.0, 2.0, 2.0, 2.0, 90.0, 1.0]
    both = _mk_turns({"a": payload, "b": payload})
    one = _mk_turns({"a": payload})
    st_both = supertrend_frame(both, window=4, mult=2.0)
    st_one = supertrend_frame(one, window=4, mult=2.0)
    a = st_both[st_both["conv_id"] == "a"]["supertrend_direction"].tolist()
    b = st_both[st_both["conv_id"] == "b"]["supertrend_direction"].tolist()
    assert a == b == st_one["supertrend_direction"].tolist()
    at_both = atr_frame(both, window=4)
    assert (
        at_both[at_both["conv_id"] == "a"]["atr14"].tolist()
        == at_both[at_both["conv_id"] == "b"]["atr14"].tolist()
    )
