"""Sixth indicator battery (stages/battery6.py) vs straight-line
references: rolling skewness/kurtosis from power sums and the closed-form
two-sided CUSUM. The DuckDB bitwise oracles live in the driver contract;
these pin each kernel against an independent per-conversation loop,
including conversation boundaries, warm-up windows, constant (zero-variance)
segments and the reflected-walk identity for the CUSUM recursion."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery6 import cusum_frame, moments_frame


def _mk_turns(groups):
    rows = []
    for cid, lens in groups.items():
        for i, tl in enumerate(lens):
            rows.append((cid, i, i * 1000, 0.0, int(tl)))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs", "text_len"]
    )
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _groups(seed=13, n_conv=6, n=90, lo=1, hi=500):
    rng = np.random.default_rng(seed)
    g = {f"c{k}": rng.integers(lo, hi, size=n) for k in range(n_conv)}
    g["flat"] = np.full(30, 42)  # zero-variance segment -> skew/kurt = 0
    g["one"] = np.array([7])
    return g


def _per_conv(out, cid, col):
    return out[out["conv_id"] == cid].sort_values("turn_idx")[col].to_numpy()


def test_moments_straightline():
    groups = _groups()
    w = 20
    out = moments_frame(_mk_turns(groups), w=w)
    for cid, lens in groups.items():
        x = np.asarray(lens, dtype=np.float64)
        skew_ref, kurt_ref = [], []
        for i in range(len(x)):
            win = x[max(0, i - w + 1) : i + 1]
            m = win.mean()
            m2 = ((win - m) ** 2).mean()
            if m2 > 1e-12:
                skew_ref.append(((win - m) ** 3).mean() / m2**1.5)
                kurt_ref.append(((win - m) ** 4).mean() / m2**2 - 3.0)
            else:
                skew_ref.append(0.0)
                kurt_ref.append(0.0)
        np.testing.assert_allclose(
            _per_conv(out, cid, "skew_20"), skew_ref, rtol=1e-9, atol=1e-9
        )
        np.testing.assert_allclose(
            _per_conv(out, cid, "kurt_20"), kurt_ref, rtol=1e-9, atol=1e-9
        )


def test_moments_flat_window_is_zero():
    out = moments_frame(_mk_turns({"flat": np.full(25, 100)}), w=20)
    assert (out["skew_20"] == 0.0).all()
    assert (out["kurt_20"] == 0.0).all()


def test_cusum_matches_recursion():
    groups = _groups(seed=29)
    k_up, k_dn, h_up, h_dn = 180, 140, 1500, 900
    out = cusum_frame(_mk_turns(groups), k_up=k_up, k_dn=k_dn, h_up=h_up, h_dn=h_dn)
    for cid, lens in groups.items():
        x = np.asarray(lens, dtype=np.int64)
        su = sd = 0
        up_ref, dn_ref = [], []
        for v in x:
            su = max(0, su + int(v) - k_up)
            sd = max(0, sd + k_dn - int(v))
            up_ref.append(su)
            dn_ref.append(sd)
        np.testing.assert_array_equal(_per_conv(out, cid, "cusum_up"), up_ref)
        np.testing.assert_array_equal(_per_conv(out, cid, "cusum_dn"), dn_ref)
        np.testing.assert_array_equal(
            _per_conv(out, cid, "alarm_up"), (np.array(up_ref) > h_up).astype(np.int64)
        )
        np.testing.assert_array_equal(
            _per_conv(out, cid, "alarm_dn"), (np.array(dn_ref) > h_dn).astype(np.int64)
        )


def test_cusum_alarm_fires_on_sustained_drift():
    # 30 rows at the mean, then a sustained +400 shift: the up detector must
    # alarm during the shifted regime and stay quiet before it
    lens = np.concatenate([np.full(30, 150), np.full(30, 550)])
    out = cusum_frame(_mk_turns({"c": lens}), k_up=180, h_up=1500)
    alarms = out.sort_values("turn_idx")["alarm_up"].to_numpy()
    assert alarms[:30].sum() == 0
    assert alarms[40:].all()


def test_empty_frames():
    empty = _mk_turns({}).iloc[0:0]
    m = moments_frame(empty)
    c = cusum_frame(empty)
    assert list(m.columns) == ["conv_id", "turn_idx", "ts_us", "skew_20", "kurt_20"]
    assert list(c.columns) == [
        "conv_id", "turn_idx", "ts_us", "cusum_up", "cusum_dn", "alarm_up", "alarm_dn",
    ]
    assert len(m) == 0 and len(c) == 0
