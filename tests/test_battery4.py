"""Fourth indicator battery (stages/battery4.py) + recursive adaptive
smoothers (stages/adaptive.py) vs per-conversation straight-line
references. The DuckDB bitwise oracles live in the driver contract; these
pin each kernel against an independent loop, including conversation
boundaries, warm-up windows, and tie/flat edge cases."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.adaptive import kama_frame, trix_frame
from quant_feature_pipeline_ray.stages.battery4 import (
    donchian_frame,
    ichimoku_frame,
    keltner_frame,
    roc_cmo_frame,
)


def _mk_turns(groups):
    rows = []
    for cid, dts in groups.items():
        for i, dt in enumerate(dts):
            rows.append((cid, i, i * 1000, float(dt)))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us", "dt_secs"])
    return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _groups(seed=11, n_conv=5, n=70, lo=0, hi=300):
    rng = np.random.default_rng(seed)
    return {f"c{k}": rng.integers(lo, hi, size=n) / 10.0 for k in range(n_conv)}


def _per_conv(out, cid, col):
    return out[out["conv_id"] == cid].sort_values("turn_idx")[col].to_numpy()


def _us(dts):
    return np.round(np.asarray(dts) * 1e6).astype(np.int64)


def test_donchian_straightline():
    groups = _groups(3, hi=30)  # small range -> flat windows exercised
    w = 20
    out = donchian_frame(_mk_turns(groups), window=w)
    for cid, dts in groups.items():
        x = _us(dts)
        mid, pos, bu, bd = [], [], [], []
        prev_mx = prev_mn = None
        for i in range(len(x)):
            win = x[max(0, i - w + 1) : i + 1]
            mn, mx = win.min(), win.max()
            mid.append((mx + mn) / 2.0)
            pos.append((x[i] - mn) / (mx - mn) if mx > mn else 0.0)
            bu.append(1 if prev_mx is not None and x[i] > prev_mx else 0)
            bd.append(1 if prev_mn is not None and x[i] < prev_mn else 0)
            prev_mx, prev_mn = mx, mn
        np.testing.assert_array_equal(_per_conv(out, cid, "dc_mid"), mid)
        np.testing.assert_array_equal(_per_conv(out, cid, "dc_pos"), pos)
        np.testing.assert_array_equal(_per_conv(out, cid, "dc_break_up"), bu)
        np.testing.assert_array_equal(_per_conv(out, cid, "dc_break_down"), bd)


def test_ichimoku_straightline():
    groups = _groups(7, n=80)
    p1, p2, p3, disp = 9, 26, 52, 26
    out = ichimoku_frame(_mk_turns(groups), p1=p1, p2=p2, p3=p3, disp=disp)
    for cid, dts in groups.items():
        x = _us(dts)
        n = len(x)

        def mid(i, p):
            win = x[max(0, i - p + 1) : i + 1]
            return (win.max() + win.min()) / 2.0

        tenkan = [mid(i, p1) for i in range(n)]
        kijun = [mid(i, p2) for i in range(n)]
        span_a = [(t + k) / 2.0 for t, k in zip(tenkan, kijun)]
        span_b = [mid(i, p3) for i in range(n)]
        chikou = [float(x[i + disp]) if i + disp < n else np.nan for i in range(n)]
        np.testing.assert_array_equal(_per_conv(out, cid, "tenkan"), tenkan)
        np.testing.assert_array_equal(_per_conv(out, cid, "kijun"), kijun)
        np.testing.assert_array_equal(_per_conv(out, cid, "span_a"), span_a)
        np.testing.assert_array_equal(_per_conv(out, cid, "span_b"), span_b)
        got = _per_conv(out, cid, "chikou")
        assert np.isnan(got[-disp:]).all()  # no lead past the conversation end
        np.testing.assert_array_equal(got[: n - disp], chikou[: n - disp])


def test_roc_cmo_straightline():
    groups = _groups(5)
    wr, wc = 12, 14
    out = roc_cmo_frame(_mk_turns(groups), roc_window=wr, cmo_window=wc)
    for cid, dts in groups.items():
        x = _us(dts)
        n = len(x)
        roc, cmo = [], []
        delta = np.diff(x, prepend=x[:1])
        delta[0] = 0
        for i in range(n):
            base = x[i - wr] if i >= wr else None
            roc.append(100.0 * (x[i] - base) / base if base else 0.0)
            d = delta[max(0, i - wc + 1) : i + 1]
            su = int(d[d > 0].sum())
            sd = int(-d[d < 0].sum())
            cmo.append(100.0 * (su - sd) / (su + sd) if su + sd > 0 else 0.0)
        np.testing.assert_array_equal(_per_conv(out, cid, "roc"), roc)
        np.testing.assert_array_equal(_per_conv(out, cid, "cmo"), cmo)


def test_keltner_straightline():
    groups = _groups(9)
    w, m, mult = 20, 3, 2.0
    out = keltner_frame(_mk_turns(groups), window=w, bar=m, mult=mult)
    for cid, dts in groups.items():
        x = _us(dts)
        n = len(x)
        hi = np.array([x[max(0, i - m + 1) : i + 1].max() for i in range(n)])
        lo = np.array([x[max(0, i - m + 1) : i + 1].min() for i in range(n)])
        center, band, pos = [], [], []
        for i in range(n):
            s = slice(max(0, i - w + 1), i + 1)
            n_in = i + 1 - max(0, i - w + 1)
            s_tp = int((hi[s] + lo[s] + x[s]).sum())
            s_r = int((hi[s] - lo[s]).sum())
            c = s_tp / (3.0 * n_in)
            b = mult * (s_r / n_in)
            center.append(c)
            band.append(b)
            pos.append((float(x[i]) - (c - b)) / ((c + b) - (c - b)) if s_r > 0 else 0.0)
        np.testing.assert_array_equal(_per_conv(out, cid, "kc_center"), center)
        np.testing.assert_array_equal(_per_conv(out, cid, "kc_band"), band)
        np.testing.assert_array_equal(_per_conv(out, cid, "kc_pos"), pos)


def test_trix_straightline():
    groups = _groups(13)
    span = 15
    alpha = 2.0 / (span + 1.0)
    out = trix_frame(_mk_turns(groups), span=span)
    for cid, dts in groups.items():
        x = _us(dts).astype(np.float64)
        e1 = e2 = e3 = x[0]
        ref = [0.0]
        for i in range(1, len(x)):
            e3p = e3
            e1 = e1 + alpha * (x[i] - e1)
            e2 = e2 + alpha * (e1 - e2)
            e3 = e3 + alpha * (e2 - e3)
            ref.append(100.0 * (e3 - e3p) / e3p if e3p != 0.0 else 0.0)
        np.testing.assert_array_equal(_per_conv(out, cid, "trix"), ref)


def test_trix_zero_base_guard():
    # all-zero latency: e3 stays 0, trix must emit 0, not NaN/inf
    out = trix_frame(_mk_turns({"z": [0.0] * 20}))
    np.testing.assert_array_equal(out["trix"].to_numpy(), np.zeros(20))


def test_kama_straightline():
    groups = _groups(17)
    w, fast, slow = 10, 2, 30
    fsc, ssc = 2.0 / (fast + 1.0), 2.0 / (slow + 1.0)
    out = kama_frame(_mk_turns(groups), er_window=w, fast=fast, slow=slow)
    for cid, dts in groups.items():
        x = _us(dts)
        xf = x.astype(np.float64)
        n = len(x)
        ers, kamas = [], []
        k = xf[0]
        for i in range(n):
            base = x[i - w] if i >= w else x[0]
            change = abs(int(x[i]) - int(base))
            vol = int(np.abs(np.diff(x[max(0, i - w) : i + 1])).sum())
            er = change / vol if vol > 0 else 0.0
            sc = er * (fsc - ssc) + ssc
            sc = sc * sc
            k = xf[i] if i == 0 else k + sc * (xf[i] - k)
            ers.append(er)
            kamas.append(k)
        np.testing.assert_array_equal(_per_conv(out, cid, "er"), ers)
        np.testing.assert_array_equal(_per_conv(out, cid, "kama"), kamas)


def test_kama_flat_series_sticks():
    # zero movement -> er=0, sc=ssc^2 but (x-k)=0, so kama == x everywhere
    out = kama_frame(_mk_turns({"f": [5.0] * 30}))
    np.testing.assert_array_equal(out["kama"].to_numpy(), np.full(30, 5e6))
    np.testing.assert_array_equal(out["er"].to_numpy(), np.zeros(30))


def test_empty_frames_schema():
    empty = _mk_turns({})
    for fn, cols in [
        (donchian_frame, ["dc_mid", "dc_pos", "dc_break_up", "dc_break_down"]),
        (ichimoku_frame, ["tenkan", "kijun", "span_a", "span_b", "chikou"]),
        (roc_cmo_frame, ["roc", "cmo"]),
        (keltner_frame, ["kc_center", "kc_band", "kc_pos"]),
        (trix_frame, ["trix"]),
        (kama_frame, ["er", "kama"]),
    ]:
        out = fn(empty)
        assert len(out) == 0
        for c in cols:
            assert c in out.columns
