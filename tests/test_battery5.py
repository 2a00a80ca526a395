"""Fifth indicator battery (stages/battery5.py) vs per-conversation
straight-line references: ADX/DMI Wilder recursion, truncated-recency
WMA + full-window Hull MA, Chaikin ADL + oscillator. The DuckDB bitwise
oracles live in the driver contract; these pin each kernel against an
independent loop, including conversation boundaries, warm-up windows and
flat-window edge cases."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery5 import (
    adx_frame,
    chaikin_frame,
    wma_frame,
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


def _groups(seed=11, n_conv=5, n=80, lo=0, hi=300):
    rng = np.random.default_rng(seed)
    return {
        f"c{k}": (
            rng.integers(lo, hi, size=n) / 10.0,
            rng.integers(1, 400, size=n),
        )
        for k in range(n_conv)
    }


def _per_conv(out, cid, col):
    return out[out["conv_id"] == cid].sort_values("turn_idx")[col].to_numpy()


def _us(dts):
    return np.round(np.asarray(dts) * 1e6).astype(np.int64)


def _bar(x, m=3):
    lo = np.array([x[max(0, i - m + 1) : i + 1].min() for i in range(len(x))])
    hi = np.array([x[max(0, i - m + 1) : i + 1].max() for i in range(len(x))])
    return lo, hi


def test_adx_straightline():
    groups = _groups(7)
    n, m = 14, 3
    out = adx_frame(_mk_turns(groups), n=n, bar=m)
    a = 1.0 / n
    for cid, (dts, _) in groups.items():
        x = _us(dts)
        lo, hi = _bar(x, m)
        dip, din, adx = [], [], []
        sp = sn = st = ax = 0.0
        for i in range(len(x)):
            if i == 0:
                dip.append(0.0)
                din.append(0.0)
                adx.append(0.0)
                continue
            up = hi[i] - hi[i - 1]
            dn = lo[i - 1] - lo[i]
            pdm = float(up) if (up > dn and up > 0) else 0.0
            ndm = float(dn) if (dn > up and dn > 0) else 0.0
            tr = float(max(hi[i] - lo[i], abs(hi[i] - x[i - 1]), abs(lo[i] - x[i - 1])))
            sp = sp + a * (pdm - sp)
            sn = sn + a * (ndm - sn)
            st = st + a * (tr - st)
            p = 100.0 * sp / st if st > 0.0 else 0.0
            q = 100.0 * sn / st if st > 0.0 else 0.0
            dx = 100.0 * abs(p - q) / (p + q) if p + q > 0.0 else 0.0
            ax = ax + a * (dx - ax)
            dip.append(p)
            din.append(q)
            adx.append(ax)
        np.testing.assert_array_equal(_per_conv(out, cid, "di_plus"), dip)
        np.testing.assert_array_equal(_per_conv(out, cid, "di_minus"), din)
        np.testing.assert_array_equal(_per_conv(out, cid, "adx"), adx)


def test_adx_flat_conversation_is_zero():
    # constant latency: hi==lo==c at every row -> no movement, no TR -> all 0
    groups = {"flat": (np.full(30, 5.0), np.full(30, 10))}
    out = adx_frame(_mk_turns(groups))
    for c in ("di_plus", "di_minus", "adx"):
        np.testing.assert_array_equal(out[c].to_numpy(), 0.0)


def test_wma_straightline():
    groups = _groups(13)
    w, h, s = 10, 5, 3
    den_w, den_h, den_s = 55, 15, 6
    out = wma_frame(_mk_turns(groups), w=w, h=h, s=s)
    for cid, (dts, _) in groups.items():
        x = _us(dts)

        def wnum(vals, i, win):
            lags = range(min(i + 1, win))
            num = sum((win - j) * int(vals[i - j]) for j in lags)
            den = sum(win - j for j in lags)
            return num, den

        wma, hma, ok = [], [], []
        r_int = [
            2 * wnum(x, i, h)[0] * den_w - wnum(x, i, w)[0] * den_h
            for i in range(len(x))
        ]
        for i in range(len(x)):
            numw, denw = wnum(x, i, w)
            wma.append(numw / denw)
            if i >= w + s - 2:
                numo, _ = wnum(r_int, i, s)
                hma.append(numo / float(den_s * den_h * den_w))
                ok.append(1)
            else:
                hma.append(0.0)
                ok.append(0)
        np.testing.assert_array_equal(_per_conv(out, cid, "wma"), wma)
        np.testing.assert_array_equal(_per_conv(out, cid, "hma"), hma)
        np.testing.assert_array_equal(_per_conv(out, cid, "hma_ok"), ok)


def test_wma_constant_series_equals_value():
    groups = {"c": (np.full(40, 7.0), np.full(40, 5))}
    out = wma_frame(_mk_turns(groups))
    np.testing.assert_allclose(out["wma"].to_numpy(), 7.0e6, rtol=0)
    full = out["hma_ok"].to_numpy() == 1
    np.testing.assert_allclose(out["hma"].to_numpy()[full], 7.0e6, rtol=0)


def test_chaikin_straightline():
    groups = _groups(29)
    m, fast, slow = 3, 3, 10
    out = chaikin_frame(_mk_turns(groups), bar=m, fast=fast, slow=slow)
    af, as_ = 2.0 / (fast + 1.0), 2.0 / (slow + 1.0)
    for cid, (dts, lens) in groups.items():
        x = _us(dts)
        lo, hi = _bar(x, m)
        adl_ref, chk_ref = [], []
        adl = e3 = e10 = 0.0
        for i in range(len(x)):
            rng_i = hi[i] - lo[i]
            mult = (2 * x[i] - hi[i] - lo[i]) / rng_i if rng_i > 0 else 0.0
            mfv = mult * float(lens[i])
            if i == 0:
                adl = mfv
                e3 = e10 = adl
                chk_ref.append(0.0)
            else:
                adl = adl + mfv
                e3 = e3 + af * (adl - e3)
                e10 = e10 + as_ * (adl - e10)
                chk_ref.append(e3 - e10)
            adl_ref.append(adl)
        np.testing.assert_array_equal(_per_conv(out, cid, "adl"), adl_ref)
        np.testing.assert_array_equal(_per_conv(out, cid, "chaikin"), chk_ref)


def test_empty_frames():
    empty = pd.DataFrame(
        {
            "conv_id": pd.Series(dtype="object"),
            "turn_idx": pd.Series(dtype="int64"),
            "ts_us": pd.Series(dtype="int64"),
            "dt_secs": pd.Series(dtype="float64"),
            "text_len": pd.Series(dtype="int64"),
        }
    )
    for fn in (adx_frame, wma_frame, chaikin_frame):
        out = fn(empty)
        assert len(out) == 0 and len(out.columns) >= 4
