"""Seventh indicator battery (stages/battery7.py) vs straight-line
references: Force Index EMA, Elder Ray bull/bear power, Coppock-style
WMA of dual-horizon momentum. The DuckDB bitwise oracles live in the
driver contract; these pin each kernel against an independent loop,
including conversation boundaries and warm-up windows."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.stages.battery7 import (
    coppock_frame,
    elder_frame,
    force_frame,
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


def _groups(seed=17, n_conv=5, n=70):
    rng = np.random.default_rng(seed)
    return {
        f"c{k}": (
            rng.integers(0, 3000, size=n) / 10.0,
            rng.integers(1, 400, size=n),
        )
        for k in range(n_conv)
    }


def _per_conv(out, cid, col):
    return out[out["conv_id"] == cid].sort_values("turn_idx")[col].to_numpy()


def _us(dts):
    return np.round(np.asarray(dts) * 1e6).astype(np.int64)


def test_force_straightline():
    groups = _groups(3)
    span = 13
    out = force_frame(_mk_turns(groups), span=span)
    a = 2.0 / (span + 1.0)
    for cid, (dts, lens) in groups.items():
        x = _us(dts)
        fr = np.concatenate([[0], np.asarray(lens[1:], dtype=np.int64) * np.diff(x)])
        e = float(fr[0])
        ref = [e]
        for v in fr[1:]:
            e = e + a * (v - e)
            ref.append(e)
        np.testing.assert_array_equal(_per_conv(out, cid, "fr"), fr)
        np.testing.assert_allclose(_per_conv(out, cid, "force_13"), ref, rtol=1e-12)


def test_elder_straightline():
    groups = _groups(5)
    span, m = 13, 3
    out = elder_frame(_mk_turns(groups), span=span, bar=m)
    a = 2.0 / (span + 1.0)
    for cid, (dts, _) in groups.items():
        x = _us(dts)
        e = float(x[0])
        ema = [e]
        for v in x[1:]:
            e = e + a * (v - e)
            ema.append(e)
        hi = np.array([x[max(0, i - m + 1) : i + 1].max() for i in range(len(x))])
        lo = np.array([x[max(0, i - m + 1) : i + 1].min() for i in range(len(x))])
        np.testing.assert_allclose(_per_conv(out, cid, "ema_13"), ema, rtol=1e-12)
        np.testing.assert_allclose(
            _per_conv(out, cid, "bull_power"), hi - np.array(ema), rtol=1e-12
        )
        np.testing.assert_allclose(
            _per_conv(out, cid, "bear_power"), lo - np.array(ema), rtol=1e-12
        )


def test_coppock_straightline():
    groups = _groups(9)
    r1, r2, w = 14, 11, 10
    out = coppock_frame(_mk_turns(groups), r1=r1, r2=r2, w=w)
    for cid, (dts, _) in groups.items():
        x = _us(dts)
        n = len(x)
        mom = np.zeros(n, dtype=np.int64)
        for L in (r1, r2):
            for i in range(L, n):
                mom[i] += x[i] - x[i - L]
        ref = []
        for i in range(n):
            win = mom[max(0, i - w + 1) : i + 1]
            # truncated-recency weights: lag j gets weight w - j
            wts = np.array([w - (i - j) for j in range(max(0, i - w + 1), i + 1)])
            ref.append(float((wts * win).sum()) / float(wts.sum()))
        np.testing.assert_array_equal(_per_conv(out, cid, "mom_sum"), mom)
        np.testing.assert_allclose(_per_conv(out, cid, "coppock"), ref, rtol=1e-12)


def test_empty_frames():
    empty = _mk_turns({}).iloc[0:0]
    for fn, cols in [
        (force_frame, ["conv_id", "turn_idx", "ts_us", "force_13", "fr"]),
        (elder_frame, ["conv_id", "turn_idx", "ts_us", "ema_13", "bull_power", "bear_power"]),
        (coppock_frame, ["conv_id", "turn_idx", "ts_us", "coppock", "mom_sum"]),
    ]:
        out = fn(empty)
        assert list(out.columns) == cols and len(out) == 0
