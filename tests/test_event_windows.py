"""Streaming event-time windows: emitted == batch groupby for on-time rows,
under any chunking and any within-lateness disorder; late rows side-output;
snapshot/restore mid-stream is invisible."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.state.event_windows import StreamingEventWindows

WINDOW_S = 60
P_US = WINDOW_S * 1_000_000


def _fixture(n=6000, seed=3, disorder_us=20_000_000):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 3_600_000_000, size=n))  # 1h of events, ordered
    arrival = ts + rng.integers(0, disorder_us, size=n)  # bounded disorder
    order = np.argsort(arrival, kind="stable")
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, size=n).astype(np.int64),
            "ts_us": ts.astype(np.int64),
            "value_c": rng.integers(-500, 500, size=n).astype(np.int64),
        }
    ).iloc[order].reset_index(drop=True)


def _batch_expected(df: pd.DataFrame) -> pd.DataFrame:
    w = (df["ts_us"] // P_US + 1) * P_US
    g = (
        df.assign(w_end_us=w)
        .groupby(["user_id", "w_end_us"], as_index=False)
        .agg(n_events=("value_c", "size"), sum_value_c=("value_c", "sum"))
        .astype("int64")
    )
    return g.sort_values(["user_id", "w_end_us"], ignore_index=True)


def _run(kernel, df, chunks):
    emitted, late = [], []
    for idx in np.array_split(np.arange(len(df)), chunks):
        e, l = kernel.process(df.iloc[idx])
        emitted.append(e)
        late.append(l)
    emitted.append(kernel.flush())
    return (
        pd.concat(emitted, ignore_index=True).sort_values(
            ["user_id", "w_end_us"], ignore_index=True
        ),
        pd.concat(late, ignore_index=True),
    )


def test_streaming_windows_equal_batch_when_lateness_covers_disorder():
    """With allowed_lateness >= the stream's disorder bound, NO row is late
    and the emitted windows equal the batch aggregate bitwise."""
    df = _fixture()
    k = StreamingEventWindows(WINDOW_S, allowed_lateness_s=21)
    got, late = _run(k, df, chunks=37)
    assert len(late) == 0 and k.n_late == 0
    pd.testing.assert_frame_equal(got, _batch_expected(df))


def test_streaming_windows_chunking_invariance():
    """Any chunking produces the identical emission multiset."""
    df = _fixture(seed=9)
    outs = []
    for chunks in (1, 7, 113):
        k = StreamingEventWindows(WINDOW_S, allowed_lateness_s=21)
        got, _ = _run(k, df, chunks)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_streaming_windows_late_rows_side_output():
    """With zero allowed lateness, disordered rows whose window already
    fired are side-routed — never silently dropped, never double-counted:
    emitted + late == input exactly."""
    df = _fixture(seed=4)
    k = StreamingEventWindows(WINDOW_S, allowed_lateness_s=0)
    got, late = _run(k, df, chunks=53)
    assert k.n_late == len(late) > 0
    # emitted aggregates == batch aggregate of input MINUS the late rows
    on_time = pd.concat([df, late]).drop_duplicates(keep=False)
    pd.testing.assert_frame_equal(got, _batch_expected(on_time))
    assert int(got["n_events"].sum()) + len(late) == len(df)


def test_streaming_windows_snapshot_restore_invisible():
    """Kill/restore mid-stream: the resumed kernel's remaining emissions
    equal the uninterrupted kernel's, bitwise."""
    df = _fixture(seed=7)
    half = len(df) // 2
    k1 = StreamingEventWindows(WINDOW_S, allowed_lateness_s=21)
    e1a, _ = k1.process(df.iloc[:half])
    k2 = StreamingEventWindows.restore(k1.snapshot())
    e1b, _ = k1.process(df.iloc[half:])
    e2b, _ = k2.process(df.iloc[half:])
    pd.testing.assert_frame_equal(e1b, e2b)
    pd.testing.assert_frame_equal(k1.flush(), k2.flush())
