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


# ---------------------------------------------------------- session windows
from quant_feature_pipeline_ray.state.event_windows import StreamingSessionWindows

GAP_S = 120
GAP_US = GAP_S * 1_000_000


def _session_fixture(n=4000, seed=11, disorder_us=30_000_000):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 7_200_000_000, size=n))
    arrival = ts + rng.integers(0, disorder_us, size=n)
    order = np.argsort(arrival, kind="stable")
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 15, size=n).astype(np.int64),
            "ts_us": ts.astype(np.int64),
            "value_c": rng.integers(-500, 500, size=n).astype(np.int64),
        }
    ).iloc[order].reset_index(drop=True)


def _batch_sessions(df: pd.DataFrame) -> pd.DataFrame:
    d = df.sort_values(["user_id", "ts_us"], kind="mergesort", ignore_index=True)
    new = np.ones(len(d), dtype=bool)
    u, t = d["user_id"].to_numpy(), d["ts_us"].to_numpy()
    new[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > GAP_US)
    d["session_id"] = (
        pd.Series(new.astype(np.int64)).groupby(u).cumsum().to_numpy().astype(np.int64)
    )
    g = d.groupby(["user_id", "session_id"], as_index=False).agg(
        start_us=("ts_us", "min"),
        end_us=("ts_us", "max"),
        n_events=("value_c", "size"),
        sum_value_c=("value_c", "sum"),
    )
    return g.astype("int64").sort_values(["user_id", "session_id"], ignore_index=True)


def _run_sessions(kernel, df, chunks):
    emitted, late = [], []
    for idx in np.array_split(np.arange(len(df)), chunks):
        e, l = kernel.process(df.iloc[idx])
        emitted.append(e)
        late.append(l)
    emitted.append(kernel.flush())
    return (
        pd.concat(emitted, ignore_index=True).sort_values(
            ["user_id", "session_id"], ignore_index=True
        ),
        pd.concat(late, ignore_index=True),
    )


def test_sessions_ordered_feed_equals_batch_any_chunking():
    df = _session_fixture().sort_values("ts_us", kind="mergesort", ignore_index=True)
    exp = _batch_sessions(df)
    for chunks in (1, 3, 17):
        got, late = _run_sessions(StreamingSessionWindows(GAP_S), df, chunks)
        assert len(late) == 0
        pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_sessions_disordered_feed_with_infinite_lateness_equals_batch():
    df = _session_fixture()  # arrival order (bounded disorder)
    exp = _batch_sessions(df)
    k = StreamingSessionWindows(GAP_S, allowed_lateness_s=10**9)
    got, late = _run_sessions(k, df, 13)
    assert len(late) == 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_sessions_bridging_event_merges_two_open_sessions():
    k = StreamingSessionWindows(GAP_S, allowed_lateness_s=10**9)
    a = pd.DataFrame({"user_id": [1, 1], "ts_us": [0, 200_000_000], "value_c": [1, 10]})
    e1, _ = k.process(a)
    assert len(e1) == 0 and len(k.open[1]) == 2  # two separate open sessions
    bridge = pd.DataFrame({"user_id": [1], "ts_us": [100_000_000], "value_c": [100]})
    k.process(bridge)
    assert len(k.open[1]) == 1  # merged by the bridging event
    out = k.flush()
    assert out["n_events"].tolist() == [3]
    assert out["sum_value_c"].tolist() == [111]
    assert out["start_us"].tolist() == [0] and out["end_us"].tolist() == [200_000_000]


def test_sessions_late_event_side_output():
    k = StreamingSessionWindows(GAP_S, allowed_lateness_s=0)
    k.process(pd.DataFrame({"user_id": [1], "ts_us": [0], "value_c": [1]}))
    # far-future event fires the first session
    e, _ = k.process(pd.DataFrame({"user_id": [1], "ts_us": [10**12], "value_c": [2]}))
    assert e["n_events"].tolist() == [1]
    # an event inside the fired session's gap halo is LATE
    e2, late = k.process(pd.DataFrame({"user_id": [1], "ts_us": [GAP_US], "value_c": [3]}))
    assert len(e2) == 0 and len(late) == 1 and k.n_late == 1


def test_sessions_snapshot_restore_invisible():
    df = _session_fixture(n=2000, seed=7).sort_values(
        "ts_us", kind="mergesort", ignore_index=True
    )
    exp = _batch_sessions(df)
    k = StreamingSessionWindows(GAP_S)
    half = len(df) // 2
    e1, _ = k.process(df.iloc[:half])
    k2 = StreamingSessionWindows.restore(k.snapshot())
    e2, _ = k2.process(df.iloc[half:])
    got = pd.concat([e1, e2, k2.flush()], ignore_index=True).sort_values(
        ["user_id", "session_id"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)
