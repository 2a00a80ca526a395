"""Top-k session paths (e_session_path_topk): straight-line parity on a
hand-built event log with known sessions, tie-break determinism (count
desc, path asc), and the k-truncation edge."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.events import events_session_path_topk

GAP_US = 1800 * 1_000_000


def mk_events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "event_type"])
    df["ts"] = df["ts_us"].astype("datetime64[us]")
    df["value"] = 0.0
    df["props"] = "{}"
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


H = 3600 * 1_000_000  # 1h in us: > gap, splits sessions
ROWS = []
eid = 0
# user 1: two sessions with the same path A>B, one session C
for s, base in enumerate([0, 3 * H, 6 * H]):
    seq = ["A", "B"] if s < 2 else ["C"]
    for j, et in enumerate(seq):
        ROWS.append((eid, 1, base + j * 1000, et))
        eid += 1
# user 2: one session A>B (path count -> 3), one session B>A (tie-break vs C)
for j, et in enumerate(["A", "B"]):
    ROWS.append((eid, 2, j * 1000, et))
    eid += 1
for j, et in enumerate(["B", "A"]):
    ROWS.append((eid, 2, 3 * H + j * 1000, et))
    eid += 1
# user 3: singleton session C (C count -> 2)
ROWS.append((eid, 3, 0, "C"))
eid += 1


@pytest.fixture(scope="module")
def topk(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("paths")
    mk_events(ROWS).to_parquet(sf / "events.parquet")
    return events_session_path_topk(str(sf / "events.parquet"), k=3)


def test_expected_paths_and_counts(topk):
    # A>B x3, C x2, then the k=3 cut keeps the lexicographically-first of
    # the count-1 paths (B>A)
    assert list(topk["path"]) == ["A>B", "C", "B>A"]
    assert list(topk["n"]) == [3, 2, 1]


def test_gap_splits_sessions(ray_session, tmp_path_factory):
    # same events but gap-adjacent: one long session per user, new paths
    sf = tmp_path_factory.mktemp("paths2")
    rows = [(i, 1, i * 1000, et) for i, (_, _, _, et) in enumerate(ROWS[:5])]
    mk_events(rows).to_parquet(sf / "events.parquet")
    got = events_session_path_topk(str(sf / "events.parquet"), k=5)
    assert list(got["path"]) == ["A>B>A>B>C"]
    assert list(got["n"]) == [1]


def test_k_truncates(topk):
    assert len(topk) == 3
