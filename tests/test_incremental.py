"""Exact incremental append: backfill(prefix) + append(rest) == backfill(all)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.manifest import (
    read_streaming_output,
    run_incremental_append,
    run_streaming_backfill,
)


@pytest.fixture(scope="module")
def deduped_input(sf001_transcripts, tmp_path_factory):
    raw = pq.read_table(sf001_transcripts).to_pandas()
    srt = raw.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    ded = srt[~srt.duplicated(["conv_id", "turn_idx"], keep="last")]
    root = tmp_path_factory.mktemp("inc")
    cutoff = int(ded["ts"].astype("int64").quantile(0.6))
    full, p1, p2 = str(root / "full.parquet"), str(root / "p1.parquet"), str(root / "p2.parquet")
    ded.to_parquet(full)
    ded[ded["ts"].astype("int64") <= cutoff].to_parquet(p1)
    ded[ded["ts"].astype("int64") > cutoff].to_parquet(p2)
    return full, p1, p2


def _collect(out_dir):
    return (
        read_streaming_output(out_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )


def test_incremental_append_bitwise(ray_session, deduped_input, tmp_path):
    full, p1, p2 = deduped_input
    full_dir, inc_dir = str(tmp_path / "full"), str(tmp_path / "inc")

    run_streaming_backfill(full, full_dir, num_buckets=12)
    run_streaming_backfill(p1, inc_dir, num_buckets=12)
    res = run_incremental_append(p2, inc_dir, num_buckets=12)
    assert res["rows"] > 0

    a, b = _collect(full_dir), _collect(inc_dir)
    assert len(a) == len(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            ok = ((x == y) | (np.isnan(x) & np.isnan(y))).all()
        else:
            ok = (x == y).all()
        assert ok, f"incremental append diverges from full recompute in {c}"


def test_replayed_input_is_idempotent_noop(ray_session, deduped_input, tmp_path):
    """Replaying an already-applied input FILE is a no-op (crash-replay
    safety: the state snapshot records the applied input path), while the
    same stale ROWS arriving under a new path still fail the watermark."""
    import shutil

    full, p1, p2 = deduped_input
    d = str(tmp_path / "wm")
    run_streaming_backfill(p1, d, num_buckets=12)
    before = _collect(d)
    res = run_incremental_append(p1, d, num_buckets=12)  # replay same path
    assert res["rows"] == 0
    after = _collect(d)
    assert len(before) == len(after)
    # identical stale data under a NEW path is a real ordering violation
    p1_copy = str(tmp_path / "replayed-copy.parquet")
    shutil.copy(p1, p1_copy)
    with pytest.raises(Exception, match="watermark"):
        run_incremental_append(p1_copy, d, num_buckets=12)


def test_num_buckets_mismatch_fails_fast(ray_session, deduped_input, tmp_path):
    """A resumed/appending run may not silently rehash with a different B."""
    full, p1, p2 = deduped_input
    d = str(tmp_path / "nb")
    run_streaming_backfill(p1, d, num_buckets=12)
    with pytest.raises(ValueError, match="num_buckets"):
        run_incremental_append(p2, d, num_buckets=8)
    # and with NO caller value, the stored header is used (no rehash drift)
    res = run_incremental_append(p2, d)
    assert res["rows"] > 0
