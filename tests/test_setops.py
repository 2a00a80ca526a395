import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quant_feature_pipeline_ray.sources.normalize_ts import (
    find_ts_column,
    infer_epoch_unit,
    normalize_ts_batch,
)
from quant_feature_pipeline_ray.stages.dedup import sample_tail, union_dedup_keep_last


def test_normalize_ts_variants():
    base_us = 1_700_000_000_000_000
    for col, vals, typ in [
        ("timestamp", [base_us // 1000, base_us // 1000 + 5], pa.int64()),  # ms
        ("time", [base_us, base_us + 5_000_000], pa.int64()),               # us
        ("ts", [base_us // 1_000_000, base_us // 1_000_000 + 5], pa.int64()),  # s
    ]:
        t = pa.table({col: pa.array(vals, typ), "x": pa.array([1, 2])})
        out = normalize_ts_batch(t)
        assert out["ts"].type == pa.timestamp("us")
        got = out["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        assert got[0] == base_us
    t = pa.table({"datetime": pa.array(["2024-01-01 00:00:00", "2024-01-01 00:00:05"])})
    out = normalize_ts_batch(t)
    assert out["ts"].type == pa.timestamp("us")
    with pytest.raises(ValueError, match="no timestamp column"):
        find_ts_column(["a", "b"])
    assert infer_epoch_unit(np.array([1.7e18])) == "ns"


def test_union_dedup_keep_last(ray_session):
    import ray.data

    old = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": np.array([0, 1, 0], dtype=np.int32),
            "ts": pd.to_datetime([1e9, 2e9, 3e9], unit="us"),
            "v": [1.0, 2.0, 3.0],
        }
    )
    new = pd.DataFrame(
        {
            "conv_id": ["a", "c"],
            "turn_idx": np.array([1, 0], dtype=np.int32),
            "ts": pd.to_datetime([2e9, 4e9], unit="us"),  # same ts as old a/1 → new wins
            "v": [20.0, 4.0],
        }
    )
    out = (
        union_dedup_keep_last(ray.data.from_pandas(old), ray.data.from_pandas(new), num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert len(out) == 4
    assert out.loc[(out.conv_id == "a") & (out.turn_idx == 1), "v"].iloc[0] == 20.0
    assert set(out["conv_id"]) == {"a", "b", "c"}


def test_sample_tail(ray_session, sf001_transcripts):
    import ray.data

    ds = ray.data.read_parquet(sf001_transcripts)
    n = ds.count()
    out = sample_tail(ds, ratio=0.01, min_rows=200)
    got = out.to_pandas()
    assert len(got) >= max(200, int(n * 0.01))
    assert len(got) < n * 0.05
    # it's a true tail: everything kept is newer than everything dropped
    cutoff = got["ts"].min()
    full = ds.to_pandas()
    assert (full[full["ts"] < cutoff]["ts"] < cutoff).all()


def test_csv_read_parity(ray_session, sf001_transcripts, tmp_path):
    """CSV ingestion (extension dispatch + normalize_ts) must be bitwise
    equal to the parquet path end-to-end through the flagship."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from quant_feature_pipeline_ray.pipelines.flagship import transcript_features
    from quant_feature_pipeline_ray.sources.transcripts import read_transcripts

    files = (
        sorted(
            os.path.join(sf001_transcripts, f)
            for f in os.listdir(sf001_transcripts)
            if f.endswith(".parquet")
        )
        if os.path.isdir(sf001_transcripts)
        else [sf001_transcripts]
    )
    csv_dir = tmp_path / "csv_in"
    csv_dir.mkdir()
    for i, f in enumerate(files):
        df = pq.read_table(f).to_pandas()
        df.to_csv(csv_dir / f"part-{i:03d}.csv", index=False)

    a = (
        transcript_features(read_transcripts(sf001_transcripts))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    b = (
        transcript_features(read_transcripts(str(csv_dir)))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            ok = ((x == y) | (np.isnan(x) & np.isnan(y))).all()
        else:
            ok = (x == y).all()
        assert ok, f"csv path diverges from parquet path in {c}"
