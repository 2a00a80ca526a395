import numpy as np
import pyarrow.parquet as pq

from quant_feature_pipeline_ray.fixtures import generate_transcripts


def test_determinism():
    a = generate_transcripts(0.001)
    b = generate_transcripts(0.001)
    assert a.equals(b)


def test_fixture_properties(sf001_transcripts):
    df = pq.read_table(sf001_transcripts).to_pandas()
    # rows stored shuffled: first rows are not sorted by (conv_id, turn_idx)
    head = df.head(1000)
    assert not head["conv_id"].is_monotonic_increasing
    # duplicate (conv_id, turn_idx) rows exist and carry a strictly smaller ts
    srt = df.sort_values(["conv_id", "turn_idx", "ts"])
    dup = srt.duplicated(["conv_id", "turn_idx"], keep="last")
    assert dup.sum() > 0
    # keep-last == keep max ts
    d = srt[~dup]
    assert d.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing).all()
    # mega conversation
    sizes = d.groupby("conv_id").size()
    assert sizes.loc["conv-000000"] >= 50 * sizes.median()
    # session gaps exist
    gaps = d.groupby("conv_id")["ts"].diff().dt.total_seconds()
    assert (gaps > 1800).sum() > 10
    # text is a function of (conv_id, turn_idx)
    assert (
        d["text"].str.split(":").str[0].eq(d["conv_id"])
        & d["text"].str.split(":").str[1].astype(int).eq(d["turn_idx"])
    ).all()


def test_stale_rows_marked(sf001_transcripts):
    df = pq.read_table(sf001_transcripts).to_pandas()
    srt = df.sort_values(["conv_id", "turn_idx", "ts"])
    dup_rows = srt[srt.duplicated(["conv_id", "turn_idx"], keep="last")]
    assert dup_rows["text"].str.endswith(":stale").all()
    kept = srt[~srt.duplicated(["conv_id", "turn_idx"], keep="last")]
    assert not kept["text"].str.endswith(":stale").any()
