"""Streaming actor kernel == batch path, bitwise, across any batch split."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG
from quant_feature_pipeline_ray.stages.turn_features import compute_turn_features
from quant_feature_pipeline_ray.state.kernels import StreamingTurnKernel


@pytest.fixture(scope="module")
def sorted_stream(sf001_transcripts):
    raw = pq.read_table(sf001_transcripts).to_pandas()
    keep = sorted(raw["conv_id"].unique())[:40]
    raw = raw[raw["conv_id"].isin(keep)]
    srt = raw.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    return srt[~srt.duplicated(["conv_id", "turn_idx"], keep="last")].reset_index(drop=True)


def _run_streaming(stream: pd.DataFrame, batch_sizes) -> pd.DataFrame:
    k = StreamingTurnKernel(DEFAULT_CONFIG)
    outs, pos, i = [], 0, 0
    while pos < len(stream):
        b = batch_sizes[i % len(batch_sizes)]
        outs.append(k(stream.iloc[pos : pos + b]))
        pos += b
        i += 1
    return pd.concat(outs, ignore_index=True)


@pytest.mark.parametrize("batch_sizes", [[17], [1000], [3, 250, 31]])
def test_streaming_equals_batch(sorted_stream, batch_sizes):
    import pyarrow as pa

    from quant_feature_pipeline_ray.stages.turn_features_arrow import featurize_bucket_arrow

    ref = featurize_bucket_arrow(pa.Table.from_pandas(sorted_stream)).to_pandas()
    got = _run_streaming(sorted_stream, batch_sizes)
    for c in got.columns:
        assert c in ref.columns, c
        a, b = got[c].to_numpy(), ref[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b.astype(float)))).all()
        else:
            ok = (a == b).all()
        assert ok, f"streaming kernel diverges from batch path in {c} (batches {batch_sizes})"


def test_watermark_guard(sorted_stream):
    k = StreamingTurnKernel(DEFAULT_CONFIG)
    one = sorted_stream[sorted_stream["conv_id"] == sorted_stream["conv_id"].iloc[0]]
    k(one.iloc[: len(one) // 2])
    with pytest.raises(AssertionError, match="watermark"):
        k(one.iloc[: len(one) // 2])  # replaying the past = time travel
