"""The arrow-native hot path must equal the pandas path BITWISE."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from quant_feature_pipeline_ray.pipelines.flagship import featurize_bucket
from quant_feature_pipeline_ray.stages.turn_features_arrow import featurize_bucket_arrow


def test_arrow_path_bitwise_equals_pandas_path(sf001_transcripts):
    tbl = pq.read_table(sf001_transcripts)
    a = featurize_bucket_arrow(tbl).to_pandas()
    b = featurize_bucket(tbl.to_pandas())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            ok = ((x == y) | (np.isnan(x) & np.isnan(y))).all()
        else:
            ok = (x == y).all()
        assert ok, f"column {c} differs between arrow and pandas paths"


def test_arrow_path_empty_input():
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
        }
    )
    out = featurize_bucket_arrow(empty)
    assert out.num_rows == 0
    assert "lat_sma_5" in out.column_names
