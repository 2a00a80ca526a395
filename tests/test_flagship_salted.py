"""Skew-aware flagship routing == plain flagship, bitwise."""

import numpy as np
import pytest

from quant_feature_pipeline_ray.pipelines.flagship import transcript_features
from quant_feature_pipeline_ray.pipelines.flagship_salted import (
    heavy_conversations,
    transcript_features_salted,
)


def test_salted_flagship_equals_plain(ray_session, sf001_transcripts):
    plain = (
        transcript_features(sf001_transcripts)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    # low threshold so the mega conversation (and a few others) take the
    # salted route; small chunks force many seams
    salted = (
        transcript_features_salted(
            sf001_transcripts, heavy_threshold=800, chunk_rows=600, num_buckets=16
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert len(plain) == len(salted)
    assert list(plain.columns) == list(salted.columns)
    for c in plain.columns:
        a, b = plain[c].to_numpy(), salted[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"salted flagship diverges in {c}"


def test_heavy_detection(ray_session, sf001_transcripts):
    from quant_feature_pipeline_ray.sources.transcripts import read_transcripts

    ds = read_transcripts(sf001_transcripts)
    heavy = heavy_conversations(ds, 800)
    assert "conv-000000" in heavy  # the fixture's mega conversation
    assert len(heavy) < 20
