"""End-to-end invariants through the distributed Ray path (FIXTURES.md)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.pipelines.flagship import (
    featurize_bucket,
    transcript_features,
)

LEAKY = {"lat_lead_1"}  # declared non-causal


@pytest.fixture(scope="module")
def dist_out(ray_session, sf001_transcripts):
    return (
        transcript_features(sf001_transcripts)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )


def test_distributed_equals_local_bitwise(dist_out, sf001_transcripts):
    local = featurize_bucket(pq.read_table(sf001_transcripts).to_pandas())
    assert list(dist_out.columns) == list(local.columns)
    for c in dist_out.columns:
        a, b = dist_out[c].to_numpy(), local[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"column {c} differs between distributed and local"


def test_text_equality_under_stable_ordering(dist_out, sf001_transcripts):
    inp = pq.read_table(sf001_transcripts).to_pandas()
    inp = (
        inp.sort_values(["conv_id", "turn_idx", "ts"])
        .drop_duplicates(["conv_id", "turn_idx"], keep="last")
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert (inp["text"].to_numpy() == dist_out["text"].to_numpy()).all()
    assert (inp["role"].to_numpy() == dist_out["role"].to_numpy()).all()


def test_zero_temporal_leakage_prefix_property(ray_session, dist_out, sf001_transcripts, tmp_path):
    raw = pq.read_table(sf001_transcripts).to_pandas()
    cutoff = int(raw["ts"].astype("int64").quantile(0.55))
    pref_path = str(tmp_path / "prefix.parquet")
    raw[raw["ts"].astype("int64") <= cutoff].to_parquet(pref_path)
    pref = (
        transcript_features(pref_path)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    full_pref = dist_out[dist_out["ts_us"] <= cutoff].reset_index(drop=True)
    assert len(pref) == len(full_pref)
    for c in pref.columns:
        if c in LEAKY:
            continue
        a, b = pref[c].to_numpy(), full_pref[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"temporal leakage detected in column {c}"


def test_dedup_keep_last(dist_out, sf001_transcripts):
    raw = pq.read_table(sf001_transcripts).to_pandas()
    n_unique = len(raw.drop_duplicates(["conv_id", "turn_idx"]))
    assert len(dist_out) == n_unique
    assert not dist_out["text"].str.endswith(":stale").any()


def test_blob_exchange_parity(ray_session, dist_out, sf001_transcripts):
    """text_exchange='blob' (text bypasses the per-row exchange as
    compressed blob rows) must be BITWISE identical to the inline path."""
    inline = (
        transcript_features(sf001_transcripts, text_exchange="inline")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert list(inline.columns) == list(dist_out.columns)
    assert len(inline) == len(dist_out)
    for c in inline.columns:
        a, b = dist_out[c].to_numpy(), inline[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"blob exchange diverges in column {c}"
