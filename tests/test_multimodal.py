"""Multimodal binary-column plumbing (stubbed codecs, real dataflow)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.pipelines import multimodal as mm


@pytest.fixture(scope="module")
def media(ray_session):
    return mm.ensure_media("/root/testdata/sf0.001")


def test_decode_matches_declared_metadata(ray_session, media):
    out = mm.media_decode("/root/testdata/sf0.001").to_pandas().sort_values("media_id")
    raw = pq.read_table(media).to_pandas().sort_values("media_id")
    assert (out["width_decoded"].to_numpy() == raw["width"].to_numpy()).all()
    assert (out["height_decoded"].to_numpy() == raw["height"].to_numpy()).all()
    assert (out["channels_decoded"].to_numpy() == raw["channels"].to_numpy()).all()


def test_byte_histogram_exact(ray_session, media):
    out = (
        mm.media_byte_features("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    raw = pq.read_table(media).to_pandas().sort_values("media_id", ignore_index=True)
    for i in [0, 7, len(raw) - 1]:
        body = np.frombuffer(raw["payload"].iloc[i][8:], dtype=np.uint8)
        assert out["body_bytes"].iloc[i] == len(body)
        assert out["byte_sum"].iloc[i] == int(body.astype(np.int64).sum())
        hist = np.bincount(body >> 4, minlength=16)
        got = out.loc[i, [f"hist_{b:02d}" for b in range(16)]].to_numpy().astype(int)
        assert (got == hist).all()


def test_frame_sample_layout(ray_session, media):
    out = mm.media_frame_sample("/root/testdata/sf0.001").to_pandas()
    raw = pq.read_table(media).to_pandas()
    audio = raw[raw["kind"] == "audio"].set_index("media_id")
    assert set(out["media_id"]).issubset(set(audio.index))
    g = out[out["media_id"] == out["media_id"].iloc[0]]
    assert (np.diff(g["frame_idx"].to_numpy()) == 4).all()
    assert (g["frame_off"].to_numpy() == g["frame_idx"].to_numpy() * 256).all()
    assert (g["frame_len"] > 0).all()


def test_unknown_kind_raises():
    import pyarrow as pa

    bad = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["video"]),
            "payload": pa.array([b"\x01\x00\x01\x00\x01\x00\x00\x00xx"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError, match="no codec"):
        mm.DecodeStub()(bad)


def test_ivf_recall_vs_bruteforce(ray_session):
    from quant_feature_pipeline_ray.pipelines.training_data import emb_ann_ivf, emb_ann_topk

    sf = "/root/testdata/sf0.01"
    brute = emb_ann_topk(sf)
    ivf = emb_ann_ivf(sf)
    recalls = []
    for qid, g in brute.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    assert np.mean(recalls) >= 0.9, f"IVF recall too low: {np.mean(recalls):.2f}"
