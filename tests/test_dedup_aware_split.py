"""Dedup-aware train/val split (doc_dedup_aware_split): the core guarantee
(normalized duplicates always share a split), md5-bucket parity vs a
straight-line hashlib implementation, determinism, and the val-rate sanity
band on a wide synthetic corpus."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_dedup_aware_split


def norm(t: str) -> str:
    return re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", "", t.lower())).strip()


def bucket(t: str) -> int:
    return int.from_bytes(hashlib.md5(norm(t).encode()).digest()[8:16], "little") % 100


DOCS = [
    (0, "The Quick Brown Fox!"),
    (1, "the quick brown fox"),  # normalized dup of 0
    (2, "the   quick  brown fox??"),  # whitespace/punct variant of 0
    (3, "something entirely different"),
    (4, ""),  # empty normalizes to ''
    (5, "!!!"),  # punctuation-only also normalizes to ''
] + [(i, f"unique document number {i} with filler words") for i in range(6, 406)]


@pytest.fixture(scope="module")
def split(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("split")
    pd.DataFrame(
        {"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}
    ).to_parquet(sf / "documents.parquet")
    return (
        doc_dedup_aware_split(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def test_matches_straight_line(split):
    for doc_id, text in DOCS:
        row = split[split["doc_id"] == doc_id].iloc[0]
        b = bucket(text)
        assert row["bucket"] == b, doc_id
        assert row["split"] == ("val" if b < 10 else "train"), doc_id


def test_normalized_dups_share_split(split):
    by_id = split.set_index("doc_id")
    assert by_id.loc[0, "split"] == by_id.loc[1, "split"] == by_id.loc[2, "split"]
    assert by_id.loc[0, "bucket"] == by_id.loc[1, "bucket"] == by_id.loc[2, "bucket"]
    assert by_id.loc[4, "split"] == by_id.loc[5, "split"]  # both normalize to ''


def test_val_rate_plausible(split):
    # 100 md5 buckets, 10 val: binomial around 10% over ~400 distinct classes
    rate = (split["split"] == "val").mean()
    assert 0.03 <= rate <= 0.20
    assert split["bucket"].between(0, 99).all()


def test_deterministic(ray_session, tmp_path_factory, split):
    sf = tmp_path_factory.mktemp("split2")
    pd.DataFrame(
        {"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}
    ).to_parquet(sf / "documents.parquet")
    again = (
        doc_dedup_aware_split(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(split, again)
