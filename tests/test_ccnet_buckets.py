"""doc_ccnet_buckets: tercile balance, per-language monotonicity in ppl,
and the deterministic tie-break. The exact value contract vs DuckDB is
carried by the driver harness (doc_ccnet_buckets oracle)."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_ccnet_buckets

ORDER = {"head": 0, "middle": 1, "tail": 2}


@pytest.fixture(scope="module")
def buckets(ray_session):
    return doc_ccnet_buckets("/root/testdata/sf0.001").to_pandas()


def test_tercile_balance(buckets):
    for lang, g in buckets.groupby("lang"):
        counts = g["bucket"].value_counts()
        assert abs(int(counts.get("head", 0)) - int(counts.get("tail", 0))) <= 1, lang
        assert abs(int(counts.get("head", 0)) - int(counts.get("middle", 0))) <= 1, lang


def test_monotone_in_ppl(buckets):
    # within a language, every head ppl <= every middle ppl <= every tail
    # ppl (ranks are ppl-sorted with a doc_id tie-break)
    for lang, g in buckets.groupby("lang"):
        by = {b: gg["ppl"].to_numpy() for b, gg in g.groupby("bucket")}
        if "head" in by and "middle" in by:
            assert by["head"].max() <= by["middle"].min() + 1e-12, lang
        if "middle" in by and "tail" in by:
            assert by["middle"].max() <= by["tail"].min() + 1e-12, lang


def test_every_scored_doc_bucketed(buckets):
    assert buckets["doc_id"].is_unique
    assert set(buckets["bucket"]) <= {"head", "middle", "tail"}
    assert len(buckets) > 0
