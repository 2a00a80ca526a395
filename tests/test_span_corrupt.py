"""T5 span corruption (doc_span_corrupt): straight-line parity, the
round-trip property (corrupted + target reconstruct the original), sentinel
numbering, and mask-rate sanity."""

import re

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_span_corrupt

P, M = 1099511628211, 1 << 64
NUM, DEN = 3, 20


def is_masked(doc_id: int, tpos: int) -> bool:
    return (((doc_id * P) % M + tpos) * P) % M % DEN < NUM


def straight(doc_id: int, text: str):
    toks = text.split(" ")
    corrupted, target = [], []
    k, in_span, n_masked = 0, False, 0
    for i, t in enumerate(toks):
        if is_masked(doc_id, i):
            n_masked += 1
            if not in_span:
                corrupted.append(f"<extra_id_{k}>")
                target.append(f"<extra_id_{k}>")
                k += 1
                in_span = True
            target.append(t)
        else:
            corrupted.append(t)
            in_span = False
    return " ".join(corrupted), " ".join(target), k, n_masked


DOCS = [(i, " ".join(f"tok{i}_{j}" for j in range(50))) for i in range(40)] + [
    (100, "one"),
    (101, ""),
]


@pytest.fixture(scope="module")
def pairs(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("spanc")
    pd.DataFrame(
        {"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}
    ).to_parquet(sf / "documents.parquet")
    return (
        doc_span_corrupt(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
        .set_index("doc_id")
    )


def test_matches_straight_line(pairs):
    for doc_id, text in DOCS:
        c, t, k, nm = straight(doc_id, text)
        row = pairs.loc[doc_id]
        assert row["corrupted"] == c, doc_id
        assert row["target"] == t, doc_id
        assert row["n_spans"] == k and row["n_masked"] == nm, doc_id


def test_round_trip_reconstructs(pairs):
    # splicing each target span back over its sentinel recovers the original
    for doc_id, text in DOCS:
        row = pairs.loc[doc_id]
        out = row["corrupted"]
        spans = re.split(r"<extra_id_\d+> ?", row["target"])[1:]
        for k, span in enumerate(spans):
            out = out.replace(f"<extra_id_{k}>", span.strip())
        assert out == text, doc_id


def test_mask_rate_plausible(pairs):
    wide = pairs.loc[[d for d, t in DOCS if len(t.split()) == 50]]
    rate = wide["n_masked"].sum() / (50 * len(wide))
    assert 0.10 <= rate <= 0.20  # 15% nominal


def test_sentinels_numbered_in_order(pairs):
    for doc_id, _ in DOCS:
        found = [int(x) for x in re.findall(r"<extra_id_(\d+)>", pairs.loc[doc_id, "corrupted"])]
        assert found == list(range(len(found))), doc_id
