"""Feature hashing (doc_hash_vectorizer): exact parity vs a straight-line
pure-Python hashing-trick vectorizer (signed unigram+bigram), plus shape
invariants (dim range, per-doc L1 mass = n_features when no sign
collisions cancel) and the empty/one-token edges."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_hash_vectorizer

P, M, OFF = 1099511628211, 1 << 64, 1469598103934665603
D = 64


def tok_hash(t: str) -> int:
    h = OFF
    for b in t.encode() + b" ":
        h = ((h ^ b) * P) % M
    return h


def straight(text: str) -> dict[int, int]:
    toks = text.split(" ")
    hs = [tok_hash(t) for t in toks]
    feats = list(hs) + [(hs[i] * P + hs[i + 1]) % M for i in range(len(hs) - 1)]
    out: dict[int, int] = {}
    for h in feats:
        sign = -1 if h >= 1 << 63 else 1
        out[h % D] = out.get(h % D, 0) + sign
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "one"),  # single token: one unigram, zero bigrams
    (2, ""),  # empty text: splits to [''] -> one unigram of the empty token
    (3, " ".join(f"w{i}" for i in range(200))),  # wide doc: every dim hit
    (4, "dup dup dup dup"),  # repeated token: weights accumulate
]


@pytest.fixture(scope="module")
def vec(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("hvec")
    pd.DataFrame(
        {"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}
    ).to_parquet(sf / "documents.parquet")
    return (
        doc_hash_vectorizer(str(sf))
        .to_pandas()
        .sort_values(["doc_id", "dim"], ignore_index=True)
    )


def test_matches_straight_line(vec):
    for doc_id, text in DOCS:
        exp = straight(text)
        got = vec[vec["doc_id"] == doc_id]
        assert dict(zip(got["dim"], got["weight"])) == exp, doc_id


def test_dims_in_range(vec):
    assert vec["dim"].between(0, D - 1).all()


def test_feature_mass(vec):
    # |weights| summed can never exceed the feature count (2n-1 per doc)
    for doc_id, text in DOCS:
        n = len(text.split(" "))
        got = vec[vec["doc_id"] == doc_id]
        assert got["weight"].abs().sum() <= 2 * n - 1
        assert len(got) >= 1


def test_single_token_doc(vec):
    got = vec[vec["doc_id"] == 1]
    assert len(got) == 1 and abs(int(got["weight"].iloc[0])) == 1
