"""Winnowing fingerprints (doc_winnow): exact parity vs a straight-line
pure-Python implementation of Schleimer-Wilkerson-Aiken winnowing, plus
the scheme's matching guarantee (shared runs >= w+k-1 tokens always share
a fingerprint) and the short-document edge."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_winnow

P, M, OFF = 1099511628211, 1 << 64, 1469598103934665603
K, W = 4, 5


def straight_winnow(text: str, k: int = K, w: int = W) -> list[tuple[int, int]]:
    toks = text.split(" ")
    ths = []
    for t in toks:
        h = OFF
        for b in t.encode() + b" ":
            h = ((h ^ b) * P) % M
        ths.append(h)
    n_g = len(toks) - (k - 1)
    grams = []
    for i in range(max(n_g, 0)):
        g = ths[i]
        for j in range(1, k):
            g = (g * P + ths[i + j]) % M
        grams.append(g)
    out = set()
    n = len(grams)
    for e in range(n):
        if not (e >= w - 1 or e == n - 1):
            continue
        bi, bv = e, grams[e]
        for i in range(e, max(0, e - w + 1) - 1, -1):
            if grams[i] < bv:
                bv, bi = grams[i], i
        out.add((bi, bv if bv < 1 << 63 else bv - M))
    return sorted(out)


DOCS = [
    ("d00", "the quick brown fox jumps over the lazy dog again and again"),
    ("d01", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # shares an 8-token (= W+K-1) run with d01 -> guaranteed shared fp
    ("d02", "prefix one two beta gamma delta epsilon zeta eta theta iota suffix"),
    ("d03", "a a a a a a a a a a"),  # all-equal hashes: tie-break stress
    ("d04", "one two three"),  # 3 tokens < k -> no grams, no rows
    ("d05", "w x y z"),  # exactly k tokens -> one gram, one partial window
    ("d06", "left pad " + " ".join(f"tok{i}" for i in range(40)) + " right pad"),
    ("d07", ""),  # empty text -> [''] single token -> no grams
]


@pytest.fixture(scope="module")
def winnow_rows(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("winnow")
    pd.DataFrame({"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}).to_parquet(
        sf / "documents.parquet"
    )
    return doc_winnow(str(sf)).to_pandas().sort_values(["doc_id", "pos"], ignore_index=True)


def test_matches_straight_line(winnow_rows):
    for doc_id, text in DOCS:
        exp = straight_winnow(text)
        got = winnow_rows[winnow_rows["doc_id"] == doc_id]
        assert list(zip(got["pos"], got["fp64"])) == exp, doc_id


def test_short_docs_emit_nothing(winnow_rows):
    assert not (winnow_rows["doc_id"].isin(["d04", "d07"])).any()
    assert (winnow_rows["doc_id"] == "d05").sum() == 1  # one partial window


def test_shared_run_guarantee(winnow_rows):
    # d01/d02 share >= W+K-1 consecutive tokens -> at least one common fp64
    f1 = set(winnow_rows.loc[winnow_rows["doc_id"] == "d01", "fp64"])
    f2 = set(winnow_rows.loc[winnow_rows["doc_id"] == "d02", "fp64"])
    assert f1 & f2


def test_tie_break_is_rightmost(winnow_rows):
    # d03 is one repeated token: every gram hash equal, so each window
    # selects its RIGHTMOST gram — the window END, one per full window
    got = winnow_rows[winnow_rows["doc_id"] == "d03"]
    n_g = 10 - (K - 1)
    assert list(got["pos"]) == list(range(W - 1, n_g))
    assert got["fp64"].nunique() == 1


def test_density(winnow_rows):
    # winnowing keeps ~2/(w+1) of gram positions on random-ish text
    got = winnow_rows[winnow_rows["doc_id"] == "d06"]
    n_g = 44 - (K - 1)
    assert 2 <= len(got) <= n_g // 2
