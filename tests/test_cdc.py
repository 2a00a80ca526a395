"""Content-defined chunking (doc_cdc_chunks / doc_cdc_dedup): exact parity
vs a straight-line pure-Python CDC, the scheme's shift-robustness property
(an edit early in a document leaves all chunks after the next surviving
boundary identical — the reason CDC beats fixed-size blocking for dedup),
the FastCDC max-size cut, and short/empty-document edges."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import (
    doc_cdc_chunks,
    doc_cdc_dedup,
)

P, M, OFF = 1099511628211, 1 << 64, 1469598103934665603
K, DIV, MAXLEN = 8, 64, 256


def straight_cdc(text: str, k: int = K, div: int = DIV, max_len: int = MAXLEN):
    """(pos, n_bytes, chash) triples, pure Python."""
    b = text.encode()
    n = len(b)
    if n == 0:
        return []
    gear = [((OFF ^ x) * P) % M for x in range(256)]
    cuts = []
    for i in range(n):
        if i >= k - 1:
            h = gear[b[i - k + 1]]
            for j in range(i - k + 2, i + 1):
                h = (h * P + gear[b[j]]) % M
            if h % div == 0:
                cuts.append(i)
    if not cuts or cuts[-1] != n - 1:
        cuts.append(n - 1)
    out = []
    s = 0
    for e in cuts:
        seg = b[s : e + 1]
        for j in range(0, len(seg), max_len):
            piece = seg[j : j + max_len]
            h = OFF
            for x in piece:
                h = ((h ^ x) * P) % M
            out.append((s + j, len(piece), h if h < 1 << 63 else h - M))
        s = e + 1
    return out


import random

_rng = random.Random(20260820)
# high-entropy deterministic text (~700 bytes): periodic text can have zero
# natural boundaries (only ~period distinct windows), random text has one
# every ~DIV bytes in expectation
BASE = " ".join(
    "".join(_rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(_rng.randint(2, 9)))
    for _ in range(110)
)
DOCS = [
    (0, BASE.strip()),
    (1, "Z" + BASE.strip()),  # one-byte prefix insertion: shift-robust case
    (2, "short"),  # < k bytes: single whole-doc chunk
    (3, ""),  # empty: no chunks
    (4, "x" * 700),  # constant bytes: same window hash everywhere ->
    #     either every position cuts or none does; max-size cut stress
    (5, "ab" * 400),  # periodic content, 800 bytes
]


@pytest.fixture(scope="module")
def cdc(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("cdc")
    pd.DataFrame(
        {"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}
    ).to_parquet(sf / "documents.parquet")
    chunks = (
        doc_cdc_chunks(str(sf))
        .to_pandas()
        .sort_values(["doc_id", "pos"], ignore_index=True)
    )
    dedup = doc_cdc_dedup(str(sf)).to_pandas().set_index("doc_id").sort_index()
    return chunks, dedup


def test_matches_straight_line(cdc):
    chunks, _ = cdc
    for doc_id, text in DOCS:
        exp = straight_cdc(text)
        got = chunks[chunks["doc_id"] == doc_id]
        assert list(zip(got["pos"], got["n_bytes"], got["chash"])) == exp, doc_id
        assert list(got["chunk_idx"]) == list(range(len(exp)))


def test_chunks_tile_the_document(cdc):
    chunks, _ = cdc
    for doc_id, text in DOCS:
        got = chunks[chunks["doc_id"] == doc_id]
        assert got["n_bytes"].sum() == len(text)
        if len(got):
            starts = got["pos"].to_numpy()
            assert starts[0] == 0
            assert (starts[1:] == (starts[:-1] + got["n_bytes"].to_numpy()[:-1])).all()
        assert (got["n_bytes"] > 0).all()
        assert (got["n_bytes"] <= MAXLEN).all()


def test_shift_robustness(cdc):
    # doc 1 = doc 0 with one byte prepended. Fixed-size blocking would share
    # zero blocks; CDC re-synchronizes at the first common boundary, so all
    # doc-0 chunks after that boundary reappear in doc 1 with pos shifted +1.
    chunks, _ = cdc
    c0 = chunks[chunks["doc_id"] == 0]
    c1 = chunks[chunks["doc_id"] == 1]
    h0, h1 = list(c0["chash"]), list(c1["chash"])
    shared = set(h0) & set(h1)
    assert shared, "CDC must re-synchronize after a prefix edit"
    # the shared suffix of the chunk sequences is identical in order
    tail = 0
    while tail < min(len(h0), len(h1)) and h0[-1 - tail] == h1[-1 - tail]:
        tail += 1
    assert tail >= 1
    p0 = c0["pos"].to_numpy()[-tail:]
    p1 = c1["pos"].to_numpy()[-tail:]
    assert (p1 == p0 + 1).all()


def test_max_size_cut(cdc):
    # constant-byte doc: the window hash is identical at every position, so
    # natural cuts are all-or-nothing; either way no chunk exceeds MAXLEN
    # and any over-long natural segment splits at exact MAXLEN multiples.
    chunks, _ = cdc
    got = chunks[chunks["doc_id"] == 4]
    assert got["n_bytes"].sum() == 700
    full = got[got["n_bytes"] == MAXLEN]
    if len(full):  # forced splits happened: they start at MAXLEN multiples
        assert ((full["pos"].to_numpy() % MAXLEN) == 0).all() or len(got) > 2


def test_dedup_rollup_consistent(cdc):
    chunks, dedup = cdc
    counts = chunks.groupby("chash")["doc_id"].size()
    for doc_id, text in DOCS:
        got = chunks[chunks["doc_id"] == doc_id]
        if len(text) == 0:
            assert doc_id not in dedup.index
            continue
        row = dedup.loc[doc_id]
        assert row["n_chunks"] == len(got)
        assert row["total_bytes"] == len(text)
        dup = int(got.loc[counts[got["chash"]].to_numpy() > 1, "n_bytes"].sum())
        assert row["dup_bytes"] == dup
        assert row["dup_frac"] == dup / len(text)
    # the periodic docs must show self-repeat duplication
    assert dedup.loc[4, "dup_bytes"] > 0 or dedup.loc[4, "n_chunks"] <= 3
