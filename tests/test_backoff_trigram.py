"""doc_backoff_trigram: straight-line parity on a corpus constructed to
exercise all three stupid-backoff branches (seen trigram, bigram backoff,
unigram add-one floor), plus the short-document exclusion. The LM trains
on the md5-even reference half (here d5/d7) and scores every doc."""

import hashlib
import math

import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_backoff_trigram

ALPHA = 0.4

# md5-parity: d5, d7 land in the reference half (LM training); the rest
# are scored against that LM — their unseen trigrams exercise the backoff
DOCS = [
    ("d5", "the cat sat on the mat"),  # ref
    ("d7", "the cat sat on a rug the mat"),  # ref
    ("d0", "the cat sat on the rug"),  # seen-trigram + bigram-backoff mix
    ("d1", "zebra quark sat on the mat"),  # OOV tokens -> unigram floor
    ("d2", "a b"),  # < 3 tokens: excluded
]


def _ref(doc_id: str) -> bool:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % 2 == 0


def straight(docs):
    uni, bi, tri = {}, {}, {}
    for d, t in docs:
        if not _ref(d):
            continue
        toks = t.split(" ")
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(toks) - 1):
            bi[" ".join(toks[i : i + 2])] = bi.get(" ".join(toks[i : i + 2]), 0) + 1
        for i in range(len(toks) - 2):
            tri[" ".join(toks[i : i + 3])] = tri.get(" ".join(toks[i : i + 3]), 0) + 1
    N, V = sum(uni.values()), len(uni)
    rows, branches = [], set()
    for d, t in docs:
        toks = t.split(" ")
        lls = []
        for i in range(len(toks) - 2):
            w1, w2, w3 = toks[i : i + 3]
            if tri.get(f"{w1} {w2} {w3}", 0) > 0:
                s = tri[f"{w1} {w2} {w3}"] / bi[f"{w1} {w2}"]
                branches.add("tri")
            elif bi.get(f"{w2} {w3}", 0) > 0:
                s = ALPHA * bi[f"{w2} {w3}"] / uni[w2]
                branches.add("bi")
            else:
                s = ALPHA * ALPHA * (uni.get(w3, 0) + 1) / (N + V)
                branches.add("uni")
            lls.append(math.log(s))
        if lls:
            rows.append((d, len(lls), round(sum(lls) / len(lls), 6)))
    df = pd.DataFrame(rows, columns=["doc_id", "n_trigrams", "backoff_score"])
    return df.sort_values("doc_id", ignore_index=True), branches


@pytest.fixture(scope="module")
def scored(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("bo")
    pd.DataFrame({"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}).to_parquet(
        sf / "documents.parquet"
    )
    return (
        doc_backoff_trigram(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def test_matches_straight_line(scored):
    exp, _ = straight(DOCS)
    pd.testing.assert_frame_equal(scored, exp, check_dtype=False)


def test_short_doc_excluded(scored):
    assert "d2" not in set(scored["doc_id"])


def test_all_branches_exercised():
    # the corpus must genuinely hit tri, bi-backoff AND the OOV unigram
    # floor — otherwise the parity test silently weakens
    _, branches = straight(DOCS)
    assert branches == {"tri", "bi", "uni"}
