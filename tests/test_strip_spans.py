"""doc_strip_dup_spans: exact parity vs a straight-line pure-Python
implementation of duplicated-span removal (Lee et al. ExactSubstr shape),
plus cross-doc, within-doc and no-dup edges."""

import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import doc_strip_dup_spans

P, M, OFF = 1099511628211, 1 << 64, 1469598103934665603
N = 5


def _tok_hash(t: str) -> int:
    h = OFF
    for b in t.encode() + b" ":
        h = ((h ^ b) * P) % M
    return h


def straight_strip(docs: list[tuple[str, str]], n: int = N) -> pd.DataFrame:
    counts: dict[int, int] = {}
    grams: dict[str, list[int]] = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        hs = [_tok_hash(t) for t in toks]
        gl = []
        for i in range(max(len(toks) - n + 1, 0)):
            g = hs[i]
            for j in range(1, n):
                g = (g * P + hs[i + j]) % M
            gl.append(g)
            counts[g] = counts.get(g, 0) + 1
        grams[doc_id] = gl
    rows = []
    for doc_id, text in docs:
        toks = text.split(" ")
        covered = [False] * len(toks)
        for s, g in enumerate(grams[doc_id]):
            if counts[g] >= 2:
                for p in range(s, min(s + n, len(toks))):
                    covered[p] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        rows.append((doc_id, " ".join(kept), sum(covered)))
    return pd.DataFrame(rows, columns=["doc_id", "text_clean", "n_removed"])


SHARED = "lorem ipsum dolor sit amet consectetur adipiscing"  # 7 tokens
DOCS = [
    ("d00", f"unique head {SHARED} unique tail zz"),
    ("d01", f"other start {SHARED} other finish qq"),
    # within-doc repetition: the same 5-gram twice in one document
    ("d02", "aa bb cc dd ee xx yy aa bb cc dd ee"),
    ("d03", "totally fresh words that appear nowhere else at all"),
    ("d04", "too short"),
    ("d05", ""),
]


@pytest.fixture(scope="module")
def stripped(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("strip")
    pd.DataFrame({"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}).to_parquet(
        sf / "documents.parquet"
    )
    return (
        doc_strip_dup_spans(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def test_matches_straight_line(stripped):
    exp = straight_strip(DOCS).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(stripped, exp, check_dtype=False)


def test_cross_doc_span_removed(stripped):
    for d in ("d00", "d01"):
        row = stripped[stripped["doc_id"] == d].iloc[0]
        assert "lorem" not in row["text_clean"]
        assert row["n_removed"] == 7
        # tokens outside the duplicated span survive
        assert "unique" in row["text_clean"] or "other" in row["text_clean"]


def test_within_doc_repetition_removed(stripped):
    row = stripped[stripped["doc_id"] == "d02"].iloc[0]
    # both occurrences of the repeated 5-gram are covered
    assert "aa" not in row["text_clean"] and "ee" not in row["text_clean"]
    assert row["n_removed"] == 10
    assert row["text_clean"] == "xx yy"


def test_untouched_docs_pass_through(stripped):
    for d, text in DOCS:
        if d in ("d03", "d04", "d05"):
            row = stripped[stripped["doc_id"] == d].iloc[0]
            assert row["text_clean"] == text
            assert row["n_removed"] == 0
