"""Round-3 operator additions: normalization dedup, cross-doc repeated
n-grams, filtered vector search."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def test_normalized_dedup_collapses_variants(ray_session):
    import ray.data

    from quant_feature_pipeline_ray.pipelines.training_data import _normalized_dedup_ds

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "Hello,  World!",
                "hello world",          # same class as 0 after normalize
                "HELLO   WORLD",        # same class
                "hello world.",         # same class (punct stripped)
                "different doc",
                "Different  DOC?",      # same class as 4
            ],
        }
    )
    out = (
        _normalized_dedup_ds(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("rep_doc_id", ignore_index=True)
    )
    assert out["rep_doc_id"].tolist() == [0, 4]
    assert out["n_copies"].tolist() == [4, 2]


def test_crossdoc_ngrams_matches_straightline(ray_session):
    from quant_feature_pipeline_ray.pipelines.training_data import doc_crossdoc_ngrams

    got = doc_crossdoc_ngrams(SF, top_n=50)

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    rows = []
    for did, txt in zip(docs["doc_id"], docs["text"]):
        t = txt.split(" ")
        rows += [(f"{a} {b} {c}", did) for a, b, c in zip(t, t[1:], t[2:])]
    ref = pd.DataFrame(rows, columns=["ngram", "doc_id"])
    agg = ref.groupby("ngram").agg(df=("doc_id", "nunique"), tf=("doc_id", "size"))
    agg = agg[agg["df"] >= 2].reset_index()
    agg = agg.sort_values(
        ["df", "tf", "ngram"], ascending=[False, False, True], kind="mergesort"
    ).head(50)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        agg.reset_index(drop=True).astype({"df": "int64", "tf": "int64"}),
    )


def test_ann_filtered_respects_predicate_and_ranks(ray_session):
    from quant_feature_pipeline_ray.pipelines.training_data import emb_ann_filtered

    got = emb_ann_filtered(SF, n_queries=5, k=4, label=1)

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    lab = dict(zip(emb["vec_id"], emb["label"]))
    assert all(lab[v] == 1 for v in got["vec_id"])

    # straight-line: brute-force cosine among label-1 candidates
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    u = m / np.sqrt((m * m).sum(axis=1))[:, None]
    ids = emb["vec_id"].to_numpy()
    cand = emb["label"].to_numpy() == 1
    for qid in range(5):
        qi = np.flatnonzero(ids == qid)[0]
        sims = np.round(u[cand] @ u[qi], 6)
        cids = ids[cand]
        keep = cids != qid
        order = np.lexsort((cids[keep], -sims[keep]))[:4]
        exp = cids[keep][order]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == exp.tolist()
