"""functions/editdist.py batched Levenshtein kernel vs a straight-line DP,
and the RRF fusion math vs an independent composition."""

import random

import numpy as np

from quant_feature_pipeline_ray.functions.editdist import levenshtein_batch


def _ref(a, b):
    D = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, D[0] = D[0], i
        for j, cb in enumerate(b, 1):
            cur = min(D[j] + 1, D[j - 1] + 1, prev + (ca != cb))
            prev, D[j] = D[j], cur
    return D[len(b)]


def test_levenshtein_batch_fuzz():
    random.seed(7)
    alpha = "abcdé💡 "
    pairs = [
        (
            "".join(random.choice(alpha) for _ in range(random.randint(0, 30))),
            "".join(random.choice(alpha) for _ in range(random.randint(0, 30))),
        )
        for _ in range(400)
    ]
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("kitten", "sitting"), ("flaw", "lawn")]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    exp = np.array([_ref(a, b) for a, b in pairs], dtype=np.int64)
    np.testing.assert_array_equal(got, exp)


def test_levenshtein_batch_unicode_codepoints():
    # distance counts CODEPOINTS (DuckDB semantics), not utf-8 bytes
    got = levenshtein_batch(["héllo"], ["hello"])
    assert got[0] == 1


def test_levenshtein_batch_ragged_lengths():
    a = ["x" * 200, "y", "x" * 200]
    b = ["x" * 200, "y" * 50, ""]
    np.testing.assert_array_equal(levenshtein_batch(a, b), [0, 49, 200])


def test_rrf_fusion_composition(ray_session):
    # rrf over the two constituent rankings computed independently
    import pandas as pd

    from quant_feature_pipeline_ray.pipelines import training_data as td

    sf = "/root/testdata/sf0.001"
    depth, k, rk = 50, 20, 60
    fused = td.doc_rrf_fusion(sf, depth=depth, k=k, rrf_k=rk)
    lex = td.doc_bm25_topk(sf, k=depth).set_index("doc_id")["rank"]
    dense = (
        td.emb_ann_topk(sf, n_queries=1, k=depth)
        .rename(columns={"vec_id": "doc_id"})
        .set_index("doc_id")["rank"]
    )
    exp = {}
    for d in set(lex.index) | set(dense.index):
        exp[d] = (1.0 / (rk + lex[d]) if d in lex.index else 0.0) + (
            1.0 / (rk + dense[d]) if d in dense.index else 0.0
        )
    exp_top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert list(fused["doc_id"]) == [d for d, _ in exp_top]
    np.testing.assert_array_equal(fused["rrf_score"].to_numpy(), [s for _, s in exp_top])
    assert list(fused["rrf_rank"]) == list(range(1, len(exp_top) + 1))


def test_edit_pairs_agree_with_jaccard_candidates(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    sf = "/root/testdata/sf0.001"
    ep = td.doc_edit_pairs(sf)
    jp = td.doc_jaccard_pairs(sf)
    # identical candidate sets, and identical-token-set pairs have high
    # character similarity on this fixture
    assert list(map(tuple, ep[["doc_a", "doc_b"]].values)) == list(
        map(tuple, jp[["doc_a", "doc_b"]].values)
    )
    assert (ep["edit_sim"] <= 1.0).all() and (ep["edit_dist"] >= 0).all()
    exact = ep[ep["edit_dist"] == 0]
    assert (exact["edit_sim"] == 1.0).all()


def test_stream_join_matches_bruteforce(ray_session):
    import pandas as pd

    from quant_feature_pipeline_ray.pipelines import events as ev

    path = "/root/testdata/sf0.001/events.parquet"
    w = 86400
    got = ev.events_stream_join(path, window_s=w)
    df = pd.read_parquet(path, columns=["event_id", "user_id", "event_type", "ts"])
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    df = df.assign(ts_us=ts)
    c = df[df["event_type"] == "click"]
    p = df[df["event_type"] == "purchase"]
    m = c.merge(p, on="user_id", suffixes=("_c", "_p"))
    m = m[(m["ts_us_p"] >= m["ts_us_c"]) & (m["ts_us_p"] < m["ts_us_c"] + w * 1_000_000)]
    exp = (
        m[["event_id_c", "event_id_p", "user_id"]]
        .rename(columns={"event_id_c": "click_id", "event_id_p": "purchase_id"})
        .sort_values(["click_id", "purchase_id"], ignore_index=True)
    )
    assert list(map(tuple, got[["click_id", "purchase_id", "user_id"]].values)) == list(
        map(tuple, exp.values)
    )
    assert ((got["dt_us"] >= 0) & (got["dt_us"] < w * 1_000_000)).all()
