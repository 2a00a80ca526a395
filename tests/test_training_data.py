"""Unit tests for dedup/similarity/text primitives (no Ray needed)."""

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.functions.dedupfns import (
    MinHasher,
    jaccard_token_sets,
    shingles,
    simhash64,
)
from quant_feature_pipeline_ray.functions.textstats import (
    fingerprint64,
    lang_scores,
    token_counts,
)
from quant_feature_pipeline_ray.hashing import content_hash, stable_bucket


def test_stable_bucket_deterministic_and_bounded():
    vals = np.array([f"conv-{i:06d}" for i in range(1000)], dtype=object)
    b1 = stable_bucket(vals, 64)
    b2 = stable_bucket(vals.copy(), 64)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < 64
    # reasonably balanced
    counts = np.bincount(b1, minlength=64)
    assert counts.max() < 4 * counts.mean()


def test_content_hash_collision_free_on_distinct():
    vals = np.array([f"text number {i}" for i in range(10_000)], dtype=object)
    h = content_hash(vals)
    assert len(np.unique(h)) == len(vals)


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=256)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = len(set(shingles(a)) & set(shingles(b))) / len(set(shingles(a)) | set(shingles(b)))
    assert abs(est - true) < 0.15
    # identical docs -> identical signatures
    assert (mh.signature(a) == mh.signature(a)).all()


def test_simhash_similar_docs_close():
    a = " ".join(f"tok{i}" for i in range(100))
    b = " ".join(f"tok{i}" for i in range(99)) + " tokX"
    c = " ".join(f"other{i}" for i in range(100))
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    ham_ab = bin(int(ha) ^ int(hb)).count("1")
    ham_ac = bin(int(ha) ^ int(hc)).count("1")
    assert ham_ab < ham_ac
    assert ham_ab <= 12


def test_jaccard_and_token_counts():
    assert jaccard_token_sets("a b c", "a b d") == 0.5
    tc = token_counts(pd.Series(["a bb ccc", "x"]))
    assert tc["n_tokens"].tolist() == [3, 1]
    assert tc["token_chars"].tolist() == [6, 1]
    assert tc["distinct_tokens"].tolist() == [3, 1]


def test_fingerprint_order_sensitive():
    fp = fingerprint64(pd.Series(["a b c", "c b a", "a b c"]))
    assert fp[0] != fp[1]
    assert fp[0] == fp[2]


def test_minhash_batch_matches_scalar():
    mh = MinHasher(num_perm=64)
    texts = ["the quick brown fox", "a b c", "", "hello world hello again", "x"]
    sigs = mh.signatures_batch(texts, k=1)
    for i, t in enumerate(texts):
        assert (sigs[i] == mh.signature(t, k=1)).all()
    keys = mh.band_keys_batch(sigs, num_bands=16)
    for i in range(len(texts)):
        assert (keys[i] == mh.band_keys(sigs[i], num_bands=16)).all()


def test_lsh_jaccard_recall_1_vs_all_pairs(ray_session):
    """The LSH-blocked doc_jaccard_pairs must reproduce the all-pairs
    result EXACTLY on the sf0.01 corpus (pairs, n_inter, n_union) — the
    banding may only add candidates (verified away), never lose pairs."""
    from quant_feature_pipeline_ray.pipelines.training_data import doc_jaccard_pairs

    sf = "/root/testdata/sf0.01"
    got_df = doc_jaccard_pairs(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sets = {int(r.doc_id): frozenset(r.text.split(" ")) for r in docs.itertuples()}
    ids = sorted(sets)
    truth = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= 0.82:
                truth[(a, b)] = (inter, union)
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.n_inter), int(r.n_union))
        for r in got_df.itertuples()
    }
    missed = set(truth) - set(got)
    extra = set(got) - set(truth)
    assert not missed and not extra, f"missed={len(missed)} extra={len(extra)}"
    assert got == truth  # values too: exact intersection/union counts


def test_lang_scores_deterministic_ties():
    df = lang_scores(pd.Series(["the la fast datos", "xyz", "the the fast"]))
    assert df["pred_lang"].tolist()[1] == "und"  # zero hits
    assert df["pred_lang"].tolist()[2] == "en"
    assert df["pred_lang"].tolist()[0] == "und"  # en==es tie -> und


def test_cosine_dups_ivf_recall_vs_exact(ray_session):
    """IVF-bucketed cosine near-dup must recover (almost) every exact pair
    at sf0.01; precision is 1.0 by construction (same sim formula)."""
    from quant_feature_pipeline_ray.pipelines.training_data import (
        emb_cosine_dups,
        emb_cosine_dups_ivf,
    )

    sf = "/root/testdata/sf0.01"
    exact = emb_cosine_dups(sf)
    approx = emb_cosine_dups_ivf(sf)
    truth = set(zip(exact["vec_a"], exact["vec_b"]))
    got = set(zip(approx["vec_a"], approx["vec_b"]))
    assert not (got - truth), "IVF variant emitted a pair the exact sweep lacks"
    recall = len(got & truth) / len(truth) if truth else 1.0
    assert recall >= 0.9, f"IVF cosine-dup recall too low: {recall:.3f}"


def test_hyperplane_lsh_recall_vs_exact(ray_session):
    """Random-hyperplane LSH near-dup must recover >= 0.9 of the exact
    O(N^2) sweep's pairs at sf0.01, and every emitted pair must appear in
    the exact result (the in-bucket verify is exact, so precision is 1.0
    by construction — a miss here means the verify drifted)."""
    from quant_feature_pipeline_ray.pipelines import training_data as td

    d = "/root/testdata/sf0.01"
    exact = td.emb_cosine_dups(d)
    lsh = td.emb_hyperplane_lsh(d)
    ek = set(zip(exact["vec_a"], exact["vec_b"]))
    lk = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert len(ek) > 0
    assert len(ek & lk) / len(ek) >= 0.9
    assert lk <= ek  # exact verify => no false positives


def test_ngram_dup_frac_matches_string_ngrams(ray_session):
    """Hashed rolling n-grams must reproduce the exact string-n-gram
    duplication profile (no collisions at test scale)."""
    from collections import Counter

    from quant_feature_pipeline_ray.pipelines.training_data import doc_ngram_dup_frac

    sf = "/root/testdata/sf0.001"
    n = 5
    got = doc_ngram_dup_frac(sf, n=n).to_pandas().set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    per_doc = {}
    owners = Counter()  # ngram -> #distinct docs
    for r in docs.itertuples():
        toks = r.text.split(" ")
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        per_doc[int(r.doc_id)] = c
        for g in c:
            owners[g] += 1
    for doc_id, c in per_doc.items():
        npos = sum(c.values())
        shared = sum(v for g, v in c.items() if owners[g] > 1)
        row = got.loc[doc_id]
        assert int(row["n_pos"]) == npos
        assert int(row["n_shared_pos"]) == shared
        assert row["dup_frac"] == shared / npos


def test_heavy_hitters_exact_and_sketch_bounded(ray_session, tmp_path):
    """Two-pass Misra-Gries heavy hitters must be EXACT (candidate
    superset + exact verify) whenever the width condition
    threshold > sum(off_b) holds, and must FAIL FAST (not silently drop
    hitters) when the sketch is too narrow for the requested threshold."""
    from collections import Counter

    import pytest as _pytest

    from quant_feature_pipeline_ray.pipelines.training_data import doc_heavy_hitters

    sf = "/root/testdata/sf0.001"
    threshold = 40
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    truth = Counter()
    for t in docs["text"]:
        truth.update(t.split(" "))
    expect = {tok: c for tok, c in truth.items() if c >= threshold}
    got = doc_heavy_hitters(sf, threshold=threshold, k_sketch=256).to_pandas()
    gm = dict(zip(got["token"], got["n"].astype(int)))
    assert gm == expect
    # the fixture vocabulary is near-uniform-heavy: a 16-counter sketch
    # cannot certify threshold 40 — the engine must refuse, not drop rows
    with _pytest.raises(ValueError, match="sketch too narrow"):
        doc_heavy_hitters(sf, threshold=threshold, k_sketch=16)

    # skewed corpus: few giants over a huge rare tail — the regime MG is
    # for. Truncation fires in every batch (vocab >> k) yet off_b stays
    # tiny, so a narrow sketch is still exact.
    rng = np.random.default_rng(7)
    giants = [f"giant{i}" for i in range(5)]
    rows = []
    for d in range(200):
        toks = [giants[j % 5] for j in range(10)] + [
            f"rare{rng.integers(0, 200_000)}" for _ in range(60)
        ]
        rows.append(" ".join(toks))
    p = tmp_path / "skew"
    p.mkdir()
    pd.DataFrame({"doc_id": range(200), "text": rows}).to_parquet(p / "documents.parquet")
    truth2 = Counter()
    for t in rows:
        truth2.update(t.split(" "))
    expect2 = {tok: c for tok, c in truth2.items() if c >= 50}
    got2 = doc_heavy_hitters(str(p), threshold=50, k_sketch=64).to_pandas()
    gm2 = dict(zip(got2["token"], got2["n"].astype(int)))
    assert gm2 == expect2
    assert set(gm2) == set(f"giant{i}" for i in range(5))


def test_dup_clusters_match_union_find(ray_session):
    """doc_dup_clusters (alternating large/small-star CC) must equal a
    driver-side union-find over the same verified pair set: cluster_id is
    the min doc_id of each similarity component; singletons map to self."""
    from quant_feature_pipeline_ray.pipelines.training_data import (
        doc_dup_clusters,
        doc_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.01"
    got = doc_dup_clusters(sf)
    pairs = doc_jaccard_pairs(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id"])

    parent = {int(d): int(d) for d in docs["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        ra, rb = find(int(r.doc_a)), find(int(r.doc_b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    want = {d: find(d) for d in parent}
    got_map = dict(zip(got["doc_id"].astype(int), got["cluster_id"].astype(int)))
    assert got_map == want
    # every cluster id is its own representative
    assert all(got_map[c] == c for c in set(got_map.values()))


def test_emb_kmeans_matches_straightline_lloyd(ray_session):
    """Distributed Lloyd (broadcast centroids + grouped centroid update)
    must reproduce a straight-line numpy Lloyd from the same deterministic
    init: identical assignments, allclose distances."""
    from quant_feature_pipeline_ray.pipelines.training_data import emb_kmeans

    sf = "/root/testdata/sf0.01"
    km = emb_kmeans(sf, k=8, n_iters=5)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = mat[:8].copy()
    for _ in range(5):
        d2 = (mat * mat).sum(1)[:, None] - 2 * mat @ C.T + (C * C).sum(1)[None, :]
        a = d2.argmin(1)
        for c in range(8):
            m = a == c
            if m.any():
                C[c] = mat[m].mean(0)
    d2 = (mat * mat).sum(1)[:, None] - 2 * mat @ C.T + (C * C).sum(1)[None, :]
    got = km.sort_values("vec_id")
    assert (got["cluster"].to_numpy() == d2.argmin(1)).all()
    assert np.allclose(got["dist2"].to_numpy(), np.round(d2.min(1), 6), atol=2e-6)
    # every cluster non-empty on this corpus
    assert got["cluster"].nunique() == 8


def test_emb_pca_matches_straightline(ray_session):
    """Distributed-covariance PCA == straight-line numpy PCA over the
    quantized matrix (same floor-quantization, same sign convention)."""
    from quant_feature_pipeline_ray.pipelines.training_data import emb_pca_project

    sf = "/root/testdata/sf0.01"
    pca = emb_pca_project(sf, n_components=2).sort_values("vec_id")
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(mat * 1000) / 1000.0
    C = np.cov(q.T, bias=True)
    w, v = np.linalg.eigh(C)
    comp = v[:, np.argsort(w)[::-1][:2]]
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(2)])
    comp = comp * flip[None, :]
    ref = mat @ comp
    got = pca[["pc1", "pc2"]].to_numpy()
    assert np.allclose(got, np.round(ref, 6), atol=2e-6)
    # projections onto the top component carry more variance than the second
    assert got[:, 0].var() > got[:, 1].var()


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate near the design point;
    partial OR-merge equals the single-shot build."""
    from quant_feature_pipeline_ray.functions.sketches import (
        bloom_contains,
        bloom_partial,
    )

    rng = np.random.default_rng(7)
    members = rng.choice(np.arange(1_000_000, dtype=np.uint64), 13_000, replace=False)
    non_members = np.setdiff1d(
        rng.integers(1_000_000, 2_000_000, 50_000).astype(np.uint64), members
    )
    bits = bloom_partial(members)
    assert bloom_contains(bits, members).all()  # zero false negatives
    fp = bloom_contains(bits, non_members).mean()
    assert fp < 0.03, fp
    # OR-merge of partials == single-shot build
    merged = bloom_partial(members[:5000]) | bloom_partial(members[5000:])
    assert np.array_equal(merged, bits)


def test_knn_graph_recall_vs_exact(ray_session):
    """IVF-bucketed k-NN graph must recover >= 0.9 of the exact neighbour
    edges at sf0.01, and every emitted sim must equal the exact cosine for
    that pair (the per-cluster kernel uses the same formula)."""
    from quant_feature_pipeline_ray.pipelines.training_data import emb_knn_graph

    sf = "/root/testdata/sf0.01"
    k = 5
    got = emb_knn_graph(sf, k=k)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    vids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    u = mat / np.maximum(np.sqrt((mat * mat).sum(1))[:, None], 1e-12)
    sims = np.round(u @ u.T, 6)
    np.fill_diagonal(sims, -2.0)
    truth = set()
    for i in range(len(vids)):
        # deterministic exact top-k: sim desc, vec_id asc
        order = np.lexsort((vids, -sims[i]))[:k]
        truth |= {(vids[i], vids[j]) for j in order}
    got_edges = set(zip(got["vec_id"], got["nbr_id"]))
    assert len(got) == len(vids) * k
    recall = len(got_edges & truth) / len(truth)
    assert recall >= 0.9, f"knn-graph recall too low: {recall:.3f}"
    # sims exact for emitted pairs
    pos = {int(v): i for i, v in enumerate(vids)}
    for v, n, s in zip(got["vec_id"], got["nbr_id"], got["sim"]):
        assert s == sims[pos[int(v)], pos[int(n)]]


def test_semdedup_matches_straightline(ray_session):
    """Distributed SemDeDup == straight-line numpy given the same seeded
    centroids: identical cluster assignment and keep/drop decisions."""
    from quant_feature_pipeline_ray.pipelines.training_data import (
        _kmeans_centroids,
        emb_semdedup,
    )

    sf = "/root/testdata/sf0.01"
    tau = 0.42
    got = emb_semdedup(sf, threshold=tau).sort_values("vec_id", ignore_index=True)

    cent = _kmeans_centroids(sf, 16, 5, 65536)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    vids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    u = mat / np.maximum(np.sqrt((mat * mat).sum(1))[:, None], 1e-12)
    assign = np.argmax(u @ cent.T, axis=1)
    keep = np.ones(len(vids), bool)
    for c in np.unique(assign):
        idx = np.flatnonzero(assign == c)  # vids sorted => idx in vec_id order
        s = np.round(u[idx] @ u[idx].T, 6)
        for r in range(1, len(idx)):
            if s[r, :r].max() >= tau:
                keep[idx[r]] = False
    assert (got["vec_id"].to_numpy() == vids).all()
    assert (got["cluster"].to_numpy() == assign).all()
    assert (got["keep"].to_numpy() == keep).all()
    # the op must actually drop something on this corpus
    assert (~keep).sum() > 0


def test_qdigest_error_bound_and_merge_associativity():
    """Quantile digest: rank error <= 2/max_centroids on heavy-tailed data,
    and merging in different groupings gives (near-)identical digests."""
    from quant_feature_pipeline_ray.functions.sketches import (
        qdigest_merge,
        qdigest_partial,
        qdigest_quantile,
    )

    rng = np.random.default_rng(11)
    x = rng.lognormal(mean=0.0, sigma=2.5, size=50_000)
    chunks = np.array_split(x, 37)
    K = 256
    parts = [qdigest_partial(c, K) for c in chunks]
    d_flat = qdigest_merge(parts, K)
    # two-level merge (different grouping) must agree within the bound too
    mid = [qdigest_merge(parts[i::5], K) for i in range(5)]
    d_tree = qdigest_merge(mid, K)
    xs = np.sort(x)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        for d in (d_flat, d_tree):
            est = qdigest_quantile(d, q)
            rank = np.searchsorted(xs, est) / len(xs)
            assert abs(rank - q) <= 2.0 / K, (q, rank)


def test_approx_quantiles_on_dataset(ray_session):
    """Distributed approx_quantiles over the events value column lands
    within the digest's rank-error bound of the exact quantiles."""
    import ray.data

    from quant_feature_pipeline_ray.stages.normalize import approx_quantiles

    sf = "/root/testdata/sf0.01"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["value"])
    got = approx_quantiles(ds, "value", (0.1, 0.5, 0.9, 0.99), max_centroids=256)
    vals = np.sort(pd.read_parquet(f"{sf}/events.parquet")["value"].to_numpy())
    for q, est in got.items():
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - q) <= 2.0 / 256, (q, rank)


def test_count_min_bounds_and_merge():
    """CMS: never undercounts; overcount bounded by (e/width)*N on a
    Zipf-ish stream; partial merge == whole-stream sketch bitwise."""
    from quant_feature_pipeline_ray.functions.sketches import (
        cms_partial,
        cms_query,
    )

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.4, size=80_000) % 10_000
    h = (keys.astype(np.uint64) * np.uint64(0xFF51AFD7ED558CCD)) ^ np.uint64(0x1234)
    W, D = 2048, 4
    whole = cms_partial(h, W, D)
    merged = sum(cms_partial(c, W, D) for c in np.array_split(h, 13))
    assert (whole == merged).all()
    uniq, true = np.unique(keys, return_counts=True)
    hu = (uniq.astype(np.uint64) * np.uint64(0xFF51AFD7ED558CCD)) ^ np.uint64(0x1234)
    est = cms_query(whole, hu)
    assert (est >= true).all()  # CM never undercounts
    bound = np.e / W * len(keys)
    # standard guarantee holds with prob 1-e^-D per key; assert the 99.9th
    # percentile of overshoot is within the bound (deterministic seed)
    over = est - true
    assert np.quantile(over, 0.999) <= bound, (np.quantile(over, 0.999), bound)


def test_doc_dedup_incremental_equals_one_shot(ray_session, tmp_path):
    """Two incremental batches against persisted state == one-shot exact
    dedup representatives, bitwise; replaying batch 2 adds nothing
    (idempotent state)."""
    import ray.data

    from quant_feature_pipeline_ray.pipelines.training_data import (
        doc_dedup_incremental,
        doc_exact_dedup,
    )

    sf = "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]].sort_values(
        "doc_id", ignore_index=True
    )
    cut = docs["doc_id"].median()
    b1, b2 = docs[docs["doc_id"] <= cut], docs[docs["doc_id"] > cut]
    state = str(tmp_path / "dedup_state")

    # inject CROSS-BATCH duplicates: 40 batch-1 texts reappear in batch 2
    # under new doc_ids (the sf0.01 corpus has no exact dups of its own)
    dup = b1.head(40).copy()
    dup["doc_id"] = dup["doc_id"].to_numpy() + 1_000_000
    b2 = pd.concat([b2, dup], ignore_index=True)

    k1 = doc_dedup_incremental(ray.data.from_pandas(b1.reset_index(drop=True)), state)
    k2 = doc_dedup_incremental(ray.data.from_pandas(b2.reset_index(drop=True)), state)
    got = np.sort(np.concatenate([k1["doc_id"].to_numpy(), k2["doc_id"].to_numpy()]))

    # the injected copies must be filtered by the PERSISTED state
    assert not np.isin(dup["doc_id"].to_numpy(), got).any()
    expected = np.sort(doc_exact_dedup(sf).to_pandas()["rep_doc_id"].to_numpy())
    assert (got == expected).all()

    # replay batch 2: every hash already committed -> zero rows kept
    k2b = doc_dedup_incremental(ray.data.from_pandas(b2.reset_index(drop=True)), state)
    assert len(k2b) == 0


def test_doc_dedup_incremental_crash_retry(ray_session, tmp_path):
    """A retry of the SAME batch (same batch_id) after its partitions
    committed returns the originally kept rows — NOT zero (round-2 ADVICE:
    the inverted crash-recovery bug, where a post-commit crash + re-run
    silently lost the batch's representatives)."""
    import ray.data

    from quant_feature_pipeline_ray.pipelines.training_data import doc_dedup_incremental

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")[
        ["doc_id", "text"]
    ].sort_values("doc_id", ignore_index=True)
    b1 = docs.head(500).reset_index(drop=True)
    state = str(tmp_path / "dedup_state")

    k1 = doc_dedup_incremental(ray.data.from_pandas(b1), state, batch_id="ingest-001")
    assert len(k1) == 500  # sf corpus has no exact dups of its own

    # crash-retry: same batch_id -> the committed keep-set, bitwise
    k1r = doc_dedup_incremental(ray.data.from_pandas(b1), state, batch_id="ingest-001")
    pd.testing.assert_frame_equal(k1r, k1)

    # a genuinely NEW batch with the same (all-seen) content keeps nothing
    k1n = doc_dedup_incremental(ray.data.from_pandas(b1), state, batch_id="ingest-002")
    assert len(k1n) == 0
    # and the default (auto batch id) path behaves the same
    k1a = doc_dedup_incremental(ray.data.from_pandas(b1), state)
    assert len(k1a) == 0


def test_emb_outliers_matches_straightline(ray_session):
    """Distributed outlier flagging == straight-line numpy from the same
    seeded centroids (same threshold rule on the round-6 distance grid)."""
    from quant_feature_pipeline_ray.pipelines.training_data import (
        _kmeans_centroids,
        emb_outliers,
    )

    sf = "/root/testdata/sf0.01"
    tail_ppm = 50_000
    got = emb_outliers(sf, tail_ppm=tail_ppm).sort_values("vec_id", ignore_index=True)

    cent = _kmeans_centroids(sf, 16, 5, 65536)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    u = mat / np.maximum(np.sqrt((mat * mat).sum(1))[:, None], 1e-12)
    sims = np.round(u @ cent.T, 6)  # round-6 before the max (oracle discipline)
    dist = np.round(1.0 - sims.max(1), 6)
    total = len(dist)
    keep_n = total - (total * tail_ppm) // 1_000_000
    vs = np.sort(np.unique(dist))
    counts = np.array([(dist == v).sum() for v in vs])
    thr = vs[np.searchsorted(np.cumsum(counts), keep_n)]
    assert (got["dist"].to_numpy() == dist).all()
    assert (got["is_outlier"].to_numpy() == (dist > thr)).all()
    frac = got["is_outlier"].mean()
    assert 0 < frac <= 0.08  # ~5% tail actually flagged


def test_pagerank_matches_straightline(ray_session):
    """Distributed PageRank == straight-line numpy power iteration over the
    same verified-pair graph (same damping/dangling handling), and the rank
    vector sums to 1."""
    from quant_feature_pipeline_ray.pipelines.training_data import (
        doc_graph_pagerank,
        doc_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.01"
    n_iters, d = 3, 0.85
    got = doc_graph_pagerank(sf, n_iters=n_iters, damping=d)

    pairs = doc_jaccard_pairs(sf)
    docs = pd.read_parquet(f"{sf}/documents.parquet")["doc_id"].to_numpy()
    n = len(docs)
    pos = {int(v): i for i, v in enumerate(np.sort(docs))}
    src = np.concatenate([pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()])
    dst = np.concatenate([pairs["doc_b"].to_numpy(), pairs["doc_a"].to_numpy()])
    si = np.array([pos[int(v)] for v in src])
    di = np.array([pos[int(v)] for v in dst])
    deg = np.bincount(si, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dang = r[deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / np.maximum(deg[si], 1))
        r = (1 - d) / n + d * (contrib + dang / n)
    got_sorted = got.sort_values("doc_id")["pagerank"].to_numpy()
    assert abs(got_sorted.sum() - 1.0) < 1e-6  # round-9 output, 500 values
    assert np.allclose(got_sorted, np.round(r, 9), atol=2e-9)
    # the graph is non-trivial: ranks must not be uniform
    assert got_sorted.std() > 0


def test_curate_corpus_writes_funnel_survivors(ray_session, tmp_path):
    """The curation job's written shards contain EXACTLY the funnel's
    surviving doc_ids (text re-joined through the doc_id exchange, never
    through the funnel), partitioned by lang; a re-run resumes (no-op)."""
    from quant_feature_pipeline_ray.pipelines.curation import curate_corpus
    from quant_feature_pipeline_ray.pipelines.training_data import doc_curation_funnel

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    s1 = curate_corpus(sf, out)
    import ray.data

    back = ray.data.read_parquet(out).to_pandas()
    want = doc_curation_funnel(sf).to_pandas()
    assert sorted(back["doc_id"]) == sorted(want["doc_id"])
    assert s1["n_final"] == len(want) and s1["n_input"] == 500
    assert back["text"].str.len().gt(0).all()  # real text rode the join
    import os

    assert any(d.startswith("lang=") for d in os.listdir(out))
    s2 = curate_corpus(sf, out)  # resume: marker present -> no rewrite
    assert s2 == s1


def test_pq_ann_recall_vs_exact(ray_session):
    """PQ-candidate + exact-rerank ANN recovers >= 0.8 of the exact top-k,
    and every reported sim equals the exact cosine (rerank is exact)."""
    from quant_feature_pipeline_ray.pipelines.training_data import (
        emb_ann_pq,
        emb_ann_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = emb_ann_topk(sf)
    pq = emb_ann_pq(sf)
    et = {(q, v) for q, v in zip(exact["query_id"], exact["vec_id"])}
    pt = {(q, v) for q, v in zip(pq["query_id"], pq["vec_id"])}
    recall = len(et & pt) / len(et)
    assert recall >= 0.8, f"PQ recall too low: {recall:.3f}"
    ex = exact.set_index(["query_id", "vec_id"])["sim"]
    for q, v, s in zip(pq["query_id"], pq["vec_id"], pq["sim"]):
        if (q, v) in et:
            assert s == ex[(q, v)]
