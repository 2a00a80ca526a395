"""Training-data pipelines over the `documents` and `embeddings` tables.

The large-scale data-curation operator family: exact & near dedup,
text analysis (token counts, quality, language-ID, fingerprints), and
similarity search over an embedding column. Each pipeline is a Ray Data
composition: vectorized map_batches (+ groupby only where a shuffle is
semantically required), with the scale pattern noted per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from quant_feature_pipeline_ray.functions.dedupfns import (
    MinHasher,
    jaccard_token_sets,
    simhash64,
)
from quant_feature_pipeline_ray.functions.textstats import (
    LANG_MARKERS,
    fingerprint64,
    lang_scores,
    stopword_hits,
    token_counts,
)
from quant_feature_pipeline_ray.hashing import content_hash

DOC_COLS = ["doc_id", "text", "lang", "n_chars"]


# ---------------------------------------------------------------- text stats
def doc_token_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-doc token counting + quality ratios (exact integer arithmetic)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        out = token_counts(texts)
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        out["stopword_hits"] = stopword_hits(texts)
        out["stopword_ratio"] = out["stopword_hits"] / out["n_tokens"]
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_token_stats_sql(sf_dir: str) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
SELECT doc_id,
       length(text) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS distinct_ratio,
       CAST(length(replace(text, ' ', '')) AS BIGINT)
         / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS mean_token_len,
       CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS BIGINT) AS stopword_hits,
       CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS BIGINT)
         / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS stopword_ratio
FROM documents
ORDER BY doc_id"""


def doc_lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        out = lang_scores(batch["text"].to_pandas())
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        out["lang"] = batch["lang"].to_numpy(zero_copy_only=False)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_lang_id_sql(sf_dir: str) -> str:
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        ms = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({ms}))) AS BIGINT) AS hits_{lang}"
        )
    langs = list(LANG_MARKERS.keys())
    best = "greatest(" + ", ".join(f"hits_{l}" for l in langs) + ")"
    n_at_max = " + ".join(f"CASE WHEN hits_{l} = {best} THEN 1 ELSE 0 END" for l in langs)
    first_max = (
        "CASE "
        + " ".join(f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs)
        + " END"
    )
    return (
        "WITH h AS (SELECT doc_id, lang, "
        + ", ".join(hit_cols)
        + " FROM documents)\nSELECT doc_id, "
        + ", ".join(f"hits_{l}" for l in langs)
        + f""",
       CASE WHEN {best} > 0 AND ({n_at_max}) = 1 THEN {first_max} ELSE 'und' END AS pred_lang,
       lang
FROM h ORDER BY doc_id"""
    )


# ---------------------------------------------------------------- dedup
def doc_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup groups: representative = min doc_id per identical text.

    Scale pattern: shuffle only (hash, doc_id) — at 100 TB the text column
    never moves; here we group by a 64-bit content hash and keep min id +
    count. (Hash collisions are ignored at this scale by design; a
    byte-compare verify stage would bolt on as one more map_batches.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hash_stage(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": content_hash(batch["text"].to_numpy(zero_copy_only=False)).astype(np.int64),
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )

    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")
    agg = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies")
    )
    return agg.drop_columns(["h"])


def doc_exact_dedup_sql(sf_dir: str) -> str:
    return """
SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text ORDER BY rep_doc_id"""


def doc_jaccard_pairs(sf_dir: str, threshold: float = 0.82) -> pd.DataFrame:
    """Near-dup pairs by exact token-SET Jaccard >= threshold.

    Ray plan: all-pairs within LSH-style blocks. At testdata scale we block
    on a cheap bucket (all docs) and verify pairwise inside map_groups with
    numpy set ops; at 100 TB the blocking key becomes the MinHash band
    (doc_minhash_lsh below) so only candidates are verified."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        texts = g["text"].tolist()
        sets = [frozenset(t.split(" ")) for t in texts]
        order = np.argsort(ids)
        rows = []
        for ii in range(len(order)):
            i = order[ii]
            for jj in range(ii + 1, len(order)):
                j = order[jj]
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), inter, union))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "n_inter", "n_union"])

    # single logical block at this scale; the groupby key is constant
    withk = docs.map_batches(
        lambda b: b.append_column("k", pa.array(np.zeros(len(b), dtype=np.int32))),
        batch_format="pyarrow",
    )
    out = withk.groupby("k").map_groups(pairs, batch_format="pandas")
    df = out.to_pandas()
    df["jaccard"] = df["n_inter"] / df["n_union"]
    return df.sort_values(["doc_a", "doc_b"], ignore_index=True)


def doc_jaccard_pairs_sql(sf_dir: str, threshold: float = 0.82) -> str:
    return f"""
WITH s AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
       CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
         / CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {threshold}
ORDER BY doc_a, doc_b"""


def doc_minhash_lsh(sf_dir: str, threshold: float = 0.82, num_perm: int = 64, num_bands: int = 16) -> pd.DataFrame:
    """MinHash+LSH near-dup: signature per doc → explode (band, key, doc) →
    groupby band bucket → candidate pairs → exact-Jaccard verify.

    Probabilistic candidate generation (no SQL oracle); the verify step
    reuses jaccard_token_sets so any surviving pair is exact."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy()
            rows = []
            for did, text in zip(ids, batch["text"].to_pylist()):
                keys = self.mh.band_keys(self.mh.signature(text), num_bands=num_bands)
                for band, key in enumerate(keys):
                    rows.append((int(did), band, np.int64(key.astype(np.int64))))
            return pd.DataFrame(rows, columns=["doc_id", "band", "key"])

    exploded = docs.map_batches(Signer, batch_format="pyarrow", concurrency=2)

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b"]).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (
        exploded.groupby(["band", "key"])
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(ignore_index=True)
    )
    if len(cand) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).set_index(
        "doc_id"
    )["text"]
    jac = np.array(
        [jaccard_token_sets(texts.at[a], texts.at[b]) for a, b in zip(cand["doc_a"], cand["doc_b"])]
    )
    out = cand[jac >= threshold].copy()
    out["jaccard"] = jac[jac >= threshold]
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True)


def doc_simhash(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash per doc (+ fingerprint); pytest-oracled."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": np.array([simhash64(t) for t in texts], dtype=np.uint64).astype(
                    np.int64
                ),
                "fingerprint": fingerprint64(texts).astype(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------- embeddings
def emb_norms(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def fn(batch: pa.Table) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(),
                "dim": np.full(len(mat), mat.shape[1], dtype=np.int64),
                "l2_norm": np.round(np.sqrt(np.einsum("ij,ij->i", mat, mat)), 6),
                "label": batch["label"].to_numpy(),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def emb_norms_sql(sf_dir: str) -> str:
    return """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       label
FROM embeddings ORDER BY vec_id"""


def emb_ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5) -> pd.DataFrame:
    """Brute-force cosine top-k per query vector — the ANN baseline.

    Scale pattern: the query matrix is broadcast once (ray.put), each batch
    does one float64 matmul against it, per-batch top-k partials are merged
    on the driver (k × n_queries rows — tiny). Rank is computed on
    round(sim, 6) with vec_id tie-break so ordering is reproducible across
    engines."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb[emb["vec_id"] < n_queries]
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qids = qdf["vec_id"].to_numpy()
    qref = ray.put((qids, qmat, qnorm))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class Scorer:
        def __init__(self, qref):
            self.qids, self.qmat, self.qnorm = (
                ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
            )

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            vids = batch["vec_id"].to_numpy()
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            sims = (mat @ self.qmat.T) / (norms[:, None] * self.qnorm[None, :])
            nq = len(self.qids)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(self.qids, len(vids)),
                    "vec_id": np.tile(vids, nq),
                    "sim": np.round(sims.T.reshape(-1), 6),
                }
            )
            out = out[out["query_id"] != out["vec_id"]]
            # per-batch partial top-k — only k rows per query leave the task
            out = out.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
            return out.groupby("query_id", as_index=False).head(k)

    partials = ds.map_batches(Scorer, fn_constructor_args=(qref,), batch_format="pyarrow", concurrency=2)
    allp = partials.to_pandas()
    allp = allp.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    top = allp.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["query_id"] = top["query_id"].astype(np.int64)
    top["vec_id"] = top["vec_id"].astype(np.int64)
    top["rank"] = top["rank"].astype(np.int64)
    return top


def emb_cosine_dups(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, sim >= τ).

    Scale pattern: the corpus matrix is broadcast once; each batch computes
    one matmul block-row of the similarity matrix and emits only pairs over
    threshold (block-row partitioning of an O(N^2) job). At 100 TB this is
    the IVF/LSH-bucketed variant's verify stage; here the full block-row
    sweep is exact and DuckDB-oracled."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy()
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    ref = ray.put((vids, mat, norms))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def block(batch: pa.Table) -> pd.DataFrame:
        avids, amat, anorms = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        bvids = batch["vec_id"].to_numpy()
        bnorms = np.sqrt(np.einsum("ij,ij->i", m, m))
        sims = (m @ amat.T) / (bnorms[:, None] * anorms[None, :])
        sims = np.round(sims, 6)
        bi, ai = np.nonzero((sims >= threshold) & (bvids[:, None] < avids[None, :]))
        return pd.DataFrame(
            {
                "vec_a": bvids[bi].astype(np.int64),
                "vec_b": avids[ai].astype(np.int64),
                "sim": sims[bi, ai],
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)


def emb_cosine_dups_sql(sf_dir: str, threshold: float = 0.4) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}
ORDER BY vec_a, vec_b"""


def emb_ann_ivf(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 5,
) -> pd.DataFrame:
    """IVF-style ANN — the scale path beyond brute force.

    Build: deterministic seeded k-means over (a sample of) the corpus on
    the driver → broadcast centroids → one map_batches assigns every vector
    to its nearest centroid (the inverted lists). Search: per query, probe
    the `nprobe` nearest clusters only, exact-rerank candidates.
    At 100 TB the assignment pass and the per-cluster search shuffle by
    cluster id; here the same dataflow runs at testdata scale. Approximate
    by design → no SQL oracle; pytest checks recall vs brute force."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy()
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    unit = mat / np.maximum(norms[:, None], 1e-12)

    rng = np.random.default_rng(7)
    cent = unit[rng.choice(len(unit), size=min(n_clusters, len(unit)), replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(unit @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = unit[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    # inverted-list assignment as the distributed pass: centroids broadcast
    # once, one matmul per batch (at scale this feeds a groupby(cluster))
    cent_ref = ray.put(cent)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def assign_batch(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "cluster": np.argmax(u @ c.T, axis=1)}
        )

    adf = ds.map_batches(assign_batch, batch_format="pyarrow").to_pandas()
    assign = adf.set_index("vec_id")["cluster"].reindex(vids).to_numpy()

    qmask = vids < n_queries
    qids, qunit = vids[qmask], unit[qmask]
    out_rows = []
    probe = np.argsort(-(qunit @ cent.T), axis=1)[:, :nprobe]
    for qi, qid in enumerate(qids):
        cand = np.isin(assign, probe[qi]) & (vids != qid)
        cvids = vids[cand]
        sims = np.round(unit[cand] @ qunit[qi], 6)
        order = np.lexsort((cvids, -sims))[:k]
        for rank, j in enumerate(order, 1):
            out_rows.append((int(qid), int(cvids[j]), float(sims[j]), rank))
    return pd.DataFrame(out_rows, columns=["query_id", "vec_id", "sim", "rank"])


def emb_ann_topk_sql(sf_dir: str, n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {n_queries}),
sims AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id <> e.vec_id
)
SELECT query_id, vec_id, sim,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
FROM sims
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= {k}
ORDER BY query_id, rank"""
