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
    simhash64,
)
from quant_feature_pipeline_ray.functions.textstats import (
    LANG_MARKERS,
    fingerprint64,
    lang_scores,
    stopword_hits,
    token_counts,
)
from quant_feature_pipeline_ray.hashing import content_hash, md5_lower64

DOC_COLS = ["doc_id", "text", "lang", "n_chars"]


def _label_n_classes(path: str, column: str = "label") -> int:
    """Number of classes = max(label)+1, derived from parquet row-group
    statistics (a footer-only read — no data scan, cheap at any corpus
    size). Falls back to a single-column read only when a writer omitted
    stats. Raises on negative labels rather than mis-indexing a gradient
    tensor deep inside a worker."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.get_field_index(column)
    lo, hi, have_stats = None, None, True
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            have_stats = False
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if not have_stats or lo is None:
        col = pq.read_table(path, columns=[column])[column]
        import pyarrow.compute as pc

        mm = pc.min_max(col).as_py()
        lo, hi = mm["min"], mm["max"]
    if lo is None or int(lo) < 0:
        raise ValueError(
            f"{path}:{column} has negative/null labels (min={lo}); "
            "class labels must be dense non-negative integers"
        )
    return int(hi) + 1


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


def _corpus_ck_key(sf_dir: str, table: str = "documents.parquet") -> str:
    """Checkpoint key component: absolute path + cheap content fingerprint
    (file size + mtime_ns + footer row count — no data scan). Two corpora
    sharing a directory basename in one process, or a corpus mutated
    in-place (the incremental-append flow), can never serve a stale
    checkpoint (round-2 ADVICE finding)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    p = os.path.join(sf_dir, table)
    st = os.stat(p)
    nrows = pq.ParquetFile(p).metadata.num_rows
    blob = f"{os.path.abspath(p)}|{st.st_size}|{st.st_mtime_ns}|{nrows}"
    return hashlib.md5(blob.encode()).hexdigest()[:12]


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

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")
    # the content-hash keyspace is corpus-sized — hash-partitioned pandas
    # reduce, never Ray's per-group sort-aggregate (stages/hash_aggregate.py)
    agg = grouped_aggregate(
        hashed, "h", {"rep_doc_id": ("doc_id", "min"), "n_copies": ("doc_id", "size")}
    )
    return agg.drop_columns(["h"])


def doc_exact_dedup_sql(sf_dir: str) -> str:
    return """
SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text ORDER BY rep_doc_id"""


_NORM_PUNCT = r"[^a-z0-9 ]"


def _normalize_text_series(texts: np.ndarray) -> pd.Series:
    """CCNet-style normalization (lower → strip punctuation → collapse
    whitespace → trim), byte-identical to the DuckDB oracle's
    regexp_replace chain."""
    s = pd.Series(texts).str.lower()
    s = s.str.replace(_NORM_PUNCT, "", regex=True)
    s = s.str.replace(" +", " ", regex=True)
    return s.str.strip()


def doc_normalized_dedup(sf_dir: str) -> ray.data.Dataset:
    """Normalization-equivalence dedup (the CCNet / C4 preprocedure,
    public: Wenzek et al. 2019): two docs are duplicates when they match
    after lowercasing, punctuation stripping and whitespace collapsing.
    Representative = min doc_id per normalization class.

    Same shuffle shape as doc_exact_dedup: normalize + hash per batch, the
    text never rides the exchange — only (hash, doc_id)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return _normalized_dedup_ds(ds)


def _normalized_dedup_ds(ds: ray.data.Dataset) -> ray.data.Dataset:
    def hash_stage(batch: pa.Table) -> pd.DataFrame:
        norm = _normalize_text_series(batch["text"].to_numpy(zero_copy_only=False))
        return pd.DataFrame(
            {
                "h": content_hash(norm.to_numpy()).astype(np.int64),
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")
    agg = grouped_aggregate(
        hashed, "h", {"rep_doc_id": ("doc_id", "min"), "n_copies": ("doc_id", "size")}
    )
    return agg.drop_columns(["h"])


def doc_normalized_dedup_sql(sf_dir: str) -> str:
    return """
SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
ORDER BY rep_doc_id"""


def doc_crossdoc_ngrams(sf_dir: str, k: int = 3, top_n: int = 100) -> pd.DataFrame:
    """Cross-document repeated n-gram detector (the signal behind
    substring-level dedup, Lee et al. 2022, public arXiv:2107.06499):
    k-grams appearing in >= 2 DISTINCT documents, with document frequency
    and total occurrence count, top-N under the deterministic total order
    (df desc, tf desc, ngram asc).

    Dataflow: per-batch arrow split -> flat token stream with doc
    boundaries -> vectorized k-gram join (pandas str.cat over shifted
    views; a k-gram never crosses a doc boundary) -> per-(ngram, doc) tf
    partial (docs never span batches, so partials are globally unique) ->
    ONE grouped_aggregate exchange keyed by ngram -> df>=2 filter +
    per-batch partial top-N -> driver merges N-row partials.

    At 100 TB: ship a 64-bit ngram hash through the exchange and fetch the
    winning strings by hash afterward; here the string rides (bounded by
    ~k x corpus tokens) because the oracle compares the strings."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy()
        docrep = np.repeat(ids, lens)
        if len(flat) < k:
            return pd.DataFrame(
                {
                    "ngram": pd.Series(dtype="object"),
                    "doc_id": pd.Series(dtype="int64"),
                    "tf": pd.Series(dtype="int64"),
                }
            )
        valid = docrep[: len(flat) - k + 1] == docrep[k - 1 :]
        parts = [pd.Series(flat[i : len(flat) - k + 1 + i][valid]) for i in range(k)]
        ng = parts[0].str.cat(parts[1:], sep=" ")
        g = pd.DataFrame({"ngram": ng, "doc_id": docrep[: len(flat) - k + 1][valid]})
        out = g.groupby(["ngram", "doc_id"], as_index=False).size()
        return out.rename(columns={"size": "tf"})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "ngram",
        {"df": ("doc_id", "size"), "tf": ("tf", "sum")},
    )

    def topn(batch: pa.Table) -> pd.DataFrame:
        d = batch.to_pandas()
        d = d[d["df"] >= 2]
        d = d.sort_values(
            ["df", "tf", "ngram"], ascending=[False, False, True], kind="mergesort"
        )
        return d.head(top_n)

    parts = agg.map_batches(topn, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["df", "tf", "ngram"], ascending=[False, False, True], kind="mergesort"
    ).head(top_n)
    parts["df"] = parts["df"].astype(np.int64)
    parts["tf"] = parts["tf"].astype(np.int64)
    return parts.reset_index(drop=True)


def doc_crossdoc_ngrams_sql(sf_dir: str, k: int = 3, top_n: int = 100) -> str:
    assert k == 3, "oracle is written for trigrams"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
)
SELECT ngram, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS tf
FROM pos
GROUP BY ngram HAVING count(DISTINCT doc_id) >= 2
ORDER BY df DESC, tf DESC, ngram
LIMIT {top_n}"""


def _empty_pairs_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "n_inter": pd.Series(dtype="int64"),
            "n_union": pd.Series(dtype="int64"),
        }
    )


def _pairwise_set_intersections(ta: np.ndarray, tb: np.ndarray) -> np.ndarray:
    """Exact |a ∩ b| per pair of SORTED-UNIQUE int64 hash-set arrays
    (np.unique output — intersect1d's assume_unique fast path)."""
    return np.fromiter(
        (np.intersect1d(a, b, assume_unique=True).size for a, b in zip(ta, tb)),
        dtype=np.int64,
        count=len(ta),
    )


def lsh_verified_pairs(
    sf_dir: str,
    threshold: float = 0.82,
    num_perm: int = 64,
    num_bands: int = 32,
    shingle_k: int = 1,
) -> ray.data.Dataset:
    """Scale-safe near-dup pairs: MinHash band blocking with a PAYLOAD-FREE
    band exchange, candidate-pair dedup, then an exact hash-set-Jaccard
    verify that fetches each candidate doc's token set by doc_id. Nothing
    corpus-sized ever reaches the driver, and no per-doc payload is ever
    multiplied by num_bands (the round-2 flaw: first raw text, then the
    token-hash sets rode the band explode x32).

    Plan (4 hash exchanges; only the last two carry tok-set payload, each
    at most ~1x the corpus's distinct-token-hash mass):

        read -> Signer actor pool: per doc, token-level MinHash signature
             -> explode to (band, key, doc_id): 20 bytes/row, x num_bands
        groupby(band, key)    -> CANDIDATE pairs per bucket (doc_a < doc_b,
                                 no payload; 16 bytes/pair-occurrence)
        groupby(doc_a, doc_b) -> dedup candidates found in multiple bands,
                                 so each unique pair verifies exactly once
        groupby(hash(doc_a))  -> join pass 1: ship every doc's DISTINCT
                                 TOKEN-HASH SET once (int64 per distinct
                                 token, np.unique'd), attach toks_a
        groupby(hash(doc_b))  -> join pass 2: attach toks_b, per-pair exact
                                 set intersection -> n_inter/n_union — the
                                 SAME integers raw-text token-set Jaccard
                                 (and the DuckDB list_intersect oracle)
                                 computes, because set Jaccard is invariant
                                 under the injective-in-practice 64-bit
                                 token hash — filter >= threshold

    Recall: a qualifying pair is missed only if it collides in NO band;
    at threshold 0.82 with 32 bands x 2 rows that probability is
    (1 - 0.82^2)^32 ~ 3e-16 per pair, and tests/test_training_data.py pins
    recall == 1.0 against the all-pairs result on the sf0.01 corpus.
    Shingle_k=1 so MinHash estimates the SAME token-set similarity the
    exact verify (and the DuckDB oracle) computes.

    Partitioning assumption: candidate volume per bucket is O(bucket^2),
    and a candidate pair is re-emitted once per shared band that lands in a
    distinct partition (<= num_bands), so on CLIQUE-HEAVY corpora the
    16-byte candidate exchange is the dominant term — but so is the OUTPUT
    (all qualifying pairs is itself quadratic in clique size; no all-pairs
    operator beats its own output). EXACT duplicates are removed upstream
    (doc_curation_funnel runs exact dedup first), which keeps
    identical-payload mega-buckets out of the band space; `num_bands` is
    the remaining knob (fewer bands = fewer candidate copies, lower
    recall). Exchange accounting at sf0.1 (BASELINE.md): the round-2
    layout shipped 34.6x the corpus text bytes; this layout ships 0.64 KB/doc
    of band keys + 16 B/candidate-occurrence + ~2x the distinct-token-hash
    mass.

    The verified-pair table is CHECKPOINTED to parquet per process (same
    discipline as dup_cluster_labels): doc_jaccard_pairs, the CC labels
    and the minhash query share one LSH+verify run."""
    import os as _os
    import shutil as _shutil

    from quant_feature_pipeline_ray.ckpt import ckpt_path

    ck = ckpt_path(
        "graft_lsh_pairs",
        f"pid{_os.getpid()}_{_corpus_ck_key(sf_dir)}_t{threshold}"
        f"_p{num_perm}_b{num_bands}_k{shingle_k}",
    )
    if _os.path.exists(ck + "._SUCCESS"):
        return ray.data.read_parquet(ck)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy()
            texts = batch["text"].to_pylist()
            sigs = self.mh.signatures_batch(texts, k=shingle_k)
            keys = self.mh.band_keys_batch(sigs, num_bands=num_bands)
            n = len(ids)
            b = num_bands
            # PAYLOAD-FREE explode: 20 bytes/row — no text, no token sets
            return pa.table(
                {
                    "band": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
                    "key": pa.array(keys.reshape(-1).view(np.int64)),
                    "doc_id": pa.array(np.repeat(ids, b)),
                }
            )

    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    n_parts = max(8, cluster_cpus())
    exploded = docs.map_batches(Signer, batch_format="pyarrow", concurrency=2)

    # hash the (band, key) space into ~#cpu partitions: ONE map_groups call
    # per partition (thousands of tiny LSH buckets per call, handled in a
    # vectorized segment loop) instead of one Python call per bucket —
    # map_groups per-group overhead is ~10 ms, which dominates otherwise
    def add_gk(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy().view(np.uint64)
        band = b["band"].to_numpy().astype(np.uint64)
        gk = ((key * np.uint64(0x9E3779B97F4A7C15) + band) % np.uint64(n_parts)).astype(
            np.int32
        )
        return b.append_column("gk", pa.array(gk))

    def _i64() -> pd.Series:
        return pd.Series(dtype="int64")

    def candidates_partition(df: pd.DataFrame) -> pd.DataFrame:
        """All doc-id pairs sharing an LSH bucket in this partition
        (doc_a < doc_b), locally deduped."""
        df = df.sort_values(["band", "key", "doc_id"], kind="mergesort", ignore_index=True)
        band = df["band"].to_numpy()
        key = df["key"].to_numpy()
        ids = df["doc_id"].to_numpy()
        n = len(df)
        gb = np.empty(n, dtype=bool)
        gb[0] = True
        gb[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(gb)
        ends = np.append(starts[1:], n)
        aa: list[np.ndarray] = []
        bb: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            aa.append(ids[s + ai])
            bb.append(ids[s + bi])
        if not aa:
            return pd.DataFrame({"doc_a": _i64(), "doc_b": _i64()})
        out = pd.DataFrame({"doc_a": np.concatenate(aa), "doc_b": np.concatenate(bb)})
        return out.drop_duplicates(ignore_index=True)

    cand = (
        exploded.map_batches(add_gk, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(candidates_partition, batch_format="pandas")
    )

    # global candidate dedup (a pair collides in every shared band) BEFORE
    # the verify joins, so each unique pair pays the tok-set fetch once
    def add_pk(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.uint64)
        c = b["doc_b"].to_numpy().astype(np.uint64)
        pk = ((a * np.uint64(0x9E3779B97F4A7C15) ^ c) % np.uint64(n_parts)).astype(np.int32)
        return b.append_column("pk", pa.array(pk))

    cand = (
        cand.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda df: df.drop_duplicates(["doc_a", "doc_b"], ignore_index=True).drop(
                columns=["pk"]
            ),
            batch_format="pandas",
        )
    )

    # --- exact verify: two doc_id-keyed join passes; each ships the
    # corpus's distinct-token-hash sets ONCE (never x num_bands)
    from quant_feature_pipeline_ray.functions.dedupfns import _token_hashes

    _LIST_I64 = pa.list_(pa.int64())

    def toks_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        toks = [
            np.unique(_token_hashes(t.split(" "))).view(np.int64)
            for t in batch["text"].to_pylist()
        ]
        jk = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        cols = {
            "jk": pa.array(jk.astype(np.int32)),
            "role": pa.array(np.zeros(len(ids), np.int8)),
            "kid": pa.array(ids.astype(np.int64)),
            "other": pa.nulls(len(ids), pa.int64()),
            "toks": pa.array(toks, type=_LIST_I64),
            "toks_a": pa.nulls(len(ids), _LIST_I64),
        }
        return pa.table(cols)

    def pair_side(batch: pa.Table, *, kid_col: str, other_col: str, has_toks_a: bool) -> pa.Table:
        kid = batch[kid_col].to_numpy().astype(np.int64)
        jk = (kid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        n = len(kid)
        return pa.table(
            {
                "jk": pa.array(jk.astype(np.int32)),
                "role": pa.array(np.ones(n, np.int8)),
                "kid": pa.array(kid),
                "other": batch[other_col].cast(pa.int64()),
                "toks": pa.nulls(n, _LIST_I64),
                "toks_a": batch["toks_a"].cast(_LIST_I64) if has_toks_a else pa.nulls(n, _LIST_I64),
            }
        )

    def _lookup(toks_rows: pd.DataFrame, kids: np.ndarray) -> np.ndarray:
        tk = toks_rows["kid"].to_numpy()
        order = np.argsort(tk, kind="stable")
        tks = tk[order]
        tv = toks_rows["toks"].to_numpy()[order]
        idx = np.searchsorted(tks, kids)
        if idx.size and ((idx >= len(tks)).any() or not (tks[np.minimum(idx, len(tks) - 1)] == kids).all()):
            raise ValueError("lsh verify join: candidate doc_id missing from toks partition")
        return tv[idx]

    def attach_a(df: pd.DataFrame) -> pa.Table:
        # returns ARROW (not pandas) so toks_a stays a plain list<int64>
        # block — a pandas object column of ndarrays would round-trip into
        # the tensor-extension struct type, which can't cast back to list
        p = df[df["role"].to_numpy() == 1]
        if p.empty:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "toks_a": pa.array([], _LIST_I64),
                }
            )
        ka = p["kid"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(ka),
                # "other" carries nulls on the toks side, so pandas floats
                # the whole column — restore exact int64 for the pair rows
                "doc_b": pa.array(p["other"].to_numpy().astype(np.int64)),
                "toks_a": pa.array(
                    list(_lookup(df[df["role"].to_numpy() == 0], ka)), type=_LIST_I64
                ),
            }
        )

    def attach_b_verify(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["role"].to_numpy() == 1]
        if p.empty:
            return _empty_pairs_frame()
        kb = p["kid"].to_numpy()
        ta = p["toks_a"].to_numpy()
        tb = _lookup(df[df["role"].to_numpy() == 0], kb)
        inter = _pairwise_set_intersections(ta, tb)
        na = np.fromiter((len(a) for a in ta), np.int64, count=len(ta))
        nb = np.fromiter((len(x) for x in tb), np.int64, count=len(tb))
        union = na + nb - inter
        # same float path as the all-pairs verify (and the recall oracle):
        # jac = inter/union in float64, >= threshold; union==0 (two empty
        # token sets) counts as identical
        with np.errstate(invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": p["other"].to_numpy()[keep].astype(np.int64),
                "doc_b": kb[keep].astype(np.int64),
                "n_inter": inter[keep],
                "n_union": union[keep],
            }
        )

    pass1 = (
        docs.map_batches(toks_side, batch_format="pyarrow")
        .union(
            cand.map_batches(
                lambda b: pair_side(b, kid_col="doc_a", other_col="doc_b", has_toks_a=False),
                batch_format="pyarrow",
            )
        )
        .groupby("jk")
        .map_groups(attach_a, batch_format="pandas")
    )

    def pass1_to_pairside(b: pa.Table) -> pa.Table:
        return pair_side(b, kid_col="doc_b", other_col="doc_a", has_toks_a=True)

    verified = (
        docs.map_batches(toks_side, batch_format="pyarrow")
        .union(pass1.map_batches(pass1_to_pairside, batch_format="pyarrow"))
        .groupby("jk")
        .map_groups(attach_b_verify, batch_format="pandas")
    )

    def add_jac(df: pd.DataFrame) -> pd.DataFrame:
        df["jaccard"] = df["n_inter"] / df["n_union"]
        return df

    pairs = verified.map_batches(add_jac, batch_format="pandas")
    _shutil.rmtree(ck, ignore_errors=True)
    pairs.write_parquet(ck)
    wrote = _os.path.isdir(ck) and any(n.endswith(".parquet") for n in _os.listdir(ck))
    if not wrote:  # zero verified pairs: nothing to checkpoint
        return pairs
    open(ck + "._SUCCESS", "w").close()
    return ray.data.read_parquet(ck)


def doc_jaccard_pairs(sf_dir: str, threshold: float = 0.82) -> pd.DataFrame:
    """Near-dup pairs by exact token-SET Jaccard >= threshold — the
    LSH-blocked scale path end-to-end (lsh_verified_pairs); the driver only
    ever sees the final qualifying pairs."""
    df = lsh_verified_pairs(sf_dir, threshold=threshold).to_pandas()
    if df.empty:
        df = _empty_pairs_frame()
        df["jaccard"] = pd.Series(dtype="float64")
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
    """MinHash+LSH near-dup: signature per doc → explode (band, key, doc,
    text) → groupby band bucket → IN-BAND exact-Jaccard verify → distributed
    pair dedup. Same dataflow as lsh_verified_pairs (the scale path — no
    driver-side text residency, no per-pair Python loop); narrower banding
    (16 bands x 4 rows) than the recall-pinned doc_jaccard_pairs entry, so
    this one is honestly probabilistic → rows-only correctness + pytest."""
    df = lsh_verified_pairs(
        sf_dir, threshold=threshold, num_perm=num_perm, num_bands=num_bands
    ).to_pandas()
    if df.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    return df[["doc_a", "doc_b", "jaccard"]].sort_values(
        ["doc_a", "doc_b"], ignore_index=True
    )


def doc_edit_pairs(sf_dir: str, threshold: float = 0.82) -> pd.DataFrame:
    """Edit-distance verify for near-dup candidate pairs — the character-
    level tier below token-set Jaccard (a pair with identical token SETS
    but shuffled order scores Jaccard 1.0; edit distance still separates
    them). Candidates are the LSH-blocked Jaccard-verified pairs
    (lsh_verified_pairs — the same candidate set doc_jaccard_pairs emits,
    so the DuckDB oracle can reproduce the candidate set exactly), and the
    verify is exact unit-cost Levenshtein (identical semantics to DuckDB's
    levenshtein()).

    Scale shape: two distributed hash JOINS (Ray Data's native join
    operator) attach each side's text to its pairs — each doc's text ships
    once per pass, never multiplied by the number of bands or pairs — and
    the per-batch verify runs the pairs-vectorized DP kernel
    (functions/editdist.py: O(P·La·Lb) cells at numpy throughput, no
    Python inner loop). Emits edit_dist + edit_sim = 1 − d/max(len) per
    qualifying pair (edit_sim of two empty texts = 1.0).

    reference parity: the reference dedups exact (conv_id, turn_idx) keys
    only (step2 dedup); character-level near-dup verify is part of the
    added large-scale-curation surface (SURVEY.md §2.7)."""
    pairs = lsh_verified_pairs(sf_dir, threshold=threshold).drop_columns(
        ["n_inter", "n_union", "jaccard"]
    )
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    n_parts = max(8, cluster_cpus())
    withA = pairs.join(
        docs, join_type="inner", num_partitions=n_parts, on=("doc_a",), right_on=("doc_id",)
    ).rename_columns({"text": "text_a"})
    withB = withA.join(
        docs, join_type="inner", num_partitions=n_parts, on=("doc_b",), right_on=("doc_id",)
    ).rename_columns({"text": "text_b"})

    def verify(batch: pa.Table) -> pd.DataFrame:
        from quant_feature_pipeline_ray.functions.editdist import levenshtein_batch

        a = batch["text_a"].to_pylist()
        b = batch["text_b"].to_pylist()
        d = levenshtein_batch(a, b)
        la = np.fromiter((len(s) for s in a), np.int64, count=len(a))
        lb = np.fromiter((len(s) for s in b), np.int64, count=len(b))
        mx = np.maximum(la, lb)
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = np.where(mx > 0, 1.0 - d / mx, 1.0)
        return pd.DataFrame(
            {
                "doc_a": batch["doc_a"].to_numpy(),
                "doc_b": batch["doc_b"].to_numpy(),
                "edit_dist": d,
                "edit_sim": sim,
            }
        )

    out = withB.map_batches(verify, batch_format="pyarrow", batch_size=1024).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "edit_dist": pd.Series(dtype="int64"),
                "edit_sim": pd.Series(dtype="float64"),
            }
        )
    out["doc_a"] = out["doc_a"].astype(np.int64)
    out["doc_b"] = out["doc_b"].astype(np.int64)
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True)


def doc_edit_pairs_sql(sf_dir: str, threshold: float = 0.82) -> str:
    # candidate set == doc_jaccard_pairs_sql's, then exact levenshtein verify
    return f"""
WITH s AS (SELECT doc_id, text, list_distinct(string_split(text, ' ')) AS toks FROM documents),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {threshold}
)
SELECT doc_a, doc_b,
       CAST(levenshtein(ta, tb) AS BIGINT) AS edit_dist,
       CASE WHEN greatest(length(ta), length(tb)) > 0
            THEN 1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
                 / CAST(greatest(length(ta), length(tb)) AS DOUBLE)
            ELSE 1.0 END AS edit_sim
FROM cand ORDER BY doc_a, doc_b"""


def doc_rrf_fusion(
    sf_dir: str, depth: int = 50, k: int = 20, rrf_k: int = 60
) -> pd.DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical BM25 ranking
    and the dense cosine ranking (query vector = embedding 0, the aligned
    doc_id/vec_id key space).

    rrf(doc) = Σ_lists 1/(rrf_k + rank_list(doc)) over the lists containing
    the doc in their top-`depth` (absent list contributes 0.0) — Cormack &
    Clarke SIGIR'09. Both input rankings are already engine-independent
    (round-6 score ties broken by id), and every rrf term is 1/(int + int),
    so the fused score is bitwise reproducible in SQL.

    Scale shape: both constituent retrievals are the existing distributed
    operators (BM25: two O(1)-scalar passes + per-batch partial top-k;
    dense: broadcast query matmul + partial top-k); the fusion itself
    touches 2·depth rows on the driver."""
    lex = doc_bm25_topk(sf_dir, k=depth)[["doc_id", "rank"]].rename(
        columns={"rank": "rank_lex"}
    )
    dense = emb_ann_topk(sf_dir, n_queries=1, k=depth)[["vec_id", "rank"]].rename(
        columns={"vec_id": "doc_id", "rank": "rank_dense"}
    )
    m = lex.merge(dense, on="doc_id", how="outer")
    rl = m["rank_lex"].to_numpy(dtype=np.float64, na_value=np.nan)
    rd = m["rank_dense"].to_numpy(dtype=np.float64, na_value=np.nan)
    score = np.where(np.isnan(rl), 0.0, 1.0 / (rrf_k + rl)) + np.where(
        np.isnan(rd), 0.0, 1.0 / (rrf_k + rd)
    )
    m["rrf_score"] = score
    m = m.sort_values(["rrf_score", "doc_id"], ascending=[False, True], ignore_index=True).head(k)
    out = pd.DataFrame(
        {
            "doc_id": m["doc_id"].astype(np.int64),
            "rrf_rank": np.arange(1, len(m) + 1, dtype=np.int64),
            "rrf_score": m["rrf_score"],
        }
    )
    return out


def doc_rrf_fusion_sql(sf_dir: str, depth: int = 50, k: int = 20, rrf_k: int = 60) -> str:
    lex = doc_bm25_topk_sql(sf_dir, k=depth)
    dense = emb_ann_topk_sql(sf_dir, n_queries=1, k=depth)
    return f"""
WITH lex AS ({lex}),
dense AS ({dense}),
fused AS (
  SELECT COALESCE(lex.doc_id, dense.vec_id) AS doc_id,
         COALESCE(1.0 / ({rrf_k} + lex.rank), 0.0)
           + COALESCE(1.0 / ({rrf_k} + dense.rank), 0.0) AS rrf_score
  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.vec_id
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rrf_rank,
       rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT {k}"""


def doc_bloom_dedup(
    sf_dir: str, base_rate: float = 0.7, bits_log2: int = 22, n_hashes: int = 4
) -> pd.DataFrame:
    """Cross-corpus dedup with a broadcast Bloom prefilter: which INCOMING
    documents are genuinely new relative to an existing BASE corpus?

    The classic new-crawl-vs-existing-training-set filter. The corpus is
    split deterministically (md5(doc_id) uniform < base_rate → base; the
    engine and the DuckDB oracle compute the identical bytes, same idiom as
    doc_weighted_sample).

    Dataflow:
      1. BUILD — one pass over base: per-batch Bloom partial (content_hash
         → n_hashes splitmix-derived bit positions in a 2^bits_log2-bit
         array), partials OR-reduced on the driver (m/8 bytes each — 512 KiB
         at the default; at 100 TB make m ∝ n and tree-reduce the OR), then
         ray.put-broadcast ONCE.
      2. PROBE — one pass over incoming: rows the filter rejects are
         DEFINITELY new (Bloom has no false negatives) and never enter any
         exchange; only Bloom-POSITIVE rows (true dups + the ~(1-e^{-kn/m})^k
         false-positive sliver) become candidates.
      3. EXACT VERIFY — candidates and base content-hashes meet in ONE
         hash-partitioned exchange (16 bytes/row, text never moves); a
         vectorized per-partition anti-join keeps candidates whose hash has
         no base occurrence. Correctness is therefore INDEPENDENT of the
         Bloom parameters — the filter only prunes exchange volume.

    Returns the new incoming doc_ids, sorted. Oracle: exact NOT IN
    anti-join on raw text (content-hash equality == text equality under the
    collision-negligible SipHash assumption, same policy as
    doc_exact_dedup)."""
    import hashlib

    from quant_feature_pipeline_ray.hashing import content_hash
    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    m_bits = 1 << bits_log2
    n_words = m_bits >> 6
    cut = np.uint64(int(base_rate * 2**32))
    C = np.uint64(0x9E3779B97F4A7C15)

    def _positions(h: np.ndarray, j: int) -> np.ndarray:
        # splitmix64 finisher over (h + j·C): independent-enough position
        # streams from one 64-bit content hash (Kirsch–Mitzenmacher style)
        x = h + np.uint64(j) * C
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return (x & np.uint64(m_bits - 1)).astype(np.int64)

    def tag(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        u32 = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) for d in ids),
            np.uint64,
            count=len(ids),
        )
        return pd.DataFrame(
            {
                "doc_id": ids.astype(np.int64),
                "h": content_hash(batch["text"].to_numpy(zero_copy_only=False)).astype(
                    np.int64
                ),
                "is_base": (u32 < cut).astype(np.int8),
            }
        )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tagged = docs.map_batches(tag, batch_format="pyarrow").materialize()

    def bloom_partial(batch: pa.Table) -> pd.DataFrame:
        h = batch["h"].to_numpy().view(np.uint64)[batch["is_base"].to_numpy() == 1]
        words = np.zeros(n_words, dtype=np.uint64)
        for j in range(n_hashes):
            pos = _positions(h, j)
            np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return pd.DataFrame({"bits": [words.tobytes()]})

    parts = tagged.map_batches(bloom_partial, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(n_words, dtype=np.uint64)
    for b in parts["bits"]:
        bloom |= np.frombuffer(b, dtype=np.uint64)
    bref = ray.put(bloom)

    def probe(batch: pa.Table) -> pd.DataFrame:
        inc = batch.filter(pa.compute.equal(batch["is_base"], 0))
        h = inc["h"].to_numpy().view(np.uint64)
        bl = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        present = np.ones(len(h), dtype=bool)
        for j in range(n_hashes):
            pos = _positions(h, j)
            present &= (bl[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1) != 0
        return pd.DataFrame(
            {
                "doc_id": inc["doc_id"].to_numpy(),
                "h": inc["h"].to_numpy(),
                "candidate": present.astype(np.int8),
            }
        )

    probed = tagged.map_batches(probe, batch_format="pyarrow").materialize()
    new_direct = probed.filter(
        expr="candidate == 0"
    )  # Bloom-negative: definitely new, no exchange

    # exact verify exchange: candidates (role 1) + base hashes (role 0)
    n_parts = max(8, cluster_cpus())

    def cand_side(batch: pa.Table) -> pd.DataFrame:
        t = batch.filter(pa.compute.equal(batch["candidate"], 1))
        return pd.DataFrame(
            {
                "h": t["h"].to_numpy(),
                "doc_id": t["doc_id"].to_numpy(),
                "role": np.ones(len(t), dtype=np.int8),
            }
        )

    def base_side(batch: pa.Table) -> pd.DataFrame:
        t = batch.filter(pa.compute.equal(batch["is_base"], 1))
        h = np.unique(t["h"].to_numpy())
        return pd.DataFrame(
            {"h": h, "doc_id": np.zeros(len(h), np.int64), "role": np.zeros(len(h), np.int8)}
        )

    union = probed.map_batches(cand_side, batch_format="pyarrow").union(
        tagged.map_batches(base_side, batch_format="pyarrow")
    )

    def add_gk(b: pa.Table) -> pa.Table:
        gk = (b["h"].to_numpy().view(np.uint64) * C % np.uint64(n_parts)).astype(np.int32)
        return b.append_column("gk", pa.array(gk))

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        base_h = np.unique(df.loc[df["role"].to_numpy() == 0, "h"].to_numpy())
        cand = df[df["role"].to_numpy() == 1]
        keep = ~np.isin(cand["h"].to_numpy(), base_h, assume_unique=False)
        return pd.DataFrame({"doc_id": cand["doc_id"].to_numpy()[keep]})

    new_verified = (
        union.map_batches(add_gk, batch_format="pyarrow").groupby("gk").map_groups(anti)
    )

    ids = np.concatenate(
        [
            new_direct.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy(),
            new_verified.to_pandas()["doc_id"].to_numpy()
            if new_verified.count() > 0
            else np.zeros(0, np.int64),
        ]
    )
    return pd.DataFrame({"doc_id": np.sort(ids.astype(np.int64))})


def doc_bloom_dedup_sql(sf_dir: str, base_rate: float = 0.7) -> str:
    cut = int(base_rate * 2**32)
    return f"""
WITH u AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS u32
  FROM documents
),
base AS (SELECT text FROM u WHERE u32 < {cut}),
inc  AS (SELECT doc_id, text FROM u WHERE u32 >= {cut})
SELECT doc_id FROM inc
WHERE text NOT IN (SELECT text FROM base)
ORDER BY doc_id"""


_SIMHASH_CTE = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tc AS (
  SELECT doc_id, md5_number_lower(token) AS h, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, token
), bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> CAST(b.bit AS UBIGINT)) & 1 = 1 THEN c ELSE -c END) AS score
  FROM tc CROSS JOIN range(0, 64) b(bit)
  GROUP BY doc_id, b.bit
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN score > 0
                  THEN CAST(1 AS HUGEINT) << CAST(bit AS INTEGER)
                  ELSE 0 END) AS u
  FROM bits GROUP BY doc_id
)"""


def doc_simhash_sql(sf_dir: str) -> str:
    """Exact SQL mirror of the md5-keyed SimHash (same per-token
    md5_number_lower hash, same signed multiset votes per bit, same
    score>0 threshold; HUGEINT bit assembly → two's-complement BIGINT)
    plus the doc_fingerprint FNV-1a mirror for the fingerprint column."""
    return (
        "WITH "
        + _SIMHASH_CTE
        + """,
d AS (SELECT doc_id, text || ' ' AS t FROM documents),
fp AS (
  SELECT doc_id, list_reduce(
    list_prepend(CAST(1469598103934665603 AS UBIGINT),
      list_transform(range(1, octet_length(encode(t)) + 1),
                     i -> CAST(unicode(t[i]) AS UBIGINT))),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                   % 18446744073709551616 AS UBIGINT)
  ) AS fp FROM d
)
SELECT sh.doc_id,
       CAST(CASE WHEN sh.u >= 9223372036854775808
                 THEN sh.u - 18446744073709551616
                 ELSE sh.u END AS BIGINT) AS simhash,
       CAST(CASE WHEN fp.fp >= 9223372036854775808
                 THEN CAST(fp.fp AS HUGEINT) - 18446744073709551616
                 ELSE CAST(fp.fp AS HUGEINT) END AS BIGINT) AS fingerprint
FROM sh JOIN fp USING (doc_id) ORDER BY sh.doc_id"""
    )


def doc_simhash_pairs_sql(sf_dir: str, max_hamming: int = 3) -> str:
    """Brute-force all-pairs mirror of the banded Hamming-ball join: the
    band blocking is LOSSLESS for hamming <= max_hamming (pigeonhole,
    n_bands > max_hamming), so the engine's blocked output must equal the
    full O(n²) popcount — affordable at oracle scale, never run at corpus
    scale."""
    return (
        "WITH "
        + _SIMHASH_CTE
        + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(CAST(a.u AS UBIGINT), CAST(b.u AS UBIGINT))) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.u AS UBIGINT), CAST(b.u AS UBIGINT))) <= {max_hamming}
ORDER BY doc_a, doc_b"""
    )


def doc_simhash(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash per doc (+ fingerprint); exact oracle via the
    md5-lower-64 token hash (doc_simhash_sql)."""
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


def emb_ann_filtered(
    sf_dir: str, n_queries: int = 10, k: int = 5, label: int = 1
) -> pd.DataFrame:
    """FILTERED vector search — top-k cosine restricted to candidates with
    a metadata predicate (label == `label`), the production vector-store
    shape ("nearest neighbours among docs tagged X").

    Scale pattern: the predicate is pushed into the parquet read (arrow
    row-group/row filter), so non-matching vectors never enter the object
    store; after that it is the broadcast-queries + per-batch matmul +
    per-batch partial top-k dataflow of emb_ann_topk."""
    import pyarrow.compute as pc

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb[emb["vec_id"] < n_queries]
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qids = qdf["vec_id"].to_numpy()
    qref = ray.put((qids, qmat, qnorm))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pc.field("label") == label,  # predicate pushdown at the read
    )

    class Scorer:
        def __init__(self, qref):
            self.qids, self.qmat, self.qnorm = (
                ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
            )

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
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
            out = out.sort_values(
                ["query_id", "sim", "vec_id"], ascending=[True, False, True]
            )
            return out.groupby("query_id", as_index=False).head(k)

    partials = ds.map_batches(
        Scorer, fn_constructor_args=(qref,), batch_format="pyarrow", concurrency=2
    )
    allp = partials.to_pandas()
    allp = allp.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    top = allp.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    for c in ("query_id", "vec_id", "rank"):
        top[c] = top[c].astype(np.int64)
    return top


def emb_ann_filtered_sql(sf_dir: str, n_queries: int = 10, k: int = 5, label: int = 1) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {n_queries}),
sims AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id <> e.vec_id AND e.label = {label}
)
SELECT query_id, vec_id, sim,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
FROM sims
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= {k}
ORDER BY query_id, rank"""


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


def emb_dedup_threshold_sweep(
    sf_dir: str, thresholds: tuple = (0.3, 0.35, 0.4, 0.45, 0.5)
) -> ray.data.Dataset:
    """Near-dup THRESHOLD SWEEP — the dedup-rate-vs-τ curve a curation run
    publishes before committing to a cosine cutoff (SemDeDup-style dedup is
    exquisitely threshold-sensitive; picking τ without this table is
    guesswork). One pass over the block-row similarity sweep produces, for
    every candidate τ: the qualifying pair count, the number of vectors
    touched by ≥1 qualifying pair, and the affected-corpus fraction.

    Scale pattern: same block-row broadcast matmul as emb_cosine_dups (the
    exact/verify baseline — the IVF-bucketed variant is the 100-TB path),
    but the exchange carries only per-batch COMBINED rows: |τ| pair-count
    partials + one (vec, max_sim) row per vector (max over partners is
    threshold-free, so ALL τ are answered in one sweep). Exact oracle via
    DuckDB list_cosine_similarity at round-6 (the emb_cosine_dups
    discipline)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy()
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    n_total = len(vids)
    ref = ray.put((vids, mat, norms))
    taus = np.asarray(thresholds, dtype=np.float64)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def block(batch: pa.Table) -> pd.DataFrame:
        avids, amat, anorms = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        bvids = batch["vec_id"].to_numpy()
        bnorms = np.sqrt(np.einsum("ij,ij->i", m, m))
        sims = np.round((m @ amat.T) / (bnorms[:, None] * anorms[None, :]), 6)
        not_self = bvids[:, None] != avids[None, :]
        # per-vec max over partners (threshold-free) — one row per vector
        max_sim = np.where(not_self, sims, -np.inf).max(axis=1)
        # pair-count partials per τ (vec_a < vec_b halves the matrix)
        lower = bvids[:, None] < avids[None, :]
        counts = np.asarray(
            [(lower & (sims >= t)).sum() for t in taus], dtype=np.int64
        )
        return pd.DataFrame(
            {
                "kind": np.concatenate(
                    [np.zeros(len(taus), dtype=np.int64), np.ones(len(bvids), dtype=np.int64)]
                ),
                "key": np.concatenate([np.arange(len(taus), dtype=np.int64), bvids]),
                "val": np.concatenate([counts.astype(np.float64), max_sim]),
            }
        )

    partials = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    # driver-side finish over |τ| + N tiny rows (N counts once per corpus,
    # not per pair — bounded like emb_ann_topk's merge)
    pair_counts = (
        partials[partials["kind"] == 0].groupby("key")["val"].sum().astype(np.int64)
    )
    vec_max = partials[partials["kind"] == 1].groupby("key")["val"].max()
    rows = []
    for i, t in enumerate(taus):
        n_vecs = int((vec_max >= t).sum())
        rows.append(
            {
                "threshold": float(t),
                "n_pairs": int(pair_counts.get(i, 0)),
                "n_vecs_with_dup": n_vecs,
                "vec_frac": n_vecs / n_total,
            }
        )
    out = pd.DataFrame(rows).astype(
        {"threshold": np.float64, "n_pairs": np.int64, "n_vecs_with_dup": np.int64}
    )
    return out.sort_values("threshold", ignore_index=True)


def emb_dedup_threshold_sweep_sql(
    sf_dir: str, thresholds: tuple = (0.3, 0.35, 0.4, 0.45, 0.5)
) -> str:
    vals = ", ".join(f"(CAST({t} AS DOUBLE))" for t in thresholds)
    return f"""
WITH sims AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
), t(threshold) AS (VALUES {vals}),
pairs AS (
  SELECT t.threshold, CAST(count(s.va) AS BIGINT) AS n_pairs
  FROM t LEFT JOIN sims s ON s.sim >= t.threshold
  GROUP BY t.threshold
), vecs AS (
  SELECT threshold, CAST(count(DISTINCT v) AS BIGINT) AS n_vecs
  FROM (
    SELECT t.threshold, u.v
    FROM t JOIN sims s ON s.sim >= t.threshold, UNNEST([s.va, s.vb]) AS u(v)
  ) GROUP BY threshold
)
SELECT p.threshold, p.n_pairs,
       COALESCE(v.n_vecs, CAST(0 AS BIGINT)) AS n_vecs_with_dup,
       COALESCE(v.n_vecs, CAST(0 AS BIGINT))
         / (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS vec_frac
FROM pairs p LEFT JOIN vecs v USING (threshold)
ORDER BY threshold"""


def emb_cosine_dups_sql(sf_dir: str, threshold: float = 0.4) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}
ORDER BY vec_a, vec_b"""


def _kmeans_centroids(
    sf_dir: str, n_clusters: int, kmeans_iters: int, sample_max: int
) -> np.ndarray:
    """Seeded spherical k-means over a BOUNDED deterministic sample — the
    only full-vector driver residency of the IVF family."""
    sample = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .limit(sample_max)
        .to_pandas()
    )
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    return _kmeans_core(smat, n_clusters, kmeans_iters)


def _kmeans_core(smat: np.ndarray, n_clusters: int, kmeans_iters: int) -> np.ndarray:
    """Numpy body of the seeded spherical k-means, shared by the engine
    (Ray-sampled input) and the oracle generator (pandas-read input) so
    both produce bitwise-identical centroids from the same sample bytes."""
    sunit = smat / np.maximum(np.sqrt(np.einsum("ij,ij->i", smat, smat))[:, None], 1e-12)
    rng = np.random.default_rng(7)
    cent = sunit[rng.choice(len(sunit), size=min(n_clusters, len(sunit)), replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(sunit @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sunit[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _scaled_n_clusters(
    sf_dir: str, n_clusters: int, vec_assign: int, max_cluster_rows: int
) -> int:
    """k ∝ corpus: enough clusters that the EXPECTED list length stays
    under max_cluster_rows even with multiple assignment (footer row count
    only — no data scan). Skewed assignments are additionally bounded by
    the in-group recursive split (_split_bounded)."""
    import os

    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    need = -(-n_rows * max(vec_assign, 1) // max_cluster_rows)  # ceil
    return max(n_clusters, int(need))


def _split_bounded(
    u: np.ndarray,
    ids: np.ndarray,
    max_rows: int,
    margin: float = 0.05,
    depth: int = 0,
) -> list[np.ndarray]:
    """Bound per-group pairwise (matmul) work: recursively split an
    oversized cluster with a deterministic 2-means spill split — vectors
    within `margin` cosine of the boundary join BOTH halves so
    near-boundary neighbours/pairs survive (the spill-tree recall lever;
    downstream pair-dedup / top-k merge already absorbs the duplicates).

    Seeds are the min-id vector and the vector least similar to it, so the
    split is reproducible. A group where the spill overlap is too large to
    shrink geometrically (a tight near-identical clique: every vector sits
    within `margin` of the boundary) falls back to a DISJOINT median split
    along the 2-means discriminant axis: cross-shard pairs inside such a
    clique are the documented loss — the pair set there is Θ(clique²)
    anyway, and exact-hash dedup owns the identical-payload case.

    With this in place no per-group matmul input grows linearly with the
    corpus: worst-case group size is max_rows (disjoint halving) and the
    recursion is depth-capped. Returns index arrays into u/ids."""
    n = len(ids)
    if n <= max_rows or depth >= 48:
        return [np.arange(n, dtype=np.int64)]
    c0 = u[np.argmin(ids)]
    c1 = u[int(np.argmin(u @ c0))]
    for _ in range(3):
        s0, s1 = u @ c0, u @ c1
        m0 = s0 >= s1
        if m0.all() or (~m0).all():
            break
        v0, v1 = u[m0].mean(axis=0), u[~m0].mean(axis=0)
        c0 = v0 / max(float(np.linalg.norm(v0)), 1e-12)
        c1 = v1 / max(float(np.linalg.norm(v1)), 1e-12)
    s0, s1 = u @ c0, u @ c1
    a = np.flatnonzero(s0 >= s1 - margin)
    b = np.flatnonzero(s1 > s0 - margin)
    if max(len(a), len(b)) > 0.8 * n:  # overlap too fat to shrink
        order = np.argsort(s0 - s1, kind="stable")  # deterministic (id-order ties)
        a, b = np.sort(order[: n // 2]), np.sort(order[n // 2 :])
    out: list[np.ndarray] = []
    for part in (a, b):
        for sub in _split_bounded(u[part], ids[part], max_rows, margin, depth + 1):
            out.append(part[sub])
    return out


def emb_cosine_dups_ivf(
    sf_dir: str,
    threshold: float = 0.4,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    vec_assign: int = 4,
    max_cluster_rows: int = 100_000,
) -> pd.DataFrame:
    """Cosine near-dup pairs, IVF-BUCKETED — the 100 TB path in front of
    the exact O(N^2) sweep (emb_cosine_dups, which stays as the
    oracle-checked verify/baseline):

      centroids (bounded-sample k-means, broadcast) → each vector joins
      its `vec_assign` nearest clusters → ONE shuffle by cluster id →
      per-cluster pairwise matmul emits pairs >= threshold → distributed
      pair dedup (hash-partitioned drop_duplicates).

    Approximate: a pair is found iff the two vectors share a cluster
    under multiple assignment. tests/test_training_data.py gates recall
    vs the exact sweep at sf0.01."""
    n_clusters = _scaled_n_clusters(sf_dir, n_clusters, vec_assign, max_cluster_rows)
    cent = _kmeans_centroids(sf_dir, n_clusters, kmeans_iters, sample_max)
    cent_ref = ray.put(cent)
    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    n_parts = max(8, cluster_cpus())
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class Assign:
        def __init__(self, ref):
            self.cent = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
            sims = u @ self.cent.T
            a = min(vec_assign, sims.shape[1])
            top = np.argpartition(-sims, a - 1, axis=1)[:, :a]
            embs = batch["embedding"].to_numpy(zero_copy_only=False)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(batch["vec_id"].to_numpy(), a),
                    "cluster": top.reshape(-1).astype(np.int32),
                    "embedding": [embs[i] for i in np.repeat(np.arange(len(embs)), a)],
                }
            )

    assigned = ds.map_batches(
        Assign, fn_constructor_args=(cent_ref,), batch_format="pyarrow", concurrency=2
    )

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )

    def pairs_in_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs()
        vids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(vids)
        vids = vids[order]
        m = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        frames = []
        # bounded pairwise work: recursive spill split of oversized lists
        for part in _split_bounded(u, vids, max_cluster_rows):
            if len(part) < 2:
                continue
            up, vp = u[part], vids[part]
            sims = np.round(up @ up.T, 6)
            ai, bi = np.nonzero(np.triu(sims >= threshold, k=1) & (vp[:, None] < vp[None, :]))
            frames.append(pd.DataFrame({"vec_a": vp[ai], "vec_b": vp[bi], "sim": sims[ai, bi]}))
        if not frames:
            return _empty_pairs()
        return pd.concat(frames, ignore_index=True)

    def add_pk(b: pa.Table) -> pa.Table:
        a = b["vec_a"].to_numpy().astype(np.uint64)
        c = b["vec_b"].to_numpy().astype(np.uint64)
        pk = ((a * np.uint64(0x9E3779B97F4A7C15) ^ c) % np.uint64(n_parts)).astype(np.int32)
        return b.append_column("pk", pa.array(pk))

    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["vec_a", "vec_b"], ignore_index=True).drop(columns=["pk"])

    out = (
        assigned.groupby("cluster")
        .map_groups(pairs_in_cluster, batch_format="pandas")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup_partition, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _empty_pairs()
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)


def emb_ann_ivf(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 6,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    vec_assign: int = 2,
) -> pd.DataFrame:
    """IVF-style ANN — the scale path beyond brute force, distributed
    end-to-end:

      build:  k-means over a BOUNDED deterministic sample (<= sample_max
              rows on the driver — at 100 TB the sample, not the corpus,
              is the only full-vector driver residency)
      lists:  broadcast centroids -> map_batches assigns every vector ->
              ONE shuffle by cluster id (the inverted lists)
      search: per-cluster map_groups scores its vectors against only the
              queries that probe that cluster (queries + probe sets are a
              broadcast) and emits k-row partials per (query, cluster)
      merge:  driver merges n_queries * nprobe * k partial rows — tiny.

    Approximate by design → no SQL oracle; tests/test_multimodal.py gates
    recall >= 0.9 vs emb_ann_topk."""
    cent = _kmeans_centroids(sf_dir, n_clusters, kmeans_iters, sample_max)

    # queries: parquet predicate pushdown — only n_queries rows read
    import pyarrow.compute as pc

    qtbl = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id") < n_queries,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    qids = qtbl["vec_id"].to_numpy()
    qmat = np.stack(qtbl["embedding"].to_numpy()).astype(np.float64)
    qunit = qmat / np.maximum(np.sqrt(np.einsum("ij,ij->i", qmat, qmat))[:, None], 1e-12)
    probe = np.argsort(-(qunit @ cent.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(qids), len(cent)), dtype=bool)
    probe_mask[np.repeat(np.arange(len(qids)), nprobe), probe.reshape(-1)] = True

    bcast = ray.put((cent, qids, qunit, probe_mask))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class AssignBatch:
        def __init__(self, ref):
            self.cent = (ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref)[0]

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
            sims = u @ self.cent.T
            # multiple assignment: each vector joins its `vec_assign`
            # nearest inverted lists (standard IVF recall lever; storage
            # cost x vec_assign, search cost unchanged per probe)
            a = min(vec_assign, sims.shape[1])
            top = np.argpartition(-sims, a - 1, axis=1)[:, :a]
            embs = batch["embedding"].to_numpy(zero_copy_only=False)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(batch["vec_id"].to_numpy(), a),
                    "cluster": top.reshape(-1).astype(np.int32),
                    "embedding": [embs[i] for i in np.repeat(np.arange(len(embs)), a)],
                }
            )

    assigned = ds.map_batches(
        AssignBatch, fn_constructor_args=(bcast,), batch_format="pyarrow", concurrency=2
    )

    def _empty_partial() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )

    def search_cluster(g: pd.DataFrame) -> pd.DataFrame:
        cent_, qids_, qunit_, pmask_ = ray.get(bcast) if isinstance(bcast, ray.ObjectRef) else bcast
        c = int(g["cluster"].iloc[0])
        qsel = np.flatnonzero(pmask_[:, c])
        if len(qsel) == 0 or len(g) == 0:
            return _empty_partial()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        vids = g["vec_id"].to_numpy().astype(np.int64)
        sims = np.round(u @ qunit_[qsel].T, 6)  # (n_vec, n_qsel)
        parts = []
        for col, qi in enumerate(qsel):
            qid = int(qids_[qi])
            mask = vids != qid
            s, v = sims[mask, col], vids[mask]
            order = np.lexsort((v, -s))[:k]
            parts.append(pd.DataFrame({"query_id": qid, "vec_id": v[order], "sim": s[order]}))
        return pd.concat(parts, ignore_index=True) if parts else _empty_partial()

    partials = assigned.groupby("cluster").map_groups(search_cluster, batch_format="pandas")
    allp = partials.to_pandas()  # <= n_queries * nprobe * k rows
    if allp.empty:
        return pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "vec_id": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64"), "rank": pd.Series(dtype="int64")}
        )
    allp = allp.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    # multiple assignment can surface the same (query, vec) from two lists
    allp = allp.drop_duplicates(["query_id", "vec_id"], ignore_index=True)
    top = allp.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype(np.int64)
    top["query_id"] = top["query_id"].astype(np.int64)
    top["vec_id"] = top["vec_id"].astype(np.int64)
    return top


def emb_recall_eval(
    sf_dir: str, n_queries: int = 10, k: int = 5
) -> pd.DataFrame:
    """ANN quality evaluation — recall@k of the two approximate retrieval
    paths (IVF inverted lists, binary-sign Hamming) against the exact
    brute-force cosine top-k, per query: the measurement a retrieval stack
    publishes BEFORE anyone trusts it at corpus scale (an unmeasured ANN
    index is a silent-recall-loss machine). Composes the three existing
    distributed retrieval operators; the eval join itself is driver-side
    over n_queries·k rows — cardinality-bounded by construction.

    Approximate methods have no SQL form → rows-only for the driver;
    tests/test_session7_ops.py gates mean IVF recall and checks the exact
    path's self-recall is 1.0."""
    exact = emb_ann_topk(sf_dir, n_queries, k)
    ivf = emb_ann_ivf(sf_dir, n_queries, k)
    ham = emb_hamming_topk(sf_dir, n_queries, k)
    # the composed production path: Hamming retrieves a 10k-wide SHORTLIST,
    # exact cosine reranks it — shortlist recall is the number that matters
    shortlist = emb_hamming_topk(sf_dir, n_queries, 10 * k)

    truth = exact.groupby("query_id")["vec_id"].agg(set)

    def recall_of(df: pd.DataFrame) -> pd.Series:
        got = df.groupby("query_id")["vec_id"].agg(set)
        return pd.Series(
            {q: len(got.get(q, set()) & t) / k for q, t in truth.items()}
        )

    r_ivf, r_ham, r_short = recall_of(ivf), recall_of(ham), recall_of(shortlist)
    out = pd.DataFrame(
        {
            "query_id": truth.index.to_numpy(dtype=np.int64),
            "recall_ivf": r_ivf.reindex(truth.index).to_numpy(),
            "recall_hamming": r_ham.reindex(truth.index).to_numpy(),
            "recall_hamming_shortlist": r_short.reindex(truth.index).to_numpy(),
        }
    ).sort_values("query_id", ignore_index=True)
    return out


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


def emb_matryoshka_eval(
    sf_dir: str, dims: tuple = (8, 16, 32, 64), n_queries: int = 10, k: int = 5
) -> pd.DataFrame:
    """Matryoshka truncation evaluation — recall@k of cosine retrieval on
    PREFIX-truncated embeddings vs the full-dimension exact top-k
    (Kusupati et al. 2022 arXiv:2205.13147: MRL-trained models pack the
    most informative coordinates first, so serving can slice d/8..d and
    trade recall for index size). This is the table that decides how many
    dims a 100-TB index actually stores. One block-row sweep answers every
    dim: each batch computes one matmul PER dim on sliced views of the
    same broadcast matrix (slices alias, no copies) and emits per-(dim,
    query) top-k partials; the driver merge sees |dims|·blocks·k·n_queries
    rows.

    Exact oracle: both sides use the round-6 + vec_id tie-break ranking
    discipline, so the truncated and full top-k SETS are deterministic and
    recall is an exact integer count / k (DuckDB: list_slice +
    list_cosine_similarity)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy()
    d_full = mat.shape[1]
    qmask = vids < n_queries
    qmat, qids = mat[qmask], vids[qmask]
    ref = ray.put((qids, qmat))
    all_dims = sorted(set(list(dims) + [d_full]))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def block(batch: pa.Table) -> pd.DataFrame:
        aqids, aqmat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        bvids = batch["vec_id"].to_numpy()
        frames = []
        for d in all_dims:
            md, qd = m[:, :d], aqmat[:, :d]
            mn = np.sqrt(np.einsum("ij,ij->i", md, md))
            qn = np.sqrt(np.einsum("ij,ij->i", qd, qd))
            sims = np.round((md @ qd.T) / (mn[:, None] * qn[None, :]), 6)
            nq = len(aqids)
            f = pd.DataFrame(
                {
                    "dim": np.full(nq * len(bvids), d, dtype=np.int64),
                    "query_id": np.repeat(aqids, len(bvids)),
                    "vec_id": np.tile(bvids, nq),
                    "sim": sims.T.reshape(-1),
                }
            )
            f = f[f["query_id"] != f["vec_id"]]
            f = f.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
            frames.append(f.groupby("query_id", as_index=False).head(k))
        return pd.concat(frames, ignore_index=True)

    allp = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    allp = allp.sort_values(
        ["dim", "query_id", "sim", "vec_id"], ascending=[True, True, False, True]
    )
    top = allp.groupby(["dim", "query_id"], as_index=False).head(k)
    truth = (
        top[top["dim"] == d_full].groupby("query_id")["vec_id"].agg(set)
    )
    rows = []
    for (d, qid), sub in top.groupby(["dim", "query_id"]):
        hit = len(set(sub["vec_id"]) & truth[qid])
        rows.append({"dim": int(d), "query_id": int(qid), "recall": hit / k})
    out = pd.DataFrame(rows).astype({"dim": np.int64, "query_id": np.int64})
    out = out[out["dim"].isin(list(dims))]
    return out.sort_values(["dim", "query_id"], ignore_index=True)


def emb_matryoshka_eval_sql(
    sf_dir: str, dims: tuple = (8, 16, 32, 64), n_queries: int = 10, k: int = 5
) -> str:
    vals = ", ".join(f"({d})" for d in dims)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {n_queries}),
dims(dim) AS (VALUES {vals}),
sims AS (
  SELECT d.dim, q.query_id, e.vec_id,
         round(list_cosine_similarity(list_slice(q.qe, 1, d.dim)::DOUBLE[],
                                      list_slice(e.embedding, 1, d.dim)::DOUBLE[]), 6) AS sim
  FROM dims d CROSS JOIN q CROSS JOIN embeddings e
  WHERE q.query_id <> e.vec_id
),
trunc AS (
  SELECT dim, query_id, vec_id FROM sims
  QUALIFY row_number() OVER (PARTITION BY dim, query_id ORDER BY sim DESC, vec_id) <= {k}
),
fsims AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS sim
  FROM q CROSS JOIN embeddings e WHERE q.query_id <> e.vec_id
),
ftop AS (
  SELECT query_id, vec_id FROM fsims
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= {k}
)
SELECT t.dim, t.query_id,
       count(f.vec_id) / {k} AS recall
FROM trunc t LEFT JOIN ftop f ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY t.dim, t.query_id
ORDER BY t.dim, t.query_id"""


# ----------------------------------------- binary-quantized (Hamming) ANN
def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array (numpy <2.0 has no
    bitwise_count) — constant per-element work, no unpackbits memory blowup."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _sign_codes(mat: np.ndarray) -> np.ndarray:
    """Pack sign bits (v > 0, strict — ties at 0.0 map to bit 0, same rule
    both engine- and SQL-side) of a (n, d≤64) float matrix into one uint64
    code per row."""
    d = mat.shape[1]
    if d > 64:
        raise ValueError(
            f"sign-quantized Hamming path packs into one 64-bit word; got d={d} "
            "— project down first (emb_jl_project) or extend to multi-word codes"
        )
    bits = (mat > 0).astype(np.uint64)
    return (bits << np.arange(d, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


def emb_hamming_topk(sf_dir: str, n_queries: int = 10, k: int = 5) -> pd.DataFrame:
    """Binary-sign-quantized nearest neighbours: quantize every embedding to
    its sign-bit code (1 bit/dim — 32x smaller than float32) and rank
    candidates by POPCNT Hamming distance to each query's code. This is the
    standard first-stage retrieval path at corpus scale (binary quantization
    + exact rerank on the shortlist; see e.g. Charikar STOC'02 simhash —
    Hamming distance on sign bits estimates angular distance): the whole
    100 TB index fits in 1/32 the memory and each distance is two CPU ops.
    `emb_ann_topk` (exact cosine) is the rerank/verify stage to compose
    downstream.

    Scale pattern: query CODES broadcast once (ray.put — 8 bytes/query);
    each batch quantizes itself zero-copy from arrow, XORs against the
    query codes, SWAR-popcounts, and emits only its per-query top-k partial;
    the driver merge sees blocks x k x n_queries rows. Deterministic
    tie-break (hamming, vec_id) so the ranking is reproducible across
    engines and partitionings.

    Exactness: sign bits are float comparisons (> 0), not arithmetic —
    bit-identical in SQL; the oracle packs the same bits into two 32-bit
    BIGINT words and ranks by bit_count(xor(lo))+bit_count(xor(hi))."""
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = qdf[qdf["vec_id"] < n_queries]
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qcodes = _sign_codes(qmat)
    qids = qdf["vec_id"].to_numpy()
    qref = ray.put((qids, qcodes))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class Scorer:
        def __init__(self, qref):
            self.qids, self.qcodes = (
                ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
            )

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            vids = batch["vec_id"].to_numpy()
            codes = _sign_codes(mat)
            ham = _popcount64(codes[:, None] ^ self.qcodes[None, :]).astype(np.int64)
            nq = len(self.qids)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(self.qids, len(vids)),
                    "vec_id": np.tile(vids, nq),
                    "hamming": ham.T.reshape(-1),
                }
            )
            out = out[out["query_id"] != out["vec_id"]]
            out = out.sort_values(["query_id", "hamming", "vec_id"])
            return out.groupby("query_id", as_index=False).head(k)

    partials = ds.map_batches(
        Scorer, fn_constructor_args=(qref,), batch_format="pyarrow", concurrency=2
    )
    allp = partials.to_pandas()
    allp = allp.sort_values(["query_id", "hamming", "vec_id"])
    top = allp.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    for c in ("query_id", "vec_id", "hamming", "rank"):
        top[c] = top[c].astype(np.int64)
    return top


def emb_hamming_topk_sql(sf_dir: str, n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH pos AS (
  SELECT vec_id, unnest(embedding) AS v,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS d
  FROM embeddings
), code AS (
  SELECT vec_id,
         SUM(CASE WHEN v > 0 AND d < 32 THEN (CAST(1 AS BIGINT) << d) ELSE 0 END) AS lo,
         SUM(CASE WHEN v > 0 AND d >= 32 THEN (CAST(1 AS BIGINT) << (d - 32)) ELSE 0 END) AS hi
  FROM pos GROUP BY vec_id
), q AS (SELECT * FROM code WHERE vec_id < {n_queries}),
 dist AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi)) AS hamming
  FROM q JOIN code c ON c.vec_id <> q.vec_id
)
SELECT query_id, vec_id, CAST(hamming AS BIGINT) AS hamming,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS BIGINT) AS rank
FROM dist
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) <= {k}
ORDER BY query_id, rank"""


# ------------------------------------------------------- global vocabulary
def doc_vocab(sf_dir: str, min_count: int = 10, batch_size: int = 4096) -> ray.data.Dataset:
    """Global vocabulary build (wordcount) with PARTIAL aggregation.

    The canonical corpus-statistics shuffle: per-batch combiner collapses
    each batch to its distinct tokens (one row per (token, batch), counts
    already summed) BEFORE the groupby — the exchange moves vocabulary-sized
    partials, not one row per token occurrence. Emits term frequency `tf`
    and document frequency `df` (docs containing the token ≥ once).

    Tokenizer: split on single space, empty tokens dropped — mirrors
    DuckDB's string_split(text, ' ') in the oracle bitwise."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        # arrow-native tokenize: one C-level split over the whole batch,
        # list_parent_indices recovers which doc each token came from
        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        pairs = pd.DataFrame(
            {
                "token": flat.filter(keep).to_pandas(),
                "d": parent.filter(keep).to_pandas(),
            }
        )
        out = pairs.groupby("token", as_index=False).agg(tf=("d", "size"), df=("d", "nunique"))
        out["tf"] = out["tf"].astype(np.int64)
        out["df"] = out["df"].astype(np.int64)
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    # vocabulary-sized keyspace — hash-partitioned pandas reduce, never
    # Ray's per-group sort-aggregate (stages/hash_aggregate.py)
    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
        "token",
        {"tf": ("tf", "sum"), "df": ("df", "sum")},
    )
    return agg.filter(expr=f"tf >= {min_count}")


def doc_vocab_sql(sf_dir: str, min_count: int = 10) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT token,
       COUNT(*) AS tf,
       COUNT(DISTINCT doc_id) AS df
FROM toks
WHERE token <> ''
GROUP BY token
HAVING COUNT(*) >= {min_count}
ORDER BY token"""


# ------------------------------------------------------ grouped top-k docs
def doc_topk_per_lang(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k documents per language by size (grouped top-k operator).

    Scale shape: per-batch partial top-k PER GROUP inside map_batches (each
    batch emits ≤ k rows per language it contains), then a final per-group
    top-k over blocks×langs×k rows. No global sort; the only exchange is
    the tiny partial-result groupby. Deterministic tie-break (n_chars DESC,
    doc_id ASC) keeps the result reproducible and oracle-exact."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        return df.groupby("lang", as_index=False, sort=False).head(k)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    parts = parts.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
    out = parts.groupby("lang", as_index=False, sort=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("lang").cumcount().astype(np.int64) + 1
    return out[["lang", "rank", "doc_id", "n_chars"]]


def doc_topk_per_lang_sql(sf_dir: str, k: int = 10) -> str:
    return f"""
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
)
WHERE rank <= {k}
ORDER BY lang, rank"""


# ----------------------------------------------------- rolling fingerprint
def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Order-sensitive rolling-FNV document fingerprint (stateless map).

    64-bit FNV-1a over the token stream (functions/textstats.fingerprint64)
    — swap two tokens and the fingerprint changes, unlike a token-set hash.
    Because every token is followed by the 0x20 separator byte, the rolling
    hash over tokens is IDENTICAL to FNV-1a over the raw bytes of
    ``text + ' '`` — which doc_fingerprint_sql reproduces exactly in DuckDB
    (list_reduce over the byte stream, HUGEINT mod-2^64 arithmetic), so
    this query carries a full exact oracle. Order-sensitivity and stability
    are additionally pinned in tests/test_training_data.py."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                # reinterpret as int64 so the value survives parquet/pandas
                # round-trips without uint64 edge cases
                "fp64": fingerprint64(texts).view(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_fingerprint_sql(sf_dir: str) -> str:
    """Exact SQL mirror of the rolling FNV-1a fingerprint: list_reduce over
    the byte stream of text||' ', each step (h XOR byte) * prime mod 2^64
    carried through HUGEINT (the 104-bit product fits int128). Uses
    unicode(char) as the byte value — exact for the ASCII synthetic corpus
    (the engine itself is UTF-8-correct via str.encode)."""
    return """
WITH d AS (SELECT doc_id, text || ' ' AS t FROM documents),
fp AS (
  SELECT doc_id, list_reduce(
    list_prepend(CAST(1469598103934665603 AS UBIGINT),
      list_transform(range(1, octet_length(encode(t)) + 1),
                     i -> CAST(unicode(t[i]) AS UBIGINT))),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                   % 18446744073709551616 AS UBIGINT)
  ) AS fp FROM d
)
SELECT doc_id,
       CAST(CASE WHEN fp >= 9223372036854775808
                 THEN CAST(fp AS HUGEINT) - 18446744073709551616
                 ELSE CAST(fp AS HUGEINT) END AS BIGINT) AS fp64
FROM fp"""


def doc_corpus_summary(sf_dir: str) -> ray.data.Dataset:
    """One-row corpus HEALTH SNAPSHOT — the WIMBD-style summary published
    with a dataset release ("What's In My Big Data?", Elazar et al. 2023
    arXiv:2310.20707): doc/token totals, vocabulary size, exact-duplicate
    document count and fraction, language and source cardinalities, mean
    doc length. One glance answers "did the ingest even work" before any
    expensive stage runs.

    Dataflow: single scan with a per-batch combiner that reduces each
    batch to ONE partial row of int64 sums plus three bounded distinct
    sets (vocab / langs / sources — dictionary-sized by nature; text
    hashes for the dup count ride as per-batch distinct partials, the
    only corpus-cardinality term, exchanged as 8-byte keys). Final merge
    is a tiny grouped reduction."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def partials(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        n_tokens = (texts.str.count(" ") + 1).to_numpy(dtype=np.int64)
        h = content_hash(texts.to_numpy()).view(np.int64)
        vocab = texts.str.split(" ").explode().unique()
        # tagged rows: kind 0 = one scalar partial; kind 1/2/3/4 = distinct
        # text-hash / vocab / lang / source keys (deduped within batch)
        rows = [
            pd.DataFrame(
                {
                    "kind": np.int64(0),
                    "key": [""],
                    "n_docs": np.int64(batch.num_rows),
                    "n_tokens": np.int64(n_tokens.sum()),
                    "n_chars": np.int64(texts.str.len().to_numpy(dtype=np.int64).sum()),
                }
            ),
            pd.DataFrame({"kind": np.int64(1), "key": pd.unique(h).astype(str),
                          "n_docs": np.int64(0), "n_tokens": np.int64(0), "n_chars": np.int64(0)}),
            pd.DataFrame({"kind": np.int64(2), "key": vocab,
                          "n_docs": np.int64(0), "n_tokens": np.int64(0), "n_chars": np.int64(0)}),
            pd.DataFrame({"kind": np.int64(3),
                          "key": pd.unique(batch["lang"].to_numpy(zero_copy_only=False)),
                          "n_docs": np.int64(0), "n_tokens": np.int64(0), "n_chars": np.int64(0)}),
            pd.DataFrame({"kind": np.int64(4),
                          "key": pd.unique(batch["source"].to_numpy(zero_copy_only=False)),
                          "n_docs": np.int64(0), "n_tokens": np.int64(0), "n_chars": np.int64(0)}),
        ]
        return pd.concat(rows, ignore_index=True)

    def key_stage(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["kind_key"] = df["kind"].astype(str) + "\x00" + df["key"].astype(str)
        return df[["kind_key", "kind", "n_docs", "n_tokens", "n_chars"]]

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pyarrow").map_batches(
            key_stage, batch_format="pyarrow"
        ),
        "kind_key",
        {"kind": ("kind", "min"), "n_docs": ("n_docs", "sum"),
         "n_tokens": ("n_tokens", "sum"), "n_chars": ("n_chars", "sum")},
    )

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby("kind")
        counts = g.size()
        return pd.DataFrame(
            {
                "kind": counts.index.to_numpy(dtype=np.int64),
                "distinct": counts.to_numpy(dtype=np.int64),
                "n_docs": g["n_docs"].sum().to_numpy(),
                "n_tokens": g["n_tokens"].sum().to_numpy(),
                "n_chars": g["n_chars"].sum().to_numpy(),
            }
        )

    parts = agg.map_batches(finish, batch_format="pyarrow").to_pandas()
    parts = parts.groupby("kind", as_index=False).sum()
    row0 = parts[parts["kind"] == 0].iloc[0]
    n_docs = int(row0["n_docs"])
    n_distinct_texts = int(parts.loc[parts["kind"] == 1, "distinct"].sum())
    out = pd.DataFrame(
        [
            {
                "n_docs": n_docs,
                "n_tokens": int(row0["n_tokens"]),
                "n_chars": int(row0["n_chars"]),
                "vocab_size": int(parts.loc[parts["kind"] == 2, "distinct"].sum()),
                "n_langs": int(parts.loc[parts["kind"] == 3, "distinct"].sum()),
                "n_sources": int(parts.loc[parts["kind"] == 4, "distinct"].sum()),
                "exact_dup_docs": n_docs - n_distinct_texts,
                "dup_frac": (n_docs - n_distinct_texts) / n_docs,
                "mean_doc_tokens": int(row0["n_tokens"]) / n_docs,
            }
        ]
    ).astype(
        {
            "n_docs": np.int64, "n_tokens": np.int64, "n_chars": np.int64,
            "vocab_size": np.int64, "n_langs": np.int64, "n_sources": np.int64,
            "exact_dup_docs": np.int64,
        }
    )
    return out


def doc_corpus_summary_sql(sf_dir: str) -> str:
    return """
WITH v AS (SELECT count(DISTINCT w) AS vocab_size
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents))
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST((SELECT vocab_size FROM v) AS BIGINT) AS vocab_size,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS exact_dup_docs,
       (count(*) - count(DISTINCT text)) / count(*) AS dup_frac,
       sum(length(text) - length(replace(text, ' ', '')) + 1) / count(*) AS mean_doc_tokens
FROM documents"""


def doc_mix_plan(
    sf_dir: str,
    budget_tokens: int = 20_000,
    weights: tuple = (("src0", 0.3), ("src1", 0.25), ("src2", 0.2), ("src3", 0.15), ("src4", 0.1)),
) -> ray.data.Dataset:
    """Training-mix PLANNING table — the Pile/Dolma-style source-weighting
    sheet: given a token budget and target mix weights, compute per source
    the available tokens, the target allocation, the sampling rate
    (down-sample when over-supplied) and the epoch count (up-sample /
    repeat when under-supplied — weights of scarce high-quality sources
    >1 epoch is standard practice, cf. The Pile's epochs column, Gao et
    al. 2020 arXiv:2101.00027 Table 1). Sources absent from `weights` get
    weight 0 (excluded). All plan columns are single float expressions
    over exact int64 token counts → exact oracle.

    Dataflow: per-batch (source → Σtokens) combiner → ONE exchange of
    |sources| rows; the plan math runs inside the per-source group."""
    wmap = dict(weights)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])

    def partials(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        df = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "n_tokens": (texts.str.count(" ") + 1).to_numpy(dtype=np.int64),
                "n_docs": np.ones(batch.num_rows, dtype=np.int64),
            }
        )
        return df.groupby("source", sort=False, as_index=False).sum()

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("source", sort=True, as_index=False).sum()
        w = a["source"].map(lambda s: wmap.get(s, 0.0)).to_numpy(dtype=np.float64)
        avail = a["n_tokens"].to_numpy(dtype=np.int64)
        target = budget_tokens * w
        a["weight"] = w
        a["target_tokens"] = target
        a["sample_rate"] = np.minimum(target / avail, 1.0)
        a["epochs"] = target / avail
        return a

    return partition_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"), plan, key="source", num_buckets=4
    )


def doc_mix_plan_sql(
    sf_dir: str,
    budget_tokens: int = 20_000,
    weights: tuple = (("src0", 0.3), ("src1", 0.25), ("src2", 0.2), ("src3", 0.15), ("src4", 0.1)),
) -> str:
    cases = " ".join(f"WHEN '{s}' THEN CAST({w} AS DOUBLE)" for s, w in weights)
    return f"""
WITH a AS (
  SELECT source,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_docs,
         CASE source {cases} ELSE 0.0 END AS weight
  FROM documents GROUP BY source
)
SELECT source, n_tokens, n_docs, weight,
       {budget_tokens} * weight AS target_tokens,
       least({budget_tokens} * weight / n_tokens, 1.0) AS sample_rate,
       {budget_tokens} * weight / n_tokens AS epochs
FROM a ORDER BY source"""


def doc_compression_proxy(sf_dir: str, level: int = 6) -> ray.data.Dataset:
    """Compression-ratio quality proxy — the zlib signal used by web-corpus
    curation (e.g. Dolma's and RefinedWeb's repetition screens): highly
    compressible text is boilerplate/repetition, incompressible text is
    often binary junk or gibberish; the healthy band sits in between. Emits
    raw/deflated byte sizes and the ratio per document plus the band
    verdict at the conventional [2.0, 6.0] cut.

    Actor-pool stage (compressor objects are reused per actor; zlib's C
    loop is the per-row cost — no vectorized form exists, which is fine:
    it IS the kernel, like model inference in doc_model_score). zlib
    output bytes depend on the zlib build → no SQL oracle (rows-only);
    determinism-within-build, band logic, and monotonicity under text
    repetition are pytest-pinned (tests/test_session7_ops.py)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Deflate:
        def __init__(self, level: int):
            import zlib

            self.zlib = zlib
            self.level = level

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            texts = batch["text"].to_pylist()
            raw = np.asarray([len(t.encode()) for t in texts], dtype=np.int64)
            comp = np.asarray(
                [len(self.zlib.compress(t.encode(), self.level)) for t in texts],
                dtype=np.int64,
            )
            ratio = raw / comp
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                    "raw_bytes": raw,
                    "compressed_bytes": comp,
                    "ratio": ratio,
                    "in_band": (ratio >= 2.0) & (ratio <= 6.0),
                }
            )

    return ds.map_batches(
        Deflate, fn_constructor_args=(level,), batch_format="pyarrow", concurrency=2
    )


def doc_length_buckets(sf_dir: str, bucket_size: int = 16) -> ray.data.Dataset:
    """Sequence-length bucketing audit — the padding-economics table a
    training-batch assembler is tuned against (length bucketing: batch
    same-length docs together so padding waste ≈ 0; the alternative to
    doc_pack_sequences' concat-packing). Per token-length bucket
    [b·B, (b+1)·B): doc count, token sum, in-bucket max, `ceil_waste`
    (pad every doc to the bucket ceiling — the static-shape/XLA cost) and
    `tight_waste` (pad to the in-bucket max — dynamic batching's cost),
    plus the tight waste fraction. All integer sums (order-independent)
    and one final float division — exact oracle.

    Dataflow: stateless scan with per-batch (bucket → n/Σ/max) combiner →
    ONE dictionary-sized exchange (≤ max_len/B rows)."""
    B = bucket_size
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partials(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        n_tokens = (texts.str.count(" ") + 1).to_numpy(dtype=np.int64)
        df = pd.DataFrame({"bucket": n_tokens // B, "n_tokens": n_tokens})
        g = df.groupby("bucket", sort=False)["n_tokens"]
        return pd.DataFrame(
            {
                "bucket": g.sum().index.to_numpy(),
                "n_docs": g.size().to_numpy(dtype=np.int64),
                "sum_tokens": g.sum().to_numpy(),
                "max_tokens": g.max().to_numpy(),
            }
        )

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("bucket", sort=True, as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum"), max_tokens=("max_tokens", "max")
        )
        a["ceil_waste"] = a["n_docs"] * (a["bucket"] + 1) * B - a["sum_tokens"]
        a["tight_waste"] = a["n_docs"] * a["max_tokens"] - a["sum_tokens"]
        a["tight_waste_frac"] = a["tight_waste"] / (a["n_docs"] * a["max_tokens"])
        return a

    return partition_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"), reduce_bucket, key="bucket", num_buckets=4
    )


def doc_length_buckets_sql(sf_dir: str, bucket_size: int = 16) -> str:
    B = bucket_size
    return f"""
WITH d AS (
  SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
  FROM documents
), a AS (
  SELECT n_tokens // {B} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         CAST(max(n_tokens) AS BIGINT) AS max_tokens
  FROM d GROUP BY bucket
)
SELECT bucket, n_docs, sum_tokens, max_tokens,
       n_docs * (bucket + 1) * {B} - sum_tokens AS ceil_waste,
       n_docs * max_tokens - sum_tokens AS tight_waste,
       (n_docs * max_tokens - sum_tokens) / (n_docs * max_tokens) AS tight_waste_frac
FROM a ORDER BY bucket"""


def doc_langid_confusion(sf_dir: str) -> ray.data.Dataset:
    """Language-ID EVALUATION — the confusion matrix of the marker-token
    classifier (doc_lang_id) against the corpus's labeled `lang` column,
    with per-true-language recall fractions: the audit table a curation
    run publishes before trusting a lang filter (mislabeled languages are
    a top silent data-loss cause at corpus scale). Dataflow: stateless
    scan with a per-batch (lang, pred) combiner → ONE |langs|²-row
    exchange; fractions computed inside the per-true-lang group so no
    second pass. Shares lang_scores' strict-argmax contract (exactly
    mirrored in SQL) with doc_lang_id."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])

    def partials(batch: pa.Table) -> pd.DataFrame:
        pred = lang_scores(batch["text"].to_pandas())["pred_lang"].to_numpy()
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "pred_lang": pred,
                "n_docs": np.ones(batch.num_rows, dtype=np.int64),
            }
        )
        return df.groupby(["lang", "pred_lang"], sort=False, as_index=False).sum()

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    def reduce_lang(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lang", "pred_lang"], sort=True, as_index=False)["n_docs"].sum()
        out["recall_frac"] = out["n_docs"] / out.groupby("lang")["n_docs"].transform("sum")
        return out

    return partition_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"), reduce_lang, key="lang", num_buckets=4
    )


def doc_langid_confusion_sql(sf_dir: str) -> str:
    langs = list(LANG_MARKERS.keys())
    hit_cols = ", ".join(
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ("
        + ", ".join(f"'{m}'" for m in ms)
        + f"))) AS BIGINT) AS hits_{l}"
        for l, ms in LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"hits_{l}" for l in langs) + ")"
    n_at_max = " + ".join(f"CASE WHEN hits_{l} = {best} THEN 1 ELSE 0 END" for l in langs)
    first_max = "CASE " + " ".join(f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs) + " END"
    return f"""
WITH h AS (SELECT lang, {hit_cols} FROM documents),
p AS (
  SELECT lang,
         CASE WHEN {best} > 0 AND ({n_at_max}) = 1 THEN {first_max} ELSE 'und' END AS pred_lang
  FROM h
), m AS (
  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY lang, pred_lang
)
SELECT lang, pred_lang, n_docs,
       n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS recall_frac
FROM m ORDER BY lang, pred_lang"""


def doc_shuffle_shards(sf_dir: str, n_shards: int = 16) -> ray.data.Dataset:
    """Deterministic hash-shard shuffle audit — HOW a 100-TB corpus is
    actually shuffled for training: not `random_shuffle` (an all-to-all
    over the full payload) but a stable hash of the doc id into N shards,
    each shard written independently (resumable, reproducible across
    re-runs and cluster sizes). This op emits the audit a shuffle job
    publishes: per (shard, source) doc and token counts, which is what you
    check to confirm the shuffle decorrelated source order (every shard
    should hold ~1/N of every source). Shard key = rolling-FNV of the
    decimal doc id (fingerprint64 — vectorized, and SQL-mirrorable via the
    doc_fingerprint list_reduce chain, so the oracle is exact).

    Dataflow: stateless scan with per-batch (shard, source) combiner →
    ONE dictionary-sized exchange (N·|sources| rows). The text never
    moves; the real shard WRITE would be write_parquet partitioned by
    shard on the same key (doc_export_partitioned demonstrates the sink
    side)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        fp = fingerprint64(pd.Series(ids.astype(str)))
        shard = (fp % np.uint64(n_shards)).astype(np.int64)
        texts = batch["text"].to_pandas()
        n_tokens = (texts.str.count(" ") + 1).to_numpy(dtype=np.int64)
        df = pd.DataFrame(
            {
                "shard": shard,
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "n_docs": np.ones(len(ids), dtype=np.int64),
                "n_tokens": n_tokens,
            }
        )
        return df.groupby(["shard", "source"], sort=False, as_index=False).sum()

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["shard", "source"], sort=True, as_index=False).sum()

    return partition_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"),
        reduce_shard,
        key="shard",
        num_buckets=8,
    )


def doc_shuffle_shards_sql(sf_dir: str, n_shards: int = 16) -> str:
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) || ' ' AS t, source,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
  FROM documents
), fp AS (
  SELECT source, n_tokens, list_reduce(
    list_prepend(CAST(1469598103934665603 AS UBIGINT),
      list_transform(range(1, octet_length(encode(t)) + 1),
                     i -> CAST(unicode(t[i]) AS UBIGINT))),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                   % 18446744073709551616 AS UBIGINT)
  ) AS fp FROM d
)
SELECT CAST(fp % {n_shards} AS BIGINT) AS shard, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM fp GROUP BY 1, 2 ORDER BY 1, 2"""


# ----------------------------------------------- winnowing fingerprints
_WIN_PRIME = 1099511628211  # FNV prime — doubles as the Horner base
_WIN_OFFSET = 1469598103934665603
_WIN_MOD = 1 << 64


def doc_winnow(sf_dir: str, k: int = 4, w: int = 5) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    SIGMOD'03 — the MOSS scheme): hash every k-token gram, slide a
    w-gram window, record the window minimum (rightmost on ties). The
    guarantee: any shared token run of >= w+k-1 tokens between two
    documents shares at least one fingerprint, while only ~2/(w+1) of
    gram hashes are kept — the classic local fingerprinting scheme next
    to minhash (set-level) and simhash (vector-level).

    Exactness chain (both sides bit-identical):
      token hash = FNV-1a over token bytes + 0x20 (one step of the
      fingerprint64 stream; textstats.token_fnv64, vectorized over byte
      positions), k-gram hash = Horner fold g = g*FNV_PRIME + th mod 2^64
      (numpy uint64 wrap == the oracle's stepwise-%% HUGEINT chain), and
      the rightmost-tie argmin == the oracle's MIN over the composite
      key g*2^20 + (2^20-1 - pos).

    Scale: a STATELESS linear map — no exchange, text never leaves the
    scan task, output is ~2/(w+1) of gram positions. Positions are
    capped at 2^20 grams/doc only by the ORACLE's key packing; the
    engine itself has no cap."""
    from quant_feature_pipeline_ray.functions.textstats import token_fnv64

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    A = np.uint64(_WIN_PRIME)

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        tok_lists = [t.split(" ") for t in texts]
        n_t = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=doc_ids.dtype),
                "pos": np.empty(0, dtype=np.int64),
                "fp64": np.empty(0, dtype=np.int64),
            }
        )
        if len(texts) == 0 or int(n_t.sum()) == 0:
            return empty
        th = token_fnv64([t for toks in tok_lists for t in toks])
        # per-doc gram counts; docs shorter than k tokens emit nothing
        n_g = np.maximum(n_t - (k - 1), 0)
        keep_doc = n_g > 0
        if not keep_doc.any():
            return empty
        tok_start = np.concatenate(([0], np.cumsum(n_t[:-1])))
        # flat gram table: doc row index + gram index within doc
        doc_of = np.repeat(np.arange(len(texts)), n_g)
        e = np.concatenate([np.arange(int(c)) for c in n_g[keep_doc]])
        base = tok_start[doc_of] + e  # flat index of the gram's first token
        # Horner fold over the k member tokens (wrapping uint64)
        g = th[base].copy()
        for j in range(1, k):
            g = g * A + th[base + j]
        # windowed min, RIGHTMOST tie: scan backwards, strictly-less wins
        best = g.copy()
        best_e = e.copy()
        for j in range(1, min(w, len(g))):
            better = np.zeros(len(g), dtype=bool)
            better[j:] = g[:-j] < best[j:]
            better &= e >= j  # window never crosses the doc start
            best[better] = g[np.flatnonzero(better) - j]
            best_e[better] = e[better] - j
        ng_of = n_g[doc_of]
        sel = (e >= w - 1) | (e == ng_of - 1)  # full windows; one partial if n_g < w
        sel_doc, sel_e = doc_of[sel], best_e[sel]
        # dedup (doc, pos): consecutive windows reselect the same gram
        key = sel_doc.astype(np.int64) * (1 << 32) + sel_e
        _, first = np.unique(key, return_index=True)
        sel_doc, sel_e = sel_doc[first], sel_e[first]
        flat = tok_start[sel_doc] + sel_e
        fp = th[flat].copy()
        for j in range(1, k):
            fp = fp * A + th[flat + j]
        return pd.DataFrame(
            {
                "doc_id": doc_ids[sel_doc],
                "pos": sel_e.astype(np.int64),
                "fp64": fp.view(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_winnow_sql(sf_dir: str, k: int = 4, w: int = 5) -> str:
    """Exact DuckDB mirror: per-token FNV via list_reduce (HUGEINT
    mod-2^64, the doc_fingerprint discipline — exact for the ASCII
    corpus), k-gram Horner with stepwise %% (congruent to the engine's
    wrap-every-op), window MIN over the composite key g*2^20 +
    (2^20-1-e) whose tie direction IS rightmost-pos."""
    M = _WIN_MOD
    horner = "CAST(th0 AS HUGEINT)"
    for j in range(1, k):
        horner = f"((({horner} * {_WIN_PRIME}) % {M}) + CAST(th{j} AS HUGEINT))"
    leads = ",\n         ".join(
        f"lead(th0, {j}) OVER (PARTITION BY doc_id ORDER BY tpos) AS th{j}"
        for j in range(1, k)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(tl) || ' ' AS tok,
         CAST(unnest(range(len(tl))) AS BIGINT) AS tpos
  FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
), th AS (
  SELECT doc_id, tpos, list_reduce(
    list_prepend(CAST({_WIN_OFFSET} AS UBIGINT),
      list_transform(range(1, octet_length(encode(tok)) + 1),
                     i -> CAST(unicode(tok[i]) AS UBIGINT))),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * {_WIN_PRIME}) % {M} AS UBIGINT)
  ) AS th0 FROM toks
), lagged AS (
  SELECT doc_id, tpos AS e, th0,
         {leads}
  FROM th
), grams AS (
  SELECT doc_id, e, ({horner}) % {M} AS g
  FROM lagged WHERE th{k - 1} IS NOT NULL
), win AS (
  SELECT doc_id, e,
         COUNT(*) OVER (PARTITION BY doc_id) AS ng,
         MIN(g * 1048576 + (1048575 - e))
           OVER (PARTITION BY doc_id ORDER BY e
                 ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS mk
  FROM grams
)
SELECT DISTINCT doc_id,
       CAST(1048575 - (mk % 1048576) AS BIGINT) AS pos,
       CAST(CASE WHEN (mk // 1048576) >= 9223372036854775808
                 THEN (mk // 1048576) - {M}
                 ELSE (mk // 1048576) END AS BIGINT) AS fp64
FROM win WHERE e >= {w - 1} OR e = ng - 1
ORDER BY doc_id, pos"""


# ---------------------------------------- duplicated-span removal (rewrite)
def doc_strip_dup_spans(
    sf_dir: str, n: int = 5, num_partitions: int = 32
) -> ray.data.Dataset:
    """REMOVE duplicated spans from the corpus (the Lee-et-al
    "Deduplicating Training Data Makes LMs Better" ExactSubstr rewrite —
    not just the dup-fraction score that doc_ngram_dup_frac reports):
    every token covered by an n-gram occurring >= 2 times anywhere in the
    corpus (cross-doc OR self-repetition) is dropped, and the document is
    re-emitted as cleaned text plus a removed-token count.

    Dataflow (TWO fixed-width exchanges + one doc_id equi-join; the text
    column crosses the wire exactly once, inside the join):
      map        → tokenize, per-token FNV (textstats.token_fnv64), n-gram
                   Horner hash mod 2^64 — the winnowing hash chain, so the
                   oracle groups by the IDENTICAL 64-bit value and even
                   hash collisions reproduce (no string/hash grouping bias)
      exchange 1 (by gram hash) → groups with total count >= 2 emit their
                   (doc_id, pos) members — output is dup positions only
      exchange 2 (by doc_id)    → dup starts packed into ONE comma-joined
                   string row per doc (fixed small rows; pandas-merge-safe
                   through the tagged-union join, unlike a list column)
      join       → hash_equi_join(documents, packed, how='left') — both
                   sides can be corpus-scale, no broadcast
      map        → coverage via diff-array cumsum (np.add.at), rebuild
                   text from kept tokens.
    """
    from quant_feature_pipeline_ray.functions.textstats import token_fnv64
    from quant_feature_pipeline_ray.stages.equi_join import hash_equi_join
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    A = np.uint64(_WIN_PRIME)

    def gram_stage(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        tok_lists = [t.split(" ") for t in texts]
        n_t = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
        n_g = np.maximum(n_t - (n - 1), 0)
        if len(texts) == 0 or int(n_g.sum()) == 0:
            return pd.DataFrame(
                {
                    "g": np.empty(0, dtype=np.int64),
                    "doc_id": np.empty(0, dtype=doc_ids.dtype),
                    "pos": np.empty(0, dtype=np.int64),
                }
            )
        th = token_fnv64([t for toks in tok_lists for t in toks])
        tok_start = np.concatenate(([0], np.cumsum(n_t[:-1])))
        doc_of = np.repeat(np.arange(len(texts)), n_g)
        e = np.concatenate([np.arange(int(c)) for c in n_g[n_g > 0]])
        base = tok_start[doc_of] + e
        g = th[base].copy()
        for j in range(1, n):
            g = g * A + th[base + j]
        return pd.DataFrame(
            {"g": g.view(np.int64), "doc_id": doc_ids[doc_of], "pos": e}
        )

    grams = ds.map_batches(gram_stage, batch_format="pyarrow")

    def dup_members(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("g")["g"].transform("size")
        return df.loc[c.to_numpy() >= 2, ["doc_id", "pos"]]

    dups = partition_map_groups(grams, dup_members, key="g", num_buckets=num_partitions)

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["doc_id", "pos"]).groupby("doc_id")["pos"]
        out = s.agg(lambda v: ",".join(map(str, v))).reset_index()
        return out.rename(columns={"pos": "dup_pos"})

    packed = partition_map_groups(dups, pack, key="doc_id", num_buckets=num_partitions)
    joined = hash_equi_join(ds, packed, on="doc_id", how="left", num_partitions=num_partitions)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        # per-DOC loop (not per-token): docs without dup spans short-circuit
        # to pass-through; for the rest, coverage is a vectorized diff-array
        # cumsum and the only per-element work is the unavoidable string
        # reassembly (same accepted shape as fingerprint64's per-doc join)
        texts = df["text"].to_numpy()
        dup_pos = df["dup_pos"].to_numpy()
        clean = np.empty(len(df), dtype=object)
        removed = np.zeros(len(df), dtype=np.int64)
        for i, (t, ps) in enumerate(zip(texts, dup_pos)):
            if not isinstance(ps, str) or ps == "":
                clean[i] = t  # no dup spans: ' '.join(split) is identity
                continue
            toks = t.split(" ")
            starts = np.array(ps.split(","), dtype=np.int64)
            diff = np.zeros(len(toks) + 1, dtype=np.int64)
            np.add.at(diff, starts, 1)
            np.add.at(diff, np.minimum(starts + n, len(toks)), -1)
            covered = np.cumsum(diff[:-1]) > 0
            removed[i] = int(covered.sum())
            kept = [tok for tok, c in zip(toks, covered) if not c]
            clean[i] = " ".join(kept)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "text_clean": clean, "n_removed": removed}
        )

    return joined.map_batches(rebuild, batch_format="pandas")


def doc_strip_dup_spans_sql(sf_dir: str, n: int = 5) -> str:
    """Exact DuckDB mirror: the winnowing FNV/Horner hash chain, dup = any
    gram-hash with global COUNT >= 2, coverage = dup starts exploded over
    range(n), rebuild = ordered string_agg over uncovered tokens."""
    M = _WIN_MOD
    horner = "CAST(th0 AS HUGEINT)"
    for j in range(1, n):
        horner = f"((({horner} * {_WIN_PRIME}) % {M}) + CAST(th{j} AS HUGEINT))"
    leads = ",\n         ".join(
        f"lead(th0, {j}) OVER (PARTITION BY doc_id ORDER BY tpos) AS th{j}"
        for j in range(1, n)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(tl) AS tok,
         CAST(unnest(range(len(tl))) AS BIGINT) AS tpos
  FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
), th AS (
  SELECT doc_id, tok, tpos, list_reduce(
    list_prepend(CAST({_WIN_OFFSET} AS UBIGINT),
      list_transform(range(1, octet_length(encode(tok || ' ')) + 1),
                     i -> CAST(unicode((tok || ' ')[i]) AS UBIGINT))),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * {_WIN_PRIME}) % {M} AS UBIGINT)
  ) AS th0 FROM toks
), lagged AS (
  SELECT doc_id, tpos AS e, th0,
         {leads}
  FROM th
), grams AS (
  SELECT doc_id, e, ({horner}) % {M} AS g
  FROM lagged WHERE th{n - 1} IS NOT NULL
), dup AS (
  SELECT doc_id, e FROM (
    SELECT doc_id, e, COUNT(*) OVER (PARTITION BY g) AS c FROM grams
  ) WHERE c >= 2
), cov AS (
  SELECT DISTINCT dup.doc_id, dup.e + u.u AS tpos
  FROM dup, (SELECT unnest(range({n})) AS u) u
), rebuilt AS (
  SELECT t.doc_id,
         COALESCE(string_agg(CASE WHEN c.tpos IS NULL THEN t.tok END,
                             ' ' ORDER BY t.tpos), '') AS text_clean,
         CAST(COUNT(c.tpos) AS BIGINT) AS n_removed
  FROM th t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tpos = c.tpos
  GROUP BY t.doc_id
)
SELECT doc_id, text_clean, n_removed FROM rebuilt ORDER BY doc_id"""


# ------------------------------------- content-defined chunking (CDC) dedup
def doc_cdc_chunks(
    sf_dir: str, k: int = 8, div: int = 64, max_len: int = 256
) -> ray.data.Dataset:
    """Content-defined chunking (the Rabin/FastCDC family — LBFS, Muthitacharoen
    et al. SOSP'01; FastCDC, Xia et al. ATC'16): cut each document into
    variable-size chunks at positions chosen by a rolling hash of the LAST
    k bytes, so an insertion early in a document shifts only the chunks it
    touches — byte-shifted near-duplicates still share every downstream
    chunk, which fixed-size blocking destroys. This is the chunk-level
    granularity used by storage dedup and by corpus-level near-dup passes
    between exact (doc_exact_dedup) and n-gram (doc_ngram_dup_frac) scope.

    Boundary rule: cut AFTER byte i when Horner(gear(b[i-k+1..i])) % div == 0
    (gear(b) = one FNV-1a step over the byte — table lookup), plus a forced
    cut at the document end; segments longer than max_len split at max_len
    multiples FROM THE SEGMENT START (FastCDC's max-size cut — deterministic
    given the natural cuts, so no recursion). The classic min-size skip is
    deliberately omitted: it makes boundary eligibility depend on the
    previous boundary (a recursion SQL cannot mirror) and only tunes the
    chunk-size distribution, not the content-defined property.

    Exactness chain (engine == oracle bit-for-bit): gear = ((OFFSET ^ b) *
    FNV_PRIME) mod 2^64, window hash = k-term Horner fold mod 2^64 (numpy
    uint64 wrap == stepwise-% HUGEINT), chunk hash = FNV-1a over the chunk
    bytes (ASCII corpus: SQL text[i] == the byte).

    Scale: a STATELESS linear map — no exchange, text never leaves the scan
    task, output is ~n_bytes/div fixed-width rows; the per-chunk hash loop
    is bounded by max_len iterations regardless of document length."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    A = np.uint64(_WIN_PRIME)
    lut = (np.uint64(_WIN_OFFSET) ^ np.arange(256, dtype=np.uint64)) * A

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "chunk_idx": np.empty(0, dtype=np.int64),
                "pos": np.empty(0, dtype=np.int64),
                "n_bytes": np.empty(0, dtype=np.int64),
                "chash": np.empty(0, dtype=np.int64),
            }
        )
        total = int(lens.sum())
        if len(texts) == 0 or total == 0:
            return empty
        buf = np.frombuffer("".join(texts).encode(), dtype=np.uint8)
        assert len(buf) == total  # ASCII corpus: 1 char == 1 byte
        doc_of = np.repeat(np.arange(len(texts)), lens)
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        g = lut[buf]
        # rolling window hash: Horner over gear values of the last k bytes;
        # hv[t] is the window ENDING at flat position t + k - 1
        cut = np.zeros(total, dtype=bool)
        if total >= k:
            hv = g[: total - k + 1].copy()
            for j in range(1, k):
                hv = hv * A + g[j : total - k + 1 + j]
            ok = doc_of[: total - k + 1] == doc_of[k - 1 :]  # window inside one doc
            nat = ok & (hv % np.uint64(div) == np.uint64(0))
            cut[k - 1 + np.flatnonzero(nat)] = True
        ends = starts + lens - 1
        cut[ends[lens > 0]] = True  # document end always cuts
        cuts = np.flatnonzero(cut)
        cdoc = doc_of[cuts]
        same = np.concatenate(([False], cdoc[1:] == cdoc[:-1]))
        prev = np.concatenate(([0], cuts[:-1]))
        seg_start = np.where(same, prev + 1, starts[cdoc])
        seg_len = cuts - seg_start + 1
        # FastCDC max-size cut: split each natural segment at max_len steps
        n_pieces = (seg_len + max_len - 1) // max_len
        rep = np.repeat(np.arange(len(cuts)), n_pieces)
        off = np.concatenate(([0], np.cumsum(n_pieces[:-1])))
        jj = np.arange(int(n_pieces.sum())) - off[rep]
        p_start = seg_start[rep] + jj * max_len
        p_len = np.minimum(max_len, seg_len[rep] - jj * max_len)
        p_doc = cdoc[rep]
        newdoc = np.concatenate(([True], p_doc[1:] != p_doc[:-1]))
        ar = np.arange(len(p_doc))
        chunk_idx = ar - np.maximum.accumulate(np.where(newdoc, ar, 0))
        # FNV-1a over each chunk's bytes (≤ max_len vectorized iterations)
        h = np.full(len(p_doc), _WIN_OFFSET, dtype=np.uint64)
        for j in range(int(p_len.max())):
            m = p_len > j
            h[m] = (h[m] ^ buf[p_start[m] + j]) * A
        return pd.DataFrame(
            {
                "doc_id": doc_ids[p_doc].astype(np.int64),
                "chunk_idx": chunk_idx.astype(np.int64),
                "pos": (p_start - starts[p_doc]).astype(np.int64),
                "n_bytes": p_len.astype(np.int64),
                "chash": h.view(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _cdc_chunks_cte(k: int, div: int, max_len: int) -> str:
    """Shared CTE chain producing the exact chunk table (doc_id, pos,
    n_bytes, chash) — the SQL mirror of doc_cdc_chunks' kernel."""
    M = _WIN_MOD
    horner = f"CAST(g{k - 1} AS HUGEINT)"
    for j in range(k - 2, -1, -1):
        horner = f"((({horner} * {_WIN_PRIME}) % {M}) + CAST(g{j} AS HUGEINT))"
    lags = ",\n         ".join(
        f"lag(g0, {j}) OVER (PARTITION BY doc_id ORDER BY i) AS g{j}"
        for j in range(1, k)
    )
    return f"""
docs AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
         FROM documents WHERE length(text) > 0),
bytes AS (
  SELECT doc_id, n, CAST(unnest(range(1, n + 1)) AS BIGINT) AS i FROM docs
), gear AS (
  SELECT b.doc_id, b.n, b.i,
         CAST((CAST(xor(CAST({_WIN_OFFSET} AS UBIGINT),
                        CAST(unicode(d.text[b.i]) AS UBIGINT)) AS HUGEINT)
               * {_WIN_PRIME}) % {M} AS UBIGINT) AS g0
  FROM bytes b JOIN docs d USING (doc_id)
), lagged AS (
  SELECT doc_id, n, i, g0,
         {lags}
  FROM gear
), bounds AS (
  SELECT doc_id, n, i
  FROM lagged
  WHERE (i >= {k} AND ({horner}) % {M} % {div} = 0) OR i = n
), segs AS (
  SELECT doc_id, i AS e,
         COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s
  FROM bounds
), pieces AS (
  SELECT doc_id, s + j * {max_len} AS p1,
         least(CAST({max_len} AS BIGINT), e - (s + j * {max_len}) + 1) AS n_bytes
  FROM (SELECT doc_id, s, e,
               CAST(unnest(range((e - s + {max_len}) // {max_len})) AS BIGINT) AS j
        FROM segs)
), chunks AS (
  SELECT p.doc_id, p.p1 - 1 AS pos, p.n_bytes,
         list_reduce(
           list_prepend(CAST({_WIN_OFFSET} AS UBIGINT),
             list_transform(range(1, p.n_bytes + 1),
               x -> CAST(unicode(substring(d.text, p.p1, p.n_bytes)[x]) AS UBIGINT))),
           (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * {_WIN_PRIME}) % {M} AS UBIGINT)
         ) AS ch
  FROM pieces p JOIN docs d USING (doc_id)
)"""


def doc_cdc_chunks_sql(sf_dir: str, k: int = 8, div: int = 64, max_len: int = 256) -> str:
    M = _WIN_MOD
    return f"""
WITH {_cdc_chunks_cte(k, div, max_len)}
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS chunk_idx,
       pos, n_bytes,
       CAST(CASE WHEN ch >= 9223372036854775808 THEN CAST(ch AS HUGEINT) - {M}
                 ELSE CAST(ch AS HUGEINT) END AS BIGINT) AS chash
FROM chunks ORDER BY doc_id, pos"""


def doc_cdc_dedup(
    sf_dir: str,
    k: int = 8,
    div: int = 64,
    max_len: int = 256,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Chunk-level duplication profile over the CDC chunk table: for every
    document, the byte fraction covered by chunks whose content hash occurs
    >= 2 times anywhere in the corpus (cross-doc or self-repeat) — the
    storage-dedup ratio, and the shift-robust sibling of
    doc_ngram_dup_frac's token-window measure.

    Dataflow (the doc_ngram_dup_frac backbone): stateless CDC scan (text
    never leaves it) → exchange 1 by chash (24 B/row: doc_id, chash,
    n_bytes) marks instances whose hash partition holds >= 2 of that hash →
    exchange 2 by doc_id sums bytes. Both exchanges move one fixed-width
    row per chunk (~n_bytes/div of the corpus byte count)."""
    chunks = doc_cdc_chunks(sf_dir, k=k, div=div, max_len=max_len)
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    def mark(part: pd.DataFrame) -> pd.DataFrame:
        dup = part.groupby("chash")["doc_id"].transform("size").to_numpy() > 1
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"],
                "n_bytes": part["n_bytes"],
                "dup_bytes": np.where(dup, part["n_bytes"].to_numpy(), 0).astype(np.int64),
                "one": np.ones(len(part), dtype=np.int64),
            }
        )

    marked = partition_map_groups(
        chunks.select_columns(["doc_id", "n_bytes", "chash"]),
        mark,
        key="chash",
        num_buckets=num_partitions,
    )
    agg = grouped_aggregate(
        marked,
        "doc_id",
        {
            "n_chunks": ("one", "sum"),
            "total_bytes": ("n_bytes", "sum"),
            "dup_bytes": ("dup_bytes", "sum"),
        },
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["dup_frac"] = df["dup_bytes"].to_numpy() / df["total_bytes"].to_numpy()
        return df

    return agg.map_batches(finish, batch_format="pyarrow")


def doc_cdc_dedup_sql(sf_dir: str, k: int = 8, div: int = 64, max_len: int = 256) -> str:
    return f"""
WITH {_cdc_chunks_cte(k, div, max_len)},
cnt AS (SELECT ch, count(*) AS c FROM chunks GROUP BY ch)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(c.n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(CASE WHEN cnt.c >= 2 THEN c.n_bytes ELSE 0 END) AS BIGINT) AS dup_bytes,
       CAST(sum(CASE WHEN cnt.c >= 2 THEN c.n_bytes ELSE 0 END) AS BIGINT)
         / CAST(sum(c.n_bytes) AS BIGINT) AS dup_frac
FROM chunks c JOIN cnt USING (ch)
GROUP BY c.doc_id
ORDER BY c.doc_id"""


# ----------------------------------------- dedup-aware train/val splitting
def doc_dedup_aware_split(sf_dir: str, val_pct: int = 10) -> ray.data.Dataset:
    """Contamination-safe train/validation split: the split is assigned to
    the NORMALIZATION CLASS, not the document — every doc whose normalized
    text (the CCNet lower/strip/collapse chain of doc_normalized_dedup)
    matches lands in the same split, so an exact or normalized duplicate of
    a training document can never leak into the eval set (the train/test
    contamination failure mode that motivates dedup-before-split; cf. Lee
    et al. 2022 §6, Dodge et al. 2021 C4 audit).

    bucket = md5_lower64(normalized_text) % 100 (the doc_checksum md5
    discipline — bit-identical to DuckDB's md5_number_lower, so the
    assignment itself is oracle-checkable); split = 'val' iff bucket <
    val_pct. Deterministic, seed-free, and stable under re-runs and
    re-partitioning.

    Scale: a STATELESS linear map, zero exchanges — the class key is
    content-derived so co-assignment needs no groupby. md5 runs once per
    batch-distinct normalized text (Python loop, cardinality-bounded per
    batch); swap in a vectorized md5 kernel if a profile ever shows it."""
    from quant_feature_pipeline_ray.hashing import md5_lower64

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        norm = _normalize_text_series(batch["text"].to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(norm.to_numpy(), return_inverse=True)
        bucket = (md5_lower64(uniq) % np.uint64(100)).astype(np.int64)[inv]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "bucket": bucket,
                "split": np.where(bucket < val_pct, "val", "train"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_dedup_aware_split_sql(sf_dir: str, val_pct: int = 10) -> str:
    return f"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       CAST(md5_number_lower(norm) % 100 AS BIGINT) AS bucket,
       CASE WHEN md5_number_lower(norm) % 100 < {val_pct}
            THEN 'val' ELSE 'train' END AS split
FROM n ORDER BY doc_id"""


# ------------------------------------------------ T5-style span corruption
def doc_span_corrupt(sf_dir: str, mask_num: int = 3, mask_den: int = 20) -> ray.data.Dataset:
    """Span-corruption training-pair builder (the T5 denoising objective,
    Raffel et al. JMLR 2020 §3.1.4): mask ~mask_num/mask_den of each
    document's tokens, collapse each RUN of adjacent masked tokens into one
    `<extra_id_k>` sentinel (k counts spans per doc in order), and emit the
    (corrupted input, target) pair where the target replays the sentinels
    followed by the tokens they hid. Deviation from T5 noted: masking is
    i.i.d. per token (spans emerge from adjacency) rather than Poisson
    mean-3 span sampling — the deterministic, seed-free variant; the
    sentinel/relabel dataflow is identical.

    Mask decision = pure integer hash ((doc_id·P + tpos)·P mod 2^64) %
    mask_den < mask_num — reproducible in SQL HUGEINT, stable across runs
    and re-partitioning (no RNG state to ship).

    Scale: a STATELESS linear map, zero exchanges; the per-doc string
    reassembly is output-bounded (same shape as t_conv_export)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    A = np.uint64(_WIN_PRIME)

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        tok_lists = [t.split(" ") for t in texts]
        n_t = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "corrupted": np.empty(0, dtype=object),
                "target": np.empty(0, dtype=object),
                "n_spans": np.empty(0, dtype=np.int64),
                "n_masked": np.empty(0, dtype=np.int64),
            }
        )
        if len(texts) == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
        doc_of = np.repeat(np.arange(len(texts)), n_t)
        starts = np.concatenate(([0], np.cumsum(n_t[:-1])))
        tpos = np.arange(len(flat)) - starts[doc_of]
        h = (
            doc_ids[doc_of].astype(np.uint64) * A + tpos.astype(np.uint64)
        ) * A
        masked = (h % np.uint64(mask_den)) < np.uint64(mask_num)
        prev_masked = np.zeros(len(flat), dtype=bool)
        prev_masked[1:] = masked[:-1] & (doc_of[1:] == doc_of[:-1])
        first_of_span = masked & ~prev_masked
        # span index within doc: cumulative count of span starts per doc
        cum = np.cumsum(first_of_span.astype(np.int64))
        first_flat_cum = cum - first_of_span.astype(np.int64)  # count BEFORE row
        doc_base = first_flat_cum[starts]
        span_idx = first_flat_cum - doc_base[doc_of]
        sent = np.where(
            first_of_span,
            np.char.add(
                np.char.add("<extra_id_", span_idx.astype("U20")), ">"
            ).astype(object),
            None,
        )
        corrupt_tok = np.where(masked, sent, flat)
        target_tok = np.where(
            first_of_span, np.char.add(np.asarray(sent, dtype="U32"), " ").astype(object), ""
        )
        target_tok = np.where(masked, np.asarray(target_tok, dtype=object) + flat, None)
        dfl = pd.DataFrame(
            {
                "d": doc_of,
                "c": corrupt_tok,
                "t": target_tok,
            }
        )
        g = dfl.groupby("d", sort=True)
        corrupted = g["c"].agg(lambda s: " ".join(x for x in s if x is not None))
        target = g["t"].agg(lambda s: " ".join(x for x in s if x is not None))
        n_spans = pd.Series(first_of_span).groupby(doc_of).sum()
        n_masked = pd.Series(masked).groupby(doc_of).sum()
        return pd.DataFrame(
            {
                "doc_id": doc_ids.astype(np.int64),
                "corrupted": corrupted.reindex(range(len(texts)), fill_value="").to_numpy(),
                "target": target.reindex(range(len(texts)), fill_value="").to_numpy(),
                "n_spans": n_spans.reindex(range(len(texts)), fill_value=0).to_numpy().astype(np.int64),
                "n_masked": n_masked.reindex(range(len(texts)), fill_value=0).to_numpy().astype(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_span_corrupt_sql(sf_dir: str, mask_num: int = 3, mask_den: int = 20) -> str:
    M = _WIN_MOD
    P = _WIN_PRIME
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(tl) AS tok,
         CAST(unnest(range(len(tl))) AS BIGINT) AS tpos
  FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
), m AS (
  SELECT doc_id, tok, tpos,
         ((((CAST(doc_id AS HUGEINT) * {P}) % {M} + tpos) * {P}) % {M})
           % {mask_den} < {mask_num} AS masked
  FROM toks
), runs AS (
  SELECT *,
         masked AND NOT COALESCE(
           lag(masked) OVER (PARTITION BY doc_id ORDER BY tpos), FALSE
         ) AS first_of_span
  FROM m
), idx AS (
  SELECT *,
         SUM(CASE WHEN first_of_span THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY tpos) - 1 AS span_idx
  FROM runs
)
SELECT doc_id,
       COALESCE(string_agg(
         CASE WHEN NOT masked THEN tok
              WHEN first_of_span THEN '<extra_id_' || span_idx || '>' END,
         ' ' ORDER BY tpos), '') AS corrupted,
       COALESCE(string_agg(
         CASE WHEN masked AND first_of_span
                THEN '<extra_id_' || span_idx || '> ' || tok
              WHEN masked THEN tok END,
         ' ' ORDER BY tpos), '') AS target,
       CAST(SUM(CASE WHEN first_of_span THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
FROM idx GROUP BY doc_id ORDER BY doc_id"""


# --------------------------------------------- feature hashing (the trick)
def doc_hash_vectorizer(sf_dir: str, n_dims: int = 64) -> ray.data.Dataset:
    """Hashing-trick bag-of-features vectorizer (Weinberger et al.,
    ICML'09 — sklearn's HashingVectorizer shape): every unigram and
    bigram hashes to a dimension h % n_dims with a ±1 sign from the
    hash's top bit (the signed variant that makes collisions unbiased),
    emitted as sparse (doc_id, dim, weight) triplets. This is the
    vocabulary-free featurizer for corpus-scale quality/language
    classifiers: no vocabulary build, no broadcast state, memory O(1)
    in corpus size — the standard complement to doc_vocab/doc_tfidf_topk
    when the model must train while the corpus streams.

    Exactness: unigram hash = FNV-1a(token + 0x20) (token_fnv64 ==
    oracle's list_reduce), bigram hash = Horner fold h1*P + h2 mod 2^64
    (the doc_winnow gram discipline), sign = 1 - 2·bit63.

    Scale: a STATELESS linear map, zero exchanges — each document's
    triplets are computed entirely inside its scan batch (≤ n_dims rows
    out per doc); downstream trainers consume the triplets with one
    doc_id-keyed exchange."""
    from quant_feature_pipeline_ray.functions.textstats import token_fnv64

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    A = np.uint64(_WIN_PRIME)
    D = np.uint64(n_dims)

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        tok_lists = [t.split(" ") for t in texts]
        n_t = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
        if len(texts) == 0 or int(n_t.sum()) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.empty(0, dtype=np.int64),
                    "dim": np.empty(0, dtype=np.int64),
                    "weight": np.empty(0, dtype=np.int64),
                }
            )
        th = token_fnv64([t for toks in tok_lists for t in toks])
        doc_of_tok = np.repeat(np.arange(len(texts)), n_t)
        # bigrams: adjacent token pairs within one document
        ok = doc_of_tok[:-1] == doc_of_tok[1:] if len(th) > 1 else np.empty(0, dtype=bool)
        bi = th[:-1][ok] * A + th[1:][ok]
        h = np.concatenate([th, bi])
        d_of = np.concatenate([doc_of_tok, doc_of_tok[:-1][ok]])
        sign = 1 - 2 * (h >> np.uint64(63)).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": doc_ids[d_of].astype(np.int64),
                "dim": (h % D).astype(np.int64),
                "weight": sign,
            }
        )
        return out.groupby(["doc_id", "dim"], as_index=False)["weight"].sum()

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_hash_vectorizer_sql(sf_dir: str, n_dims: int = 64) -> str:
    M = _WIN_MOD
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(tl) || ' ' AS tok,
         CAST(unnest(range(len(tl))) AS BIGINT) AS tpos
  FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents)
), th AS (
  SELECT doc_id, tpos, list_reduce(
    list_prepend(CAST({_WIN_OFFSET} AS UBIGINT),
      list_transform(range(1, octet_length(encode(tok)) + 1),
                     i -> CAST(unicode(tok[i]) AS UBIGINT))),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * {_WIN_PRIME}) % {M} AS UBIGINT)
  ) AS h FROM toks
), uni AS (
  SELECT doc_id, CAST(h AS HUGEINT) AS h FROM th
), bi AS (
  SELECT doc_id,
         ((CAST(h AS HUGEINT) * {_WIN_PRIME}) % {M}
          + CAST(lead(h) OVER (PARTITION BY doc_id ORDER BY tpos) AS HUGEINT)) % {M} AS h
  FROM th
  QUALIFY lead(h) OVER (PARTITION BY doc_id ORDER BY tpos) IS NOT NULL
), feats AS (
  SELECT doc_id, h FROM uni UNION ALL SELECT doc_id, h FROM bi
)
SELECT doc_id, CAST(h % {n_dims} AS BIGINT) AS dim,
       CAST(SUM(CASE WHEN h >= 9223372036854775808 THEN -1 ELSE 1 END) AS BIGINT)
         AS weight
FROM feats GROUP BY doc_id, dim
ORDER BY doc_id, dim"""


# ------------------------------------------- random-hyperplane LSH near-dup
def emb_hyperplane_lsh(
    sf_dir: str,
    threshold: float = 0.4,
    num_bits: int = 64,
    num_bands: int = 16,
    seed: int = 7,
) -> pd.DataFrame:
    """Cosine near-dup pairs via RANDOM-HYPERPLANE LSH (SimHash on the
    embedding column) — the third scale path next to the IVF bucketing
    (emb_cosine_dups_ivf) and the exact O(N^2) sweep (emb_cosine_dups,
    the oracle-checked baseline).

      seeded Gaussian hyperplanes H (d x num_bits), broadcast once →
      sign bits per vector → banded keys (num_bands bands of
      num_bits/num_bands bits) → ONE shuffle on the hashed band-key space →
      exact pairwise cosine verify inside each band bucket (buckets
      segmented INSIDE hash partitions — never one map_groups per tiny
      bucket) → distributed pair dedup.

    P[band collision] = (1 - theta/pi)^bits_per_band, so bits_per_band
    trades recall against bucket size: the default (4 bits x 16 bands) is
    tuned for this fixture's low 0.4 threshold; a production 0.9+ near-dup
    threshold wants 8-16 bits per band, giving exponentially finer buckets.
    Recall >= 0.9 vs the exact sweep is gated in
    tests/test_training_data.py."""
    bpb = num_bits // num_bands
    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    n_parts = max(8, cluster_cpus())
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    d = len(ds.limit(1).to_pandas()["embedding"].iloc[0])
    H = np.random.default_rng(seed).standard_normal((d, num_bits))
    h_ref = ray.put(H)
    weights = (1 << np.arange(bpb, dtype=np.int64))[None, :]

    class BandKeys:
        def __init__(self, ref):
            self.H = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
            bits = (u @ self.H) > 0  # (n, num_bits)
            n = len(m)
            # band-major fan-out as ONE arrow take — the embedding column
            # crosses the exchange as arrow list<float>, never as pickled
            # Python object rows (16x the rows makes that cost real)
            keys = np.empty(n * num_bands, dtype=np.int64)
            for b in range(num_bands):
                val = (bits[:, b * bpb : (b + 1) * bpb] @ weights.T).ravel()
                keys[b * n : (b + 1) * n] = (np.int64(b) << np.int64(bpb)) | val
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), num_bands))
            rep = batch.select(["vec_id", "embedding"]).take(idx)
            return rep.append_column("key", pa.array(keys))

    keyed = ds.map_batches(
        BandKeys, fn_constructor_args=(h_ref,), batch_format="pyarrow", concurrency=2
    )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # segment by exact band key INSIDE the hash partition (thousands of
        # tiny buckets would cost ~10ms each as map_groups calls)
        for _, g in df.groupby("key", sort=False):
            if len(g) < 2:
                continue
            vids = g["vec_id"].to_numpy().astype(np.int64)
            order = np.argsort(vids)
            vids = vids[order]
            m = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
            u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
            sims = np.round(u @ u.T, 6)
            ai, bi = np.nonzero(np.triu(sims >= threshold, k=1) & (vids[:, None] < vids[None, :]))
            if len(ai):
                outs.append(
                    pd.DataFrame({"vec_a": vids[ai], "vec_b": vids[bi], "sim": sims[ai, bi]})
                )
        return pd.concat(outs, ignore_index=True) if outs else _empty()

    def add_pk(b: pa.Table) -> pa.Table:
        a = b["vec_a"].to_numpy().astype(np.uint64)
        c = b["vec_b"].to_numpy().astype(np.uint64)
        pk = ((a * np.uint64(0x9E3779B97F4A7C15) ^ c) % np.uint64(n_parts)).astype(np.int32)
        return b.append_column("pk", pa.array(pk))

    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["vec_a", "vec_b"], ignore_index=True).drop(columns=["pk"])

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    verified = partition_map_groups(
        keyed, verify_partition, key="key", num_buckets=n_parts
    )
    out = (
        verified.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup_partition, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _empty()
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)


# ----------------------------------------------------- curation funnel ops
def doc_quality_filter(
    sf_dir: str,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> ray.data.Dataset:
    """C4-style heuristic quality filter (the canonical pre-training
    curation funnel): length floor, gibberish ceiling (mean token length),
    stopword floor. Stateless map_batches — composes the exact
    integer-ratio stats of doc_token_stats and keeps only survivors, so
    the filter is bitwise-reproducible against the SQL oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        st = token_counts(texts)
        st["stopword_hits"] = stopword_hits(texts)
        keep = (
            (st["n_tokens"].to_numpy() >= min_tokens)
            & (st["token_chars"].to_numpy() / st["n_tokens"].to_numpy() <= max_mean_token_len)
            & (st["stopword_hits"].to_numpy() / st["n_tokens"].to_numpy() >= min_stopword_ratio)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[keep],
                "lang": batch["lang"].to_numpy(zero_copy_only=False)[keep],
                "n_tokens": st["n_tokens"].to_numpy()[keep],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_quality_filter_sql(
    sf_dir: str,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS BIGINT) AS sw_hits
  FROM documents
)
SELECT doc_id, lang, n_tokens
FROM s
WHERE n_tokens >= {min_tokens}
  AND token_chars / n_tokens <= {max_mean_token_len}
  AND sw_hits / n_tokens >= {min_stopword_ratio}
ORDER BY doc_id"""


_BLOCKLIST = ("slow", "dup", "leak", "spark")


def doc_blocklist_filter(sf_dir: str, words: tuple = _BLOCKLIST) -> ray.data.Dataset:
    """Lexicon/blocklist safety filter — the C4 "bad words" curation stage
    (Raffel et al. 2020 §2.2 dropped any page containing a blocklist word;
    reference analogue: the reference has no safety stage, this is part of
    the LLM-curation surface): count word-boundary blocklist matches in
    each document and emit the per-doc verdict (strict C4 rule: keep only
    zero-match docs) plus the match count and rate, so downstream can
    either hard-drop or threshold.

    Implemented as an ACTOR-POOL stage: the alternation regex
    \\b(w1|w2|...)\\b is compiled ONCE per actor in __init__ (the lexicon in
    production is thousands of terms — per-batch recompile would dominate),
    batches scan vectorized via pandas' C regex loop. The lexicon is tiny
    and travels in the actor constructor (broadcast once), never per batch.

    Exactness: word-boundary literal alternation agrees between Python re
    and DuckDB's RE2 (no backtracking constructs); token counting mirrors
    doc_token_stats' split discipline."""
    import re

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Scanner:
        def __init__(self, words):
            self.pat = re.compile(r"\b(?:" + "|".join(map(re.escape, words)) + r")\b")

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            texts = batch["text"].to_pandas()
            n_blocked = texts.str.count(self.pat).astype(np.int64)
            n_tokens = texts.str.count(" ").astype(np.int64) + 1
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                    "n_blocked": n_blocked,
                    "n_tokens": n_tokens,
                    "blocked_rate": np.round(n_blocked / n_tokens, 6),
                    "keep": (n_blocked == 0).to_numpy(),
                }
            )

    return ds.map_batches(
        Scanner, fn_constructor_args=(words,), batch_format="pyarrow", concurrency=2
    )


def doc_blocklist_filter_sql(sf_dir: str, words: tuple = _BLOCKLIST) -> str:
    pat = r"\b(?:" + "|".join(words) + r")\b"
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_blocked,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       round(len(regexp_extract_all(text, '{pat}'))
             / (length(text) - length(replace(text, ' ', '')) + 1), 6) AS blocked_rate,
       len(regexp_extract_all(text, '{pat}')) = 0 AS keep
FROM documents ORDER BY doc_id"""


def doc_gopher_rules(
    sf_dir: str,
    min_words: int = 40,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 4.5,
    min_stop_hits: int = 3,
    min_distinct_ratio: float = 0.45,
    max_top_word_frac: float = 0.09,
) -> ray.data.Dataset:
    """Gopher-style quality-rule battery (Rae et al. 2021 arXiv:2112.11446
    Appendix A — the canonical pre-training heuristic filter set): per-doc
    word-count bounds, mean-word-length bounds, stop-word floor, distinct-
    word-ratio floor (their duplicate-content family) and most-common-word
    dominance ceiling, each emitted as its OWN boolean flag plus the raw
    statistic so downstream can audit which rule fired — the difference
    from doc_quality_filter (a single keep verdict over 3 rules) is the
    per-rule diagnostic surface, which is what a curation run tunes
    against. Thresholds are adapted to the synthetic corpus (Gopher's
    [3,10] mean-length band never fires here) but keep the paper's rule
    shapes; reference analogue: the reference has no quality stage — this
    is part of the LLM-curation surface.

    Stateless vectorized map_batches: composes token_counts /
    stopword_hits (shared with doc_token_stats, exact-integer discipline);
    the only bounded-python term is the per-doc top-word multiplicity
    (Counter over that doc's tokens). All ratios are IEEE double divisions
    of the same integers on both engine and oracle sides — bitwise, no
    rounding needed."""
    from collections import Counter

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        st = token_counts(texts)
        sh = stopword_hits(texts)
        top_c = (
            texts.str.split(" ")
            .map(lambda t: max(Counter(t).values()))
            .to_numpy(dtype=np.int64)
        )
        n = st["n_tokens"].to_numpy()
        mean_len = st["token_chars"].to_numpy() / n
        dr = st["distinct_tokens"].to_numpy() / n
        twf = top_c / n
        r_wordcount = (n >= min_words) & (n <= max_words)
        r_meanlen = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
        r_stopwords = sh >= min_stop_hits
        r_distinct = dr >= min_distinct_ratio
        r_topword = twf <= max_top_word_frac
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                "n_words": n,
                "mean_word_len": mean_len,
                "stop_hits": sh,
                "distinct_ratio": dr,
                "top_word_frac": twf,
                "r_wordcount": r_wordcount,
                "r_meanlen": r_meanlen,
                "r_stopwords": r_stopwords,
                "r_distinct": r_distinct,
                "r_topword": r_topword,
                "keep": r_wordcount & r_meanlen & r_stopwords & r_distinct & r_topword,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_gopher_rules_sql(
    sf_dir: str,
    min_words: int = 40,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 4.5,
    min_stop_hits: int = 3,
    min_distinct_ratio: float = 0.45,
    max_top_word_frac: float = 0.09,
) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), pw AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS tc,
         CAST(sum(CASE WHEN w IN ({sw}) THEN c ELSE 0 END) AS BIGINT) AS sh
  FROM pw GROUP BY doc_id
), base AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars
  FROM documents
)
SELECT b.doc_id,
       b.n_words,
       b.token_chars / b.n_words AS mean_word_len,
       a.sh AS stop_hits,
       a.nd / b.n_words AS distinct_ratio,
       a.tc / b.n_words AS top_word_frac,
       (b.n_words >= {min_words} AND b.n_words <= {max_words}) AS r_wordcount,
       (b.token_chars / b.n_words >= {min_mean_len}
        AND b.token_chars / b.n_words <= {max_mean_len}) AS r_meanlen,
       a.sh >= {min_stop_hits} AS r_stopwords,
       a.nd / b.n_words >= {min_distinct_ratio} AS r_distinct,
       a.tc / b.n_words <= {max_top_word_frac} AS r_topword,
       ((b.n_words >= {min_words} AND b.n_words <= {max_words})
        AND (b.token_chars / b.n_words >= {min_mean_len}
             AND b.token_chars / b.n_words <= {max_mean_len})
        AND a.sh >= {min_stop_hits}
        AND a.nd / b.n_words >= {min_distinct_ratio}
        AND a.tc / b.n_words <= {max_top_word_frac}) AS keep
FROM base b JOIN agg a USING (doc_id)
ORDER BY b.doc_id"""


def doc_pack_sequences(
    sf_dir: str, context_len: int = 512, num_partitions: int = 32
) -> ray.data.Dataset:
    """Greedy sequence packing (sample packing for pre-training): assign
    docs to fixed-budget context windows of `context_len` tokens,
    first-fit in doc_id order WITHIN each hash partition.

    The packing recurrence (cumsum with reset at the budget) is inherently
    sequential, so it parallelizes per partition — each partition packs its
    own docs independently and bin ids are made globally unique as
    (partition << 32) | local_bin. Oversized docs (> context_len) get their
    own bin, truncation flagged. Deterministic: same input → same packing.
    The partition key is md5(doc_id)[:8] % P (the doc_stratified_sample
    discipline) rather than the engine SipHash, so the whole op — partition
    assignment AND the reset recurrence — has an EXACT oracle: the
    recurrence replays as a rank-indexed RECURSIVE CTE (promoted from
    rows-only in round 5); straight-line invariants remain in
    tests/test_training_data.py."""
    import hashlib

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pd.DataFrame:
        st = token_counts(batch["text"].to_pandas())
        ids = batch["doc_id"].to_numpy()
        part = np.fromiter(
            (
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % num_partitions
                for d in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        return pd.DataFrame(
            {"doc_id": ids, "n_tokens": st["n_tokens"].to_numpy(), "part": part}
        )

    def pack_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", ignore_index=True)
        part = int(df["part"].iat[0]) if len(df) else 0
        toks = np.minimum(df["n_tokens"].to_numpy(), context_len)
        n = len(toks)
        bin_id = np.empty(n, dtype=np.int64)
        offset = np.empty(n, dtype=np.int64)
        cur_bin, cur_fill = 0, 0
        # sequential first-fit within the partition: O(n) python loop over
        # a cumsum-with-reset recurrence — the one loop the semantics force;
        # partitions pack in parallel, so per-task n stays bounded
        for i in range(n):
            t = int(toks[i])
            if cur_fill + t > context_len and cur_fill > 0:
                cur_bin += 1
                cur_fill = 0
            bin_id[i] = cur_bin
            offset[i] = cur_fill
            cur_fill += t
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": df["n_tokens"].to_numpy(),
                "packed_tokens": toks,
                "truncated": (df["n_tokens"].to_numpy() > context_len).astype(np.int64),
                "bin_id": (np.int64(part) << np.int64(32)) | bin_id,
                "bin_offset": offset,
            }
        )

    # one exchange on the md5 partition key; each part packs independently
    return (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_partition, batch_format="pandas")
    )


def doc_pack_sequences_sql(sf_dir: str, context_len: int = 512, num_partitions: int = 32) -> str:
    """Exact recursive-CTE replay of the first-fit packing recurrence:
    same md5 partition key, same doc_id order within a partition, same
    reset-at-budget carry of (local_bin, fill)."""
    return f"""
WITH RECURSIVE s AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              % {num_partitions} AS BIGINT) AS part
  FROM documents
), r AS (
  SELECT doc_id, n_tokens, part, least(n_tokens, {context_len}) AS t,
         row_number() OVER (PARTITION BY part ORDER BY doc_id) AS rn
  FROM s
), walk AS (
  SELECT part, rn, doc_id, n_tokens, t,
         CAST(0 AS BIGINT) AS local_bin, CAST(0 AS BIGINT) AS bin_offset, t AS fill
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.part, r.rn, r.doc_id, r.n_tokens, r.t,
         CASE WHEN w.fill + r.t > {context_len} AND w.fill > 0
              THEN w.local_bin + 1 ELSE w.local_bin END,
         CASE WHEN w.fill + r.t > {context_len} AND w.fill > 0
              THEN 0 ELSE w.fill END,
         CASE WHEN w.fill + r.t > {context_len} AND w.fill > 0
              THEN r.t ELSE w.fill + r.t END
  FROM r JOIN walk w ON r.part = w.part AND r.rn = w.rn + 1
)
SELECT doc_id, n_tokens, t AS packed_tokens,
       CAST(n_tokens > {context_len} AS BIGINT) AS truncated,
       (part << 32) | local_bin AS bin_id,
       bin_offset
FROM walk ORDER BY doc_id"""


def doc_curation_funnel(
    sf_dir: str,
    threshold: float = 0.82,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> ray.data.Dataset:
    """The composed end-to-end curation funnel — what a pre-training data
    pipeline actually runs, as ONE dataflow:

      quality filter (C4-style heuristics)
      ∩ exact-dedup representative (min doc_id per identical text)
      ∖ near-dup victims (doc_b of every verified Jaccard pair — the
        deterministic higher-id-loses rule, so removal is SQL-expressible
        and independent of discovery order)

    Scale shape: the three legs are each scale-safe pipelines already
    (stateless filter; hash-only exact dedup; LSH-blocked verified pairs),
    and the composition is ONE tagged-union grouped_aggregate on doc_id —
    no driver-side key sets, no broadcast of anything corpus-sized."""
    filt = doc_quality_filter(sf_dir, min_tokens, max_mean_token_len, min_stopword_ratio)

    def tag_f(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "n_tokens": batch["n_tokens"].to_numpy(),
                "f": np.ones(len(batch), dtype=np.int64),
                "r": np.zeros(len(batch), dtype=np.int64),
                "v": np.zeros(len(batch), dtype=np.int64),
            }
        )

    reps = doc_exact_dedup(sf_dir)

    def tag_r(batch: pa.Table) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame(
            {
                "doc_id": batch["rep_doc_id"].to_numpy(),
                "lang": [""] * n,
                "n_tokens": np.zeros(n, dtype=np.int64),
                "f": np.zeros(n, dtype=np.int64),
                "r": np.ones(n, dtype=np.int64),
                "v": np.zeros(n, dtype=np.int64),
            }
        )

    # victims via the linear-output path: one mark per doc, never the
    # Θ(clique²) pair set (2.4 M pairs / 130 s on the clique-heavy sf0.1
    # fixture; lsh_victims applies the identical higher-id-loses rule)
    victims = lsh_victims(sf_dir, threshold=threshold)

    def tag_v(batch: pa.Table) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "lang": [""] * n,
                "n_tokens": np.zeros(n, dtype=np.int64),
                "f": np.zeros(n, dtype=np.int64),
                "r": np.zeros(n, dtype=np.int64),
                "v": np.ones(n, dtype=np.int64),
            }
        )

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    tagged = (
        filt.map_batches(tag_f, batch_format="pyarrow")
        .union(reps.map_batches(tag_r, batch_format="pyarrow"))
        .union(victims.map_batches(tag_v, batch_format="pyarrow"))
    )
    agg = grouped_aggregate(
        tagged,
        "doc_id",
        {
            "lang": ("lang", "max"),
            "n_tokens": ("n_tokens", "max"),
            "f": ("f", "max"),
            "r": ("r", "max"),
            "v": ("v", "max"),
        },
    )
    return agg.filter(expr="f == 1 and r == 1 and v == 0").drop_columns(["f", "r", "v"])


def doc_funnel_ablation(
    sf_dir: str,
    threshold: float = 0.82,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> ray.data.Dataset:
    """Funnel ATTRIBUTION table — the Venn breakdown of the curation
    funnel's three stages (quality filter, exact-dedup representative,
    near-dup victim): for every flag combination, how many documents land
    there and whether that cell survives the composed funnel. This is the
    table a curation run reads to learn WHICH stage is doing the cutting
    (a funnel that reports only its final count hides e.g. a quality
    filter that silently drops 40% — the top tuning mistake).

    Same three scale-safe legs as doc_curation_funnel, composed by the
    identical tagged-union grouped_aggregate on doc_id; the per-doc flag
    rows then collapse through a per-batch 3-bit-key combiner into an
    8-row exchange. Nothing corpus-sized reaches the driver."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def tag(col: str):
        def fn(batch: pa.Table) -> pd.DataFrame:
            key = {"b": "doc_id", "f": "doc_id", "r": "rep_doc_id", "v": "doc_id"}[col]
            n = batch.num_rows
            out = pd.DataFrame({"doc_id": batch[key].to_numpy().astype(np.int64)})
            for c in ("b", "f", "r", "v"):
                out[c] = np.full(n, np.int64(1 if c == col else 0))
            return out

        return fn

    legs = (
        base.map_batches(tag("b"), batch_format="pyarrow")
        .union(
            doc_quality_filter(sf_dir, min_tokens, max_mean_token_len, min_stopword_ratio)
            .select_columns(["doc_id"])
            .map_batches(tag("f"), batch_format="pyarrow")
        )
        .union(
            doc_exact_dedup(sf_dir)
            .select_columns(["rep_doc_id"])
            .map_batches(tag("r"), batch_format="pyarrow")
        )
        .union(
            lsh_victims(sf_dir, threshold=threshold).map_batches(
                tag("v"), batch_format="pyarrow"
            )
        )
    )
    flags = grouped_aggregate(
        legs,
        "doc_id",
        {"b": ("b", "max"), "f": ("f", "max"), "r": ("r", "max"), "v": ("v", "max")},
    )

    def combine(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["b"] == 1]
        df["k"] = df["f"] * 4 + df["r"] * 2 + df["v"]
        g = df.groupby("k", sort=False).size()
        return pd.DataFrame({"k": g.index.to_numpy(), "n_docs": g.to_numpy()})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("k", sort=True, as_index=False)["n_docs"].sum()
        k = a["k"].to_numpy()
        a["f_pass"] = (k & 4) > 0
        a["is_rep"] = (k & 2) > 0
        a["is_victim"] = (k & 1) > 0
        a["kept"] = a["f_pass"] & a["is_rep"] & ~a["is_victim"]
        return a.drop(columns=["k"])

    return partition_map_groups(
        flags.map_batches(combine, batch_format="pyarrow"), finish, key="k", num_buckets=2
    )


def doc_funnel_ablation_sql(
    sf_dir: str,
    threshold: float = 0.82,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS BIGINT) AS sw_hits
  FROM documents
),
q AS (
  SELECT doc_id FROM s
  WHERE n_tokens >= {min_tokens}
    AND token_chars / n_tokens <= {max_mean_token_len}
    AND sw_hits / n_tokens >= {min_stopword_ratio}
),
reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
tk AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
victims AS (
  SELECT DISTINCT b.doc_id
  FROM tk a JOIN tk b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {threshold}
),
flags AS (
  SELECT d.doc_id,
         d.doc_id IN (SELECT doc_id FROM q) AS f_pass,
         d.doc_id IN (SELECT doc_id FROM reps) AS is_rep,
         d.doc_id IN (SELECT doc_id FROM victims) AS is_victim
  FROM documents d
)
SELECT CAST(count(*) AS BIGINT) AS n_docs, f_pass, is_rep, is_victim,
       (f_pass AND is_rep AND NOT is_victim) AS kept
FROM flags GROUP BY f_pass, is_rep, is_victim
ORDER BY f_pass, is_rep, is_victim"""


def doc_curation_funnel_sql(
    sf_dir: str,
    threshold: float = 0.82,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS BIGINT) AS sw_hits
  FROM documents
),
q AS (
  SELECT doc_id, lang, n_tokens FROM s
  WHERE n_tokens >= {min_tokens}
    AND token_chars / n_tokens <= {max_mean_token_len}
    AND sw_hits / n_tokens >= {min_stopword_ratio}
),
reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
tk AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
victims AS (
  SELECT DISTINCT b.doc_id
  FROM tk a JOIN tk b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {threshold}
)
SELECT q.doc_id, q.lang, q.n_tokens
FROM q
WHERE q.doc_id IN (SELECT doc_id FROM reps)
  AND q.doc_id NOT IN (SELECT doc_id FROM victims)
ORDER BY q.doc_id"""


def emb_label_centroids(sf_dir: str) -> ray.data.Dataset:
    """Vector aggregate: per-label centroid of the embedding column.

    Per-batch partial = one matmul (one-hot-label.T @ matrix) producing a
    d-wide sum row per label per batch → grouped_aggregate over the d sum
    columns + count → mean per dimension, emitted LONG (label, dim, mean)
    so the SQL oracle (CROSS JOIN range(d), avg(embedding[dim])) compares
    row-for-row. round(,6) absorbs float-sum ordering across the exchange."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    d = len(ds.limit(1).to_pandas()["embedding"].iloc[0])

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        onehot = np.zeros((len(uniq), len(labels)), dtype=np.float64)
        onehot[inv, np.arange(len(labels))] = 1.0
        sums = onehot @ m  # (n_labels, d)
        out = pd.DataFrame({"label": uniq, "n": np.bincount(inv).astype(np.int64)})
        for j in range(d):
            out[f"s{j}"] = sums[:, j]
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    aggs = {"n": ("n", "sum")}
    for j in range(d):
        aggs[f"s{j}"] = (f"s{j}", "sum")
    agg = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"), "label", aggs)

    def melt(batch: pa.Table) -> pd.DataFrame:
        labels = batch["label"].to_numpy()
        n = batch["n"].to_numpy().astype(np.float64)
        k = len(labels)
        sums = np.column_stack([batch[f"s{j}"].to_numpy() for j in range(d)])
        return pd.DataFrame(
            {
                "label": np.repeat(labels, d).astype(np.int64),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), k),
                "mean": np.round((sums / n[:, None]).ravel(), 6),
            }
        )

    return agg.map_batches(melt, batch_format="pyarrow")


def emb_label_centroids_sql(sf_dir: str, d: int = 64) -> str:
    return f"""
SELECT CAST(label AS BIGINT) AS label,
       CAST(r.dim AS BIGINT) AS dim,
       round(avg(embedding[r.dim]), 6) AS mean
FROM embeddings CROSS JOIN range(1, {d + 1}) r(dim)
GROUP BY label, r.dim
ORDER BY label, dim"""


def doc_tfidf_topk(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-doc top-k TF-IDF terms: the global document-frequency table
    (vocabulary-bounded, built by the doc_vocab dataflow) is collected once
    and BROADCAST via ray.put — the canonical computed-dimension pattern —
    then each batch scores and ranks its own docs locally: tokenize →
    per-(doc, token) tf → idf lookup → top-k by (rounded score desc,
    token asc). Docs never span batches, so there is NO second shuffle.
    round(,6) on the score makes the rank deterministic in both engines."""
    dfreq = doc_vocab(sf_dir, min_count=1).to_pandas()  # vocabulary-bounded
    n_docs = int(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    )
    df_ref = ray.put(dict(zip(dfreq["token"], dfreq["df"].astype(np.int64))))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Score:
        def __init__(self, ref):
            self.df = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            split = pc.split_pattern(batch["text"], " ")
            flat = pc.list_flatten(split)
            parent = pc.list_parent_indices(split)
            keep = pc.not_equal(flat, "")
            pairs = pd.DataFrame(
                {
                    "d": parent.filter(keep).to_pandas(),
                    "token": flat.filter(keep).to_pandas(),
                }
            )
            tf = pairs.groupby(["d", "token"], as_index=False).agg(tf=("token", "size"))
            tf["tf"] = tf["tf"].astype(np.int64)
            dfv = tf["token"].map(self.df).to_numpy(dtype=np.float64)
            tf["score"] = np.round(tf["tf"].to_numpy() * np.log(float(n_docs) / dfv), 6)
            tf = tf.sort_values(["d", "score", "token"], ascending=[True, False, True])
            top = tf.groupby("d", as_index=False, sort=False).head(k).reset_index(drop=True)
            top["rank"] = top.groupby("d").cumcount().astype(np.int64) + 1
            top["doc_id"] = batch["doc_id"].to_numpy()[top["d"].to_numpy()]
            return top[["doc_id", "rank", "token", "tf", "score"]]

    return ds.map_batches(Score, fn_constructor_args=(df_ref,), batch_format="pyarrow", concurrency=2)


def doc_tfidf_topk_sql(sf_dir: str, k: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df
  FROM toks WHERE token <> '' GROUP BY token
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln(n.n / dfreq.df), 6) AS score
  FROM tf, dfreq, n WHERE tf.token = dfreq.token
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, score
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank
  FROM scored
)
WHERE rank <= {k}
ORDER BY doc_id, rank"""


def doc_distinct_tokens_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate global distinct-token count via a distributed
    HyperLogLog (functions/sketches.py): per-batch register partials
    (one (register, rho) row per NON-ZERO register per batch) → ONE
    grouped_aggregate max over the register space → O(m) driver
    estimate. The sketch is the scale path for unbounded keyspaces where
    the exact value-counts histogram (bounded-cardinality tool) cannot
    fit; accuracy vs the exact count is pytest-gated at 5% (sketch std
    error ~1.6% at m=4096).

    The token hash is md5-lower-64 (the doc_checksum discipline) so the
    DuckDB oracle reproduces the registers — and therefore the ESTIMATE —
    bit-for-bit: the register sum is carried as an exact Python/HUGEINT
    integer (Σ 2^(52−rho), never a float accumulation whose order could
    differ), the final α·m²·2^52/S division and the linear-counting
    ln() are single IEEE ops identical across numpy-free Python and
    DuckDB. md5 runs per DISTINCT token per batch (vocabulary-bounded,
    not row-bounded)."""
    import math

    from quant_feature_pipeline_ray.functions.sketches import HLL_M, HLL_P, hll_registers
    from quant_feature_pipeline_ray.hashing import md5_lower64
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        keep = pc.not_equal(flat, "")
        toks = np.unique(flat.filter(keep).to_numpy(zero_copy_only=False))
        reg = hll_registers(md5_lower64(toks))
        nz = np.flatnonzero(reg)
        return pd.DataFrame({"register": nz.astype(np.int64), "rho": reg[nz].astype(np.int64)})

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        "register",
        {"rho": ("rho", "max")},
    ).to_pandas()  # <= m = 4096 rows, never row-scaled
    reg = np.zeros(HLL_M, dtype=np.uint8)
    reg[merged["register"].to_numpy()] = merged["rho"].to_numpy().astype(np.uint8)
    rest = 64 - HLL_P
    # exact integer register sum: S = Σ 2^(rest − rho) over all m registers
    s_int = sum((1 << (rest - int(r))) for r in reg)
    zeros = int(np.count_nonzero(reg == 0))
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M * float(1 << rest) / float(s_int)
    if est <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * math.log(HLL_M / zeros)  # linear counting
    return pd.DataFrame({"distinct_tokens_est": [est]})


def doc_distinct_tokens_hll_sql(sf_dir: str) -> str:
    """Bit-exact SQL mirror of the HLL estimate: same md5-lower-64 hash
    (md5_number_lower), same exact-integer register sum in HUGEINT, same
    single-division / ln() float tail."""
    from quant_feature_pipeline_ray.functions.sketches import HLL_M, HLL_P

    m, rest = HLL_M, 64 - HLL_P
    two_rest = float(1 << rest)
    return f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
), h AS (
  SELECT md5_number_lower(token) AS h FROM toks WHERE token <> ''
), reg AS (
  SELECT CAST(h >> {rest} AS BIGINT) AS register,
         CAST(h & ((CAST(1 AS UBIGINT) << {rest}) - 1) AS UBIGINT) AS w
  FROM h
), rho AS (
  SELECT register,
         MAX(CASE WHEN w = 0 THEN {rest + 1}
                  ELSE {rest} - length(bin(w)) + 1 END) AS rho
  FROM reg GROUP BY register
), s AS (
  SELECT SUM(CAST(1 AS HUGEINT) << ({rest} - rho)) AS s_nz, COUNT(*) AS n_nz
  FROM rho
), est AS (
  SELECT (0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)} * {two_rest}
           / CAST(s_nz + ({m} - n_nz) * (CAST(1 AS HUGEINT) << {rest}) AS DOUBLE)
           AS raw,
         {m} - n_nz AS zeros
  FROM s
)
SELECT CASE WHEN raw <= {2.5 * m} AND zeros > 0
            THEN {float(m)} * ln({float(m)} / zeros)
            ELSE raw END AS distinct_tokens_est
FROM est"""


def lsh_victims(
    sf_dir: str,
    threshold: float = 0.82,
    num_perm: int = 64,
    num_bands: int = 32,
    shingle_k: int = 1,
) -> ray.data.Dataset:
    """Near-dup VICTIM set (docs with any lower-id Jaccard match) — the
    linear-output companion to lsh_verified_pairs.

    On clique-heavy corpora the pair set is Θ(clique²) (measured: 2.4 M
    pairs from 5 k docs on the sf0.1 fixture, 130 s mostly materializing
    them), but dedup REMOVAL only needs one bit per doc. Same band
    dataflow; the in-bucket verify marks column-wise any-match instead of
    enumerating pairs, and the output dedup is a doc_id grouped_aggregate.
    Exactly the funnel's higher-id-loses rule, so doc_curation_funnel
    keeps its oracle while dropping the quadratic intermediate."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from quant_feature_pipeline_ray.functions.dedupfns import _token_hashes

            ids = batch["doc_id"].to_numpy()
            texts = batch["text"].to_pylist()
            sigs = self.mh.signatures_batch(texts, k=shingle_k)
            keys = self.mh.band_keys_batch(sigs, num_bands=num_bands)
            # ride the DISTINCT TOKEN-HASH SET along instead of raw text:
            # set Jaccard is invariant under the (injective-in-practice)
            # 64-bit token hash — smaller exchange bytes and no per-bucket
            # re-tokenization across the num_bands copies
            tok_sets = [np.unique(_token_hashes(t.split(" "))).view(np.int64) for t in texts]
            n = len(ids)
            b = num_bands
            return pa.table(
                {
                    "band": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
                    "key": pa.array(keys.reshape(-1).view(np.int64)),
                    "doc_id": pa.array(np.repeat(ids, b)),
                    "toks": pa.array(
                        [tok_sets[i] for i in range(n) for _ in range(b)],  # doc-major
                        type=pa.list_(pa.int64()),
                    ),
                }
            )

    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus

    n_parts = max(8, cluster_cpus())
    exploded = docs.map_batches(Signer, batch_format="pyarrow", concurrency=2)

    def add_gk(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy().view(np.uint64)
        band = b["band"].to_numpy().astype(np.uint64)
        gk = ((key * np.uint64(0x9E3779B97F4A7C15) + band) % np.uint64(n_parts)).astype(
            np.int32
        )
        return b.append_column("gk", pa.array(gk))

    def victims_in_group(g: pd.DataFrame) -> np.ndarray:
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:
            return ids[:0]
        order = np.argsort(ids)
        ids = ids[order]
        tok_arrays = list(g["toks"].to_numpy()[order])  # int64 hash sets
        counts = np.fromiter((len(a) for a in tok_arrays), dtype=np.int64, count=len(ids))
        vocab, inv = np.unique(np.concatenate(tok_arrays), return_inverse=True)
        m = len(ids)
        M = np.zeros((m, len(vocab)), dtype=np.float32)
        M[np.repeat(np.arange(m), counts), inv] = 1.0
        inter = (M @ M.T).astype(np.int64)
        union = counts[:, None] + counts[None, :] - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        hit = np.triu(jac >= threshold, k=1)  # row i < col j by id order
        return ids[hit.any(axis=0)]

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["band", "key"], kind="mergesort", ignore_index=True)
        band = df["band"].to_numpy()
        key = df["key"].to_numpy()
        n = len(df)
        gb = np.empty(n, dtype=bool)
        gb[0] = True
        gb[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(gb)
        ends = np.append(starts[1:], n)
        # near-identical cliques collide in EVERY band, so the same doc-set
        # bucket reappears once per band that hashed into this partition —
        # identical doc sets produce identical victim sets, verify each once
        seen: set[bytes] = set()
        hits = []
        ids_all = df["doc_id"].to_numpy()
        for a, b in zip(starts, ends):
            if b - a < 2:
                continue
            sig = np.sort(ids_all[a:b]).tobytes()
            if sig in seen:
                continue
            seen.add(sig)
            hits.append(victims_in_group(df.iloc[a:b]))
        v = np.unique(np.concatenate(hits)) if hits else np.empty(0, dtype=np.int64)
        return pd.DataFrame({"doc_id": v.astype(np.int64)})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    marked = (
        exploded.map_batches(add_gk, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(verify_partition, batch_format="pandas")
    )
    # a doc can be marked in several bands/partitions -> distinct doc_id
    return grouped_aggregate(marked, "doc_id", {"n": ("doc_id", "size")}).drop_columns(["n"])


# ------------------------------------------------------- chunking & sampling
def doc_chunk(sf_dir: str, chunk_tokens: int = 30) -> ray.data.Dataset:
    """Sequence chunking (the pretraining window-packing precursor): split
    every document into consecutive `chunk_tokens`-token chunks, one output
    row per chunk — the flat_map shape (1 row in, ceil(n/c) rows out).

    Pure per-batch transform, no shuffle; chunk boundaries are token
    offsets, so the output is deterministic and exactly reproducible in SQL
    (DuckDB list_slice oracle). Cost is O(total tokens); the chunk-assembly
    loop iterates CHUNKS (not characters): at 100 TB this stage streams and
    scales embarrassingly."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    c = chunk_tokens

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        out_id, out_ci, out_tx, out_nt = [], [], [], []
        for did, t in zip(doc_ids, texts):
            toks = t.split(" ")
            n = len(toks)
            n_chunks = (n + c - 1) // c
            for ci in range(n_chunks):
                seg = toks[ci * c : (ci + 1) * c]
                out_id.append(did)
                out_ci.append(ci)
                out_tx.append(" ".join(seg))
                out_nt.append(len(seg))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, dtype=np.int64),
                "chunk_idx": np.asarray(out_ci, dtype=np.int64),
                "chunk_text": out_tx,
                "n_tokens": np.asarray(out_nt, dtype=np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_chunk_sql(sf_dir: str, chunk_tokens: int = 30) -> str:
    c = chunk_tokens
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
SELECT doc_id,
       u.ci AS chunk_idx,
       array_to_string(list_slice(tk, ci * {c} + 1, least((ci + 1) * {c}, len(tk))), ' ') AS chunk_text,
       CAST(least((ci + 1) * {c}, len(tk)) - ci * {c} AS BIGINT) AS n_tokens
FROM toks, UNNEST(range(0, CAST(ceil(len(tk) / {c}.0) AS BIGINT))) AS u(ci)
ORDER BY doc_id, chunk_idx"""


DEFAULT_SAMPLE_RATES = {"en": 0.5, "zh": 1.0, "fr": 0.25, "es": 0.25, "de": 0.75}


def doc_stratified_sample(
    sf_dir: str, rates: dict[str, float] | None = None
) -> ray.data.Dataset:
    """Deterministic stratified sampling: keep each doc with per-language
    probability `rates[lang]`, decided by a content-independent hash of the
    doc_id — the standard reproducible downsampling/upsampling primitive for
    corpus mixing.

    Selection = md5(doc_id)[:8] as uint32 / 2^32 < rate. md5 is chosen
    because the DuckDB oracle computes the IDENTICAL bytes (md5 is
    bit-stable everywhere), making an approximate-looking operator exactly
    checkable. At scale the only change is swapping md5 for a vectorized
    64-bit hash (the engine's content_hash) — the dataflow (stateless
    map_batches filter, rate table broadcast, no shuffle) is unchanged."""
    import hashlib

    rt = dict(DEFAULT_SAMPLE_RATES if rates is None else rates)
    rates_ref = ray.put(rt)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        r = ray.get(rates_ref) if isinstance(rates_ref, ray.ObjectRef) else rates_ref
        doc_ids = batch["doc_id"].to_numpy()
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        u = np.fromiter(
            (
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                for d in doc_ids
            ),
            dtype=np.uint64,
            count=len(doc_ids),
        )
        thresh = np.fromiter(
            (r.get(l, 0.0) * 4294967296.0 for l in langs), dtype=np.float64, count=len(langs)
        )
        return batch.filter(pa.array(u.astype(np.float64) < thresh))

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_stratified_sample_sql(sf_dir: str, rates: dict[str, float] | None = None) -> str:
    rt = dict(DEFAULT_SAMPLE_RATES if rates is None else rates)
    case = " ".join(f"WHEN lang = '{l}' THEN {r}" for l, r in rt.items())
    return f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      < (CASE {case} ELSE 0.0 END) * 4294967296.0
ORDER BY doc_id"""


# ------------------------------------------- substring-level duplication
def doc_ngram_dup_frac(sf_dir: str, n: int = 5, num_partitions: int = 32) -> ray.data.Dataset:
    """Substring-level duplication profile (the Lee-et-al "deduplicating
    training data" shape): for every document, the fraction of its n-token
    positions whose n-gram also occurs in ANOTHER document.

    Dataflow (all linear, text never leaves the scan):
      map      → tokenize per batch, vectorized 64-bit token hashes, rolling
                 polynomial n-gram hashes (wrapping uint64 — no string
                 n-grams are ever materialized), per-(ngram, doc) position
                 counts (combiner).
      exchange 1 (by ngram hash) → a (g, doc) pair is unique globally, so
                 within each hash partition `groupby(g).size()` IS the
                 distinct-doc count; emit per-doc (npos, shared_npos).
      exchange 2 (by doc_id)    → grouped_aggregate sums → dup_frac.

    Both exchanges move O(total n-gram positions) fixed-width rows. The
    engine groups by a 64-bit combined hash while the oracle groups by the
    n-gram STRING — a cross-n-gram hash collision (~N²/2^64) would merge two
    groups; at corpus scale this is the standard accepted bias, at test
    scale it is ~1e-11."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    A = 0x9E3779B97F4A7C15
    MASK = (1 << 64) - 1
    powers = np.array([(pow(A, n - 1 - j, 1 << 64)) & MASK for j in range(n)], dtype=np.uint64)

    def ngram_stage(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        tok_lists = [t.split(" ") for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
        if len(texts) == 0 or counts.sum() == 0:
            return pd.DataFrame(
                {
                    "g": pd.Series(dtype="uint64"),
                    "doc_id": pd.Series(dtype="int64"),
                    "npos": pd.Series(dtype="int64"),
                }
            )
        flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
        th = content_hash(flat)  # vectorized SipHash, uint64
        # rolling polynomial over windows of n token hashes (wrapping uint64)
        m = len(th)
        valid_doc = np.repeat(np.arange(len(texts)), counts)
        g = np.zeros(max(m - n + 1, 0), dtype=np.uint64)
        for j in range(n):
            g += th[j : m - n + 1 + j] * powers[j]
        # a position is valid iff its window stays inside one document
        ok = valid_doc[: m - n + 1] == valid_doc[n - 1 :]
        p = pd.DataFrame(
            {
                "g": g[ok],
                "doc_id": doc_ids[valid_doc[: m - n + 1][ok]].astype(np.int64),
            }
        )
        out = p.groupby(["g", "doc_id"], as_index=False).size()
        return out.rename(columns={"size": "npos"})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    pairs = ds.map_batches(ngram_stage, batch_format="pyarrow")

    def mark_shared(part: pd.DataFrame) -> pd.DataFrame:
        ndocs = part.groupby("g")["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"],
                "npos": part["npos"],
                "shared_npos": np.where(ndocs > 1, part["npos"], 0).astype(np.int64),
            }
        )

    marked = partition_map_groups(pairs, mark_shared, key="g", num_buckets=num_partitions)
    agg = grouped_aggregate(
        marked,
        "doc_id",
        {"n_pos": ("npos", "sum"), "n_shared_pos": ("shared_npos", "sum")},
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["dup_frac"] = df["n_shared_pos"].to_numpy() / df["n_pos"].to_numpy()
        return df

    return agg.map_batches(finish, batch_format="pyarrow")


def doc_ngram_dup_frac_sql(sf_dir: str, n: int = 5) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
pos AS (
  SELECT doc_id, array_to_string(list_slice(tk, i, i + {n - 1}), ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
),
pg AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS npos FROM pos GROUP BY doc_id, g),
sh AS (SELECT g, count(*) AS ndocs FROM pg GROUP BY g)
SELECT pg.doc_id,
       CAST(sum(npos) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN ndocs > 1 THEN npos ELSE 0 END) AS BIGINT) AS n_shared_pos,
       CAST(sum(CASE WHEN ndocs > 1 THEN npos ELSE 0 END) AS BIGINT)
         / CAST(sum(npos) AS BIGINT) AS dup_frac
FROM pg JOIN sh USING (g)
GROUP BY pg.doc_id
ORDER BY pg.doc_id"""


# ----------------------------------------------------- frequency sketching
_MG_OFF_SENTINEL = " __mg_offset__"


def doc_heavy_hitters(
    sf_dir: str, threshold: int = 300, k_sketch: int = 256, num_partitions: int = 32
) -> ray.data.Dataset:
    """Heavy-hitter tokens (corpus count >= threshold) via a two-pass
    Misra-Gries sketch — EXACT output with sketch-bounded memory.

    Pass 1 (candidates): per-batch token counts truncated to k_sketch
    counters by subtracting the (k+1)-th largest count off_b — the
    Misra-Gries reduction. A token's undercount within batch b is at most
    off_b, so after grouped_aggregate sums the partials,
    est <= true <= est + sum(off_b) for EVERY token (including tokens
    truncated to absence — each off_b rides along as a sentinel row).
    Hence est >= T - sum(off_b) is a guaranteed SUPERSET of the true heavy
    hitters, PROVIDED T > sum(off_b); below that, a token can vanish from
    every batch sketch and the protocol fails fast with a ValueError
    telling the caller to widen k_sketch (classic MG width condition:
    sum(off_b) <= total_tokens / (k_sketch+1)). The summed sketch is
    <= blocks x k_sketch rows — bounded regardless of vocabulary size
    (the full-vocab doc_vocab pipeline is the exact-everything alternative;
    this is the path when the vocabulary itself doesn't fit).

    Pass 2 (verify): broadcast the sorted candidate array, count ONLY
    candidate tokens exactly (per-batch combiner + one grouped_aggregate),
    keep count >= T. Output is bitwise-exact -> DuckDB HAVING oracle."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["text"])

    def mg_partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pandas()
        toks = np.concatenate([t.split(" ") for t in texts]) if len(texts) else np.array([], object)
        if len(toks) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=object), "c": pd.Series(dtype="int64")})
        uniq, cnt = np.unique(toks.astype(object), return_counts=True)
        off = 0
        if len(uniq) > k_sketch:
            off = int(np.partition(cnt, len(cnt) - k_sketch - 1)[len(cnt) - k_sketch - 1])
            kept = cnt - off
            uniq, cnt = uniq[kept > 0], kept[kept > 0]
        out = pd.DataFrame({"token": uniq, "c": cnt.astype(np.int64)})
        if off:
            out = pd.concat(
                [out, pd.DataFrame({"token": [_MG_OFF_SENTINEL], "c": [np.int64(off)]})],
                ignore_index=True,
            )
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    sketch = grouped_aggregate(
        ds.map_batches(mg_partial, batch_format="pyarrow", batch_size=4096),
        "token",
        {"est": ("c", "sum")},
        num_partitions=num_partitions,
    ).to_pandas()  # <= blocks x k_sketch rows by construction
    off_rows = sketch["token"] == _MG_OFF_SENTINEL
    total_off = int(sketch.loc[off_rows, "est"].sum())
    if threshold <= total_off:
        raise ValueError(
            f"doc_heavy_hitters: sketch too narrow for exactness — threshold "
            f"{threshold} <= max possible undercount {total_off}; widen k_sketch "
            f"(currently {k_sketch}) or raise the threshold"
        )
    cand = sketch.loc[~off_rows & (sketch["est"] >= threshold - total_off), "token"]
    cand_ref = ray.put(np.sort(cand.to_numpy(object)))

    def exact_partial(batch: pa.Table) -> pd.DataFrame:
        cs = ray.get(cand_ref) if isinstance(cand_ref, ray.ObjectRef) else cand_ref
        texts = batch["text"].to_pandas()
        toks = np.concatenate([t.split(" ") for t in texts]) if len(texts) else np.array([], object)
        if len(toks) == 0 or len(cs) == 0:
            return pd.DataFrame({"token": pd.Series(dtype=object), "c": pd.Series(dtype="int64")})
        uniq, cnt = np.unique(toks.astype(object), return_counts=True)
        pos = np.clip(np.searchsorted(cs, uniq), 0, len(cs) - 1)
        m = cs[pos] == uniq
        return pd.DataFrame({"token": uniq[m], "c": cnt[m].astype(np.int64)})

    exact = grouped_aggregate(
        ds.map_batches(exact_partial, batch_format="pyarrow", batch_size=4096),
        "token",
        {"n": ("c", "sum")},
        num_partitions=num_partitions,
    )
    return exact.filter(expr=f"n >= {threshold}")


def doc_heavy_hitters_sql(sf_dir: str, threshold: int = 300) -> str:
    return f"""
SELECT t.token, CAST(count(*) AS BIGINT) AS n
FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
GROUP BY t.token
HAVING count(*) >= {threshold}
ORDER BY t.token"""


# ------------------------------------------------- near-dup cluster assembly


def dup_cluster_labels(
    sf_dir: str, threshold: float = 0.82, max_passes: int = 24
) -> ray.data.Dataset:
    """Connected components over the near-dup pair graph: every document is
    assigned cluster_id = min doc_id of its similarity component (singletons
    map to themselves). This is the pairs->clusters step real dedup needs:
    keep one representative per CLUSTER, not per pair (a-b and b-c dup pairs
    must collapse a, b, c even though a-c never verified).

    Algorithm: the alternating large-star / small-star CC of Kiveris et al.,
    "Connected Components in MapReduce and Beyond" (SoCC'14) — the published
    shuffle-efficient CC for exactly this dedup-graph workload. Each pass is
    ONE hash exchange over the (node, parent) edge list:

        replicate each edge to both endpoints' hash partitions ->
        per-partition vectorized grouped min m(u) = min(neighbors(u), u) ->
          large-star pass: emit (v, m(u)) for neighbors v > u
          small-star pass: emit (v, m(u)) for neighbors v < u, plus (u, m(u))

    Both emissions keep parent < node, so edges stay canonically oriented;
    the multiset converges to per-component stars rooted at the component
    min in O(log^2 n) passes (2-4 for clique-like dup components).
    Convergence is detected from an order-free potential (edge count +
    endpoint sums + a mixed hash) computed as per-block partial sums — the
    driver only ever sees that 4-tuple per pass plus the final
    (doc_id, cluster_id) table the caller asked for. Edge tables are
    materialized per pass and stay linear in the number of verified pairs.

    The final label table is CHECKPOINTED to parquet (distributed write —
    nothing lands on the driver) and reused by later calls in the same
    process: doc_dup_clusters and doc_cluster_rep share one CC run instead
    of re-deriving the pair graph twice. At scale this is the standard
    iterative-result checkpoint; delete the path (or pass a different
    threshold) to force recompute."""
    import os
    import shutil

    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    from quant_feature_pipeline_ray.ckpt import ckpt_path

    # per-process checkpoint path: shared by every caller in this driver
    # process, auto-invalidated across processes/rounds (code may change)
    ck = ckpt_path(
        "graft_cc_labels",
        f"pid{os.getpid()}_{_corpus_ck_key(sf_dir)}_t{threshold}_p{max_passes}",
    )
    if os.path.exists(ck + "._SUCCESS"):
        return ray.data.read_parquet(ck)

    n_parts = max(8, cluster_cpus())

    def _star_bucket(arr: np.ndarray) -> np.ndarray:
        mixed = (arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return (mixed % np.uint64(n_parts)).astype(np.int64)

    pairs = lsh_verified_pairs(sf_dir, threshold=threshold).select_columns(
        ["doc_a", "doc_b"]
    )

    def canon(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy()
        c = b["doc_b"].to_numpy()
        return pa.table(
            {
                "node": pa.array(np.maximum(a, c)),
                "parent": pa.array(np.minimum(a, c)),
            }
        )

    edges = pairs.map_batches(canon, batch_format="pyarrow").materialize()

    def add_pk(b: pa.Table) -> pa.Table:
        # a symmetric incidence (u,v)+(v,u) must reach BOTH endpoints'
        # partitions: replicate each canonical edge to pk(node) and pk(parent)
        n = b["node"].to_numpy()
        p = b["parent"].to_numpy()
        pk = np.concatenate([_star_bucket(n), _star_bucket(p)]).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(np.concatenate([n, n])),
                "parent": pa.array(np.concatenate([p, p])),
                "_pk": pa.array(pk),
            }
        )

    def _empty_edges() -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "parent": pd.Series(dtype="int64")}
        )

    def star_pass(large: bool):
        def per_partition(g: pd.DataFrame) -> pd.DataFrame:
            if g.empty:
                return _empty_edges()
            my_pk = int(g["_pk"].iloc[0])
            u = np.concatenate([g["node"].to_numpy(), g["parent"].to_numpy()])
            v = np.concatenate([g["parent"].to_numpy(), g["node"].to_numpy()])
            df = pd.DataFrame({"u": u, "v": v})
            df = df[_star_bucket(df["u"].to_numpy()) == my_pk]
            if df.empty:
                return _empty_edges()
            df = df.drop_duplicates(ignore_index=True)
            m = df.groupby("u")["v"].transform("min")
            m = np.minimum(m.to_numpy(), df["u"].to_numpy())
            uu = df["u"].to_numpy()
            vv = df["v"].to_numpy()
            if large:
                sel = vv > uu
                out_node, out_parent = vv[sel], m[sel]
            else:
                sel = vv < uu
                _, first_idx = np.unique(uu, return_index=True)
                out_node = np.concatenate([vv[sel], uu[first_idx]])
                out_parent = np.concatenate([m[sel], m[first_idx]])
            ok = out_node != out_parent
            out = pd.DataFrame({"node": out_node[ok], "parent": out_parent[ok]})
            return out.drop_duplicates(ignore_index=True)

        return per_partition

    def potential(ds) -> tuple:
        def part(b: pa.Table) -> pd.DataFrame:
            n = b["node"].to_numpy().astype(np.uint64)
            p = b["parent"].to_numpy().astype(np.uint64)
            mix = (n * np.uint64(0x9E3779B97F4A7C15)) ^ (p * np.uint64(0xC2B2AE3D27D4EB4F))
            return pd.DataFrame(
                {
                    "n": [np.int64(len(n))],
                    "su": [np.int64(n.sum(dtype=np.uint64).astype(np.int64))],
                    "sv": [np.int64(p.sum(dtype=np.uint64).astype(np.int64))],
                    "h": [np.int64(mix.sum(dtype=np.uint64).astype(np.int64))],
                }
            )

        t = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        return tuple(int(t[c].sum()) for c in ("n", "su", "sv", "h"))

    hist: list[tuple] = [potential(edges)]
    for i in range(max_passes):
        fn = star_pass(large=(i % 2 == 0))
        edges = (
            edges.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(fn, batch_format="pandas")
            # pin the block count at the loop boundary — groupby+map_groups
            # multiplies blocks per pass, which compounds superlinearly over
            # iterations (the PageRank lesson, BASELINE.md round 3)
            .repartition(16)
            .materialize()
        )
        hist.append(potential(edges))
        # stable through one large AND one small pass => star fixpoint
        if len(hist) >= 3 and hist[-1] == hist[-2] == hist[-3]:
            break
    else:
        raise RuntimeError(f"doc_dup_clusters: no convergence in {max_passes} passes")

    # final: all docs union star edges, singletons -> self
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    doc_tagged = docs.map_batches(
        lambda b: pa.table({"node": b["doc_id"], "parent": b["doc_id"]}),
        batch_format="pyarrow",
    )
    labels = grouped_aggregate(
        edges.union(doc_tagged),
        "node",
        {"cluster_id": ("parent", "min")},
        num_partitions=n_parts,
    )
    shutil.rmtree(ck, ignore_errors=True)
    labels.write_parquet(ck)
    open(ck + "._SUCCESS", "w").close()
    return ray.data.read_parquet(ck)


def doc_dup_clusters(
    sf_dir: str, threshold: float = 0.82, max_passes: int = 24
) -> pd.DataFrame:
    """Driver-facing view of dup_cluster_labels (see there for the
    algorithm): the full (doc_id, cluster_id) assignment, sorted."""
    final = dup_cluster_labels(sf_dir, threshold=threshold, max_passes=max_passes)
    out = final.to_pandas().rename(columns={"node": "doc_id"})
    return out.sort_values("doc_id", ignore_index=True)[["doc_id", "cluster_id"]]


def doc_cluster_purity(sf_dir: str, threshold: float = 0.82) -> ray.data.Dataset:
    """Near-dup cluster PURITY audit — for every duplicate cluster (≥2
    members): member count, distinct-source count, majority-source
    fraction and a cross-source flag. The question it answers: are the
    near-dups SYNDICATION (cross-source — dedup aggressively, the copies
    are redundant) or BOILERPLATE/RESUBMISSION (intra-source — maybe keep
    one per source)? A dedup policy chosen without this table treats both
    the same.

    Dataflow: CC labels (dup_cluster_labels — the exact-oracled star
    passes) and the doc→source map meet in ONE doc_id-keyed tagged-union
    exchange; unlabeled docs become their own singleton cluster (and are
    filtered by the ≥2 cut, never pooled); per-batch (cluster, source)
    count combiner → one cluster-keyed exchange for the stats."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    labels = dup_cluster_labels(sf_dir, threshold=threshold)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    lab_tagged = labels.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["node"].to_numpy(),
                "cluster_id": b["cluster_id"].to_numpy(),
                "source": np.full(len(b), "", dtype=object),
            }
        ),
        batch_format="pyarrow",
    )
    doc_tagged = docs.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "cluster_id": np.full(len(b), -1, dtype=np.int64),
                "source": b["source"].to_numpy(zero_copy_only=False),
            }
        ),
        batch_format="pyarrow",
    )
    per_doc = grouped_aggregate(
        lab_tagged.union(doc_tagged),
        "doc_id",
        {"cluster_id": ("cluster_id", "max"), "source": ("source", "max")},
    )

    def combine(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        cid = df["cluster_id"].to_numpy()
        df["cluster_id"] = np.where(cid < 0, df["doc_id"].to_numpy(), cid)
        g = df.groupby(["cluster_id", "source"], sort=False).size()
        return pd.DataFrame(
            {
                "cluster_id": g.index.get_level_values(0).to_numpy(),
                "source": g.index.get_level_values(1).to_numpy(),
                "c": g.to_numpy().astype(np.int64),
            }
        )

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["cluster_id", "source"], sort=True, as_index=False)["c"].sum()
        a = g.groupby("cluster_id", sort=True).agg(
            n_members=("c", "sum"), n_sources=("c", "size"), top_c=("c", "max")
        )
        a = a[a["n_members"] >= 2].reset_index()
        a["majority_frac"] = a["top_c"] / a["n_members"]
        a["cross_source"] = a["n_sources"] > 1
        return a.drop(columns=["top_c"]).astype(
            {"n_members": np.int64, "n_sources": np.int64}
        )

    return partition_map_groups(
        per_doc.map_batches(combine, batch_format="pyarrow"),
        per_cluster,
        key="cluster_id",
        num_buckets=8,
    )


def doc_cluster_purity_sql(sf_dir: str, threshold: float = 0.82) -> str:
    return f"""
WITH RECURSIVE s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {threshold}
),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
cc(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT e.b, cc.label FROM cc JOIN sym e ON e.a = cc.node WHERE cc.label < e.b
),
m AS (SELECT node, min(label) AS label FROM cc GROUP BY node),
lab AS (
  SELECT d.doc_id, COALESCE(m.label, d.doc_id) AS cluster_id, d.source
  FROM documents d LEFT JOIN m ON d.doc_id = m.node
),
per AS (SELECT cluster_id, source, count(*) AS c FROM lab GROUP BY cluster_id, source),
agg AS (
  SELECT cluster_id,
         CAST(sum(c) AS BIGINT) AS n_members,
         CAST(count(*) AS BIGINT) AS n_sources,
         CAST(max(c) AS BIGINT) AS top_c
  FROM per GROUP BY cluster_id
)
SELECT cluster_id, n_members, n_sources,
       top_c / n_members AS majority_frac,
       n_sources > 1 AS cross_source
FROM agg WHERE n_members >= 2 ORDER BY cluster_id"""


def doc_dup_clusters_sql(sf_dir: str, threshold: float = 0.82) -> str:
    # transitive closure by recursive min-label BFS: the component-min node m
    # reaches every member along paths of members > m, so min(label) per node
    # is the component min; UNION (distinct) bounds the recursion.
    return f"""
WITH RECURSIVE s AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {threshold}
),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
cc(node, label) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT e.b, cc.label FROM cc JOIN sym e ON e.a = cc.node WHERE cc.label < e.b
),
m AS (SELECT node, min(label) AS label FROM cc GROUP BY node)
SELECT d.doc_id, COALESCE(m.label, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN m ON d.doc_id = m.node
ORDER BY d.doc_id"""


# -------------------------------------------- embedding matrix analytics


def emb_covariance(sf_dir: str, quant: int = 1000) -> pd.DataFrame:
    """Distributed covariance matrix of the embedding columns (upper
    triangle, long format). The vectors are quantized to integer
    milli-units q = floor(x * quant) so every partial sum is an exact
    int64 and the result is bitwise order-independent (the repo's
    integer-sum oracle discipline; floor not round — numpy rounds
    half-to-even, SQL half-away).

    Scale pattern (the W12-family "global second moment" shape): each batch
    emits ONE d x d int64 Gram partial as long (i, j, sqq) rows — d(d+1)/2
    rows per batch regardless of batch height — plus per-dim sums and a
    count; grouped_aggregate reduces them in one small exchange. The driver
    only sees the final d(d+1)/2-row table. cov = (n*Sij - Si*Sj) / (n^2
    * quant^2), i.e. the population covariance, as the identical IEEE
    expression in engine and oracle."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = np.floor(mat * quant).astype(np.int64)
        d = q.shape[1]
        gram = q.T @ q  # exact int64
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {
                "dim_i": np.concatenate([iu, np.arange(d), [-1]]).astype(np.int64),
                "dim_j": np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int64),
                "s": np.concatenate(
                    [gram[iu, ju], q.sum(axis=0), [len(q)]]
                ).astype(np.int64),
            }
        )

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["dim_i", "dim_j"],
        {"s": ("s", "sum")},
    ).to_pandas()  # d(d+1)/2 + d + 1 rows — driver-bounded

    n = int(agg.loc[(agg["dim_i"] == -1) & (agg["dim_j"] == -1), "s"].iloc[0])
    sums = (
        agg[(agg["dim_j"] == -1) & (agg["dim_i"] >= 0)]
        .set_index("dim_i")["s"]
        .sort_index()
    )
    pairs = agg[(agg["dim_i"] >= 0) & (agg["dim_j"] >= 0)].copy()
    si = sums.reindex(pairs["dim_i"].to_numpy()).to_numpy(np.int64)
    sj = sums.reindex(pairs["dim_j"].to_numpy()).to_numpy(np.int64)
    pairs["cov_num"] = n * pairs["s"].to_numpy(np.int64) - si * sj
    pairs["cov"] = pairs["cov_num"] / (float(n) * n * quant * quant)
    out = pairs[["dim_i", "dim_j", "cov_num", "cov"]].astype(
        {"dim_i": "int64", "dim_j": "int64", "cov_num": "int64"}
    )
    return out.sort_values(["dim_i", "dim_j"], ignore_index=True)


def emb_covariance_sql(sf_dir: str, quant: int = 1000, d: int = 64) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, i.i AS i,
         CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * {quant}) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range({d})) AS i) i
),
n AS (SELECT count(*) AS n FROM embeddings),
m AS (SELECT i, CAST(SUM(q) AS BIGINT) AS s FROM q GROUP BY i),
g AS (
  SELECT a.i AS dim_i, b.i AS dim_j, CAST(SUM(a.q * b.q) AS BIGINT) AS sqq
  FROM q a JOIN q b USING (vec_id) WHERE a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT g.dim_i, g.dim_j,
       CAST(n.n * g.sqq - ma.s * mb.s AS BIGINT) AS cov_num,
       CAST(n.n * g.sqq - ma.s * mb.s AS DOUBLE)
         / (CAST(n.n AS DOUBLE) * n.n * {quant} * {quant}) AS cov
FROM g, n
JOIN m ma ON ma.i = g.dim_i
JOIN m mb ON mb.i = g.dim_j
ORDER BY g.dim_i, g.dim_j"""


def emb_pca_project(sf_dir: str, n_components: int = 2, quant: int = 1000) -> pd.DataFrame:
    """PCA projection of every embedding onto the top principal components.

    Two-pass: (1) the distributed integer-exact covariance above; (2) a
    d x d eigendecomposition on the DRIVER (d is tiny and fixed — this is
    the classic tall-skinny PCA split) and a stateless distributed
    projection pass with the component matrix broadcast via ray.put.
    Sign convention: each component's largest-|loading| coordinate is made
    positive so the output is reproducible across eigensolvers.
    Approximate only in float (eigh) — rows-only + pytest parity vs a
    straight-line numpy PCA."""
    cov_long = emb_covariance(sf_dir, quant=quant)
    d = int(cov_long["dim_i"].max()) + 1
    C = np.zeros((d, d))
    C[cov_long["dim_i"], cov_long["dim_j"]] = cov_long["cov"]
    C[cov_long["dim_j"], cov_long["dim_i"]] = cov_long["cov"]
    w, v = np.linalg.eigh(C)
    comp = v[:, np.argsort(w)[::-1][:n_components]]  # d x p
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(n_components)])
    comp = comp * np.where(flip == 0, 1.0, flip)[None, :]
    cref = ray.put(comp)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def project(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        proj = mat @ c
        out = {"vec_id": batch["vec_id"].to_numpy()}
        for p in range(c.shape[1]):
            out[f"pc{p + 1}"] = np.round(proj[:, p], 6)
        return pd.DataFrame(out)

    res = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return res.sort_values("vec_id", ignore_index=True)


def emb_kmeans(
    sf_dir: str, k: int = 8, n_iters: int = 5, quant: int = 1000
) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the embedding column, end-to-end on
    the cluster:

      init      = the k smallest vec_ids' vectors (deterministic; fetched
                  via a per-batch partial top-k, k rows per batch)
      assign    = stateless map_batches: one matmul per batch against the
                  BROADCAST centroid matrix (ray.put)
      update    = per-batch partial per-cluster sums in long (cluster, dim)
                  format -> grouped_aggregate -> k*(d+1) rows to the driver
      repeat    n_iters times (fixed, deterministic)

    Only centroids (k x d) and the long partial table ever reach the
    driver; assignments stay distributed until the caller collects them.
    Rows-only in the driver contract (float sums are order-dependent);
    tests/test_training_data.py pins assignments + centroids against a
    straight-line numpy Lloyd from the same init."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def init_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(),
                "embedding": batch["embedding"].to_numpy(zero_copy_only=False),
            }
        )
        return df.nsmallest(k, "vec_id")

    seed = (
        ds.map_batches(init_partial, batch_format="pyarrow", batch_size=8192)
        .to_pandas()
        .nsmallest(k, "vec_id")
        .sort_values("vec_id")
    )
    centroids = np.stack(seed["embedding"].to_numpy()).astype(np.float64)

    for _ in range(n_iters):
        cref = ray.put(centroids)

        def update_partial(batch: pa.Table, _cref=cref) -> pd.DataFrame:
            c = ray.get(_cref) if isinstance(_cref, ray.ObjectRef) else _cref
            mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            d2 = (
                np.einsum("ij,ij->i", mat, mat)[:, None]
                - 2.0 * mat @ c.T
                + np.einsum("ij,ij->i", c, c)[None, :]
            )
            assign = d2.argmin(axis=1)
            kk, dd = c.shape
            sums = np.zeros((kk, dd))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=kk)
            return pd.DataFrame(
                {
                    "cluster": np.repeat(np.arange(kk, dtype=np.int64), dd + 1),
                    "dim": np.tile(np.arange(-1, dd, dtype=np.int64), kk),
                    "s": np.concatenate(
                        [np.concatenate([[counts[c_]], sums[c_]]) for c_ in range(kk)]
                    ),
                }
            )

        agg = grouped_aggregate(
            ds.map_batches(update_partial, batch_format="pyarrow", batch_size=4096),
            ["cluster", "dim"],
            {"s": ("s", "sum")},
        ).to_pandas()
        counts = (
            agg[agg["dim"] == -1].set_index("cluster")["s"].sort_index().to_numpy()
        )
        wide = agg[agg["dim"] >= 0].pivot(index="cluster", columns="dim", values="s").sort_index()
        new_c = centroids.copy()
        nz = counts > 0
        new_c[nz] = wide.to_numpy()[nz] / counts[nz, None]
        centroids = new_c

    cref = ray.put(centroids)

    def final_assign(batch: pa.Table, _cref=cref) -> pd.DataFrame:
        c = ray.get(_cref) if isinstance(_cref, ray.ObjectRef) else _cref
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        d2 = (
            np.einsum("ij,ij->i", mat, mat)[:, None]
            - 2.0 * mat @ c.T
            + np.einsum("ij,ij->i", c, c)[None, :]
        )
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(),
                "cluster": d2.argmin(axis=1).astype(np.int64),
                "dist2": np.round(d2.min(axis=1), 6),
            }
        )

    out = ds.map_batches(final_assign, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id", ignore_index=True)


def doc_lm_stats(sf_dir: str) -> ray.data.Dataset:
    """Corpus-frequency language-model statistics per document — the
    "train a corpus model, then score every doc against it" two-pass shape
    (unigram LM flavour) used for rarity/quality curation signals:

        n_tokens   token count (with multiplicity)
        freq_sum   sum of each token's GLOBAL corpus count
        freq_min   rarest token's corpus count (1 => contains a hapax)
        hapax      number of token positions whose token is a corpus hapax
        avg_freq   freq_sum / n_tokens

    Pass 1 is the doc_vocab dataflow (per-batch tf combiner -> one token-key
    exchange); the vocabulary-bounded count table is broadcast once via
    ray.put (swap for a token-key shuffle join if the vocabulary outgrows
    worker heap). Pass 2 is stateless: tokenize, look up, aggregate per doc
    inside the batch — docs never span batches, so no second shuffle. All
    outputs are integer sums (exact DuckDB oracle); avg_freq is the same
    IEEE division both sides."""
    counts = doc_vocab(sf_dir, min_count=1).to_pandas()
    cnt_ref = ray.put(dict(zip(counts["token"], counts["tf"].astype(np.int64))))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Score:
        def __init__(self, ref):
            self.cnt = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            split = pc.split_pattern(batch["text"], " ")
            flat = pc.list_flatten(split)
            parent = pc.list_parent_indices(split)
            keep = pc.not_equal(flat, "")
            pairs = pd.DataFrame(
                {
                    "d": parent.filter(keep).to_pandas(),
                    "c": flat.filter(keep).to_pandas().map(self.cnt).astype(np.int64),
                }
            )
            g = pairs.groupby("d", as_index=False).agg(
                n_tokens=("c", "size"),
                freq_sum=("c", "sum"),
                freq_min=("c", "min"),
                hapax=("c", lambda s: int((s == 1).sum())),
            )
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[g["d"].to_numpy()],
                    "n_tokens": g["n_tokens"].astype(np.int64),
                    "freq_sum": g["freq_sum"].astype(np.int64),
                    "freq_min": g["freq_min"].astype(np.int64),
                    "hapax": g["hapax"].astype(np.int64),
                }
            )
            out["avg_freq"] = out["freq_sum"] / (out["n_tokens"] * 1.0)
            return out

    return ds.map_batches(Score, fn_constructor_args=(cnt_ref,), batch_format="pyarrow", concurrency=2)


def doc_lm_stats_sql(sf_dir: str) -> str:
    return """
WITH tok AS (
  SELECT doc_id, t.token FROM documents, UNNEST(string_split(text, ' ')) t(token)
  WHERE t.token <> ''
),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt.c) AS BIGINT) AS freq_sum,
       MIN(cnt.c) AS freq_min,
       CAST(SUM(CASE WHEN cnt.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(cnt.c) AS BIGINT) / (count(*) * 1.0) AS avg_freq
FROM tok JOIN cnt USING (token)
GROUP BY tok.doc_id ORDER BY tok.doc_id"""


def doc_cluster_rep(sf_dir: str, threshold: float = 0.82) -> pd.DataFrame:
    """Cluster-level dedup summary: one row per similarity CLUSTER (the
    connected component from doc_dup_clusters) with its representative
    (= min doc_id), member count, and total/kept character counts — the
    numbers a curation run reports after transitive near-dup removal
    ("kept 165 of 500 docs, dropped 68% of near-dup bytes").

    Composition: CC labels (distributed star passes) -> one tagged-union
    exchange with the doc stats -> per-cluster grouped aggregate. The label
    table never lands on the driver: labels join the doc stats through one
    tagged-union exchange on doc_id, and only the per-cluster aggregate
    comes back."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    labels = dup_cluster_labels(sf_dir, threshold=threshold)  # (node, cluster_id) Dataset
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    lab_tagged = labels.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["node"],
                "cluster_id": b["cluster_id"],
                "n_chars": pa.array(np.full(len(b), -1, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    doc_tagged = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "cluster_id": pa.array(np.full(len(b), -1, np.int64)),
                "n_chars": b["n_chars"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def join_rows(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["n_chars"] < 0].set_index("doc_id")["cluster_id"]
        d = g[g["n_chars"] >= 0]
        cid = d["doc_id"].map(lab).to_numpy(np.int64)
        nch = d["n_chars"].to_numpy(np.int64)
        is_rep = d["doc_id"].to_numpy(np.int64) == cid
        return pd.DataFrame(
            {
                "cluster_id": cid,
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "n_chars": nch,
                "rep_chars": np.where(is_rep, nch, 0),
            }
        )

    joined = partition_map_groups(
        lab_tagged.union(doc_tagged), join_rows, key="doc_id", num_buckets=32
    )
    agg = grouped_aggregate(
        joined,
        "cluster_id",
        {
            "rep_doc_id": ("doc_id", "min"),
            "n_members": ("doc_id", "size"),
            "total_chars": ("n_chars", "sum"),
            "kept_chars": ("rep_chars", "sum"),
        },
    ).to_pandas()
    agg = agg.astype({c: "int64" for c in agg.columns})
    return agg.sort_values("cluster_id", ignore_index=True)[
        ["cluster_id", "rep_doc_id", "n_members", "total_chars", "kept_chars"]
    ]


def doc_cluster_rep_sql(sf_dir: str, threshold: float = 0.82) -> str:
    cc = doc_dup_clusters_sql(sf_dir, threshold)
    # reuse the recursive-CTE labels as a subquery; aggregate per cluster
    return f"""
WITH lab AS ({cc})
SELECT lab.cluster_id,
       min(lab.doc_id) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
       min(CASE WHEN lab.doc_id = lab.cluster_id THEN d.n_chars END) AS kept_chars
FROM lab JOIN documents d ON d.doc_id = lab.doc_id
GROUP BY lab.cluster_id ORDER BY lab.cluster_id"""


def doc_weighted_sample(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): keep the k docs with the largest key u^(1/w), where w =
    n_chars (longer docs proportionally likelier) and u is a reproducible
    per-doc uniform derived from md5(doc_id) — the same bit-stable hash
    trick as doc_stratified_sample, so the "random" sample is exactly
    checkable against the SQL oracle.

    Scale pattern: priorities are compared as ln(u)/w (monotone transform);
    each batch emits only its local top-k (nlargest partial), the driver
    merges k-row partials — the distributed-top-k shape, no shuffle."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy()
        u32 = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) for d in doc_ids),
            dtype=np.uint64,
            count=len(doc_ids),
        )
        u = (u32.astype(np.float64) + 1.0) / 4294967296.0  # (0, 1]
        w = batch["n_chars"].to_numpy().astype(np.float64)
        df = pd.DataFrame(
            {
                "doc_id": doc_ids,
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "n_chars": batch["n_chars"].to_numpy(),
                # rank on the ROUNDED priority: numpy log and SQL ln can
                # differ in the last ulp, which flips near-ties; 6 dp +
                # doc_id tie-break makes the order engine-independent
                "priority": np.round(np.log(u) / w, 6),
            }
        )
        return df.sort_values(["priority", "doc_id"], ascending=[False, True]).head(k)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    top = (
        parts.sort_values(["priority", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "doc_id", "lang", "n_chars", "priority"]]


def doc_weighted_sample_sql(sf_dir: str, k: int = 50) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, lang, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1.0)
            / 4294967296.0) / CAST(n_chars AS DOUBLE) AS priority
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY round(priority, 6) DESC, doc_id) AS BIGINT) AS rank,
       doc_id, lang, n_chars, round(priority, 6) AS priority
FROM s
ORDER BY round(priority, 6) DESC, doc_id
LIMIT {k}"""


# ------------------------------------------------- similarity: range / graph


def emb_range_search(
    sf_dir: str, threshold: float = 0.32, n_queries: int = 20
) -> pd.DataFrame:
    """Cosine RADIUS search: every corpus vector within similarity >=
    threshold of any query vector — the "find everything near these seeds"
    primitive (contamination scans, targeted filtering), complementing the
    top-k shape of emb_ann_topk.

    Scale pattern: queries load via parquet predicate pushdown and are
    broadcast ONCE (ray.put); each batch does one matmul block against the
    query matrix and emits only the rows over threshold — output is
    result-sized, never O(N x n_q). No shuffle."""
    import pyarrow.compute as pc

    qtbl = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id") < n_queries,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    qids = qtbl["vec_id"].to_numpy()
    qmat = np.stack(qtbl["embedding"].to_numpy()).astype(np.float64)
    qunit = qmat / np.maximum(np.sqrt(np.einsum("ij,ij->i", qmat, qmat))[:, None], 1e-12)
    qref = ray.put((qids, qunit))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def block(batch: pa.Table) -> pd.DataFrame:
        qids_, qunit_ = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        vids = batch["vec_id"].to_numpy()
        sims = np.round(u @ qunit_.T, 6)  # (n_vec, n_q)
        vi, qi = np.nonzero((sims >= threshold) & (vids[:, None] != qids_[None, :]))
        return pd.DataFrame(
            {
                "query_id": qids_[qi].astype(np.int64),
                "vec_id": vids[vi].astype(np.int64),
                "sim": sims[vi, qi],
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "vec_id": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )
    return out.sort_values(["query_id", "vec_id"], ignore_index=True)


def emb_range_search_sql(sf_dir: str, threshold: float = 0.32, n_queries: int = 20) -> str:
    return f"""
SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
       round(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) AS sim
FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
WHERE q.vec_id < {n_queries}
  AND round(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) >= {threshold}
ORDER BY query_id, vec_id"""


def emb_knn_graph_ds(
    sf_dir: str,
    k: int = 5,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    vec_assign: int = 4,
    max_cluster_rows: int = 100_000,
) -> ray.data.Dataset:
    """Approximate k-NN GRAPH over the whole embedding column — every vector's
    k nearest neighbours (the substrate for SemDeDup-style curation, graph
    clustering, and hub/outlier analysis). Brute force is O(N^2) in one block;
    this is the IVF-bucketed scale path:

      centroids (bounded-sample k-means) broadcast -> each vector joins its
      `vec_assign` nearest clusters (multiple assignment = the recall lever)
      -> ONE shuffle by cluster -> per-cluster pairwise matmul emits each
      member's top-k WITHIN the cluster -> one vec_id-keyed exchange merges
      the per-cluster partials (dedup neighbours, keep global top-k).

    Returns the distributed (vec_id, rank, nbr_id, sim) edge Dataset —
    consumed as-is by graph algorithms (emb_label_prop) so the edge list
    never has to fit on the driver. Approximate by design -> rows-only;
    tests gate recall >= 0.9 vs the exact numpy graph."""
    from quant_feature_pipeline_ray.sources.transcripts import cluster_cpus
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    n_clusters = _scaled_n_clusters(sf_dir, n_clusters, vec_assign, max_cluster_rows)
    cent = _kmeans_centroids(sf_dir, n_clusters, kmeans_iters, sample_max)
    cent_ref = ray.put(cent)
    n_parts = max(8, cluster_cpus())

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class Assign:
        def __init__(self, ref):
            self.cent = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
            sims = u @ self.cent.T
            a = min(vec_assign, sims.shape[1])
            top = np.argpartition(-sims, a - 1, axis=1)[:, :a]
            embs = batch["embedding"].to_numpy(zero_copy_only=False)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(batch["vec_id"].to_numpy(), a),
                    "cluster": top.reshape(-1).astype(np.int32),
                    "embedding": [embs[i] for i in np.repeat(np.arange(len(embs)), a)],
                }
            )

    assigned = ds.map_batches(
        Assign, fn_constructor_args=(cent_ref,), batch_format="pyarrow", concurrency=2
    )

    def _empty_edges() -> pd.DataFrame:
        return pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"), "nbr_id": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )

    def topk_in_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_edges()
        vids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(vids)
        vids = vids[order]
        m = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        frames = []
        # bounded pairwise work: spill split keeps near-boundary neighbours
        # in both halves; the vec_id-keyed merge dedups and re-ranks
        for part in _split_bounded(u, vids, max_cluster_rows):
            if len(part) < 2:
                continue
            up, vp = u[part], vids[part]
            sims = np.round(up @ up.T, 6)
            np.fill_diagonal(sims, -2.0)  # exclude self
            kk = min(k, len(vp) - 1)
            nbr = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(vp)), kk)
            cols = nbr.reshape(-1)
            frames.append(
                pd.DataFrame({"vec_id": vp[rows], "nbr_id": vp[cols], "sim": sims[rows, cols]})
            )
        if not frames:
            return _empty_edges()
        return pd.concat(frames, ignore_index=True)

    partials = assigned.groupby("cluster").map_groups(topk_in_cluster, batch_format="pandas")

    def merge_vec(g: pd.DataFrame) -> pd.DataFrame:
        # multiple assignment duplicates (vec, nbr) edges across shared
        # clusters: dedup, then keep the global top-k per vector with a
        # deterministic (sim desc, nbr asc) order
        g = g.drop_duplicates(["vec_id", "nbr_id"])
        g = g.sort_values(["vec_id", "sim", "nbr_id"], ascending=[True, False, True])
        out = g.groupby("vec_id", as_index=False).head(k).copy()
        out["rank"] = out.groupby("vec_id").cumcount().to_numpy() + 1
        return out[["vec_id", "rank", "nbr_id", "sim"]]

    return partition_map_groups(partials, merge_vec, key="vec_id", num_buckets=n_parts)


def emb_knn_graph(
    sf_dir: str,
    k: int = 5,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    vec_assign: int = 4,
    max_cluster_rows: int = 100_000,
) -> pd.DataFrame:
    """Driver-resident view of emb_knn_graph_ds (the N×k edge rows)."""
    out = emb_knn_graph_ds(
        sf_dir, k, n_clusters, kmeans_iters, sample_max, vec_assign, max_cluster_rows
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"), "rank": pd.Series(dtype="int64"),
             "nbr_id": pd.Series(dtype="int64"), "sim": pd.Series(dtype="float64")}
        )
    out["rank"] = out["rank"].astype(np.int64)
    return out.sort_values(["vec_id", "rank"], ignore_index=True)


def emb_semdedup(
    sf_dir: str,
    threshold: float = 0.42,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    max_cluster_rows: int = 100_000,
) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv:2303.09540): cluster the embedding space, then WITHIN each cluster
    drop every vector whose cosine similarity to a lower-vec_id member
    reaches the threshold — one representative per semantic near-dup set,
    at per-cluster (not corpus) pairwise cost.

      centroids (bounded-sample k-means) broadcast -> stateless nearest-
      centroid assignment -> ONE shuffle by cluster -> per-cluster triangular
      matmul marks keep/drop -> N rows out.

    Deterministic given the seeded centroids (keep rule is pure vec_id
    order), so the pytest pins EXACT parity vs a straight-line numpy
    implementation; rows-only in the driver contract (kmeans is iterative
    float math, not SQL)."""
    n_clusters = _scaled_n_clusters(sf_dir, n_clusters, 1, max_cluster_rows)
    cent = _kmeans_centroids(sf_dir, n_clusters, kmeans_iters, sample_max)
    cent_ref = ray.put(cent)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class Assign1:
        def __init__(self, ref):
            self.cent = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].to_numpy(),
                    "cluster": np.argmax(u @ self.cent.T, axis=1).astype(np.int32),
                    "embedding": batch["embedding"].to_numpy(zero_copy_only=False),
                }
            )

    assigned = ds.map_batches(
        Assign1, fn_constructor_args=(cent_ref,), batch_format="pyarrow", concurrency=2
    )

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        vids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(vids)
        vids = vids[order]
        c = int(g["cluster"].iloc[0])
        m = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        frames = []
        # bounded pairwise work: DISJOINT split (margin=0) — the keep rule
        # ("no lower-id match in my cluster") is subcluster-local under a
        # split, which only refines the clustering SemDeDup already
        # conditions on; never triggers below max_cluster_rows
        for part in _split_bounded(u, vids, max_cluster_rows, margin=0.0):
            up, vp = u[part], vids[part]
            sims = np.round(up @ up.T, 6)
            # mask to strictly-lower-index members (tril would leak 0.0 from
            # the zeroed upper triangle when every true sim is negative)
            idx = np.arange(len(vp))
            masked = np.where(idx[None, :] < idx[:, None], sims, -2.0)
            max_lower = masked.max(axis=1, initial=-2.0)
            frames.append(
                pd.DataFrame(
                    {
                        "vec_id": vp,
                        "cluster": np.full(len(vp), c, dtype=np.int64),
                        "max_sim_lower": np.where(max_lower <= -2.0, np.nan, max_lower),
                        "keep": max_lower < threshold,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    out = assigned.groupby("cluster").map_groups(mark, batch_format="pandas").to_pandas()
    return out.sort_values("vec_id", ignore_index=True)


# ------------------------------------------------------- corpus-law analysis


def doc_zipf(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """Zipf rank-frequency profile of the corpus: the top_n tokens by term
    frequency with their rank, plus the fitted log-log slope (OLS of ln(tf)
    on ln(rank) — a Zipfian corpus sits near -1). The standard "is this
    corpus natural / degenerate / bot-spammed" diagnostic.

    Dataflow: the doc_vocab wordcount (per-batch combiner -> one token-key
    exchange) -> per-partition partial top-n (each hash partition emits its
    own n best) -> driver merges P x n rows. Ordering is (tf desc, token
    asc) in both engines, so ranks are deterministic; the slope is a
    round-6 double (same OLS formula as DuckDB's regr_slope over 100
    points — ulp-safe at that scale)."""
    vocab = doc_vocab(sf_dir, min_count=1)

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["tf", "token"], ascending=[False, True])
        return df.head(top_n)[["token", "tf"]]

    parts = vocab.map_batches(partial_top, batch_format="pandas").to_pandas()
    top = (
        parts.sort_values(["tf", "token"], ascending=[False, True])
        .head(top_n)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    x = np.log(top["rank"].to_numpy(np.float64))
    y = np.log(top["tf"].to_numpy(np.float64))
    xc = x - x.mean()
    slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
    top["zipf_slope"] = np.round(slope, 6)
    top["tf"] = top["tf"].astype(np.int64)
    return top[["rank", "token", "tf", "zipf_slope"]]


def doc_zipf_sql(sf_dir: str, top_n: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE token <> '' GROUP BY token
),
top AS (
  SELECT token, tf,
         CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rank
  FROM cnt ORDER BY tf DESC, token LIMIT {top_n}
),
s AS (SELECT round(regr_slope(ln(tf), ln(rank)), 6) AS zipf_slope FROM top)
SELECT top.rank, top.token, top.tf, s.zipf_slope
FROM top, s ORDER BY top.rank"""


def doc_redact(
    sf_dir: str, pattern: str = r"\b(customer|order|vector)\b", repl: str = "[REDACTED]"
) -> ray.data.Dataset:
    """Regex scrubbing / PII-redaction shape: replace every match of a
    compiled pattern in the text column and count the hits per document —
    the content-transform operator every compliance pipeline needs (emails,
    phone numbers, IDs; here demonstrated on corpus tokens since the
    synthetic text has no PII).

    Stateless arrow-native map: ONE C-level RE2 pass per batch for the
    replacement (pc.replace_substring_regex) and one for the count — no
    Python row loop, no shuffle. pyarrow and DuckDB both compile RE2, so
    the oracle matches byte-for-byte."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pc.cast(
                    pc.count_substring_regex(batch["text"], pattern), pa.int64()
                ),
                "text_redacted": pc.replace_substring_regex(batch["text"], pattern, repl),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_redact_sql(
    sf_dir: str, pattern: str = r"\b(customer|order|vector)\b", repl: str = "[REDACTED]"
) -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pattern}')) AS BIGINT) AS n_hits,
       regexp_replace(text, '{pattern}', '{repl}', 'g') AS text_redacted
FROM documents ORDER BY doc_id"""


def doc_contamination(sf_dir: str, eval_mod: int = 43) -> pd.DataFrame:
    """Benchmark-contamination scan: word-TRIGRAM overlap between every
    training document and a held-out "benchmark" set (here: doc_id %
    eval_mod == 0, a deterministic stand-in for an eval suite) — the
    decontamination operator every LLM data pipeline runs before training
    (n-gram collision against eval sets, cf. the public GPT-3/PaLM appendix
    methodology).

    Two-pass shape like doc_lm_stats: pass 1 extracts the benchmark's
    distinct trigrams DISTRIBUTED (per-batch combiner emits eval-doc
    trigrams only; the driver only ever holds the benchmark-sized set,
    which is small by nature) and broadcasts them once; pass 2 is a
    stateless scan scoring every non-eval doc's distinct-trigram overlap.
    The contaminated flag is the integer predicate 10*overlap >= 3*total
    (exact, no float threshold)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _trigrams(batch: pa.Table) -> pd.DataFrame:
        """(doc_id, trigram) distinct pairs for the batch, empty tokens
        dropped — vectorized: one split over the batch, shifted-array
        concatenation forms every trigram without a per-doc loop."""
        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).to_pandas().to_numpy()
        p = parent.filter(keep).to_pandas().to_numpy()
        if len(f) < 3:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "trigram": pd.Series(dtype="object")})
        valid = (p[:-2] == p[1:-1]) & (p[:-2] == p[2:])
        tri = pd.Series(f[:-2][valid]) + " " + pd.Series(f[1:-1][valid]) + " " + pd.Series(f[2:][valid])
        doc_ids = batch["doc_id"].to_numpy()
        out = pd.DataFrame({"doc_id": doc_ids[p[:-2][valid]], "trigram": tri.to_numpy()})
        return out.drop_duplicates(ignore_index=True)

    # pass 1: benchmark trigram set (distributed extract, driver holds only
    # the benchmark-sized distinct set)
    def eval_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["doc_id"].to_numpy()
        sel = (d % eval_mod) == 0
        sub = batch.filter(pa.array(sel))
        return _trigrams(sub)[["trigram"]].drop_duplicates(ignore_index=True)

    eval_tris = ds.map_batches(eval_partial, batch_format="pyarrow").to_pandas()
    eval_set = frozenset(eval_tris["trigram"].unique())
    eref = ray.put(eval_set)

    # pass 2: score every non-eval doc
    def score(batch: pa.Table) -> pd.DataFrame:
        es = ray.get(eref) if isinstance(eref, ray.ObjectRef) else eref
        d = batch["doc_id"].to_numpy()
        sub = batch.filter(pa.array((d % eval_mod) != 0))
        tri = _trigrams(sub)
        if tri.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_trigrams": pd.Series(dtype="int64"),
                                 "n_overlap": pd.Series(dtype="int64"),
                                 "overlap_frac": pd.Series(dtype="float64"),
                                 "contaminated": pd.Series(dtype="bool")})
        tri["hit"] = tri["trigram"].isin(es).astype(np.int64)
        agg = tri.groupby("doc_id", as_index=False).agg(
            n_trigrams=("trigram", "size"), n_overlap=("hit", "sum")
        )
        agg["n_trigrams"] = agg["n_trigrams"].astype(np.int64)
        agg["n_overlap"] = agg["n_overlap"].astype(np.int64)
        agg["overlap_frac"] = np.round(agg["n_overlap"] / agg["n_trigrams"], 6)
        agg["contaminated"] = 10 * agg["n_overlap"] >= 3 * agg["n_trigrams"]
        return agg

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def doc_contamination_sql(sf_dir: str, eval_mod: int = 43) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks WHERE len(t) >= 3
),
dtri AS (SELECT DISTINCT doc_id, g FROM tri),
eval_set AS (SELECT DISTINCT g FROM dtri WHERE doc_id % {eval_mod} = 0)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       round(SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) / (count(*) * 1.0), 6) AS overlap_frac,
       10 * SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) >= 3 * count(*) AS contaminated
FROM dtri d LEFT JOIN eval_set e USING (g)
WHERE d.doc_id % {eval_mod} <> 0
GROUP BY 1 ORDER BY 1"""


# -------------------------------------------------------- partitioned export


def doc_export_shards(sf_dir: str, root: str | None = None) -> pd.DataFrame:
    """Partitioned training-shard export + read-back verification: write the
    documents table as hive-partitioned parquet (one directory per lang —
    the resumable-output layout: a failed run re-lists the partition dirs
    and skips finished ones), then read it BACK per partition and report
    per-lang row/char counts from the WRITTEN bytes.

    The returned numbers come from the round-tripped files, not the input,
    so the oracle (same aggregate over the source table) proves the sink
    lost/duplicated nothing. Output path is per-sf and wiped first, so
    reruns are deterministic."""
    import os
    import shutil

    from quant_feature_pipeline_ray.ckpt import ckpt_path

    if root is None:
        root = ckpt_path("graft_doc_shards")
    out_dir = os.path.join(root, os.path.basename(sf_dir))
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars", "text"]
    )
    ds.write_parquet(out_dir, partition_cols=["lang"])

    back = ray.data.read_parquet(out_dir)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "n_docs": np.ones(len(batch), np.int64),
                "total_chars": batch["n_chars"].to_numpy().astype(np.int64),
            }
        )
        return df.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
        )

    parts = back.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    return out.sort_values("lang", ignore_index=True)


def doc_export_shards_sql(sf_dir: str) -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang"""


def doc_source_mix(sf_dir: str) -> pd.DataFrame:
    """Domain-mixing / source reweighting: sample the corpus down to a
    TARGET source mix (here 3:1 even:odd source ids — the "upweight
    curated domains" move every LLM data recipe makes) with deterministic,
    engine-independent selection.

    Two-pass, all integer:
      pass 1: per-source counts (tiny groupby through one exchange);
      driver: unit U = min_s floor(n_s / w_s); per-source keep threshold
              t_s = (w_s * U) << 32 // n_s — so each source keeps ~w_s * U
              docs and the kept corpus hits the target ratio;
      pass 2: stateless filter keep iff md5(doc_id)[:8] as u32 < t_s —
              the same bit-stable uniform as doc_stratified_sample, so the
              exact kept SET is SQL-checkable (at scale swap md5 for a
              vectorized 64-bit mixer; the structure is unchanged)."""
    import hashlib

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    cnt = grouped_aggregate(
        ds, "source", {"n": ("doc_id", "size")}, num_partitions=8
    ).to_pandas()

    def weight(src: str) -> int:
        return 3 if int(src[3:]) % 2 == 0 else 1

    cnt["w"] = cnt["source"].map(weight).astype(np.int64)
    unit = int((cnt["n"].astype(np.int64) // cnt["w"]).min())
    thr = {
        s: (int(w) * unit * 4294967296) // int(n)
        for s, n, w in zip(cnt["source"], cnt["n"], cnt["w"])
    }
    tref = ray.put(thr)

    def keep(batch: pa.Table) -> pd.DataFrame:
        t = ray.get(tref) if isinstance(tref, ray.ObjectRef) else tref
        ids = batch["doc_id"].to_numpy()
        src = batch["source"].to_numpy(zero_copy_only=False)
        u32 = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) for d in ids),
            dtype=np.int64,
            count=len(ids),
        )
        tv = np.fromiter((t[s] for s in src), dtype=np.int64, count=len(src))
        m = u32 < tv
        return pd.DataFrame({"doc_id": ids[m], "source": src[m]})

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def doc_source_mix_sql(sf_dir: str) -> str:
    return """
WITH cnt AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 3 ELSE 1 END AS w
  FROM documents GROUP BY 1
),
u AS (SELECT min(n // w) AS unit FROM cnt),
thr AS (
  SELECT source, (w::HUGEINT * (SELECT unit FROM u) * 4294967296) // n AS t
  FROM cnt
)
SELECT d.doc_id, d.source
FROM documents d JOIN thr ON thr.source = d.source
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT < thr.t
ORDER BY d.doc_id"""


# --------------------------------------------------------- incremental dedup


def doc_dedup_incremental(
    ds: "ray.data.Dataset",
    state_root: str,
    num_partitions: int = 32,
    batch_id: str | None = None,
) -> pd.DataFrame:
    """Incremental exact dedup against a PERSISTED hash state — the
    streaming-corpus shape: batches of new documents arrive over time, and
    a doc is kept iff its content was never seen in ANY earlier batch (nor
    earlier in this one, by doc_id order). The state is the document
    analogue of the transcript engine's per-conversation ConvState
    (manifest.run_incremental_append): hash-partitioned parquet files, one
    per partition, updated atomically batch after batch.

    Dataflow: content-hash per batch (text never moves) -> ONE hash
    exchange on the partition key -> each partition loads only ITS state
    file (bounded: 1/num_partitions of the seen-hash set), filters
    new-batch dups in doc_id order, rewrites its state file via
    tmp+rename.

    Crash recovery (round-2 ADVICE): the per-partition commit is ATOMIC
    WITH THE EMITTED KEEP-SET — each state row records (h, doc_id,
    batch_id), so the state file doubles as the keep log. A retry of the
    SAME batch (same `batch_id`) against a partition that already
    committed returns that partition's recorded keeps verbatim instead of
    re-filtering them out as "seen"; partitions that had not committed
    compute fresh. Callers that may retry MUST pass a stable `batch_id`;
    with the default None a fresh ingest id is minted, which gives pure
    append semantics (a replayed all-seen batch keeps nothing).

    `state_root` must be on storage every worker node can reach (NFS /
    object store mount) on a multi-node cluster — the partition files are
    read and atomically replaced from whichever node runs the group.

    Returns the kept (doc_id, h) rows. tests pin two-batch append ==
    one-shot doc_exact_dedup representatives, bitwise, plus the
    crash-retry replay."""
    import os
    import tempfile
    import uuid

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    os.makedirs(state_root, exist_ok=True)
    bid = batch_id if batch_id is not None else f"auto-{uuid.uuid4().hex}"

    def hash_stage(batch: pa.Table) -> pd.DataFrame:
        h = content_hash(batch["text"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "h": h})

    hashed = ds.map_batches(hash_stage, batch_format="pyarrow")

    _EMPTY_STATE = {"h": "int64", "doc_id": "int64", "batch_id": "object"}

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        part = int(
            (g["h"].to_numpy(np.int64).view(np.uint64)[0] * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(40)
        ) % num_partitions if len(g) else 0
        # all rows in one call share the partition by construction; recompute
        # the canonical id from the bucket column is avoided — derive from h
        path = os.path.join(state_root, f"part{part:05d}.parquet")
        state = (
            pd.read_parquet(path)
            if os.path.exists(path)
            else pd.DataFrame({c: pd.Series(dtype=t) for c, t in _EMPTY_STATE.items()})
        )
        committed = state[state["batch_id"].to_numpy() == bid]
        if len(committed):
            # this (partition, batch) already committed — crash-retry
            # replay: return exactly the keep-set recorded atomically with
            # the state, never re-filter it out as "seen"
            return (
                committed[["doc_id", "h"]]
                .sort_values("doc_id", kind="mergesort")
                .reset_index(drop=True)
            )
        seen = state["h"].to_numpy(np.int64)
        g = g.sort_values("doc_id", kind="mergesort")
        first_in_batch = ~g["h"].duplicated(keep="first").to_numpy()
        fresh = ~g["h"].isin(seen).to_numpy() & first_in_batch
        kept = g[fresh][["doc_id", "h"]].reset_index(drop=True)
        new_state = pd.concat(
            [state, kept.assign(batch_id=bid)], ignore_index=True
        )
        fd, tmp = tempfile.mkstemp(dir=state_root)
        os.close(fd)
        new_state.to_parquet(tmp)
        os.replace(tmp, path)
        return kept

    def add_pk(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy().view(np.uint64)
        pk = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(num_partitions)
        return b.append_column("pk", pa.array(pk.astype(np.int32)))

    out = (
        hashed.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda df: dedup_partition(df.drop(columns=["pk"])), batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "h": pd.Series(dtype="int64")})
    return out.sort_values("doc_id", ignore_index=True)


def doc_dedup_incremental_run(sf_dir: str) -> pd.DataFrame:
    """Driver-facing demonstration of doc_dedup_incremental: the corpus
    arrives as two batches (split at the median doc_id), each deduped
    against the persisted state in turn. The union of kept ids must equal
    the ONE-SHOT exact-dedup representatives — which is exactly what the
    SQL oracle computes, so the incremental path is oracle-gated, not just
    pytest-gated."""
    import os
    import shutil

    from quant_feature_pipeline_ray.ckpt import ckpt_path

    state = ckpt_path(
        "graft_dedup_state", f"pid{os.getpid()}_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(state, ignore_errors=True)

    from quant_feature_pipeline_ray.stages.normalize import approx_quantiles

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    # distributed q-digest median — nothing row-scaled reaches the driver
    # (round-2 verdict: the demo previously pulled every doc_id down); the
    # keep-set union is invariant to the exact cut, so approximate is fine
    cut = int(approx_quantiles(docs, "doc_id", (0.5,))[0.5])

    import pyarrow.compute as pc

    b1 = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pc.field("doc_id") <= cut,
    )
    b2 = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pc.field("doc_id") > cut,
    )
    k1 = doc_dedup_incremental(b1, state, batch_id="demo-b1")
    k2 = doc_dedup_incremental(b2, state, batch_id="demo-b2")
    out = pd.concat([k1, k2], ignore_index=True)[["doc_id"]]
    out = out.rename(columns={"doc_id": "rep_doc_id"})
    return out.sort_values("rep_doc_id", ignore_index=True)


def doc_dedup_incremental_run_sql(sf_dir: str) -> str:
    return """
SELECT CAST(min(doc_id) AS BIGINT) AS rep_doc_id
FROM documents GROUP BY text ORDER BY rep_doc_id"""


# ----------------------------------------------------- global sort / ranking


def doc_curriculum_rank(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """GLOBAL sort/rank of the corpus by a difficulty score (here n_chars,
    tie-break doc_id) — the curriculum-ordering operator ("train on short
    docs first"), and the repo's demonstration of the scalable global-sort
    pattern Ray's own ds.sort uses under the hood, built explicitly:

      sample:    bounded score sample -> driver picks P-1 split points
                 (ties NEVER split: partition id = searchsorted(splits,
                 score), so equal scores share a partition by construction)
      exchange:  ONE range shuffle by partition id; only (doc_id, score)
                 rides — never text
      rank:      per-partition sort + local rank (vectorized argsort)
      offsets:   per-partition counts -> driver prefix-sums P integers ->
                 broadcast -> stateless map adds offset[pid]

    global_rank is exactly row_number() OVER (ORDER BY score, doc_id) —
    the oracle checks every rank, which pins both the range partitioner
    (no row in the wrong partition) and the offset arithmetic."""
    from quant_feature_pipeline_ray.stages.partition import BUCKET_COL

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    # bounded sample: fine-grained quantile split points from up to 64k rows
    sample = ds.limit(65536).to_pandas()["n_chars"].to_numpy()
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    splits = np.unique(np.quantile(sample, qs, method="lower"))

    def assign(batch: pa.Table) -> pd.DataFrame:
        s = batch["n_chars"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "score": s,
                "pid": np.searchsorted(splits, s, side="right").astype(np.int32),
            }
        )

    def local_rank(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["doc_id"].to_numpy(), g["score"].to_numpy()))
        out = g.iloc[order].reset_index(drop=True)
        out["local_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    ranked = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(local_rank, batch_format="pandas")
        .materialize()  # small columns only (doc_id, score, pid, local_rank)
    )

    def count_partial(b: pa.Table) -> pd.DataFrame:
        pid, n = np.unique(b["pid"].to_numpy(), return_counts=True)
        return pd.DataFrame({"pid": pid, "n": n.astype(np.int64)})

    counts = (
        ranked.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("pid")["n"]
        .sum()
        .sort_index()
    )
    offs = counts.cumsum().shift(fill_value=0).to_dict()
    oref = ray.put(offs)

    def add_offset(batch: pa.Table) -> pd.DataFrame:
        o = ray.get(oref) if isinstance(oref, ray.ObjectRef) else oref
        pid = batch["pid"].to_numpy()
        base = np.fromiter((o[int(p)] for p in pid), dtype=np.int64, count=len(pid))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "score": batch["score"].to_numpy(),
                "global_rank": base + batch["local_rank"].to_numpy(),
            }
        )

    out = ranked.map_batches(add_offset, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def doc_curriculum_rank_sql(sf_dir: str) -> str:
    return """
SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS global_rank
FROM documents ORDER BY doc_id"""


def emb_outliers(
    sf_dir: str,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    tail_ppm: int = 50_000,
) -> pd.DataFrame:
    """Prototypicality outlier flagging (the complement of SemDeDup's
    keep-the-prototype move): score every vector by cosine distance to its
    nearest seeded centroid, and flag the global tail (top tail_ppm
    parts-per-million most-distant) as outliers — the "drop the weird 5%"
    curation pass.

    Distributed shape: centroids broadcast -> stateless per-batch
    assignment + distance -> the global threshold comes from the EXACT
    value-counts histogram over round-6 distances (stages/normalize
    discipline: a bounded keyspace, nothing row-scaled on the driver) ->
    stateless flag pass. Deterministic given the seeded k-means; pytest
    pins exact parity vs straight-line numpy."""
    cent = _kmeans_centroids(sf_dir, n_clusters, kmeans_iters, sample_max)
    cent_ref = ray.put(cent)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def score(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        # round-6 BEFORE the argmax (the emb_ann_topk ranking discipline):
        # assignment ties are then exact and break on the lowest cluster id
        # on both sides, making the whole op SQL-mirrorable
        sims = np.round(u @ c.T, 6)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(),
                "cluster": np.argmax(sims, axis=1).astype(np.int64),
                "dist": np.round(1.0 - sims.max(axis=1), 6),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()

    # exact distributed histogram over the round-6 distance grid -> the
    # global (1 - tail) quantile threshold, computed from value counts
    def vc(batch: pa.Table) -> pd.DataFrame:
        v, n = np.unique(batch["dist"].to_numpy(), return_counts=True)
        return pd.DataFrame({"v": v, "n": n.astype(np.int64)})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    hist = (
        grouped_aggregate(
            scored.map_batches(vc, batch_format="pyarrow"), "v", {"n": ("n", "sum")}
        )
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    total = int(hist["n"].sum())
    keep_n = total - (total * tail_ppm) // 1_000_000  # rows NOT flagged
    cum = hist["n"].cumsum()
    thr = float(hist["v"].iloc[int(np.searchsorted(cum.to_numpy(), keep_n))]) if keep_n < total else np.inf

    def flag(batch: pa.Table) -> pd.DataFrame:
        d = batch["dist"].to_numpy()
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(),
                "cluster": batch["cluster"].to_numpy(),
                "dist": d,
                "is_outlier": d > thr,
            }
        )

    out = scored.map_batches(flag, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id", ignore_index=True)


def emb_outliers_sql(
    sf_dir: str,
    n_clusters: int = 16,
    kmeans_iters: int = 5,
    sample_max: int = 65536,
    tail_ppm: int = 50_000,
) -> str:
    """Exact mirror of emb_outliers DOWNSTREAM of the seeded k-means: the
    centroids (float-recursive, not SQL-expressible) are recomputed by the
    shared _kmeans_core from the same sample bytes and embedded as
    round-trip literals — the same broadcast-constant discipline as
    emb_ann_topk's query matrix. The SQL then mirrors assignment (round-6
    sims, argmax with lowest-cluster tie-break), the exact value-counts
    histogram threshold (searchsorted-left == min v with cum >= keep_n),
    and the strict > flag."""
    import pandas as pd

    sample = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"]).head(
        sample_max
    )
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    cent = _kmeans_core(smat, n_clusters, kmeans_iters)
    rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in cent[i])}]::DOUBLE[])"
        for i in range(len(cent))
    )
    keep_expr = f"t - (t * {tail_ppm}) // 1000000"
    return f"""
WITH cent(cluster, ce) AS (VALUES
    {rows}
), sims AS (
  SELECT e.vec_id, c.cluster,
         round(list_inner_product(e.embedding::DOUBLE[], c.ce)
               / greatest(sqrt(list_inner_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[])), 1e-12),
               6) AS sim
  FROM embeddings e CROSS JOIN cent c
), best AS (
  SELECT vec_id, cluster, round(1.0 - sim, 6) AS dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cluster) AS rn
  FROM sims
), sc AS (SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist FROM best WHERE rn = 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM sc),
cum AS (
  SELECT dist AS v, sum(CAST(count(*) AS BIGINT)) OVER (ORDER BY dist) AS c
  FROM sc GROUP BY dist
), thr AS (SELECT min(v) AS tv FROM cum, tot WHERE c >= {keep_expr})
SELECT sc.vec_id, sc.cluster, sc.dist,
       sc.dist > COALESCE(thr.tv, 1e308) AS is_outlier
FROM sc, thr ORDER BY sc.vec_id"""


def doc_graph_pagerank(
    sf_dir: str,
    threshold: float = 0.82,
    n_iters: int = 5,
    damping: float = 0.85,
) -> pd.DataFrame:
    """PageRank over the (undirected) near-dup similarity graph — graph
    centrality as a REPRESENTATIVE-QUALITY signal: inside a dup cluster the
    highest-rank member is the most-connected (most "canonical") copy,
    a better keep-choice than min-doc_id when copies differ in quality.

    Bulk-synchronous distributed power iteration, TWO hash exchanges per
    round (the minimum: contributions must re-key from src to dst, and the
    per-node update joins the static degree table):

      exchange 1 (key=node/src): static edge list + current (node, deg, r)
        rows ride one tagged union; per partition each edge picks up its
        source's r/deg -> (dst, contrib) rows out
      exchange 2 (key=dst/node): contributions + the static (node, deg)
        table; per partition r' = (1-d)/N + d*(sum_contrib + dangling/N)

    The dangling mass (deg-0 nodes' rank) is a per-round driver SCALAR from
    per-batch partial sums. Ranks are materialized each round (iterative
    lineage would otherwise recompute from scratch). Float sums are
    order-dependent -> rows-only; pytest pins allclose parity vs a
    straight-line numpy power iteration and sum(r) == 1."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    pairs = lsh_verified_pairs(sf_dir, threshold=threshold).select_columns(
        ["doc_a", "doc_b"]
    )

    def sym(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy()
        c = b["doc_b"].to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, c])),
                "dst": pa.array(np.concatenate([c, a])),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    # static degree table over ALL docs (deg 0 = dangling)
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    deg = grouped_aggregate(
        edges, "src", {"deg": ("dst", "size")}, num_partitions=16
    ).to_pandas()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_docs = docs.count()
    deg_map = dict(zip(deg["src"].astype(np.int64), deg["deg"].astype(np.int64)))
    dref = ray.put(deg_map)

    def init_ranks(b: pa.Table) -> pd.DataFrame:
        dm = ray.get(dref) if isinstance(dref, ray.ObjectRef) else dref
        ids = b["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "node": ids,
                "deg": np.fromiter((dm.get(int(i), 0) for i in ids), np.int64, len(ids)),
                "r": np.full(len(ids), 1.0 / n_docs),
            }
        )

    ranks = docs.map_batches(init_ranks, batch_format="pyarrow").materialize()

    base = (1.0 - damping) / n_docs
    for _ in range(n_iters):
        # driver scalar: dangling mass via per-block partial sums (the
        # driver sees one float per block, never the rank rows)
        dang = float(
            ranks.map_batches(
                lambda b: pd.DataFrame(
                    {"s": [float(b["r"].to_numpy()[b["deg"].to_numpy() == 0].sum())]}
                ),
                batch_format="pyarrow",
            )
            .to_pandas()["s"]
            .sum()
        )

        rank_tagged = ranks.map_batches(
            lambda b: pa.table(
                {
                    "key": b["node"],
                    "dst": pa.array(np.full(len(b), -1, np.int64)),
                    "r": b["r"],
                    "deg": b["deg"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        edge_tagged = edges.map_batches(
            lambda b: pa.table(
                {
                    "key": b["src"],
                    "dst": b["dst"],
                    "r": pa.array(np.zeros(len(b))),
                    "deg": pa.array(np.full(len(b), -1, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )

        def contribs(g: pd.DataFrame) -> pd.DataFrame:
            nodes = g[g["deg"] >= 0]
            share = pd.Series(
                (nodes["r"] / nodes["deg"].clip(lower=1)).to_numpy(), index=nodes["key"]
            )
            e = g[g["deg"] < 0]
            return pd.DataFrame(
                {"dst": e["dst"].to_numpy(np.int64), "c": e["key"].map(share).to_numpy()}
            )

        contrib = partition_map_groups(
            rank_tagged.union(edge_tagged), contribs, key="key", num_buckets=16
        )

        node_tagged = ranks.map_batches(
            lambda b: pa.table(
                {
                    "dst": b["node"],
                    "c": pa.array(np.zeros(len(b))),
                    "deg": b["deg"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        contrib_tagged = contrib.map_batches(
            lambda b: pa.table(
                {
                    "dst": b["dst"],
                    "c": b["c"],
                    "deg": pa.array(np.full(len(b), -1, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )

        def update(g: pd.DataFrame, _dang=dang) -> pd.DataFrame:
            s = g.groupby("dst")["c"].sum()
            nodes = g[g["deg"] >= 0]
            new_r = base + damping * (
                nodes["dst"].map(s).to_numpy() + _dang / n_docs
            )
            return pd.DataFrame(
                {
                    "node": nodes["dst"].to_numpy(np.int64),
                    "deg": nodes["deg"].to_numpy(np.int64),
                    "r": new_r,
                }
            )

        # repartition BEFORE materializing: union+sort+map_groups roughly
        # doubles the block count every round (measured 48 -> 112 -> 240 at
        # sf0.01), which compounded into superlinear per-round cost
        # (9.7 s -> 133 s by round 5); pinning the block count keeps every
        # round O(1) executions over O(1) blocks (~3 s/round)
        ranks = (
            partition_map_groups(
                node_tagged.union(contrib_tagged), update, key="dst", num_buckets=16
            )
            .repartition(16)
            .materialize()
        )

    out = ranks.to_pandas()[["node", "r"]].rename(columns={"node": "doc_id", "r": "pagerank"})
    out["pagerank"] = np.round(out["pagerank"], 9)
    return out.sort_values("doc_id", ignore_index=True)


def emb_ann_pq(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    n_candidates: int = 64,
    kmeans_iters: int = 8,
    sample_max: int = 65536,
) -> pd.DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, public) — the
    memory-side scale lever completing the repo's similarity family
    (brute force = exact baseline, IVF = compute pruning, PQ = 8 bytes
    per vector instead of 256):

      train:   per-subspace k-means codebooks over a BOUNDED sample
               (driver holds m × k × d/m floats — constant-size)
      encode:  stateless map_batches: argmin per subspace -> uint8 codes;
               at 100 TB the code table is what persists, not the floats
      search:  asymmetric distance (ADC): per-query lookup tables
               (n_q × m × k, tiny) broadcast once; each batch scores every
               vector with m table lookups + a sum, emits a candidate
               partial top-N; the driver exact-reranks candidate ids only
               (candidate vectors are re-read via predicate pushdown).

    Approximate -> rows-only; pytest gates recall >= 0.8 vs emb_ann_topk
    after the exact rerank."""
    import pyarrow.compute as pc

    # --- train codebooks on a bounded sample
    sample = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .limit(sample_max)
        .to_pandas()
    )
    smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    d = smat.shape[1]
    assert d % n_subspaces == 0
    sub_d = d // n_subspaces
    rng = np.random.default_rng(13)
    codebooks = np.empty((n_subspaces, n_codes, sub_d))
    for m in range(n_subspaces):
        x = smat[:, m * sub_d : (m + 1) * sub_d]
        cent = x[rng.choice(len(x), size=min(n_codes, len(x)), replace=False)].copy()
        for _ in range(kmeans_iters):
            d2 = (
                np.einsum("ij,ij->i", x, x)[:, None]
                - 2.0 * x @ cent.T
                + np.einsum("ij,ij->i", cent, cent)[None, :]
            )
            a = d2.argmin(1)
            for c in range(len(cent)):
                msk = a == c
                if msk.any():
                    cent[c] = x[msk].mean(0)
        codebooks[m] = cent

    # --- queries + ADC lookup tables (n_q x m x k, broadcast once)
    qtbl = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id") < n_queries,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    qids = qtbl["vec_id"].to_numpy()
    qmat = np.stack(qtbl["embedding"].to_numpy()).astype(np.float64)
    luts = np.empty((len(qids), n_subspaces, n_codes))
    for m in range(n_subspaces):
        qs = qmat[:, m * sub_d : (m + 1) * sub_d]
        cb = codebooks[m]
        luts[:, m, :] = (
            np.einsum("ij,ij->i", qs, qs)[:, None]
            - 2.0 * qs @ cb.T
            + np.einsum("ij,ij->i", cb, cb)[None, :]
        )
    bref = ray.put((codebooks, qids, luts))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class EncodeScore:
        def __init__(self, ref):
            self.cb, self.qids, self.luts = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            vids = batch["vec_id"].to_numpy()
            n, nq = len(vids), len(self.qids)
            dist = np.zeros((nq, n))
            for m in range(n_subspaces):
                x = mat[:, m * sub_d : (m + 1) * sub_d]
                cb = self.cb[m]
                d2 = (
                    np.einsum("ij,ij->i", x, x)[:, None]
                    - 2.0 * x @ cb.T
                    + np.einsum("ij,ij->i", cb, cb)[None, :]
                )
                codes = d2.argmin(1)  # encode
                dist += self.luts[:, m, codes]  # ADC accumulate
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(self.qids, n),
                    "vec_id": np.tile(vids, nq),
                    "adc": np.round(dist.reshape(-1), 6),
                }
            )
            out = out[out["query_id"] != out["vec_id"]]
            out = out.sort_values(["query_id", "adc", "vec_id"])
            return out.groupby("query_id", as_index=False).head(n_candidates)

    partials = ds.map_batches(
        EncodeScore, fn_constructor_args=(bref,), batch_format="pyarrow", concurrency=2
    ).to_pandas()
    cand = (
        partials.sort_values(["query_id", "adc", "vec_id"])
        .groupby("query_id", as_index=False)
        .head(n_candidates)
    )

    # --- exact rerank of candidate ids only (predicate-pushdown re-read)
    cand_ids = np.unique(cand["vec_id"].to_numpy())
    cvecs = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(pa.array(cand_ids)),
        )
        .to_pandas()
        .set_index("vec_id")
    )
    qunit = qmat / np.maximum(np.sqrt(np.einsum("ij,ij->i", qmat, qmat))[:, None], 1e-12)
    rows = []
    for qi, qrow in enumerate(qids):
        ids = cand.loc[cand["query_id"] == qrow, "vec_id"].to_numpy()
        m = np.stack(cvecs.loc[ids, "embedding"].to_numpy()).astype(np.float64)
        u = m / np.maximum(np.sqrt(np.einsum("ij,ij->i", m, m))[:, None], 1e-12)
        sims = np.round(u @ qunit[qi], 6)
        order = np.lexsort((ids, -sims))[:k]
        for r, j in enumerate(order, start=1):
            rows.append((int(qrow), int(ids[j]), float(sims[j]), r))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim", "rank"])


def doc_source_kl(sf_dir: str) -> pd.DataFrame:
    """Distribution-shift diagnostic: KL(source ‖ corpus) over token
    unigram distributions, per source — the "which domain is drifting /
    which scrape is contaminated" check run before mixing sources into a
    training corpus.

    One token-key exchange builds integer (source, token) counts (the
    vocab dataflow with source riding the combiner); per-source and corpus
    totals are integer sums of the SAME partials; KL is then a stateless
    per-row expression + a small per-source sum. Tokens absent from a
    source contribute zero (standard plug-in estimator); every count is
    integer-exact, so the oracle matches on the round-6 divergence."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        src = batch["source"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "source": src[parent.filter(keep).to_numpy()],
                "token": flat.filter(keep).to_pandas().to_numpy(),
            }
        )
        out = df.groupby(["source", "token"], as_index=False).size()
        out["c"] = out.pop("size").astype(np.int64)
        return out

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["token", "source"],
        {"c": ("c", "sum")},
    ).to_pandas()

    # vocabulary-bounded tables from here on (driver-side is fine: the
    # token×source grid is dictionary-sized, never row-scaled)
    tok_tot = counts.groupby("token")["c"].sum()
    src_tot = counts.groupby("source")["c"].sum()
    N = int(counts["c"].sum())
    p_s = counts["c"].to_numpy(np.float64) / counts["source"].map(src_tot).to_numpy(np.float64)
    p = counts["token"].map(tok_tot).to_numpy(np.float64) / float(N)
    counts["term"] = p_s * np.log(p_s / p)
    out = counts.groupby("source", as_index=False).agg(kl=("term", "sum"))
    out["n_tokens"] = out["source"].map(src_tot).to_numpy(np.int64)
    out["kl"] = np.round(out["kl"], 6)
    return out.sort_values("source", ignore_index=True)[["source", "n_tokens", "kl"]]


def doc_source_kl_sql(sf_dir: str) -> str:
    return """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c FROM toks
  WHERE token <> '' GROUP BY 1, 2
),
st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS s FROM c GROUP BY 1),
tt AS (SELECT token, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY 1),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c)
SELECT c.source,
       CAST(any_value(st.s) AS BIGINT) AS n_tokens,
       round(SUM((c.c * 1.0 / st.s) * ln((c.c * 1.0 / st.s) / (tt.t * 1.0 / n.n))), 6) AS kl
FROM c JOIN st USING (source) JOIN tt USING (token), n
GROUP BY c.source ORDER BY c.source"""


# ------------------------------------------------------------- BM25 ranking
BM25_QUERY = ("spark", "window", "hash", "stream")


def doc_bm25_topk(
    sf_dir: str, k: int = 20, k1: float = 1.2, b: float = 0.75
) -> pd.DataFrame:
    """Top-k documents by BM25 score against a fixed query-term set.

    Distinct from doc_tfidf_topk (per-doc term ranking): BM25 ranks DOCS for
    a query, with term-frequency saturation (k1) and document-length
    normalization (b, against the corpus mean length avgdl).

    Scale shape: pass 1 reduces the corpus to O(1) scalars (n_docs, Σdl, df
    per query term) via one-row-per-batch partials; pass 2 scores each batch
    locally against those broadcast scalars and emits a per-batch partial
    top-k — the driver merges blocks x k rows. No shuffle at all.
    Float discipline: the score expression is written with the identical
    operation order as the SQL oracle and rounded to 6 decimals before
    ranking, so rank and value are engine-independent."""
    import math

    terms = list(BM25_QUERY)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        dl = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()
        row = {"n_docs": np.int64(len(batch)), "sum_dl": dl.sum()}
        for t in terms:
            tf = np.bincount(parent[flat == t], minlength=len(batch))
            row[f"df_{t}"] = np.int64((tf > 0).sum())
        return pd.DataFrame([row])

    st = ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    n_docs = int(st["n_docs"].sum())
    avgdl = int(st["sum_dl"].sum()) * 1.0 / n_docs
    idf = {
        t: math.log(1.0 + (n_docs - int(st[f"df_{t}"].sum()) + 0.5) / (int(st[f"df_{t}"].sum()) + 0.5))
        for t in terms
    }

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        dl = pc.list_value_length(split).to_numpy().astype(np.float64)
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()
        norm = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(batch), dtype=np.float64)
        any_tf = np.zeros(len(batch), dtype=np.int64)
        for t in terms:  # fixed term order == SQL expression order (FP parity)
            tf = np.bincount(parent[flat == t], minlength=len(batch)).astype(np.float64)
            score = score + idf[t] * (tf * (k1 + 1.0)) / (tf + norm)
            any_tf += tf.astype(np.int64)
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "score": np.round(score, 6)}
        )
        out = out[any_tf > 0]
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)

    parts = ds.map_batches(score_partial, batch_format="pyarrow", batch_size=4096).to_pandas()
    top = (
        parts.sort_values(["score", "doc_id"], ascending=[False, True], ignore_index=True)
        .head(k)
        .reset_index(drop=True)
    )
    top.insert(1, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[["doc_id", "rank", "score"]]


def doc_bm25_topk_sql(sf_dir: str, k: int = 20, k1: float = 1.2, b: float = 0.75) -> str:
    terms = list(BM25_QUERY)
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT) AS tf_{t}" for t in terms
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in terms
    )
    score_terms = " + ".join(
        f"ln(1.0 + (stats.n_docs - df.df_{t} + 0.5) / (df.df_{t} + 0.5))"
        f" * (tf.tf_{t} * ({k1} + 1.0)) / (tf.tf_{t} + {k1} * (1.0 - {b} + {b} * tf.dl / stats.avgdl))"
        for t in terms
    )
    any_tf = " + ".join(f"tf.tf_{t}" for t in terms)
    return f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, SUM(len(toks)) * 1.0 / count(*) AS avgdl FROM s),
tf AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         {tf_cols}
       FROM s),
df AS (SELECT {df_cols} FROM tf)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY round({score_terms}, 6) DESC, doc_id) AS BIGINT) AS rank,
       round({score_terms}, 6) AS score
FROM tf, stats, df
WHERE {any_tf} > 0
ORDER BY score DESC, doc_id
LIMIT {k}"""


# ------------------------------------------- within-doc repetition signals
def doc_repetition(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style within-document repetition signals: the fraction of
    token positions covered by the single most frequent token, and of
    adjacent-bigram positions covered by the most frequent bigram
    (high values flag boilerplate / degenerate generations; cf. Rae et al.
    2021 "Scaling Language Models" repetition filters, public paper).

    Stateless vectorized scan — one arrow split per batch, adjacency via a
    same-parent mask over the flattened token stream (no per-row loop), two
    C-level pandas groupbys per batch, no shuffle. Ties on the max count
    break lexicographically (token ASC) in both engines."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        n_tokens = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()

        uc = (
            pd.DataFrame({"d": parent, "tok": flat})
            .groupby(["d", "tok"], as_index=False)
            .size()
            .sort_values(["d", "size", "tok"], ascending=[True, False, True])
            .groupby("d", as_index=False, sort=False)
            .head(1)
        )
        top_tok = np.empty(len(batch), dtype=object)
        top_tok[uc["d"].to_numpy()] = uc["tok"].to_numpy()
        top_tok_n = np.zeros(len(batch), dtype=np.int64)
        top_tok_n[uc["d"].to_numpy()] = uc["size"].to_numpy()

        adj = parent[:-1] == parent[1:]
        top_big = np.full(len(batch), "", dtype=object)
        top_big_n = np.zeros(len(batch), dtype=np.int64)
        if adj.any():
            bg = pd.DataFrame(
                {"d": parent[:-1][adj], "bigram": flat[:-1][adj] + " " + flat[1:][adj]}
            )
            bc = (
                bg.groupby(["d", "bigram"], as_index=False)
                .size()
                .sort_values(["d", "size", "bigram"], ascending=[True, False, True])
                .groupby("d", as_index=False, sort=False)
                .head(1)
            )
            top_big[bc["d"].to_numpy()] = bc["bigram"].to_numpy()
            top_big_n[bc["d"].to_numpy()] = bc["size"].to_numpy()

        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_tokens": n_tokens,
                "top_token": top_tok,
                "top_token_n": top_tok_n,
                "top_token_frac": top_tok_n * 1.0 / n_tokens,
                "top_bigram": top_big,
                "top_bigram_n": top_big_n,
                "top_bigram_frac": np.where(
                    n_tokens >= 2, top_big_n * 1.0 / np.maximum(n_tokens - 1, 1), 0.0
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_repetition_sql(sf_dir: str) -> str:
    return """
WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT doc_id, unnest(toks) AS tok FROM s),
uc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY doc_id, tok),
ut AS (SELECT doc_id, tok, c,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
       FROM uc),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
       FROM s),
bc AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY doc_id, bigram),
bt AS (SELECT doc_id, bigram, c,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) AS rn
       FROM bc),
n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM s)
SELECT n.doc_id, n.n_tokens,
       ut.tok AS top_token, ut.c AS top_token_n,
       ut.c * 1.0 / n.n_tokens AS top_token_frac,
       COALESCE(bt.bigram, '') AS top_bigram,
       CAST(COALESCE(bt.c, 0) AS BIGINT) AS top_bigram_n,
       CASE WHEN n.n_tokens >= 2
            THEN COALESCE(bt.c, 0) * 1.0 / (n.n_tokens - 1) ELSE 0.0 END AS top_bigram_frac
FROM n
JOIN ut ON ut.doc_id = n.doc_id AND ut.rn = 1
LEFT JOIN bt ON bt.doc_id = n.doc_id AND bt.rn = 1
ORDER BY n.doc_id"""


# ------------------------------------------------------- PMI collocations
def doc_pmi_bigrams(sf_dir: str, min_count: int = 5, top_n: int = 50) -> pd.DataFrame:
    """Corpus-level collocation mining: top-n adjacent token bigrams by
    pointwise mutual information (Church & Hanks 1990, public paper).

    Scale shape: per-batch bigram COMBINER (one row per distinct bigram per
    batch) -> ONE hash exchange (grouped_aggregate) to global bigram counts
    -> scalar total via Dataset.sum -> score inside map_batches against the
    BROADCAST unigram-count table (vocabulary-bounded, built by the
    doc_vocab dataflow) -> per-batch partial top-n, driver merges
    blocks x n rows. The bigram-count dataset is materialized once because
    it is consumed twice (total + scoring); it is vocab^2-bounded, not
    corpus-bounded."""
    uni = doc_vocab(sf_dir, min_count=1).to_pandas()  # vocabulary-bounded
    t_uni = int(uni["tf"].sum())
    uni_ref = ray.put(dict(zip(uni["token"], uni["tf"].astype(np.int64))))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()
        adj = parent[:-1] == parent[1:]
        if not adj.any():
            return pd.DataFrame(
                {
                    "x": pd.Series(dtype=object),
                    "y": pd.Series(dtype=object),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        p = pd.DataFrame({"x": flat[:-1][adj], "y": flat[1:][adj]})
        out = p.groupby(["x", "y"], as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["x", "y"],
        {"n": ("n", "sum")},
    ).materialize()
    t_big = int(counts.sum("n"))

    class Score:
        def __init__(self, ref):
            self.uni = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            df = df[df["n"] >= min_count]
            if df.empty:
                return pd.DataFrame(
                    {
                        "bigram": pd.Series(dtype=object),
                        "n": pd.Series(dtype=np.int64),
                        "pmi": pd.Series(dtype=np.float64),
                    }
                )
            cx = df["x"].map(self.uni).to_numpy(dtype=np.int64)
            cy = df["y"].map(self.uni).to_numpy(dtype=np.int64)
            n = df["n"].to_numpy(dtype=np.int64)
            pmi = np.round(np.log((n * 1.0 * t_uni * t_uni) / (cx * 1.0 * cy * t_big)), 6)
            out = pd.DataFrame(
                {"bigram": df["x"].to_numpy() + " " + df["y"].to_numpy(), "n": n, "pmi": pmi}
            )
            return out.sort_values(["pmi", "bigram"], ascending=[False, True]).head(top_n)


    parts = counts.map_batches(
        Score, fn_constructor_args=(uni_ref,), batch_format="pyarrow", concurrency=2
    ).to_pandas()
    return (
        parts.sort_values(["pmi", "bigram"], ascending=[False, True], ignore_index=True)
        .head(top_n)
        .reset_index(drop=True)
    )


def doc_pmi_bigrams_sql(sf_dir: str, min_count: int = 5, top_n: int = 50) -> str:
    return f"""
WITH s AS (SELECT string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM s),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni WHERE tok <> '' GROUP BY tok),
tu AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM uc),
bg AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
       FROM s),
bgc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY bigram),
tb AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM bgc)
SELECT bgc.bigram, bgc.n,
       round(ln((bgc.n * 1.0 * tu.t * tu.t) / (ux.c * 1.0 * uy.c * tb.t)), 6) AS pmi
FROM bgc
CROSS JOIN tu
CROSS JOIN tb
JOIN uc ux ON ux.tok = string_split(bgc.bigram, ' ')[1]
JOIN uc uy ON uy.tok = string_split(bgc.bigram, ' ')[2]
WHERE bgc.n >= {min_count}
ORDER BY pmi DESC, bigram
LIMIT {top_n}"""


# --------------------------------------------------- bigram-LM perplexity
def doc_perplexity(sf_dir: str) -> ray.data.Dataset:
    """Per-document perplexity under an add-one-smoothed corpus bigram LM —
    the CCNet-style quality signal (Wenzek et al. 2020, public paper): docs
    whose token transitions are unlike the corpus score high ppl and get
    routed to the tail quality bucket.

    P(y|x) = (c(x,y) + 1) / (c(x) + V); ppl(doc) = exp(-mean ln P) over the
    doc's adjacent token pairs (docs with < 2 tokens have no transitions and
    are excluded in both engines).

    Scale shape: the LM itself is the corpus bigram/unigram count table —
    built by the doc_pmi_bigrams combiner dataflow (one hash exchange),
    collected ONLY because this corpus' bigram vocabulary is bounded
    (vocab²); at open-vocabulary scale the table would be count-pruned
    (min_count) before broadcast, which is the standard CCNet recipe.
    Scoring is then a stateless vectorized scan: one arrow split per batch,
    dict-mapped transition counts, per-doc sums via np.bincount — no second
    exchange, no driver loop."""
    uni = doc_vocab(sf_dir, min_count=1).to_pandas()  # vocabulary-bounded
    v = np.int64(len(uni))
    uni_ref = ray.put(dict(zip(uni["token"], uni["tf"].astype(np.int64))))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bigram_partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()
        adj = parent[:-1] == parent[1:]
        if not adj.any():
            return pd.DataFrame(
                {"bigram": pd.Series(dtype=object), "n": pd.Series(dtype=np.int64)}
            )
        p = pd.DataFrame({"bigram": flat[:-1][adj] + " " + flat[1:][adj]})
        out = p.groupby("bigram", as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    bgc = grouped_aggregate(
        ds.map_batches(bigram_partial, batch_format="pyarrow", batch_size=4096),
        "bigram",
        {"n": ("n", "sum")},
    ).to_pandas()  # bigram-vocabulary-bounded (see docstring)
    bg_ref = ray.put(dict(zip(bgc["bigram"], bgc["n"].astype(np.int64))))

    class Score:
        def __init__(self, uref, bref):
            self.uni = ray.get(uref) if isinstance(uref, ray.ObjectRef) else uref
            self.bg = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            split = pc.split_pattern(batch["text"], " ")
            flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
            parent = pc.list_parent_indices(split).to_numpy()
            adj = parent[:-1] == parent[1:]
            d = parent[:-1][adj]
            xs = pd.Series(flat[:-1][adj])
            key = xs + " " + pd.Series(flat[1:][adj])
            n_xy = key.map(self.bg).to_numpy(dtype=np.int64)
            c_x = xs.map(self.uni).to_numpy(dtype=np.int64)
            ll = np.log((n_xy + 1.0) / (c_x + v))
            n_rows = len(batch)
            cnt = np.bincount(d, minlength=n_rows)
            tot = np.bincount(d, weights=ll, minlength=n_rows)
            keep = cnt > 0
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[keep],
                    "n_bigrams": cnt[keep].astype(np.int64),
                    "ppl": np.round(np.exp(-(tot[keep] / cnt[keep])), 6),
                }
            )

    return ds.map_batches(
        Score, fn_constructor_args=(uni_ref, bg_ref), batch_format="pyarrow", concurrency=2
    )


def doc_perplexity_sql(sf_dir: str) -> str:
    return """
WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM s),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni WHERE tok <> '' GROUP BY tok),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uc),
bgd AS (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM s),
bgc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bgd GROUP BY bigram),
ll AS (SELECT d.doc_id, ln((bgc.n + 1.0) / (uc.c + v.v)) AS ll
       FROM bgd d
       JOIN bgc ON bgc.bigram = d.bigram
       JOIN uc ON uc.tok = string_split(d.bigram, ' ')[1]
       CROSS JOIN v)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-(SUM(ll) / count(*))), 6) AS ppl
FROM ll
GROUP BY doc_id
ORDER BY doc_id"""


def doc_backoff_trigram(sf_dir: str, alpha: float = 0.4) -> ray.data.Dataset:
    """Per-document mean log-score under a STUPID BACKOFF trigram LM
    (Brants et al. EMNLP'07 "Large Language Models in Machine Translation"
    — the canonical distributed count-based LM, built exactly this way:
    distributed n-gram counts, then stateless scoring):

        S(w3|w1 w2) = c123/c12                if c123 > 0
                    = α · c23/c2              elif c23 > 0
                    = α² · (c3+1)/(N+V)       else  (add-one floor: OOV w3
                                                     must not hit ln 0)
        score(doc)  = round(mean over the doc's trigrams of ln S, 6)

    The LM is trained on the REFERENCE HALF of the corpus (md5(doc_id)
    even — the doc_stratified_sample hash discipline) and scores ALL
    docs: scoring a corpus against counts from the same corpus would make
    every trigram "seen" and the backoff branches dead code.

    Scale shape = doc_perplexity: the 1/2/3-gram count tables are built by
    per-batch combiners through ONE hash exchange each (vocabulary-bounded
    here; count-pruned before broadcast at open vocabulary — Brants'
    own recipe), then scoring is a stateless vectorized scan, no second
    exchange. Docs with < 3 tokens have no trigrams and are excluded on
    both sides. round(...,6) absorbs the ln ulp (the doc_perplexity
    discipline, driver-green in round 3)."""
    import hashlib

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _ref_mask(doc_ids: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 2 == 0 for d in doc_ids),
            dtype=bool,
            count=len(doc_ids),
        )

    def ngram_partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        keep = _ref_mask(batch["doc_id"].to_numpy())
        batch = batch.filter(pa.array(keep))
        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()
        frames = []
        for n in (1, 2, 3):
            if len(flat) < n:
                continue
            ok = np.ones(len(flat) - n + 1, dtype=bool)
            for j in range(1, n):
                ok &= parent[: len(flat) - n + 1] == parent[j : len(flat) - n + 1 + j]
            if not ok.any():
                continue
            key = pd.Series(flat[: len(flat) - n + 1][ok])
            for j in range(1, n):
                key = key + " " + pd.Series(flat[j : len(flat) - n + 1 + j][ok])
            g = pd.DataFrame({"gram": key, "n": np.int64(1)})
            out = g.groupby("gram", as_index=False)["n"].sum()
            out["order"] = np.int64(n)
            frames.append(out)
        if not frames:
            return pd.DataFrame(
                {
                    "gram": pd.Series(dtype=object),
                    "order": pd.Series(dtype=np.int64),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        return pd.concat(frames, ignore_index=True)[["gram", "order", "n"]]

    counts = (
        grouped_aggregate(
            ds.map_batches(ngram_partial, batch_format="pyarrow"),
            ["gram", "order"],
            {"n": ("n", "sum")},
        )
        .to_pandas()  # vocabulary-bounded (count-prune at open vocabulary)
    )
    tabs = {
        n: dict(zip(g["gram"], g["n"].astype(np.int64)))
        for n, g in counts.groupby("order")
    }
    big_n = int(sum(tabs.get(1, {}).values()))
    vocab_v = int(len(tabs.get(1, {})))
    refs = ray.put((tabs.get(1, {}), tabs.get(2, {}), tabs.get(3, {}), big_n, vocab_v))

    class Score:
        def __init__(self, r):
            self.uni, self.bi, self.tri, self.N, self.V = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r
            )

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            split = pc.split_pattern(batch["text"], " ")
            flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
            parent = pc.list_parent_indices(split).to_numpy()
            if len(flat) < 3:
                return pd.DataFrame(
                    {
                        "doc_id": np.empty(0, dtype=batch["doc_id"].to_numpy().dtype),
                        "n_trigrams": np.empty(0, dtype=np.int64),
                        "backoff_score": np.empty(0, dtype=np.float64),
                    }
                )
            m = len(flat) - 2
            ok = (parent[:m] == parent[1 : m + 1]) & (parent[:m] == parent[2 : m + 2])
            d = parent[:m][ok]
            w1 = pd.Series(flat[:m][ok])
            w2 = pd.Series(flat[1 : m + 1][ok])
            w3 = pd.Series(flat[2 : m + 2][ok])
            c123 = (w1 + " " + w2 + " " + w3).map(self.tri).fillna(0).to_numpy(np.int64)
            c12 = (w1 + " " + w2).map(self.bi).fillna(0).to_numpy(np.int64)
            c23 = (w2 + " " + w3).map(self.bi).fillna(0).to_numpy(np.int64)
            c2 = w2.map(self.uni).fillna(0).to_numpy(np.int64)
            c3 = w3.map(self.uni).fillna(0).to_numpy(np.int64)
            s = np.where(
                c123 > 0,
                c123 / np.maximum(c12, 1),
                np.where(
                    c23 > 0,
                    alpha * (c23 / np.maximum(c2, 1)),
                    alpha * alpha * ((c3 + 1.0) / (self.N + self.V)),
                ),
            )
            ll = np.log(s)
            n_rows = len(batch)
            cnt = np.bincount(d, minlength=n_rows)
            tot = np.bincount(d, weights=ll, minlength=n_rows)
            keep = cnt > 0
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[keep],
                    "n_trigrams": cnt[keep].astype(np.int64),
                    "backoff_score": np.round(tot[keep] / cnt[keep], 6),
                }
            )

    return ds.map_batches(
        Score, fn_constructor_args=(refs,), batch_format="pyarrow", concurrency=2
    )


def doc_backoff_trigram_sql(sf_dir: str, alpha: float = 0.4) -> str:
    return f"""
WITH s_all AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT * FROM s_all
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 2 = 0),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT unnest(toks) AS tok FROM s) GROUP BY tok),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uc),
bg AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM (
         SELECT unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1])) AS g FROM s
       ) GROUP BY g),
tg AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM (
         SELECT unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g FROM s
       ) GROUP BY g),
doc_tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 1), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks) - 1), i -> toks[i + 1])) AS w2,
         unnest(list_transform(range(1, len(toks) - 1), i -> toks[i + 2])) AS w3
  FROM s_all
), scored AS (
  SELECT d.doc_id,
         CASE WHEN COALESCE(t.c, 0) > 0
              THEN ln(t.c / CAST(greatest(b12.c, 1) AS DOUBLE))
              WHEN COALESCE(b23.c, 0) > 0
              THEN ln({alpha} * (b23.c / CAST(greatest(u2.c, 1) AS DOUBLE)))
              ELSE ln({alpha} * {alpha} *
                      ((COALESCE(u3.c, 0) + 1.0) / CAST(nn.n + nn.v AS DOUBLE)))
         END AS ll
  FROM doc_tri d
  LEFT JOIN tg t ON t.g = d.w1 || ' ' || d.w2 || ' ' || d.w3
  LEFT JOIN bg b12 ON b12.g = d.w1 || ' ' || d.w2
  LEFT JOIN bg b23 ON b23.g = d.w2 || ' ' || d.w3
  LEFT JOIN uc u2 ON u2.tok = d.w2
  LEFT JOIN uc u3 ON u3.tok = d.w3
  CROSS JOIN nn
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(SUM(ll) / count(*), 6) AS backoff_score
FROM scored GROUP BY doc_id ORDER BY doc_id"""


def doc_ccnet_buckets(sf_dir: str, num_partitions: int = 16) -> ray.data.Dataset:
    """CCNet head/middle/tail quality routing (Wenzek et al. 2020 — the
    bucketing LLaMA-style data recipes train from): per LANGUAGE, rank
    documents by bigram-LM perplexity and cut into terciles; 'head' is the
    most-fluent third.

    Rank-based terciles with a deterministic (ppl, doc_id) tie-break make
    the assignment exact (no float quantile interpolation), so the oracle
    replays it with one window pass. Dataflow: the doc_perplexity scan
    (one bounded-vocab LM exchange + stateless scoring), one doc_id
    equi-join to pick up `lang`, one lang-keyed exchange for the
    per-language rank. At open-corpus scale the rank exchange is the
    documented trade: per-lang partitions sort only their own language —
    swap to two-pass q-digest THRESHOLDS (then a stateless compare) when a
    single language exceeds a partition, same recipe as
    stages/normalize.py's calibration."""
    from quant_feature_pipeline_ray.stages.equi_join import hash_equi_join
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    ppl = doc_perplexity(sf_dir)
    langs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    joined = hash_equi_join(ppl, langs, on="doc_id", how="inner", num_partitions=num_partitions)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang", sort=False):
            g = g.sort_values(["ppl", "doc_id"], ignore_index=True)
            rn = np.arange(len(g), dtype=np.int64)
            idx = rn * 3 // len(g)
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": g["doc_id"],
                        "lang": lang,
                        "ppl": g["ppl"],
                        "bucket": np.array(["head", "middle", "tail"], dtype=object)[idx],
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "lang": pd.Series(dtype=object),
                    "ppl": pd.Series(dtype=np.float64),
                    "bucket": pd.Series(dtype=object),
                }
            )
        )

    return partition_map_groups(
        joined.select_columns(["doc_id", "lang", "ppl"]),
        bucketize,
        key="lang",
        num_buckets=num_partitions,
    )


def doc_ccnet_buckets_sql(sf_dir: str) -> str:
    return f"""
WITH p AS ({doc_perplexity_sql(sf_dir)}
), j AS (
  SELECT p.doc_id, d.lang, p.ppl
  FROM p JOIN documents d USING (doc_id)
), r AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl, doc_id) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM j
)
SELECT doc_id, lang, ppl,
       ['head', 'middle', 'tail'][CAST((rn * 3) // cnt AS INT) + 1] AS bucket
FROM r ORDER BY doc_id"""


# ------------------------------------------- model-scoring actor pool
def doc_model_score(
    sf_dir: str, n_buckets: int = 64, scale: int = 8, concurrency: int = 2
) -> ray.data.Dataset:
    """Quality-classifier inference as a STATEFUL ACTOR-POOL stage — the
    fasttext-style hashed bag-of-tokens linear model every large corpus
    curation run applies (quality filtering by learned model rather than
    heuristics; reference analogue: the rule-based keep gate in
    doc_quality_filter, which this generalizes).

    The model is deterministic public math so the DuckDB oracle can replay
    it exactly: bucket(tok) = md5(tok)[:8] % n_buckets, weight(b) =
    md5('w'||b)[:8] % 201 − 100 (int64 in [−100,100]).  Per doc:
      z_num = Σ_tokens weight(bucket(tok))          (int64-exact)
      z     = z_num / (n_tok · scale)               (ONE float division)
      quality_score = 0.5·(1 + z/(1+|z|))           (algebraic sigmoid —
                      every op an IEEE-identical expression on both sides,
                      so the oracle is bitwise with NO rounding)
      keep  = z_num >= 0                            (integer-exact flag)

    Dataflow (100 TB-safe): stateless per-doc scan, NO shuffle. The model
    weights live in each actor's __init__ (loaded once per actor, not per
    batch — the map_batches(Cls, concurrency=N) discipline), and the
    token→bucket md5 cache persists across batches inside the actor, so a
    corpus with a Zipfian vocabulary hashes each frequent token once per
    actor rather than once per occurrence."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class Model:
        def __init__(self) -> None:
            import hashlib

            self.w = np.array(
                [
                    int(hashlib.md5(f"w{j}".encode()).hexdigest()[:8], 16) % 201 - 100
                    for j in range(n_buckets)
                ],
                dtype=np.int64,
            )
            self.bucket_of: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            import hashlib

            toks = (
                pd.DataFrame(
                    {
                        "doc_id": batch["doc_id"].to_numpy(),
                        "tok": batch["text"].to_pandas().str.split(" "),
                    }
                )
                .explode("tok", ignore_index=True)
            )
            toks = toks[toks["tok"] != ""]
            fresh = [t for t in pd.unique(toks["tok"]) if t not in self.bucket_of]
            for t in fresh:
                self.bucket_of[t] = (
                    int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
                )
            toks["wt"] = self.w[toks["tok"].map(self.bucket_of).to_numpy()]
            agg = toks.groupby("doc_id", as_index=False).agg(
                z_num=("wt", "sum"), n_tok=("wt", "size")
            )
            agg = agg[agg["n_tok"] > 0]
            z = agg["z_num"].to_numpy() / (agg["n_tok"].to_numpy() * float(scale))
            return pd.DataFrame(
                {
                    "doc_id": agg["doc_id"].to_numpy(),
                    "n_tok": agg["n_tok"].to_numpy().astype(np.int64),
                    "z_num": agg["z_num"].to_numpy().astype(np.int64),
                    "quality_score": 0.5 * (1.0 + z / (1.0 + np.abs(z))),
                    "keep": (agg["z_num"].to_numpy() >= 0).astype(np.int64),
                }
            )

    return ds.map_batches(Model, batch_format="pyarrow", concurrency=concurrency)


def doc_quality_calibration(sf_dir: str) -> ray.data.Dataset:
    """Heuristic-vs-model CALIBRATION table — do the Gopher rule flags and
    the learned quality model agree? For each count of passed rules
    (0..5): doc count, model-keep count and rate, and the pooled model
    logit (Σ z_num / (Σ n_tok · scale)). A curation run reads this before
    replacing heuristics with a model (or vice versa): monotone keep-rate
    in n_rules = the two signals rank documents consistently; a flat or
    inverted row says one of them is broken. All aggregates are int64 sums
    with one final float division per column → exact oracle (float means
    of IEEE doubles would be accumulation-order-dependent; pooling the
    integer numerators is the discipline that avoids it).

    Dataflow: the two scans (rules, model scores) meet in ONE doc_id-keyed
    tagged-union exchange; per-doc rows collapse through a per-batch
    n_rules-keyed combiner into a 6-row exchange."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    rules = doc_gopher_rules(sf_dir)
    scores = doc_model_score(sf_dir)

    def tag_rules(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        n_rules = (
            df[["r_wordcount", "r_meanlen", "r_stopwords", "r_distinct", "r_topword"]]
            .to_numpy()
            .sum(axis=1)
            .astype(np.int64)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_rules": n_rules,
                "z_num": np.zeros(len(df), dtype=np.int64),
                "n_tok": np.zeros(len(df), dtype=np.int64),
                "keep": np.zeros(len(df), dtype=np.int64),
            }
        )

    def tag_scores(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_rules": np.full(len(df), -1, dtype=np.int64),
                "z_num": df["z_num"].to_numpy(),
                "n_tok": df["n_tok"].to_numpy(),
                "keep": df["keep"].to_numpy(),
            }
        )

    joined = grouped_aggregate(
        rules.map_batches(tag_rules, batch_format="pyarrow").union(
            scores.map_batches(tag_scores, batch_format="pyarrow")
        ),
        "doc_id",
        {
            "n_rules": ("n_rules", "max"),
            "z_num": ("z_num", "sum"),
            "n_tok": ("n_tok", "sum"),
            "keep": ("keep", "sum"),
        },
    )

    def combine(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby("n_rules", sort=False).agg(
            n_docs=("doc_id", "size"),
            n_keep=("keep", "sum"),
            z_sum=("z_num", "sum"),
            tok_sum=("n_tok", "sum"),
        )
        return g.reset_index()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("n_rules", sort=True, as_index=False).sum()
        a["keep_rate"] = a["n_keep"] / a["n_docs"]
        a["pooled_z"] = a["z_sum"] / (a["tok_sum"] * 8.0)
        return a.drop(columns=["z_sum", "tok_sum"])

    return partition_map_groups(
        joined.map_batches(combine, batch_format="pyarrow"), finish, key="n_rules", num_buckets=2
    )


def doc_quality_calibration_sql(sf_dir: str, n_buckets: int = 64, scale: int = 8) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), pw AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS nd,
         CAST(max(c) AS BIGINT) AS tc,
         CAST(sum(CASE WHEN w IN ({sw}) THEN c ELSE 0 END) AS BIGINT) AS sh
  FROM pw GROUP BY doc_id
), base AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars
  FROM documents
), rules AS (
  SELECT b.doc_id,
         CAST((CASE WHEN b.n_words >= 40 AND b.n_words <= 100000 THEN 1 ELSE 0 END)
            + (CASE WHEN b.token_chars / b.n_words >= 3.0
                     AND b.token_chars / b.n_words <= 4.5 THEN 1 ELSE 0 END)
            + (CASE WHEN a.sh >= 3 THEN 1 ELSE 0 END)
            + (CASE WHEN a.nd / b.n_words >= 0.45 THEN 1 ELSE 0 END)
            + (CASE WHEN a.tc / b.n_words <= 0.09 THEN 1 ELSE 0 END) AS BIGINT) AS n_rules
  FROM base b JOIN agg a USING (doc_id)
), tw AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('w' || CAST(
             ('0x' || substr(md5(w), 1, 8))::UBIGINT % {n_buckets}
           AS VARCHAR)), 1, 8))::UBIGINT % 201 AS BIGINT) - 100 AS wt
  FROM tok WHERE w <> ''
), sc AS (
  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS z_num, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tw GROUP BY doc_id
), cell AS (
  SELECT r.n_rules,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN s.z_num >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(sum(s.z_num) AS BIGINT) AS z_sum,
         CAST(sum(s.n_tok) AS BIGINT) AS tok_sum
  FROM rules r JOIN sc s USING (doc_id)
  GROUP BY r.n_rules
)
SELECT n_rules, n_docs, n_keep,
       n_keep / n_docs AS keep_rate,
       z_sum / (tok_sum * {float(scale)}) AS pooled_z
FROM cell ORDER BY n_rules"""


def doc_model_score_sql(sf_dir: str, n_buckets: int = 64, scale: int = 8) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tw AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('w' || CAST(
             ('0x' || substr(md5(tok), 1, 8))::UBIGINT % {n_buckets}
           AS VARCHAR)), 1, 8))::UBIGINT % 201 AS BIGINT) - 100 AS w
  FROM toks WHERE tok <> ''
), agg AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS z_num, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tw GROUP BY doc_id
), z AS (
  SELECT doc_id, n_tok, z_num,
         CAST(z_num AS DOUBLE) / (CAST(n_tok AS DOUBLE) * {float(scale)}) AS z
  FROM agg
)
SELECT doc_id, n_tok, z_num,
       0.5 * (1.0 + z / (1.0 + abs(z))) AS quality_score,
       CAST(CASE WHEN z_num >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM z ORDER BY doc_id"""


# ------------------------------------------- simhash hamming-ball self-join
def doc_simhash_pairs(
    sf_dir: str, max_hamming: int = 3, n_bands: int = 4, num_partitions: int = 16
) -> ray.data.Dataset:
    """All document pairs within Hamming distance `max_hamming` of each
    other's 64-bit SimHash — the bitwise near-duplicate join (Manku et al.,
    WWW'07 "Detecting Near-Duplicates for Web Crawling": split the
    fingerprint into bands; any pair with ≤ k differing bits shares at
    least one identical band when n_bands > k, so band-equality blocking
    is LOSSLESS — recall 1.0 by pigeonhole, no tuning).

    Dataflow (100 TB-safe in structure): per-doc simhash (stateless scan)
    → explode n_bands 16-byte rows per doc → ONE hash exchange on
    (band, value16) → per-bucket vectorized XOR-popcount verify over the
    colliding signatures only → global pair dedup (a pair can collide in
    several bands) keyed on the pair id. Signatures are 8 bytes/doc — the
    text never moves. The synthetic corpus is adversarially clique-heavy
    (see lsh_verified_pairs), so all-pairs OUTPUT can be quadratic in a
    clique; every non-output term stays linear.

    Rows-only for the driver (simhash is not SQL-expressible); exactness
    is pinned by tests/test_new_ops_r3d.py against the brute-force
    all-pairs popcount."""
    from quant_feature_pipeline_ray.functions.dedupfns import simhash64
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    assert n_bands > max_hamming, "pigeonhole blocking needs n_bands > max_hamming"
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def bands(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        sigs = np.array(
            [simhash64(t) for t in batch["text"].to_pandas()], dtype=np.uint64
        )
        shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))[None, :]
        vals = ((sigs[:, None] >> shifts) & mask).astype(np.int64).ravel()
        b = np.tile(np.arange(n_bands, dtype=np.int64), len(ids))
        return pd.DataFrame(
            {
                # band+value fused into ONE exchange key (band in the high
                # bits above the 16-bit band value)
                "bkey": (b << np.int64(width)) | vals,
                "doc_id": np.repeat(ids, n_bands),
                "sig": np.repeat(sigs.astype(np.int64), n_bands),
            }
        )

    exploded = docs.map_batches(bands, batch_format="pyarrow", concurrency=2)

    def _pairs_of(sub: pd.DataFrame) -> pd.DataFrame | None:
        n = len(sub)
        if n < 2:
            return None
        ids = sub["doc_id"].to_numpy()
        sigs = sub["sig"].to_numpy().astype(np.uint64)
        # row-slab the triangular sweep so a mega collision group (the
        # clique-heavy corpus case) never materializes all O(n²) pair
        # indices at once — peak memory is O(slab · n)
        slab = max(1, 4_000_000 // n)
        frames = []
        for s in range(0, n - 1, slab):
            e = min(s + slab, n - 1)
            ia = np.repeat(np.arange(s, e, dtype=np.int64), n - 1 - np.arange(s, e))
            ib = np.concatenate([np.arange(i + 1, n, dtype=np.int64) for i in range(s, e)])
            v = sigs[ia] ^ sigs[ib]
            ham = np.zeros(len(v), dtype=np.int64)
            while True:  # vectorized Kernighan popcount: iterations = max hamming
                nz = v != 0
                if not nz.any():
                    break
                ham[nz] += 1
                v[nz] &= v[nz] - np.uint64(1)
            keep = ham <= max_hamming
            if not keep.any():
                continue
            a, b = ids[ia[keep]], ids[ib[keep]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            if len(lo) and int(hi.max()) >= (1 << 31):
                raise ValueError("doc_simhash_pairs pair_key packs two ids into int64")
            frames.append(
                pd.DataFrame(
                    {
                        "pair_key": (lo.astype(np.int64) << 32) | hi.astype(np.int64),
                        "doc_a": lo.astype(np.int64),
                        "doc_b": hi.astype(np.int64),
                        "hamming": ham[keep],
                    }
                )
            )
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    def collide(g: pd.DataFrame) -> pd.DataFrame:
        # one hash bucket holds many (band, value) groups; pairs form only
        # WITHIN a group — iterate groups, vectorized popcount inside each
        frames = [p for _, sub in g.groupby("bkey", sort=False) if (p := _pairs_of(sub)) is not None]
        if not frames:
            return pd.DataFrame(
                {
                    "pair_key": pd.Series(dtype="int64"),
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    pairs = partition_map_groups(exploded, collide, key="bkey", num_buckets=num_partitions)
    uniq = grouped_aggregate(
        pairs,
        "pair_key",
        {"doc_a": ("doc_a", "min"), "doc_b": ("doc_b", "min"), "hamming": ("hamming", "min")},
    )
    return uniq.drop_columns(["pair_key"])


# ------------------------------------------- segment-level dedup (line dedup)
def doc_segment_dedup(
    sf_dir: str, seg_tokens: int = 8, num_partitions: int = 32
) -> ray.data.Dataset:
    """Segment-level exact dedup with document REASSEMBLY — the C4 / RefinedWeb
    "line dedup" operator (public: Raffel et al. 2020 arXiv:1910.10683 §2.2
    three-sentence-span dedup; Penedo et al. 2023 arXiv:2306.01116 line-wise
    dedup): every document is split into consecutive `seg_tokens`-token
    segments; a segment occurring in multiple places corpus-wide is kept ONLY
    at its first occurrence (min (doc_id, seg_idx)) and removed everywhere
    else, and each document is re-emitted with its surviving segments joined
    back together. (The synthetic corpus has no newlines, so the segment
    boundary is a token offset; on real text the split key is `\\n` — the
    dataflow is identical.)

    Dataflow (100-TB-safe — the text crosses the wire ONCE, and only for
    reassembly):
      read -> segmenter map_batches: (segment_hash, doc_id, seg_idx) — 24
              bytes/segment, the segment TEXT never rides the dedup exchange
      exchange on segment_hash -> per-hash winner = min packed (doc_id,
              seg_idx); emit LOSER occurrences only (duplicate mass, not
              corpus mass)
      tagged union (documents + losers) exchanged on doc_id -> per-doc
              re-segmentation, drop loser seg_idx, join survivors
    Reference analogue: the keep-last turn dedup (step2_resample.py:143) is
    the row-level cousin; this is the within-payload version a text corpus
    needs."""
    c = seg_tokens
    import pyarrow.compute as pc

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def segments_of(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized (doc_row, seg_idx, seg_text) for a batch of texts.
        Returns (seg_text object array, per-doc segment counts)."""
        toks = [t.split(" ") for t in texts]
        segs: list[str] = []
        counts = np.empty(len(toks), dtype=np.int64)
        for i, tk in enumerate(toks):
            n = (len(tk) + c - 1) // c
            counts[i] = n
            segs.extend(" ".join(tk[j * c : (j + 1) * c]) for j in range(n))
        return np.asarray(segs, dtype=object), counts

    def seg_stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_numpy(zero_copy_only=False)
        segs, counts = segments_of(texts)
        seg_idx = np.arange(len(segs), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        doc_ids = np.repeat(ids, counts)
        if len(doc_ids) and (int(doc_ids.max()) >= (1 << 42) or int(seg_idx.max()) >= (1 << 20)):
            raise ValueError("doc_segment_dedup packs (doc_id, seg_idx) into int64")
        return pd.DataFrame(
            {
                "h": content_hash(segs).astype(np.int64),
                "packed": (doc_ids << 20) | seg_idx,
            }
        )

    def losers_of(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby("h", sort=False)["packed"].transform("min")
        lose = g.loc[g["packed"] != win, "packed"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": lose >> 20,
                "seg_idx": lose & ((1 << 20) - 1),
                "text": np.full(len(lose), "", dtype=object),
                "kind": np.ones(len(lose), dtype=np.int64),
            }
        )

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    occurrences = docs.map_batches(seg_stage, batch_format="pyarrow")
    losers = partition_map_groups(occurrences, losers_of, key="h", num_buckets=num_partitions)

    def doc_tag(batch: pa.Table) -> pd.DataFrame:
        n = batch.num_rows
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "seg_idx": np.full(n, -1, dtype=np.int64),
                "text": batch["text"].to_numpy(zero_copy_only=False),
                "kind": np.zeros(n, dtype=np.int64),
            }
        )

    tagged = docs.map_batches(doc_tag, batch_format="pyarrow").union(losers)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["kind"] == 0]
        drop: dict[int, set[int]] = {}
        for did, si in zip(
            g.loc[g["kind"] == 1, "doc_id"].to_numpy(),
            g.loc[g["kind"] == 1, "seg_idx"].to_numpy(),
        ):
            drop.setdefault(int(did), set()).add(int(si))
        out_id, out_ns, out_nk, out_tx = [], [], [], []
        for did, text in zip(d["doc_id"].to_numpy(), d["text"].to_numpy()):
            segs, counts = segments_of(np.asarray([text], dtype=object))
            gone = drop.get(int(did), ())
            kept = [s for j, s in enumerate(segs) if j not in gone]
            out_id.append(did)
            out_ns.append(int(counts[0]))
            out_nk.append(len(kept))
            out_tx.append(" ".join(kept))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, dtype=np.int64),
                "n_segs": np.asarray(out_ns, dtype=np.int64),
                "n_kept": np.asarray(out_nk, dtype=np.int64),
                "text_dedup": out_tx,
            }
        )

    return partition_map_groups(tagged, reassemble, key="doc_id", num_buckets=num_partitions)


def doc_segment_dedup_sql(sf_dir: str, seg_tokens: int = 8) -> str:
    c = seg_tokens
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
segs AS (
  SELECT doc_id, u.ci AS seg_idx,
         array_to_string(list_slice(tk, ci * {c} + 1, least((ci + 1) * {c}, len(tk))), ' ') AS seg_text
  FROM toks, UNNEST(range(0, CAST(ceil(len(tk) / {c}.0) AS BIGINT))) AS u(ci)
),
ranked AS (
  SELECT doc_id, seg_idx, seg_text,
         row_number() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' ' ORDER BY seg_idx), '') AS text_dedup
FROM ranked GROUP BY doc_id ORDER BY doc_id"""


def doc_boilerplate_strip(
    sf_dir: str, seg_tokens: int = 4, min_docs: int = 2
) -> ray.data.Dataset:
    """Boilerplate removal — strip every segment that repeats across ≥
    `min_docs` DISTINCT documents of the SAME source (headers, footers,
    nav chrome: the per-site repeated-content pass every web-corpus
    pipeline runs — e.g. CCNet's per-shard duplicated-paragraph strip,
    Wenzek et al. 2019 arXiv:1911.00359 §3.1). Differs from
    doc_segment_dedup in BOTH directions: the trigger is cross-doc
    frequency within a source (not any 2nd occurrence corpus-wide), and a
    triggered segment is removed EVERYWHERE including its first occurrence
    (boilerplate has no "winner").

    Dataflow (100-TB-safe): segment scan emits per-batch COMBINED
    (source⊕segment-hash, distinct-doc partial) rows — 16 bytes per
    distinct (doc, segment), text never rides → ONE small exchange sums
    distinct-doc counts → the boilerplate key set (HAVING ≥ min_docs) is
    dictionary-sized (a source's repeated-chrome lexicon, output-bounded)
    → broadcast once via ray.put, np.isin lookup inside the rebuild scan
    (no second all-to-all). Each doc rebuilds locally from its own row.
    Oracle keys on (source, seg_text) itself; the engine's 64-bit key is
    the doc_exact_dedup collision discipline."""
    c = seg_tokens
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def _segments(text: str) -> list[str]:
        tk = text.split(" ")
        n = (len(tk) + c - 1) // c
        return [" ".join(tk[j * c : (j + 1) * c]) for j in range(n)]

    def _keys(source: str, segs: list[str]) -> np.ndarray:
        joined = np.asarray([source + "\x00" + s for s in segs], dtype=object)
        return content_hash(joined).view(np.int64)

    def seg_partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        srcs = batch["source"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_numpy(zero_copy_only=False)
        ks, ds = [], []
        for did, src, text in zip(ids, srcs, texts):
            segs = _segments(text)
            ks.append(_keys(src, segs))
            ds.append(np.full(len(segs), did, dtype=np.int64))
        df = pd.DataFrame({"k": np.concatenate(ks), "d": np.concatenate(ds)})
        # a doc lives wholly in one batch row → within-batch (k, d) dedup
        # makes the partial an exact distinct-doc count contribution
        part = df.drop_duplicates().groupby("k", sort=False).size()
        return pd.DataFrame({"k": part.index.to_numpy(), "nd": part.to_numpy()})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    counts = grouped_aggregate(
        docs.map_batches(seg_partials, batch_format="pyarrow"), "k", {"nd": ("nd", "sum")}
    )
    boiler = counts.filter(expr=f"nd >= {min_docs}").select_columns(["k"]).to_pandas()
    # dictionary-sized by construction (see docstring) — broadcast once
    bkeys_ref = ray.put(np.sort(boiler["k"].to_numpy()))

    class Rebuild:
        def __init__(self, ref):
            self.bkeys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            out_id, out_ns, out_nk, out_tx = [], [], [], []
            for did, src, text in zip(
                batch["doc_id"].to_numpy(),
                batch["source"].to_numpy(zero_copy_only=False),
                batch["text"].to_numpy(zero_copy_only=False),
            ):
                segs = _segments(text)
                bad = np.isin(_keys(src, segs), self.bkeys, assume_unique=False)
                kept = [s for s, b in zip(segs, bad) if not b]
                out_id.append(did)
                out_ns.append(len(segs))
                out_nk.append(len(kept))
                out_tx.append(" ".join(kept))
            return pd.DataFrame(
                {
                    "doc_id": np.asarray(out_id, dtype=np.int64),
                    "n_segs": np.asarray(out_ns, dtype=np.int64),
                    "n_kept": np.asarray(out_nk, dtype=np.int64),
                    "text_clean": out_tx,
                }
            )

    return docs.map_batches(
        Rebuild, fn_constructor_args=(bkeys_ref,), batch_format="pyarrow", concurrency=2
    )


def doc_boilerplate_strip_sql(sf_dir: str, seg_tokens: int = 4, min_docs: int = 2) -> str:
    c = seg_tokens
    return f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
segs AS (
  SELECT doc_id, source, u.ci AS seg_idx,
         array_to_string(list_slice(tk, ci * {c} + 1, least((ci + 1) * {c}, len(tk))), ' ') AS seg_text
  FROM toks, UNNEST(range(0, CAST(ceil(len(tk) / {c}.0) AS BIGINT))) AS u(ci)
),
freq AS (
  SELECT source, seg_text FROM segs
  GROUP BY source, seg_text HAVING count(DISTINCT doc_id) >= {min_docs}
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(CASE WHEN f.seg_text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN f.seg_text IS NULL THEN s.seg_text END,
                           ' ' ORDER BY s.seg_idx), '') AS text_clean
FROM segs s
LEFT JOIN freq f ON s.source = f.source AND s.seg_text = f.seg_text
GROUP BY s.doc_id ORDER BY s.doc_id"""


# ------------------------------------------- DSIR-style importance weights
def doc_dsir_weights(
    sf_dir: str,
    target_sources: tuple[str, ...] = ("src0", "src1"),
    n_buckets: int = 128,
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Data Selection via Importance Resampling — hashed-n-gram importance
    weights (public: Xie et al. 2023, arXiv:2302.03169): score every document
    by how much more likely its hashed unigram profile is under a TARGET
    distribution (here: the docs from `target_sources`) than under the raw
    corpus distribution. This variant replaces DSIR's log-likelihood-ratio
    with the smoothed PROBABILITY-DIFFERENCE numerator so the whole score is
    int64-exact up to ONE final float division (the doc_model_score
    discipline), making the DuckDB oracle bitwise:

      bucket(tok) = md5(tok)[:8] % B
      t_b, r_b    = bucket counts over target / all token occurrences
      w_b         = (t_b+1)*(R+B) - (r_b+1)*(T+B)        (int64)
      w_num(doc)  = Σ_tok w_b(bucket(tok))               (int64-exact)
      dsir_score  = w_num / ((T+B) * (R+B))              (one division)
                  = Σ_tok [ p̂_target(b) − p̂_raw(b) ]     (add-1 smoothing)

    Dataflow (100-TB-safe): pass 1 is a per-batch COMBINER (B-row bucket
    partials per batch — the token exchange moves B rows per batch, never
    tokens) reduced to one B-row table on the driver and broadcast via
    ray.put; pass 2 is a stateless scan through a stateful ACTOR POOL
    (weights + md5 bucket cache built once per actor in __init__). At real
    scale w_num overflow forces float weights — the int64 path is the
    oracle-exactness device and guarded by asserts."""
    import hashlib

    B = n_buckets
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    tset = set(target_sources)

    def count_stage(batch: pa.Table) -> pd.DataFrame:
        toks = pd.DataFrame(
            {
                "is_t": pd.Series(batch["source"].to_numpy(zero_copy_only=False)).isin(tset).to_numpy(),
                "tok": batch["text"].to_pandas().str.split(" "),
            }
        ).explode("tok", ignore_index=True)
        toks = toks[toks["tok"] != ""]
        b = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B for t in toks["tok"]),
            dtype=np.int64,
            count=len(toks),
        )
        agg = pd.DataFrame({"b": b, "is_t": toks["is_t"].to_numpy().astype(np.int64)}).groupby(
            "b", as_index=False
        ).agg(r_b=("is_t", "size"), t_b=("is_t", "sum"))
        return agg

    partials = ds.map_batches(count_stage, batch_format="pyarrow")
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    counts = grouped_aggregate(
        partials, "b", {"r_b": ("r_b", "sum"), "t_b": ("t_b", "sum")}, num_partitions=8
    ).to_pandas()  # B rows — driver-resident by design
    r = np.zeros(B, dtype=np.int64)
    t = np.zeros(B, dtype=np.int64)
    r[counts["b"].to_numpy()] = counts["r_b"].to_numpy()
    t[counts["b"].to_numpy()] = counts["t_b"].to_numpy()
    R, T = int(r.sum()), int(t.sum())
    w = (t + 1) * (R + B) - (r + 1) * (T + B)
    assert abs(w).max() < (1 << 62), "doc_dsir_weights int64 weight overflow"
    denom = float(T + B) * float(R + B)
    w_ref = ray.put(w)

    class Scorer:
        def __init__(self) -> None:
            self.w = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
            self.bucket_of: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            toks = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "tok": batch["text"].to_pandas().str.split(" "),
                }
            ).explode("tok", ignore_index=True)
            toks = toks[toks["tok"] != ""]
            fresh = [x for x in pd.unique(toks["tok"]) if x not in self.bucket_of]
            for x in fresh:
                self.bucket_of[x] = int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % B
            toks["wt"] = self.w[toks["tok"].map(self.bucket_of).to_numpy()]
            agg = toks.groupby("doc_id", as_index=False).agg(
                w_num=("wt", "sum"), n_tok=("wt", "size")
            )
            return pd.DataFrame(
                {
                    "doc_id": agg["doc_id"].to_numpy(),
                    "n_tok": agg["n_tok"].to_numpy().astype(np.int64),
                    "w_num": agg["w_num"].to_numpy().astype(np.int64),
                    "dsir_score": agg["w_num"].to_numpy() / denom,
                }
            )

    return ds.drop_columns(["source"]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency
    )


def doc_dsir_weights_sql(
    sf_dir: str, target_sources: tuple[str, ...] = ("src0", "src1"), n_buckets: int = 128
) -> str:
    B = n_buckets
    tlist = ", ".join(f"'{s}'" for s in target_sources)
    return f"""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
), tb AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % {B} AS BIGINT) AS b
  FROM toks WHERE tok <> ''
), cnt AS (
  SELECT b, CAST(count(*) AS BIGINT) AS r_b,
         CAST(sum(CASE WHEN source IN ({tlist}) THEN 1 ELSE 0 END) AS BIGINT) AS t_b
  FROM tb GROUP BY b
), tot AS (
  SELECT CAST(sum(r_b) AS BIGINT) AS R, CAST(sum(t_b) AS BIGINT) AS T FROM cnt
), w AS (
  SELECT b, (t_b + 1) * (R + {B}) - (r_b + 1) * (T + {B}) AS w_b FROM cnt, tot
), doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, CAST(sum(w_b) AS BIGINT) AS w_num
  FROM tb JOIN w USING (b) GROUP BY doc_id
)
SELECT doc_id, n_tok, w_num,
       CAST(w_num AS DOUBLE)
         / (CAST((SELECT T FROM tot) + {B} AS DOUBLE) * CAST((SELECT R FROM tot) + {B} AS DOUBLE))
         AS dsir_score
FROM doc ORDER BY doc_id"""


# ----------------------------------------------- BPE merge-candidate counts
def doc_bpe_pairs(sf_dir: str, k: int = 100, batch_size: int = 4096) -> pd.DataFrame:
    """Top-k adjacent character pairs within words — the BPE tokenizer-
    training step 0 (merge-candidate statistics, Sennrich ACL'16).

    Dataflow is the doc_vocab wordcount shape: a per-batch combiner collapses
    each batch to its distinct pairs (counts pre-summed) BEFORE the exchange,
    so the shuffle moves pair-vocabulary-sized partials (≤ alphabet², in
    practice a few thousand rows) — never one row per character position.
    The final top-k runs on the aggregated pair vocabulary (driver-resident,
    alphabet-bounded, corpus-size-independent).

    Vectorization: each batch's words are joined with the tokenizer's own
    separator (' ', which cannot occur inside a word) into ONE string whose
    UTF-32 view gives the codepoint array; adjacent pairs are two shifted
    slices packed into int64 keys and counted with np.unique — no Python
    loop over positions (only over the batch's DISTINCT pairs to render the
    2-char strings). Codepoint (not byte) pairs mirror DuckDB's
    character-based substring() bitwise."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        words = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        joined = " ".join(words.to_pylist())
        if len(joined) == 0:
            return pd.DataFrame({"pair": pd.Series(dtype=str), "cnt": pd.Series(dtype=np.int64)})
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        a, b = cp[:-1], cp[1:]
        sep = ord(" ")
        keep = (a != sep) & (b != sep)
        packed = (a[keep] << 32) | b[keep]
        uniq, cnt = np.unique(packed, return_counts=True)
        pairs = [chr(int(p) >> 32) + chr(int(p) & 0xFFFFFFFF) for p in uniq]
        return pd.DataFrame({"pair": pairs, "cnt": cnt.astype(np.int64)})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
        "pair",
        {"cnt": ("cnt", "sum")},
    ).to_pandas()
    agg = agg.sort_values(["cnt", "pair"], ascending=[False, True], kind="mergesort")
    return agg.head(k).reset_index(drop=True)


def doc_bpe_pairs_sql(sf_dir: str, k: int = 100) -> str:
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pos AS (
  SELECT w, unnest(range(1, length(w))) AS i FROM words WHERE length(w) >= 2
)
SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
       CAST(count(*) AS BIGINT) AS cnt
FROM pos
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {k}"""


# ------------------------------------------------- source-overlap matrix
def doc_source_overlap(sf_dir: str, batch_size: int = 4096) -> pd.DataFrame:
    """Pairwise token-set Jaccard between sources (corpus-overlap matrix —
    the cross-corpus contamination / redundancy audit run before mixing
    training sources).

    Three vocabulary-bounded exchanges, none carrying a row per token
    OCCURRENCE: (1) per-batch distinct (token, source) partials -> global
    distinct via one hash-key aggregate; (2) token -> int bitmask of the
    sources containing it (sum of 1<<src_id is exact because step 1 made
    each (token, source) unique); (3) bitmask histogram (#distinct masks ≤
    #tokens, and ≤ 2^n_sources). The S×S matrix then reduces on the driver
    from the mask histogram alone — intersection(a,b) = Σ cnt[mask] over
    masks containing both bits — never touching per-token data again. Adding
    a source re-runs only the cheap scans; at 100 TB the only corpus-scale
    object shuffled is the distinct token vocabulary."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def distinct_pairs(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        src = batch["source"].take(parent.filter(keep)).to_pandas()
        df = pd.DataFrame({"token": flat.filter(keep).to_pandas(), "source": src})
        return df.drop_duplicates(ignore_index=True)

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    pairs = grouped_aggregate(
        ds.map_batches(distinct_pairs, batch_format="pyarrow", batch_size=batch_size),
        ["token", "source"],
        {"one": ("source", "size")},
    )
    sources = sorted(
        grouped_aggregate(pairs, "source", {"n": ("one", "size")}).to_pandas()["source"]
    )
    if len(sources) > 62:
        # bits 0..62 of a signed int64; bit 63 flips the sign and breaks
        # the arithmetic shifts below. A 63+-source corpus needs the
        # sketch variant (doc_source_overlap_sketch) or a multi-word mask.
        raise ValueError(
            f"doc_source_overlap supports at most 62 distinct sources "
            f"(got {len(sources)}); use doc_source_overlap_sketch instead"
        )
    src_id = {s: i for i, s in enumerate(sources)}

    def to_mask(df: pd.DataFrame) -> pd.DataFrame:
        bit = df["source"].map(src_id).to_numpy(dtype=np.int64)
        return pd.DataFrame({"token": df["token"], "bit": np.int64(1) << bit})

    masks = grouped_aggregate(
        pairs.map_batches(to_mask, batch_format="pandas"),
        "token",
        {"mask": ("bit", "sum")},
    )
    hist = grouped_aggregate(masks, "mask", {"cnt": ("token", "size")}).to_pandas()
    mk = hist["mask"].to_numpy(dtype=np.int64)
    ct = hist["cnt"].to_numpy(dtype=np.int64)
    rows = []
    for ia, sa in enumerate(sources):
        in_a = (mk >> ia) & 1 == 1
        na = int(ct[in_a].sum())
        for ib in range(ia + 1, len(sources)):
            inter = int(ct[in_a & ((mk >> ib) & 1 == 1)].sum())
            if inter == 0:
                continue  # SQL inner join drops empty intersections
            nb = int(ct[(mk >> ib) & 1 == 1].sum())
            un = na + nb - inter
            rows.append((sa, sources[ib], inter, un, inter / un))
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "inter", "un", "jaccard"])
    out["inter"] = out["inter"].astype(np.int64)
    out["un"] = out["un"].astype(np.int64)
    return out


def doc_source_overlap_sql(sf_dir: str) -> str:
    return """
WITH t0 AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), toks AS (
  SELECT DISTINCT source, token FROM t0 WHERE token <> ''
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS inter
  FROM toks a JOIN toks b USING (token)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, inter,
       sa.n + sb.n - inter AS un,
       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b"""


# ------------------------------------------------ int8 scalar quantization
def emb_quantize_int8(sf_dir: str, batch_size: int = 2048) -> ray.data.Dataset:
    """Per-dimension symmetric int8 scalar quantization of the embedding
    column (the storage/serving compression pass run before ANN indexing).

    Pass 1 reduces the per-dim scale s_d = max|x_d| with per-batch partials
    (d rows per batch -> one tiny hash aggregate; nothing row-scaled leaves
    the workers). Pass 2 broadcasts the d-vector of scales in the closure
    and emits codes floor((x/s)*127 + 0.5) — one IEEE expression replayed
    textually by the oracle, float64 all the way from the float32 input so
    both sides round identically. Long (vec_id, dim, code) layout keeps the
    oracle join trivial; dim is 1-based to match SQL."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def scale_partial(batch: pa.Table) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        mx = np.abs(mat).max(axis=0)
        return pd.DataFrame(
            {"dim": np.arange(1, mat.shape[1] + 1, dtype=np.int64), "s": mx}
        )

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    scales = (
        grouped_aggregate(
            ds.map_batches(scale_partial, batch_format="pyarrow", batch_size=batch_size),
            "dim",
            {"s": ("s", "max")},
        )
        .to_pandas()
        .sort_values("dim")
    )
    s = scales["s"].to_numpy()  # len d, corpus-global

    def quantize(batch: pa.Table) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        n, d = mat.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((mat / s) * 127.0 + 0.5)
        q = np.where(s > 0.0, q, 0.0).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": np.repeat(batch["vec_id"].to_numpy(), d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
                "code": q.ravel(),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow", batch_size=batch_size)


def emb_quantize_int8_sql(sf_dir: str) -> str:
    return """
WITH ex AS (
  SELECT vec_id,
         unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
), sc AS (
  SELECT dim, MAX(ABS(CAST(v AS DOUBLE))) AS s FROM ex GROUP BY dim
)
SELECT e.vec_id, e.dim,
       CAST(CASE WHEN s > 0.0
                 THEN FLOOR((CAST(e.v AS DOUBLE) / s) * 127.0 + 0.5)
                 ELSE 0.0 END AS BIGINT) AS code
FROM ex e JOIN sc USING (dim)
ORDER BY vec_id, dim"""


# --------------------------------- Johnson-Lindenstrauss sign projection
_JL_GOLD = 0x9E3779B97F4A7C15
_JL_SCALE = 65536.0  # 2^16 fixed-point quantization


def emb_jl_project(sf_dir: str, m: int = 16, batch_size: int = 2048) -> ray.data.Dataset:
    """Dimensionality reduction by a ±1 sign projection (Achlioptas JCSS'03
    database-friendly Johnson-Lindenstrauss): y_j = Σ_i sign(j,i)·q_i over
    the 2^16-fixed-point embedding — the cheap pre-pass that shrinks
    vectors before dedup/clustering at corpus scale.

    There is no projection matrix to ship at all: sign(j,i) is derived
    from the multiplicative hash ((j-1)·D + i)·GOLDEN mod 2^64 (top bit),
    so every task — and the SQL oracle — regenerates the identical matrix
    from two integers. Quantization makes the reduction an INTEGER sum
    (order-free, D·2^17 << 2^63), which is what lets the oracle replay the
    projection exactly; the float rounding step floor(v·2^16 + 0.5) is the
    single shared IEEE expression.

    Scale: stateless linear map, no exchange, no broadcast; output m
    numbers per vector."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    def project(batch: pa.Table) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        n, d = mat.shape
        q = np.floor(mat * _JL_SCALE + 0.5).astype(np.int64)
        idx = (
            np.arange(1, m * d + 1, dtype=np.uint64).reshape(m, d)
            * np.uint64(_JL_GOLD)
        )
        signs = np.where(idx < np.uint64(1 << 63), 1, -1).astype(np.int64)
        y = q @ signs.T  # exact int64: |q| <= ~2^17, d = 64
        return pd.DataFrame(
            {
                "vec_id": np.repeat(batch["vec_id"].to_numpy(), m),
                "jdim": np.tile(np.arange(1, m + 1, dtype=np.int64), n),
                "y": y.ravel(),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow", batch_size=batch_size)


def emb_jl_project_sql(sf_dir: str, m: int = 16) -> str:
    return f"""
WITH ex AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_JL_SCALE} + 0.5) AS BIGINT) AS q,
         unnest(range(1, len(embedding) + 1)) AS i,
         len(embedding) AS d
  FROM embeddings
), terms AS (
  SELECT vec_id, j.j, q,
         CASE WHEN CAST(((CAST((j.j - 1) AS HUGEINT) * d + i) * {_JL_GOLD})
                        % 18446744073709551616 AS UBIGINT)
                   < CAST(9223372036854775808 AS UBIGINT)
              THEN 1 ELSE -1 END AS sgn
  FROM ex, (SELECT unnest(range(1, {m} + 1)) AS j) j
)
SELECT vec_id, CAST(j AS BIGINT) AS jdim, CAST(SUM(sgn * q) AS BIGINT) AS y
FROM terms GROUP BY vec_id, j
ORDER BY vec_id, jdim"""


# ------------------------------------------------- greedy k-center coreset
def emb_kcenter_sample(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Greedy k-center (Gonzalez'85) coreset selection over the embedding
    corpus — the diversity-sampling / data-pruning pass (Sener & Savarese
    ICLR'18 core-set selection).

    Distributed form: the chosen centers live on the driver (k×d, tiny);
    each round ONE map_batches updates the cached min-distance column
    against only the NEWEST center (classic incremental trick — O(N·d) per
    round, not O(N·k·d)) and emits a per-block (max_dist, argmax vec_id)
    partial; the driver reduces #blocks partials to the next center.
    k rounds × one scan; the iterated dataset is re-materialized per round
    with its block count pinned (BASELINE.md round-3 iterative-operator
    rule). Deterministic: seed = smallest vec_id, ties broken toward the
    smaller vec_id, all distances float64.

    Returns (order_idx, vec_id, dist) — dist is the squared L2 distance to
    the previously selected set at selection time (the k-center radius
    sequence, nonincreasing ⇒ coverage guarantee); 0 for the seed."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def seed_partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"vid": [int(pd.Series(batch["vec_id"].to_numpy()).min())]})

    seed_id = int(ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()["vid"].min())

    def fetch_vec(vid: int) -> np.ndarray:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
            columns=["vec_id", "embedding"], filter=pads.field("vec_id") == vid
        )
        return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)

    center = fetch_vec(seed_id)
    chosen = [(0, seed_id, 0.0)]
    chosen_ids = {seed_id}

    work = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy(),
                "dist": np.full(len(b), np.inf),
            }
            | {"emb": [np.asarray(v, dtype=np.float64) for v in b["embedding"].to_pandas()]}
        ),
        batch_format="pyarrow",
    ).materialize()

    for order_idx in range(1, k):
        c = center  # broadcast via closure capture (ray.put under the hood)

        def update(df: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(df["emb"].to_numpy())
            delta = mat - c
            d2 = np.einsum("ij,ij->i", delta, delta)
            df = df.copy()
            df["dist"] = np.minimum(df["dist"].to_numpy(), d2)
            return df

        work = work.map_batches(update, batch_format="pandas").materialize()

        def argmax_partial(df: pd.DataFrame) -> pd.DataFrame:
            dist = df["dist"].to_numpy()
            vids = df["vec_id"].to_numpy()
            mask = ~np.isin(vids, np.fromiter(chosen_ids, dtype=np.int64))
            if not mask.any():
                return pd.DataFrame({"vec_id": [], "dist": []})
            dist, vids = dist[mask], vids[mask]
            mx = dist.max()
            vid = vids[dist == mx].min()
            return pd.DataFrame({"vec_id": [int(vid)], "dist": [float(mx)]})

        parts = work.map_batches(argmax_partial, batch_format="pandas").to_pandas()
        if parts.empty or parts["dist"].isna().all():
            break  # k exceeds the number of vectors: every point is chosen
        mx = parts["dist"].max()
        nxt = int(parts.loc[parts["dist"] == mx, "vec_id"].min())
        chosen.append((order_idx, nxt, float(mx)))
        chosen_ids.add(nxt)
        center = fetch_vec(nxt)

    return pd.DataFrame(chosen, columns=["order_idx", "vec_id", "dist"]).astype(
        {"order_idx": np.int64, "vec_id": np.int64}
    )


# ------------------------------------------------- label propagation
def emb_label_prop(
    sf_dir: str,
    k: int = 5,
    n_iters: int = 3,
    mask_mod: int = 4,
    n_parts: int = 16,
) -> pd.DataFrame:
    """Semi-supervised label propagation over the approximate kNN graph
    (Zhu & Ghahramani, CMU-CALD-02-107) — graph-smoothness auto-labeling,
    the cheap label-expansion pass run when only a slice of a corpus is
    human-labeled.

    Seeds: vectors with vec_id % mask_mod == 0 keep their `label` column
    (deterministic stand-in for the labeled slice); the rest start
    unlabeled (-1). Each round every NON-SEED vector adopts the
    weight-majority label among its currently-labeled kNN neighbours, with
    votes weighted by round(sim·10⁶) INTEGERS — exact sums, so the argmax
    and its (weight desc, label asc) tie-break are deterministic under any
    partitioning (a float-weighted vote would be exchange-order-dependent).
    Seed labels are clamped; a node with no labeled neighbour stays -1.

    Dataflow per round, TWO hash exchanges (the doc_graph_pagerank BSP
    discipline):

      exchange 1 (key = voting neighbour): static edge list + current
        (node, label) rows ride one tagged union; per partition each edge
        picks up its voter's label, drops unlabeled voters, and
        PRE-AGGREGATES (dst, label) -> weight partials
      exchange 2 (key = dst node): vote partials + the static seed/node
        table; per partition the weighted argmax decides, seeds clamp,
        voteless nodes keep -1

    The label table is re-materialized each round with a PINNED block
    count (repartition before materialize — BASELINE.md round-3 iterative
    rule: union+map_groups otherwise doubles the physical block count per
    round). Per-round exchange volume is O(|E| + N), never corpus-quadratic.
    Approximate upstream (IVF kNN) -> rows-only driver query; pytest pins
    exact parity vs a straight-line numpy propagation on the same edges."""
    edges = emb_knn_graph_ds(sf_dir, k=k)

    def to_votes(b: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["nbr_id"].to_numpy(),  # the voter
                "dst": b["vec_id"].to_numpy(),
                "w": np.round(b["sim"].to_numpy() * 1e6).astype(np.int64),
                "label": np.full(len(b), -1, dtype=np.int64),
                "tag": np.zeros(len(b), dtype=np.int64),
            }
        )

    edge_rows = edges.map_batches(to_votes, batch_format="pyarrow").materialize()

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])

    def seed_rows(b: pa.Table) -> pd.DataFrame:
        ids = b["vec_id"].to_numpy()
        lab = b["label"].to_numpy().astype(np.int64)
        is_seed = ids % mask_mod == 0
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": np.where(is_seed, lab, -1),
                "is_seed": is_seed.astype(np.int64),
            }
        )

    seeds = emb.map_batches(seed_rows, batch_format="pyarrow").materialize()
    labels = seeds

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    for _ in range(n_iters):

        def label_rows(b: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": b["vec_id"].to_numpy(),
                    "dst": np.full(len(b), -1, dtype=np.int64),
                    "w": np.zeros(len(b), dtype=np.int64),
                    "label": b["label"].to_numpy(),
                    "tag": np.ones(len(b), dtype=np.int64),
                }
            )

        tagged = edge_rows.union(
            labels.map_batches(label_rows, batch_format="pyarrow")
        )

        def vote_partial(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["tag"] == 1]
            cur = dict(zip(lab["key"].to_numpy(), lab["label"].to_numpy()))
            ed = g[g["tag"] == 0]
            if len(ed) == 0:
                return pd.DataFrame(
                    {"dst": pd.Series(dtype=np.int64), "label": pd.Series(dtype=np.int64),
                     "w": pd.Series(dtype=np.int64)}
                )
            vlab = ed["key"].map(cur).fillna(-1).astype(np.int64)
            keep = vlab >= 0
            votes = pd.DataFrame(
                {"dst": ed["dst"].to_numpy()[keep], "label": vlab.to_numpy()[keep],
                 "w": ed["w"].to_numpy()[keep]}
            )
            return votes.groupby(["dst", "label"], as_index=False).agg(w=("w", "sum"))

        partials = partition_map_groups(
            tagged, vote_partial, key="key", num_buckets=n_parts
        )

        def node_rows(b: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "dst": b["vec_id"].to_numpy(),
                    "label": b["label"].to_numpy(),
                    "w": np.full(len(b), -1, dtype=np.int64),
                    "seed_label": np.where(
                        b["is_seed"].to_numpy() == 1, b["label"].to_numpy(), -1
                    ).astype(np.int64),
                    "tag": np.ones(len(b), dtype=np.int64),
                }
            )

        def decide(g: pd.DataFrame) -> pd.DataFrame:
            nodes = g[g["tag"] == 1]
            votes = g[g["tag"] == 0]
            if len(votes):
                agg = votes.groupby(["dst", "label"], as_index=False).agg(w=("w", "sum"))
                agg = agg.sort_values(
                    ["dst", "w", "label"], ascending=[True, False, True], kind="mergesort"
                )
                win = agg.drop_duplicates("dst", keep="first")
                winner = dict(zip(win["dst"].to_numpy(), win["label"].to_numpy()))
            else:
                winner = {}
            ids = nodes["dst"].to_numpy()
            seed_lab = nodes["seed_label"].to_numpy()
            voted = pd.Series(ids).map(winner).fillna(-1).astype(np.int64).to_numpy()
            new_lab = np.where(seed_lab >= 0, seed_lab, voted)
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "label": new_lab,
                    "is_seed": (seed_lab >= 0).astype(np.int64),
                }
            )

        tagged2 = partials.map_batches(
            lambda df: df.assign(seed_label=np.int64(-1), tag=np.int64(0)),
            batch_format="pandas",
        ).union(seeds.map_batches(node_rows, batch_format="pyarrow"))
        labels = (
            partition_map_groups(tagged2, decide, key="dst", num_buckets=n_parts)
            .repartition(n_parts)
            .materialize()
        )

    out = labels.to_pandas().sort_values("vec_id", ignore_index=True)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out


def doc_source_overlap_sketch(
    sf_dir: str, k: int = 1024, batch_size: int = 4096
) -> pd.DataFrame:
    """Bottom-k (KMV) sketch variant of doc_source_overlap — the
    bounded-state scale path (Bar-Yossef et al. RANDOM'02 distinct-element
    sketch; Beyer et al. SIGMOD'07 Jaccard estimator).

    Where the exact operator's exchange is vocabulary-sized, this one is
    CORPUS-SIZE-INDEPENDENT: each batch emits at most sources×k (source,
    token-hash) rows (bottom-k of the batch's distinct SipHash64 token
    hashes per source), one source-keyed exchange merges partials by
    keep-smallest-k, and the driver holds sources×k values total. Pairwise
    estimate: with A_k, B_k the per-source sketches and U_k the k smallest
    of A_k ∪ B_k,  Ĵ = |U_k ∩ A_k ∩ B_k| / |U_k|  — exact whenever a
    source's distinct-token count ≤ k (the sketch then IS the set), and
    unbiased with σ ≈ 1/√k otherwise. pytest pins both regimes against the
    exact operator."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "source"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        src = batch["source"].take(parent.filter(keep)).to_pandas()
        tok = flat.filter(keep).to_pandas()
        # md5-lower-64 token hash (round-5): bit-identical to DuckDB's
        # md5_number_lower, so the whole KMV estimator — bottom-k per
        # source, union bottom-k, intersection count — has an EXACT SQL
        # mirror. md5 runs once per distinct (source, token) of the batch
        # (vocabulary-bounded); swap content_hash back for raw speed when
        # no oracle is needed.
        df = pd.DataFrame({"source": src, "tok": tok}).drop_duplicates(ignore_index=True)
        df = pd.DataFrame(
            {"source": df["source"], "h": md5_lower64(df["tok"].to_numpy())}
        )
        df = df.drop_duplicates(ignore_index=True)
        out = (
            df.sort_values(["source", "h"], kind="mergesort")
            .groupby("source", as_index=False)
            .head(k)
        )
        return out.reset_index(drop=True)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)

    def merge_source(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates(["source", "h"])
            .sort_values(["source", "h"], kind="mergesort")
            .groupby("source", as_index=False)
            .head(k)
        )
        return out.reset_index(drop=True)

    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    sk = partition_map_groups(parts, merge_source, key="source", num_buckets=8).to_pandas()
    sketches = {
        s: np.sort(g["h"].to_numpy().astype(np.uint64)) for s, g in sk.groupby("source")
    }
    rows = []
    for sa in sorted(sketches):
        for sb in sorted(sketches):
            if sb <= sa:
                continue
            A, B = sketches[sa], sketches[sb]
            U = np.union1d(A, B)[:k]
            inter = np.intersect1d(U, np.intersect1d(A, B))
            if len(U) == 0 or len(inter) == 0:
                continue
            rows.append((sa, sb, len(inter) / len(U)))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "jaccard_est"])


def doc_source_overlap_sketch_sql(sf_dir: str, k: int = 1024) -> str:
    """Exact SQL mirror of the KMV estimator (round-5 promotion): same
    md5-lower-64 token hash, same bottom-k per source, same k-smallest of
    the pair union, same |U_k ∩ A_k ∩ B_k| / |U_k| with pairs whose
    intersection is empty dropped."""
    return f"""
WITH tok AS (
  SELECT DISTINCT source, md5_number_lower(token) AS h
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
), sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM tok
  ) WHERE rn <= {k}
), srcs AS (SELECT DISTINCT source FROM sk),
pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM srcs a JOIN srcs b ON a.source < b.source
), uni AS (
  SELECT DISTINCT p.sa, p.sb, s.h
  FROM pairs p JOIN sk s ON s.source = p.sa OR s.source = p.sb
), uk AS (
  SELECT sa, sb, h FROM (
    SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
    FROM uni
  ) WHERE rn <= {k}
), inter AS (
  SELECT uk.sa, uk.sb, CAST(count(*) AS BIGINT) AS n_inter
  FROM uk
  JOIN sk A ON A.source = uk.sa AND A.h = uk.h
  JOIN sk B ON B.source = uk.sb AND B.h = uk.h
  GROUP BY uk.sa, uk.sb
), usz AS (
  SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_u FROM uk GROUP BY sa, sb
)
SELECT i.sa AS src_a, i.sb AS src_b,
       i.n_inter / CAST(u.n_u AS DOUBLE) AS jaccard_est
FROM inter i JOIN usz u ON u.sa = i.sa AND u.sb = i.sb
ORDER BY src_a, src_b"""


def doc_cluster_keep_best(sf_dir: str, threshold: float = 0.82) -> pd.DataFrame:
    """Quality-aware near-dup dedup: per similarity CLUSTER keep the member
    with the highest model quality score — the real curation keep-choice
    (min-doc_id keeps an arbitrary copy; the quality argmax keeps the best
    one; VERDICT round-2 made the same point for PageRank centrality).

    Composition of two exact-oracled stages: CC labels (dup_cluster_labels,
    distributed star passes) and model scores (doc_model_score actor pool)
    meet in ONE tagged-union exchange on doc_id, then one cluster-keyed
    exchange picks argmax(quality_score desc, doc_id asc) and counts
    members. Both sides of the oracle compute the identical IEEE
    quality_score doubles, so the float ORDER BY ranks identically — the
    argmax is engine-independent without an integer surrogate. Neither the
    label table nor the score table ever lands on the driver; only the
    per-cluster winners come back."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    labels = dup_cluster_labels(sf_dir, threshold=threshold)  # (node, cluster_id)
    scores = doc_model_score(sf_dir)  # (doc_id, ..., quality_score, ...)

    lab_tagged = labels.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["node"].to_numpy(),
                "cluster_id": b["cluster_id"].to_numpy(),
                "q": np.full(len(b), -1.0),
            }
        ),
        batch_format="pyarrow",
    )
    sc_tagged = scores.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "cluster_id": np.full(len(b), -1, dtype=np.int64),
                "q": b["quality_score"].to_numpy(),
            }
        ),
        batch_format="pyarrow",
    )

    def join_rows(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["q"] < 0].set_index("doc_id")["cluster_id"]
        d = g[g["q"] >= 0]
        return pd.DataFrame(
            {
                "cluster_id": d["doc_id"].map(lab).to_numpy(np.int64),
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "q": d["q"].to_numpy(),
            }
        )

    joined = partition_map_groups(
        lab_tagged.union(sc_tagged), join_rows, key="doc_id", num_buckets=32
    )

    def best_per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "q", "doc_id"], ascending=[True, False, True],
                          kind="mergesort")
        n = g.groupby("cluster_id", as_index=False).agg(n_members=("doc_id", "size"))
        best = g.drop_duplicates("cluster_id", keep="first")[["cluster_id", "doc_id", "q"]]
        out = best.merge(n, on="cluster_id")
        return pd.DataFrame(
            {
                "cluster_id": out["cluster_id"].to_numpy(np.int64),
                "best_doc_id": out["doc_id"].to_numpy(np.int64),
                "best_q": out["q"].to_numpy(),
                "n_members": out["n_members"].to_numpy(np.int64),
            }
        )

    out = partition_map_groups(
        joined, best_per_cluster, key="cluster_id", num_buckets=32
    ).to_pandas()
    return out.sort_values("cluster_id", ignore_index=True)


def doc_cluster_keep_best_sql(sf_dir: str, threshold: float = 0.82) -> str:
    cc = doc_dup_clusters_sql(sf_dir, threshold)
    sc = doc_model_score_sql(sf_dir)
    return f"""
WITH lab AS ({cc}), sc AS ({sc})
SELECT cluster_id, best_doc_id, best_q, n_members
FROM (
  SELECT lab.cluster_id, lab.doc_id AS best_doc_id, sc.quality_score AS best_q,
         CAST(count(*) OVER (PARTITION BY lab.cluster_id) AS BIGINT) AS n_members,
         row_number() OVER (PARTITION BY lab.cluster_id
                            ORDER BY sc.quality_score DESC, lab.doc_id) AS rk
  FROM lab JOIN sc ON sc.doc_id = lab.doc_id
)
WHERE rk = 1 ORDER BY cluster_id"""


# ------------------------------------------------- BPE tokenizer training
_BPE_NEW_BASE = 0x110000  # first id above the Unicode codepoint range


def _bpe_merge_loop(
    words: list[str], cnts: np.ndarray, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Vectorized BPE merge loop over a (word, count) vocabulary table
    (Sennrich ACL'16 §3.2). Every round is numpy over ONE flat symbol
    array: weighted adjacent-pair counts via sort+reduceat, argmax with
    (count desc, symbol-id pair asc) tie-break, and a left-to-right
    non-overlapping greedy merge (runs of consecutive candidate positions
    keep even offsets — exactly the sequential greedy result). Merged
    symbols get ids above the codepoint range so pair packing stays
    collision-free in (a<<32)|b."""
    if len(words) == 0 or n_merges <= 0:
        return []
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    keep_w = lens > 0
    words = [w for w, k in zip(words, keep_w) if k]
    cnts, lens = cnts[keep_w], lens[keep_w]
    flat = "".join(words)
    sym = np.frombuffer(flat.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    wt = np.repeat(cnts.astype(np.int64), lens)
    names: dict[int, str] = {}

    def name_of(i: int) -> str:
        return names[i] if i >= _BPE_NEW_BASE else chr(i)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        valid = wid[:-1] == wid[1:]
        if not valid.any():
            break
        a, b, w = sym[:-1][valid], sym[1:][valid], wt[:-1][valid]
        packed = (a << 32) | b
        order = np.argsort(packed, kind="stable")
        ps, ws = packed[order], w[order]
        bounds = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        sums = np.add.reduceat(ws, bounds)
        top = sums.max()
        kbest = int(ps[bounds][sums == top].min())
        pa_, pb_ = kbest >> 32, kbest & 0xFFFFFFFF
        new_id = _BPE_NEW_BASE + rank
        names[new_id] = name_of(pa_) + name_of(pb_)
        merges.append((rank, name_of(pa_), name_of(pb_), int(top)))
        cand = np.flatnonzero(
            (sym[:-1] == pa_) & (sym[1:] == pb_) & (wid[:-1] == wid[1:])
        )
        run_start = np.r_[True, np.diff(cand) != 1]
        starts_idx = np.flatnonzero(run_start)
        offset = np.arange(len(cand)) - starts_idx[np.cumsum(run_start) - 1]
        kept = cand[offset % 2 == 0]
        sym[kept] = new_id
        alive = np.ones(len(sym), dtype=bool)
        alive[kept + 1] = False
        sym, wid, wt = sym[alive], wid[alive], wt[alive]
    return merges


def doc_bpe_train(
    sf_dir: str, n_merges: int = 60, batch_size: int = 4096
) -> pd.DataFrame:
    """BPE tokenizer TRAINING over the corpus — the full merge loop, not
    just the step-0 pair statistics of doc_bpe_pairs.

    Scale design (how real tokenizer trainers work): the only corpus-scale
    stage is ONE distributed word-count scan — per-batch combiners collapse
    each batch to distinct words before the exchange, so the shuffle moves
    word-vocabulary-sized partials, never a row per occurrence. The merge
    loop then iterates on the (word, count) TABLE, whose size is bounded by
    the distinct-word vocabulary — corpus-size-INDEPENDENT — so running it
    driver-resident (vectorized numpy, see _bpe_merge_loop) is the correct
    placement: at 100 TB the vocab table is a few hundred MB while the
    corpus is not, and n_merges rounds over it never touch the corpus
    again. Deterministic: argmax tie-breaks on the smallest symbol-id
    pair; a rank's count is the weighted number of adjacent occurrences
    (overlaps included) at the time of the merge."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        keep = pc.not_equal(flat, "")
        s = flat.filter(keep).to_pandas()
        out = s.value_counts().rename_axis("w").reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    vocab = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
        "w",
        {"cnt": ("cnt", "sum")},
    ).to_pandas()
    if vocab.empty:  # word-less corpus: the all-empty aggregate loses its
        # schema on the way back — nothing to merge
        return pd.DataFrame({"rank": pd.Series(dtype=np.int64),
                             "left": pd.Series(dtype=str),
                             "right": pd.Series(dtype=str),
                             "cnt": pd.Series(dtype=np.int64)})
    vocab = vocab.sort_values("w", ignore_index=True)  # deterministic layout
    merges = _bpe_merge_loop(
        vocab["w"].tolist(), vocab["cnt"].to_numpy(), n_merges
    )
    return pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"]).astype(
        {"rank": np.int64, "cnt": np.int64}
    )


# ------------------------------------------------- distributed logistic regression
def emb_logreg_train(
    sf_dir: str,
    epochs: int = 40,
    lr: float = 5.0,
    batch_size: int = 256,
) -> pd.DataFrame:
    """Multinomial logistic-regression TRAINING on the embedding table —
    BSP full-batch gradient descent as a Ray Data iterative pipeline
    (the model-scoring counterpart: doc_model_score applies a model,
    this one fits it).

    Per epoch: one map_batches pass computes per-batch gradient PARTIALS
    of the softmax cross-entropy; the driver sums them, updates the
    (d+1)x C weight matrix (bias folded in), and broadcasts it into the
    next epoch's closure — weights are k·d driver-resident, the dataset
    is never collected. The training set is materialize()d once into the
    object store (the canonical iterative-training cache; Ray spills it
    under memory pressure rather than holding Python lists).

    Determinism at any parallelism: each ROW's gradient contribution is
    quantized to fixed-point int64 (np.rint at 2^scale_bits) BEFORE any
    cross-row sum, so partial sums are integer — associative and
    commutative — and the fitted weights are bitwise identical regardless
    of batch boundaries or worker scheduling (same discipline as
    emb_label_prop's integer vote weights). scale_bits shrinks with the
    row count so the int64 accumulator cannot overflow (N·2^bits < 2^61).
    Matrix products are computed as an explicit feature-ordered loop of
    rank-1 updates — a fixed float reduction order, immune to BLAS
    threading — and the parity pytest reproduces the identical math
    straight-line."""
    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path)
    n_rows = meta.metadata.num_rows
    d = 0
    for b in meta.iter_batches(batch_size=1):
        d = len(b["embedding"][0])
        break
    ds = ray.data.read_parquet(path, columns=["embedding", "label"]).materialize()
    n_classes = _label_n_classes(path)  # footer-stats pass, no data scan
    scale_bits = min(24, 61 - int(np.ceil(np.log2(n_rows + 1))))
    scale = float(2**scale_bits)

    def matmul_fixed(Xb: np.ndarray, W: np.ndarray) -> np.ndarray:
        # explicit feature-ordered accumulation: deterministic float order
        Z = np.zeros((Xb.shape[0], W.shape[1]))
        for j in range(W.shape[0]):
            Z += Xb[:, j : j + 1] * W[j]
        return Z

    def embed_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, d)
        Xb = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        y = batch["label"].to_numpy().astype(np.int64)
        return Xb, y

    W = np.zeros((d + 1, n_classes))
    for _ in range(epochs):
        Wb = W.copy()

        def grad_partial(batch: pa.Table) -> pd.DataFrame:
            Xb, y = embed_matrix(batch)
            Z = matmul_fixed(Xb, Wb)
            Z -= Z.max(axis=1, keepdims=True)
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            P[np.arange(len(y)), y] -= 1.0
            G = np.rint(scale * np.einsum("ni,nj->nij", Xb, P)).astype(np.int64)
            return pd.DataFrame({"g": [G.sum(axis=0).ravel()]})

        parts = ds.map_batches(
            grad_partial, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        G = np.sum(np.stack(parts["g"].to_numpy()), axis=0).reshape(d + 1, n_classes)
        W = W - lr * (G.astype(np.float64) / scale) / n_rows

    Wf = W

    def acc_partial(batch: pa.Table) -> pd.DataFrame:
        Xb, y = embed_matrix(batch)
        pred = np.argmax(matmul_fixed(Xb, Wf), axis=1)
        return pd.DataFrame({"ok": [int((pred == y).sum())], "n": [len(y)]})

    acc = ds.map_batches(acc_partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    train_acc = float(acc["ok"].sum()) / float(acc["n"].sum())

    cls, dim = np.meshgrid(np.arange(n_classes), np.arange(-1, d))
    out = pd.DataFrame(
        {
            "class": cls.ravel().astype(np.int64),
            "dim": dim.ravel().astype(np.int64),  # -1 = bias
            "w": np.vstack([W[-1:], W[:-1]]).ravel(),
            "train_acc": np.full((d + 1) * n_classes, train_acc),
        }
    )
    return out.sort_values(["class", "dim"], ignore_index=True)


def _bpe_apply(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Encode one word with a trained merge table: repeatedly merge every
    occurrence of the lowest-rank adjacent pair present (left-to-right
    non-overlapping), until no mergeable pair remains. Returns the token
    count (the symbols themselves are concatenations of the input, so the
    count is the datum worth shipping)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best_pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def doc_bpe_encode(
    sf_dir: str, n_merges: int = 60, batch_size: int = 2048
) -> pd.DataFrame:
    """Tokenize the corpus with the BPE model doc_bpe_train just fit — the
    apply side of tokenizer training, and the honest BPE token count the
    whitespace/token-regex stats approximate.

    The merge-rank table (n_merges rows) is broadcast once via ray.put and
    materialized per ACTOR in __init__ — never re-shipped per batch. Each
    actor keeps a persistent word → token-count cache across batches: word
    frequency is Zipfian, so the per-word merge loop (the only non-vector
    step, inherent to BPE's sequential merge semantics) runs once per
    DISTINCT word per actor, not once per occurrence. Output is one row
    per doc (doc_id, n_tokens, n_words) — linear, no exchange at all."""
    merges = doc_bpe_train(sf_dir, n_merges=n_merges)
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    ranks_ref = ray.put(ranks)

    class Encoder:
        def __init__(self):
            self.ranks = ray.get(ranks_ref)
            self.cache: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            import pyarrow.compute as pc

            split = pc.split_pattern(batch["text"], " ")
            flat = pc.list_flatten(split)
            parent = pc.list_parent_indices(split)
            keep = pc.not_equal(flat, "")
            words = flat.filter(keep).to_pandas().to_numpy()
            par = parent.filter(keep).to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(words, return_inverse=True)
            counts = np.empty(len(uniq), dtype=np.int64)
            for i, w in enumerate(uniq):
                c = self.cache.get(w)
                if c is None:
                    c = _bpe_apply(w, self.ranks)
                    self.cache[w] = c
                counts[i] = c
            per_word = counts[inv]
            n_docs = len(batch)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "n_tokens": np.bincount(par, weights=per_word, minlength=n_docs
                                            ).astype(np.int64),
                    "n_words": np.bincount(par, minlength=n_docs).astype(np.int64),
                }
            )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        Encoder, concurrency=2, batch_size=batch_size, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def emb_triangle_count(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Distributed exact triangle count over the (undirected) k-NN graph —
    the clustering-coefficient / community-structure primitive on the
    similarity graph the curation family already builds.

    Degree-oriented wedge join (Suri & Vassilvitskii WWW'11 "curse of the
    last reducer"): canonicalize the directed kNN edges to unordered pairs,
    rank nodes by (degree, id), orient every edge low-rank -> high-rank —
    each node's out-degree is then O(sqrt(m))-bounded, so per-node wedge
    generation can't blow up on hubs. Wedges (u's out-neighbour pairs) and
    oriented edges meet in ONE pair-keyed tagged-union exchange; a wedge
    closed by an edge is exactly one triangle, counted once (orientation
    makes u < v < w in rank order unique). Nothing node- or edge-scaled
    lands on the driver — per-bucket int64 partial counts only."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    edges = emb_knn_graph_ds(sf_dir, k=k)

    def canon(b: pa.Table) -> pd.DataFrame:
        u = b["vec_id"].to_numpy(zero_copy_only=False)
        v = b["nbr_id"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]}).drop_duplicates(
            ignore_index=True
        )

    und = edges.map_batches(canon, batch_format="pyarrow")

    # global pair dedup + per-edge emit, one exchange keyed on the pair
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"], ignore_index=True)[["a", "b"]]

    # materialize the canonical edge list once: both the degree pass and the
    # wedge join consume it, and without the pin the second consumer would
    # re-execute the whole kNN lineage (actor pools included)
    und = partition_map_groups(und, dedup_pairs, key="a", num_buckets=32).materialize()

    # degrees (vocabulary-sized: one row per node)
    def deg_partial(b: pa.Table) -> pd.DataFrame:
        ids = np.concatenate(
            [b["a"].to_numpy(zero_copy_only=False), b["b"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    deg = grouped_aggregate(
        und.map_batches(deg_partial, batch_format="pyarrow"),
        "node",
        {"deg": ("deg", "sum")},
    ).to_pandas()
    # rank = (deg, id): dense int rank, broadcast (node-vocabulary-sized —
    # at kNN degree <= 2k the rank table is N rows of two ints; for a
    # general graph this table is the one driver-resident object and stays
    # far below the edge list it orients)
    deg = deg.sort_values(["deg", "node"], ignore_index=True)
    rank_of = pd.Series(np.arange(len(deg), dtype=np.int64), index=deg["node"].to_numpy())
    rank_ref = ray.put(rank_of)

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rank_ref)
        ra = r.loc[b["a"].to_numpy()].to_numpy()
        rb = r.loc[b["b"].to_numpy()].to_numpy()
        src = np.where(ra < rb, b["a"].to_numpy(), b["b"].to_numpy())
        dst = np.where(ra < rb, b["b"].to_numpy(), b["a"].to_numpy())
        return pd.DataFrame({"src": src, "dst": dst,
                             "rd": np.where(ra < rb, rb, ra)})

    oriented = und.map_batches(orient, batch_format="pandas")

    # wedges per source node (out-neighbour pairs), tagged union with edges
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, grp in g.groupby("src"):
            # pair order must match the edge ORIENTATION: sort the
            # out-neighbours by rank so (x, y) has rank(x) < rank(y)
            nb = grp.sort_values("rd")["dst"].to_numpy()
            n = len(nb)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame({"x": nb[i], "y": nb[j]}))
        if not outs:
            return pd.DataFrame({"x": pd.Series(dtype=np.int64),
                                 "y": pd.Series(dtype=np.int64),
                                 "is_edge": pd.Series(dtype=np.int64)})
        out = pd.concat(outs, ignore_index=True)
        out["is_edge"] = np.int64(0)
        return out

    wedge_ds = partition_map_groups(oriented, wedges, key="src", num_buckets=32)
    edge_tagged = oriented.map_batches(
        lambda b: pd.DataFrame(
            {"x": b["src"].to_numpy(), "y": b["dst"].to_numpy(),
             "is_edge": np.ones(len(b), dtype=np.int64)}
        ),
        batch_format="pyarrow",
    )

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["is_edge"].to_numpy().astype(bool)
        w = g.loc[~is_e, ["x", "y"]]
        e = g.loc[is_e, ["x", "y"]].drop_duplicates()
        closed = len(w.merge(e, on=["x", "y"]))
        return pd.DataFrame({"n_triangles": [np.int64(closed)]})

    parts = partition_map_groups(
        wedge_ds.union(edge_tagged), close_count, key="x", num_buckets=32
    ).to_pandas()
    return pd.DataFrame({"n_triangles": [np.int64(parts["n_triangles"].sum())]})


def emb_logreg_cv(
    sf_dir: str,
    n_folds: int = 5,
    epochs: int = 20,
    lr: float = 5.0,
    batch_size: int = 256,
) -> pd.DataFrame:
    """K-fold cross-validated logistic regression — the model-selection
    protocol as ONE dataflow: all K leave-fold-out models train
    SIMULTANEOUSLY, so each epoch is a single pass over the data (not K),
    and the eval pass scores every row under the model that never saw it
    (honest out-of-fold accuracy).

    Folds are vec_id % n_folds (deterministic, no shuffle needed on ids
    that carry no order semantics). Per batch the gradient partial is a
    (K, d+1, C) int64 tensor — each row's fixed-point-quantized outer
    product enters the K−1 models whose fold it is NOT in, evaluated under
    each model's own weights. Same bitwise-at-any-parallelism discipline
    as emb_logreg_train (per-row int64 quantization, feature-ordered
    matmul)."""
    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path)
    n_rows = meta.metadata.num_rows
    d = 0
    for b in meta.iter_batches(batch_size=1):
        d = len(b["embedding"][0])
        break
    ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding", "label"]
    ).materialize()
    C = _label_n_classes(path)  # footer-stats pass, no data scan
    K = n_folds
    scale_bits = min(24, 61 - int(np.ceil(np.log2(n_rows + 1))))
    scale = float(2**scale_bits)

    def matmul_fixed(Xb: np.ndarray, W: np.ndarray) -> np.ndarray:
        Z = np.zeros((Xb.shape[0], W.shape[1]))
        for j in range(W.shape[0]):
            Z += Xb[:, j : j + 1] * W[j]
        return Z

    def embed_matrix(batch: pa.Table):
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, d)
        Xb = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        y = batch["label"].to_numpy().astype(np.int64)
        f = batch["vec_id"].to_numpy().astype(np.int64) % K
        return Xb, y, f

    # per-fold row counts (one cheap pass)
    def count_partial(batch: pa.Table) -> pd.DataFrame:
        f = batch["vec_id"].to_numpy().astype(np.int64) % K
        return pd.DataFrame({"cnt": [np.bincount(f, minlength=K).astype(np.int64)]})

    cnts = np.sum(
        np.stack(
            ds.map_batches(count_partial, batch_format="pyarrow", batch_size=batch_size)
            .to_pandas()["cnt"]
            .to_numpy()
        ),
        axis=0,
    )
    n_train = np.maximum(n_rows - cnts, 1)  # rows each model trains on
    # (clamped to 1: a fold holding ALL rows leaves its model untrained —
    # zero gradient mass — rather than dividing by zero)

    Ws = np.zeros((K, d + 1, C))
    for _ in range(epochs):
        Wb = Ws.copy()

        def grad_partial(batch: pa.Table) -> pd.DataFrame:
            Xb, y, f = embed_matrix(batch)
            n = len(y)
            G = np.zeros((K, d + 1, C), dtype=np.int64)
            for k in range(K):
                use = f != k
                if not use.any():
                    continue
                Xu, yu = Xb[use], y[use]
                Z = matmul_fixed(Xu, Wb[k])
                Z -= Z.max(axis=1, keepdims=True)
                P = np.exp(Z)
                P /= P.sum(axis=1, keepdims=True)
                P[np.arange(len(yu)), yu] -= 1.0
                G[k] = np.rint(scale * np.einsum("ni,nj->nij", Xu, P)).astype(
                    np.int64
                ).sum(axis=0)
            return pd.DataFrame({"g": [G.ravel()]})

        parts = ds.map_batches(
            grad_partial, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        G = np.sum(np.stack(parts["g"].to_numpy()), axis=0).reshape(K, d + 1, C)
        for k in range(K):
            Ws[k] = Ws[k] - lr * (G[k].astype(np.float64) / scale) / n_train[k]

    Wf = Ws.copy()

    def eval_partial(batch: pa.Table) -> pd.DataFrame:
        Xb, y, f = embed_matrix(batch)
        ok = np.zeros(K, dtype=np.int64)
        for k in range(K):
            m = f == k  # out-of-fold rows for model k
            if not m.any():
                continue
            pred = np.argmax(matmul_fixed(Xb[m], Wf[k]), axis=1)
            ok[k] = int((pred == y[m]).sum())
        return pd.DataFrame({"ok": [ok]})

    oks = np.sum(
        np.stack(
            ds.map_batches(eval_partial, batch_format="pyarrow", batch_size=batch_size)
            .to_pandas()["ok"]
            .to_numpy()
        ),
        axis=0,
    )
    return pd.DataFrame(
        {
            "fold": np.arange(K, dtype=np.int64),
            "n_train": n_train.astype(np.int64),
            "n_test": cnts.astype(np.int64),
            "oof_acc": oks.astype(np.float64) / np.maximum(cnts, 1),
        }
    )


def emb_mmr_diversify(
    sf_dir: str,
    query_id: int = 0,
    n_candidates: int = 50,
    k: int = 10,
    lam: float = 0.7,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98) — the diversification tail of the retrieval stack
    (doc_bm25_topk / emb_ann_topk / doc_rrf_fusion produce relevance-ranked
    candidates; MMR trades relevance against redundancy:
    argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)).

    Stage 1 is the distributed part: brute-force cosine vs the broadcast
    query over the whole column, per-batch top-N partials (blocks×N rows to
    the driver, never the corpus). Stage 2 fetches only the N candidate
    vectors by predicate-pushdown read and runs the inherently sequential
    greedy selection driver-side — O(k·N·d) on N=50 rows, the correct
    placement. Deterministic tie-break (score desc handled by exact float
    compare, then vec_id asc)."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/embeddings.parquet"
    qdf = ray.data.read_parquet(
        path, columns=["vec_id", "embedding"], filter=pc.field("vec_id") == query_id
    ).to_pandas()
    qv = np.asarray(qdf["embedding"].iloc[0], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    qref = ray.put(qv)

    def part(batch: pa.Table) -> pd.DataFrame:
        q = ray.get(qref)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = np.asarray(col.flatten(), dtype=np.float64).reshape(len(batch), -1)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = X @ q
        ids = batch["vec_id"].to_numpy()
        keep = ids != query_id
        ids, sims = ids[keep], sims[keep]
        n = min(n_candidates, len(ids))
        order = np.lexsort((ids, -sims))[:n]
        return pd.DataFrame({"vec_id": ids[order], "sim_q": sims[order]})

    parts = ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        part, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    parts = parts.sort_values(["sim_q", "vec_id"], ascending=[False, True],
                              kind="mergesort").head(n_candidates)
    cand_ids = parts["vec_id"].to_numpy()

    cdf = ray.data.read_parquet(
        path, columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(cand_ids.tolist()),
    ).to_pandas().set_index("vec_id").loc[cand_ids]
    M = np.stack(cdf["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sim_q = parts["sim_q"].to_numpy()

    chosen: list[int] = []
    max_red = np.full(len(cand_ids), -np.inf)
    out = []
    for rank in range(min(k, len(cand_ids))):
        if not chosen:
            score = lam * sim_q
        else:
            score = lam * sim_q - (1.0 - lam) * max_red
        score[chosen] = -np.inf
        best = score.max()
        idx = np.flatnonzero(score == best)
        pick = idx[np.argmin(cand_ids[idx])]
        out.append((rank, int(cand_ids[pick]), float(sim_q[pick]), float(best)))
        chosen.append(int(pick))
        red = M @ M[pick]
        max_red = np.maximum(max_red, red)
    return pd.DataFrame(out, columns=["rank", "vec_id", "sim_q", "mmr_score"]).astype(
        {"rank": np.int64, "vec_id": np.int64}
    )


def doc_export_partitioned(sf_dir: str, read_lang: str = "en") -> pd.DataFrame:
    """Hive-partitioned columnar export + partition-PRUNED read-back — the
    resumable-output discipline end-to-end: write the corpus partitioned by
    lang (`lang=<v>/` directories via write_parquet(partition_cols=...),
    one subtree per partition so a failed run can skip finished partitions
    and downstream readers prune at the PATH level), then read exactly one
    partition back — the read lists only `lang=<read_lang>/` files, never
    touching the other partitions' bytes.

    The export is cached per corpus fingerprint (_corpus_ck_key — path +
    size + mtime + row count), so re-runs skip the write. Returns the
    pruned partition's rows, oracle-checked against a WHERE filter over the
    unpartitioned table."""
    import os
    import shutil

    from quant_feature_pipeline_ray.ckpt import ckpt_path

    out_root = ckpt_path("graft_part_export", _corpus_ck_key(sf_dir))
    done = os.path.join(out_root, "_SUCCESS")
    if not os.path.exists(done):
        shutil.rmtree(out_root, ignore_errors=True)
        tmp = out_root + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        ds.write_parquet(tmp, partition_cols=["lang"])
        try:
            os.replace(tmp, out_root)
            with open(done, "w") as f:
                f.write("ok")
        except OSError:
            # concurrent exporter won the rename; its output is equivalent
            # (same corpus fingerprint) — use it if committed, else re-raise
            if not os.path.exists(done):
                raise
            shutil.rmtree(tmp, ignore_errors=True)

    part = ray.data.read_parquet(os.path.join(out_root, f"lang={read_lang}"))
    out = part.to_pandas()
    out["lang"] = read_lang  # partition column lives in the path, not the files
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["doc_id", "lang", "n_chars"]].sort_values("doc_id", ignore_index=True)


def doc_export_partitioned_sql(sf_dir: str, read_lang: str = "en") -> str:
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE lang = '{read_lang}' ORDER BY doc_id"""


def emb_clustering_coeff(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Per-node local clustering coefficient over the undirected kNN graph
    — 2·T(v) / (deg(v)·(deg(v)−1)) — the node-level refinement of
    emb_triangle_count (same degree-oriented wedge join; Suri &
    Vassilvitskii WWW'11).

    The wedge rows additionally carry their center u; a closed wedge
    (u;v,w) credits ONE triangle to each of u, v, w. Per-bucket partial
    (node, t) counts pre-sum before the node-keyed exchange, so the final
    aggregation is node-vocabulary-sized. Degrees ride the same table the
    orientation pass already built."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    edges = emb_knn_graph_ds(sf_dir, k=k)

    def canon(b: pa.Table) -> pd.DataFrame:
        u = b["vec_id"].to_numpy(zero_copy_only=False)
        v = b["nbr_id"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]}).drop_duplicates(
            ignore_index=True
        )

    und = partition_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"),
        lambda g: g.drop_duplicates(["a", "b"], ignore_index=True)[["a", "b"]],
        key="a",
        num_buckets=32,
    ).materialize()

    def deg_partial(b: pa.Table) -> pd.DataFrame:
        ids = np.concatenate(
            [b["a"].to_numpy(zero_copy_only=False), b["b"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    deg = grouped_aggregate(
        und.map_batches(deg_partial, batch_format="pyarrow"),
        "node",
        {"deg": ("deg", "sum")},
    ).to_pandas()
    deg = deg.sort_values(["deg", "node"], ignore_index=True)
    rank_of = pd.Series(np.arange(len(deg), dtype=np.int64), index=deg["node"].to_numpy())
    rank_ref = ray.put(rank_of)

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rank_ref)
        ra = r.loc[b["a"].to_numpy()].to_numpy()
        rb = r.loc[b["b"].to_numpy()].to_numpy()
        src = np.where(ra < rb, b["a"].to_numpy(), b["b"].to_numpy())
        dst = np.where(ra < rb, b["b"].to_numpy(), b["a"].to_numpy())
        return pd.DataFrame({"src": src, "dst": dst,
                             "rd": np.where(ra < rb, rb, ra)})

    oriented = und.map_batches(orient, batch_format="pandas")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, grp in g.groupby("src"):
            nb = grp.sort_values("rd")["dst"].to_numpy()
            n = len(nb)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            outs.append(pd.DataFrame(
                {"x": nb[i], "y": nb[j],
                 "u": np.full(len(i), src, dtype=np.int64)}))
        if not outs:
            return pd.DataFrame({"x": pd.Series(dtype=np.int64),
                                 "y": pd.Series(dtype=np.int64),
                                 "u": pd.Series(dtype=np.int64),
                                 "is_edge": pd.Series(dtype=np.int64)})
        out = pd.concat(outs, ignore_index=True)
        out["is_edge"] = np.int64(0)
        return out

    wedge_ds = partition_map_groups(oriented, wedges, key="src", num_buckets=32)
    edge_tagged = oriented.map_batches(
        lambda b: pd.DataFrame(
            {"x": b["src"].to_numpy(), "y": b["dst"].to_numpy(),
             "u": np.full(len(b), -1, dtype=np.int64),
             "is_edge": np.ones(len(b), dtype=np.int64)}
        ),
        batch_format="pyarrow",
    )

    def close_credit(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["is_edge"].to_numpy().astype(bool)
        w = g.loc[~is_e, ["x", "y", "u"]]
        e = g.loc[is_e, ["x", "y"]].drop_duplicates()
        closed = w.merge(e, on=["x", "y"])
        if len(closed) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "t": pd.Series(dtype=np.int64)})
        nodes = np.concatenate(
            [closed["u"].to_numpy(), closed["x"].to_numpy(), closed["y"].to_numpy()]
        )
        un, cn = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": un, "t": cn.astype(np.int64)})

    tri = grouped_aggregate(
        partition_map_groups(
            wedge_ds.union(edge_tagged), close_credit, key="x", num_buckets=32
        ),
        "node",
        {"t": ("t", "sum")},
    ).to_pandas()

    out = deg.merge(tri, on="node", how="left")
    out["t"] = out["t"].fillna(0).astype(np.int64)
    d = out["deg"].to_numpy().astype(np.float64)
    denom = d * (d - 1.0)
    out["coeff"] = np.where(denom > 0, 2.0 * out["t"].to_numpy() / denom, 0.0)
    return out.sort_values("node", ignore_index=True).astype(
        {"node": np.int64, "deg": np.int64}
    )


_CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime: sum stays in int64 on both sides


def doc_checksum(sf_dir: str, batch_size: int = 4096) -> pd.DataFrame:
    """Order-independent content checksum of the corpus — the anti-entropy
    primitive: verify that a migrated / backfilled / re-partitioned copy is
    IDENTICAL to the source by exchanging one integer instead of the data
    (commutative sum of per-row digests — any row order, any partitioning,
    same checksum; any changed/missing/extra row changes it).

    Per row: v = little-endian uint64 of md5(doc_id|text) bytes 8..16
    (what DuckDB's md5_number_lower computes), reduced mod 2^61−1;
    checksum = Σv mod 2^61−1. Per-batch partials are single Python-int
    sums, the driver combines block partials — nothing row-scaled moves.
    md5 (not an engine hash) so the DuckDB oracle computes the identical
    digests."""
    import hashlib

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def part(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        s = 0
        for i, t in zip(ids, texts):
            d = hashlib.md5(f"{i}|{t}".encode()).digest()
            s += int.from_bytes(d[8:16], "little") % _CHECKSUM_MOD
        return pd.DataFrame({"partial": [s % _CHECKSUM_MOD], "n": [len(ids)]})

    parts = ds.map_batches(part, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    # combine in arbitrary-precision Python ints: an int64 sum of partials
    # (each up to 2^61) silently wraps past four batches
    total = sum(int(x) for x in parts["partial"]) % _CHECKSUM_MOD
    return pd.DataFrame(
        {
            "checksum": [np.int64(total)],
            "n_rows": [np.int64(parts["n"].sum())],
        }
    )


def doc_checksum_sql(sf_dir: str) -> str:
    return f"""
SELECT CAST(SUM(CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '|' || text) % {_CHECKSUM_MOD} AS HUGEINT)) % {_CHECKSUM_MOD} AS BIGINT) AS checksum,
       CAST(count(*) AS BIGINT) AS n_rows
FROM documents"""


def emb_logreg_per_source(
    sf_dir: str, epochs: int = 30, lr: float = 5.0, num_buckets: int = 16
) -> pd.DataFrame:
    """Per-SOURCE logistic regression — the "many small models" pattern
    (one independent model per group, fit INSIDE map_groups), the
    complement of emb_logreg_train's "one big model over all data" BSP:
    when each group fits on a worker, a grouped fit needs ONE exchange per
    join key and ZERO driver round-trips per epoch.

    Dataflow: documents(doc_id, source) and embeddings(vec_id, X, label)
    meet in a doc_id-keyed tagged-union exchange (nothing broadcast —
    the doc→source map is corpus-scale); the joined rows re-key by source
    and each source's group runs the same per-row-quantized GD as
    emb_logreg_train straight-line (bitwise deterministic; group order
    irrelevant). Embeddings travel as packed float32 BYTES — a plain
    Arrow binary column — because object columns of ndarrays round-trip
    through Ray's tensor extension and break pandas hops."""
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    C = _label_n_classes(f"{sf_dir}/embeddings.parquet")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "source": b["source"].to_numpy(zero_copy_only=False),
                "xb": [b""] * len(b),
                "label": np.full(len(b), -1, dtype=np.int64),
            }
        ),
        batch_format="pyarrow",
    )

    def pack(b: pa.Table) -> pd.DataFrame:
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        X = np.asarray(col.flatten(), dtype=np.float32).reshape(len(b), -1)
        return pd.DataFrame(
            {
                "doc_id": b["vec_id"].to_numpy(),
                "source": [""] * len(b),
                "xb": [row.tobytes() for row in X],
                "label": b["label"].to_numpy().astype(np.int64),
            }
        )

    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).map_batches(pack, batch_format="pyarrow")

    def join(g: pd.DataFrame) -> pd.DataFrame:
        src = g[g["label"] < 0].set_index("doc_id")["source"]
        d = g[g["label"] >= 0]
        return pd.DataFrame(
            {
                "source": d["doc_id"].map(src).to_numpy(),
                "xb": d["xb"].to_numpy(),
                "label": d["label"].to_numpy(),
            }
        )

    joined = partition_map_groups(
        docs.union(embs), join, key="doc_id", num_buckets=num_buckets
    )

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, gg in g.groupby("source"):
            X = np.stack(
                [np.frombuffer(b, dtype=np.float32) for b in gg["xb"]]
            ).astype(np.float64)
            Xb = np.concatenate([X, np.ones((len(X), 1))], axis=1)
            y = gg["label"].to_numpy()
            n = len(y)
            scale = float(2 ** min(24, 61 - int(np.ceil(np.log2(n + 1)))))
            W = np.zeros((Xb.shape[1], C))
            for _ in range(epochs):
                Z = np.zeros((n, C))
                for j in range(Xb.shape[1]):
                    Z += Xb[:, j : j + 1] * W[j]
                Z -= Z.max(axis=1, keepdims=True)
                P = np.exp(Z)
                P /= P.sum(axis=1, keepdims=True)
                P[np.arange(n), y] -= 1.0
                G = np.rint(scale * np.einsum("ni,nj->nij", Xb, P)).astype(
                    np.int64
                ).sum(axis=0)
                W = W - lr * (G.astype(np.float64) / scale) / n
            Z = np.zeros((n, C))
            for j in range(Xb.shape[1]):
                Z += Xb[:, j : j + 1] * W[j]
            acc = float((np.argmax(Z, axis=1) == y).mean())
            rows.append((src, np.int64(n), acc, float(np.sqrt((W * W).sum()))))
        return pd.DataFrame(rows, columns=["source", "n", "train_acc", "w_norm"])

    out = partition_map_groups(joined, fit, key="source", num_buckets=8).to_pandas()
    return out.sort_values("source", ignore_index=True)


# ------------------------------------------------ temperature source mixing
def doc_temperature_mix(sf_dir: str, alphas: tuple = (1.0, 0.7, 0.5, 0.3)) -> pd.DataFrame:
    """Temperature-scaled source-sampling plan — the multilingual/source
    balancing rule from public multilingual-LM recipes (XLM-R / mBERT:
    sample source i with p_i ∝ c_i^alpha, Conneau et al. 2020): for each
    temperature alpha, every source's sampling weight, its natural
    frequency, the expected docs drawn per epoch at corpus size, and the
    implied up/down-sampling factor. alpha=1.0 is the natural mix;
    lowering alpha flattens toward uniform (upsamples rare sources).

    Scale shape: per-batch source-count COMBINER → one |sources|-bounded
    exchange → the |alphas|x|sources| plan is computed on the driver
    (dictionary-sized). Documents never ride the exchange. round(,6) on
    the pow-derived columns absorbs float-sum ordering of the per-alpha
    normalizer (the emb_label_centroids discipline).

    reference parity: the reference processes one trading pair per run
    (run_daily_features.py); corpus-mix planning is part of the added
    curation surface (SURVEY.md §2.7 extension)."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = batch["source"].to_pandas()
        out = s.value_counts().rename_axis("source").reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"), "source", {"n": ("n", "sum")}
        )
        .to_pandas()  # |sources|-bounded
        .sort_values("source", ignore_index=True)
    )
    n = counts["n"].to_numpy(dtype=np.int64)
    total = np.int64(n.sum())
    rows = []
    for alpha in alphas:
        w_raw = np.power(n.astype(np.float64), float(alpha))
        z = np.add.reduce(w_raw)  # sequential in source order; round absorbs
        weight = w_raw / z
        p_nat = n / total
        rows.append(
            pd.DataFrame(
                {
                    "alpha": np.full(len(n), float(alpha)),
                    "source": counts["source"].to_numpy(),
                    "n_docs": n,
                    "p_natural": p_nat,
                    "weight": np.round(weight, 6),
                    "expected_docs": np.round(weight * total, 6),
                    "upsample": np.round(weight / p_nat, 6),
                }
            )
        )
    return pd.concat(rows, ignore_index=True).sort_values(
        ["alpha", "source"], ignore_index=True
    )


def doc_temperature_mix_sql(sf_dir: str, alphas: tuple = (1.0, 0.7, 0.5, 0.3)) -> str:
    vals = ", ".join(f"({a})" for a in alphas)
    return f"""
WITH al(alpha) AS (VALUES {vals}),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
w AS (
  SELECT al.alpha, c.source, c.n_docs,
         pow(c.n_docs, al.alpha) AS w_raw,
         sum(pow(c.n_docs, al.alpha)) OVER (PARTITION BY al.alpha) AS z
  FROM al CROSS JOIN c
)
SELECT w.alpha, w.source, w.n_docs,
       w.n_docs / CAST(tot.total AS DOUBLE) AS p_natural,
       round(w.w_raw / w.z, 6) AS weight,
       round((w.w_raw / w.z) * tot.total, 6) AS expected_docs,
       round((w.w_raw / w.z) / (w.n_docs / CAST(tot.total AS DOUBLE)), 6) AS upsample
FROM w CROSS JOIN tot
ORDER BY alpha, source"""


# --------------------------------------------- Kneser–Ney bigram LM scoring
def doc_kn_bigram(sf_dir: str, discount: float = 0.75, top_n: int = 100) -> pd.DataFrame:
    """Interpolated Kneser–Ney bigram probabilities for the corpus's top
    bigrams (Kneser & Ney 1995; Chen & Goodman 1998 — the smoothing used by
    every serious count-based LM; the continuation-probability term is what
    distinguishes it from doc_backoff_trigram's stupid backoff):

        P_KN(y|x) = max(c(x,y) − D, 0)/c(x·) + (D·N1+(x·)/c(x·)) · N1+(·y)/B

    with D the absolute discount, c(x·) the left-context total, N1+(x·)
    distinct continuations of x, N1+(·y) distinct left contexts of y, and
    B the number of distinct bigram types.

    Scale shape: per-batch bigram COMBINER → one hash exchange to global
    (x, y) counts (the doc_pmi_bigrams dataflow) → the three derived stats
    are vocabulary-bounded aggregates OVER the count table (never over the
    corpus) → per-batch partial top-n by count, driver merges blocks×n and
    scores the n winners against the broadcastable vocab-sized stat maps.
    One float expression mirrored verbatim in the oracle → bitwise."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy()
        adj = parent[:-1] == parent[1:]
        x, y = flat[:-1][adj], flat[1:][adj]
        ok = (x != "") & (y != "")
        p = pd.DataFrame({"x": x[ok], "y": y[ok]})
        out = p.groupby(["x", "y"], as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["x", "y"],
        {"n": ("n", "sum")},
    ).materialize()
    n_types = np.int64(counts.count())
    # vocabulary-bounded derived stats (rows = |vocab|, never corpus-scale)
    left = grouped_aggregate(
        counts, "x", {"c1": ("n", "sum"), "n_follow": ("n", "size")}
    ).to_pandas()
    prec = grouped_aggregate(counts, "y", {"n_prec": ("n", "size")}).to_pandas()

    def topn(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.sort_values(["n", "x", "y"], ascending=[False, True, True]).head(top_n)

    top = (
        counts.map_batches(topn, batch_format="pyarrow")
        .to_pandas()  # blocks × top_n
        .sort_values(["n", "x", "y"], ascending=[False, True, True], ignore_index=True)
        .head(top_n)
    )
    top = top.merge(left, on="x", how="left").merge(prec, on="y", how="left")
    c12 = top["n"].to_numpy(dtype=np.int64)
    c1 = top["c1"].to_numpy(dtype=np.int64)
    nf = top["n_follow"].to_numpy(dtype=np.int64)
    npr = top["n_prec"].to_numpy(dtype=np.int64)
    D = float(discount)
    kn = np.maximum(c12 - D, 0.0) / c1 + (D * nf / c1) * (npr / np.float64(n_types))
    return pd.DataFrame(
        {
            "x": top["x"],
            "y": top["y"],
            "c12": c12,
            "c1": c1,
            "n_follow": nf,
            "n_prec": npr,
            "kn_prob": kn,
        }
    )


def doc_kn_bigram_sql(sf_dir: str, discount: float = 0.75, top_n: int = 100) -> str:
    return f"""
WITH s AS (SELECT string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i + 1]])) AS pr
  FROM s
),
bgf AS (SELECT pr[1] AS x, pr[2] AS y FROM bg WHERE pr[1] <> '' AND pr[2] <> ''),
c AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c12 FROM bgf GROUP BY x, y),
lft AS (SELECT x, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n_follow
        FROM c GROUP BY x),
pr AS (SELECT y, CAST(count(*) AS BIGINT) AS n_prec FROM c GROUP BY y),
b AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c),
top AS (SELECT x, y, c12 FROM c ORDER BY c12 DESC, x, y LIMIT {top_n})
SELECT t.x, t.y, t.c12, lft.c1, lft.n_follow, pr.n_prec,
       greatest(t.c12 - {discount}, 0) / lft.c1
         + ({discount} * lft.n_follow / lft.c1) * (pr.n_prec / CAST(b.n_types AS DOUBLE))
         AS kn_prob
FROM top t JOIN lft USING (x) JOIN pr USING (y) CROSS JOIN b
ORDER BY t.c12 DESC, t.x, t.y"""


# ----------------------------------------------- embedding-drift audit
def emb_centroid_shift(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift audit: per-label centroid agreement between the
    two vec_id-parity halves of the corpus (the stand-in for before/after
    embedding snapshots — re-embedding with a new model checkpoint, or an
    old-vs-new crawl). cos ≈ 1 means the halves agree; a label whose
    halves diverge flags a labeling or embedding-version problem before
    the vectors feed dedup/ANN.

    Same partial-sum discipline as emb_label_centroids: one matmul per
    batch produces d-wide sums per (label, parity) → grouped exchange of
    (labels×2) rows → driver computes means rounded to 6dp (absorbing
    float-sum order) and the cosine FROM THE ROUNDED MEANS in dim order,
    final round(,6) — both mirrored in the oracle."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    d = len(ds.limit(1).to_pandas()["embedding"].iloc[0])

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        par = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 2
        key = lab * 2 + par
        uniq, inv = np.unique(key, return_inverse=True)
        onehot = np.zeros((len(uniq), len(key)), dtype=np.float64)
        onehot[inv, np.arange(len(key))] = 1.0
        sums = onehot @ m
        out = pd.DataFrame({"key": uniq, "cnt": np.bincount(inv).astype(np.int64)})
        for j in range(d):
            out[f"s{j}"] = sums[:, j]
        return out

    aggs = {"cnt": ("cnt", "sum")}
    for j in range(d):
        aggs[f"s{j}"] = (f"s{j}", "sum")
    agg = (
        grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"), "key", aggs)
        .to_pandas()  # (labels × 2)-bounded
        .sort_values("key", ignore_index=True)
    )
    sums = agg[[f"s{j}" for j in range(d)]].to_numpy()
    means = np.round(sums / agg["cnt"].to_numpy()[:, None], 6)
    agg["label"] = agg["key"].to_numpy() // 2
    agg["parity"] = agg["key"].to_numpy() % 2
    rows = []
    for lab in sorted(agg["label"].unique()):
        e = agg.index[(agg["label"] == lab) & (agg["parity"] == 0)]
        o = agg.index[(agg["label"] == lab) & (agg["parity"] == 1)]
        if len(e) == 0 or len(o) == 0:
            continue
        me, mo = means[e[0]], means[o[0]]
        ab = np.add.reduce(me * mo)  # dim-ordered; final round absorbs
        aa = np.add.reduce(me * me)
        bb = np.add.reduce(mo * mo)
        rows.append(
            (
                np.int64(lab),
                np.int64(agg.loc[e[0], "cnt"]),
                np.int64(agg.loc[o[0], "cnt"]),
                np.round(ab / (np.sqrt(aa) * np.sqrt(bb)), 6),
            )
        )
    return pd.DataFrame(rows, columns=["label", "n_even", "n_odd", "cos_shift"])


def emb_centroid_shift_sql(sf_dir: str, d: int | None = None) -> str:
    if d is None:
        # infer the embedding width from the parquet itself (first row of the
        # first row group) so the oracle always unrolls the same d the Python
        # op infers from the data — a hardcoded default would silently compare
        # a truncated/NULL-padded cosine if the corpus width ever changed
        import pyarrow.parquet as _pq

        first = _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(
            0, columns=["embedding"]
        )
        d = len(first.column("embedding")[0])
    return f"""
WITH c AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(vec_id % 2 AS BIGINT) AS parity,
         CAST(r.dim AS BIGINT) AS dim, round(avg(embedding[r.dim]), 6) AS m
  FROM embeddings CROSS JOIN range(1, {d + 1}) r(dim)
  GROUP BY 1, 2, 3
),
n AS (SELECT CAST(label AS BIGINT) AS label, CAST(vec_id % 2 AS BIGINT) AS parity,
             CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY 1, 2),
dot AS (
  SELECT e.label, sum(e.m * o.m) AS ab, sum(e.m * e.m) AS aa, sum(o.m * o.m) AS bb
  FROM c e JOIN c o ON e.label = o.label AND e.dim = o.dim
  WHERE e.parity = 0 AND o.parity = 1
  GROUP BY e.label
)
SELECT d.label, ne.n AS n_even, no.n AS n_odd,
       round(d.ab / (sqrt(d.aa) * sqrt(d.bb)), 6) AS cos_shift
FROM dot d
JOIN n ne ON ne.label = d.label AND ne.parity = 0
JOIN n no ON no.label = d.label AND no.parity = 1
ORDER BY d.label"""


# --------------------------------------------------- encoding-health audit
def doc_char_freq(sf_dir: str) -> pd.DataFrame:
    """Per-language character frequency table — the encoding-health audit
    (mojibake, stray control characters, and double-encoded artifacts all
    surface as unexpected codepoints long before they poison a tokenizer;
    the WIMBD-style "what is actually IN the bytes" probe at character
    granularity).

    Scale shape: per-batch (lang, codepoint) count COMBINER — each batch's
    text is joined per language and counted with one np.unique over the
    utf-32 view (no per-char Python loop) → ONE exchange bounded by
    |langs|×|charset| → driver computes shares on the dictionary-sized
    table. Text never rides the exchange."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "text": batch["text"].to_pylist(),
            }
        )
        out = []
        for lang, g in df.groupby("lang", sort=False):
            blob = "".join(g["text"])
            cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
            uniq, cnt = np.unique(cps, return_counts=True)
            out.append(
                pd.DataFrame(
                    {"lang": lang, "cp": uniq.astype(np.int64), "n": cnt.astype(np.int64)}
                )
            )
        return pd.concat(out, ignore_index=True)

    m = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"), ["lang", "cp"],
            {"n": ("n", "sum")},
        )
        .to_pandas()  # |langs|×|charset|-bounded
        .sort_values(["lang", "cp"], ignore_index=True)
    )
    tot = m.groupby("lang")["n"].transform("sum").to_numpy(dtype=np.int64)
    n = m["n"].to_numpy(dtype=np.int64)
    m["ch"] = [chr(c) for c in m["cp"].to_numpy()]
    m["share"] = n / tot
    return m[["lang", "ch", "n", "share"]].sort_values(
        ["lang", "ch"], ignore_index=True
    )


def doc_char_freq_sql(sf_dir: str) -> str:
    return """
WITH ch AS (
  SELECT lang, unnest(regexp_extract_all(text, '(?s).')) AS ch FROM documents
), c AS (
  SELECT lang, ch, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2
), t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.lang, c.ch, c.n, c.n / CAST(t.tot AS DOUBLE) AS share
FROM c JOIN t USING (lang)
ORDER BY c.lang, c.ch"""


# ----------------------------------------------------- classifier AUC eval
def doc_model_auc(
    sf_dir: str,
    n_buckets: int = 64,
    scale: int = 8,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> pd.DataFrame:
    """ROC-AUC of the hashed linear model's quality score against the C4
    heuristic filter's verdict — the eval every team runs before swapping
    heuristics for a learned filter (the ranking complement of
    doc_quality_calibration's agreement table).

    Exact AUC without a global sort: AUC needs only, per DISTINCT score,
    the positive/negative counts — so a per-batch (score, label) count
    COMBINER feeds one score-cardinality-bounded exchange, and the driver
    evaluates the tie-aware Mann–Whitney form with INTEGER arithmetic:

        AUC = Σ_s n1_s · (2·cum_n0_<s + n0_s)  /  (2·N1·N0)

    (one float division at the end → bitwise oracle). Score and label are
    computed in ONE fused text pass (no join): the score is bitwise
    doc_model_score's quality_score, the label is bitwise
    doc_quality_filter's predicate. Score cardinality is bounded by the
    distinct (z_num, n_tok) pairs — the grouped-quantiles histogram
    caveat applies (documented there)."""
    import hashlib

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    sw = ("the", "a", "of", "and", "to")

    class Scan:
        def __init__(self) -> None:
            self.w = np.array(
                [
                    int(hashlib.md5(f"w{j}".encode()).hexdigest()[:8], 16) % 201 - 100
                    for j in range(n_buckets)
                ],
                dtype=np.int64,
            )
            self.bucket_of: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            texts = batch["text"].to_pandas()
            toks = texts.str.split(" ")
            e = toks.explode()
            e = e[e != ""]
            for t in pd.unique(e):
                if t not in self.bucket_of:
                    self.bucket_of[t] = (
                        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
                    )
            wt = pd.Series(self.w[e.map(self.bucket_of).to_numpy()], index=e.index)
            g = wt.groupby(level=0)
            idx = pd.RangeIndex(len(texts))
            z_num = g.sum().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
            n_tok_h = g.size().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
            z = z_num / (np.maximum(n_tok_h, 1) * float(scale))
            score = 0.5 * (1.0 + z / (1.0 + np.abs(z)))
            # C4-filter predicate, bitwise doc_quality_filter's oracle
            n_tokens = texts.str.count(" ").to_numpy(dtype=np.int64) + 1
            token_chars = (
                texts.str.len().to_numpy(dtype=np.int64) - (n_tokens - 1)
            )
            sw_hits = (
                toks.explode().isin(sw).groupby(level=0).sum()
                .reindex(idx, fill_value=0)
                .to_numpy(dtype=np.int64)
            )
            label = (
                (n_tokens >= min_tokens)
                & (token_chars / n_tokens <= max_mean_token_len)
                & (sw_hits / n_tokens >= min_stopword_ratio)
            ).astype(np.int64)
            d = pd.DataFrame({"score": score, "label": label})
            out = d.groupby(["score", "label"], as_index=False).size()
            out["n"] = out.pop("size").astype(np.int64)
            return out

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    hist = (
        grouped_aggregate(
            ds.map_batches(Scan, batch_format="pyarrow", concurrency=2),
            ["score", "label"],
            {"n": ("n", "sum")},
        )
        .to_pandas()  # score-cardinality-bounded
        .sort_values("score", ignore_index=True)
    )
    piv = hist.pivot_table(index="score", columns="label", values="n", aggfunc="sum").fillna(0)
    n0s = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(dtype=np.int64)
    n1s = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(dtype=np.int64)
    cum0 = np.concatenate([[0], np.cumsum(n0s)[:-1]])
    num2 = int((n1s * (2 * cum0 + n0s)).sum())
    n1, n0 = int(n1s.sum()), int(n0s.sum())
    # one-class corpus has no ranking to score: report 0.5 (same CASE in
    # the oracle) instead of dividing by zero
    auc = num2 / (2.0 * n1 * n0) if n1 > 0 and n0 > 0 else 0.5
    return pd.DataFrame(
        {"n_pos": [np.int64(n1)], "n_neg": [np.int64(n0)], "auc": [auc]}
    )


def doc_model_auc_sql(
    sf_dir: str,
    n_buckets: int = 64,
    scale: int = 8,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
) -> str:
    sw = ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "to"))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tw AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('w' || CAST(
             ('0x' || substr(md5(tok), 1, 8))::UBIGINT % {n_buckets}
           AS VARCHAR)), 1, 8))::UBIGINT % 201 AS BIGINT) - 100 AS w
  FROM toks WHERE tok <> ''
), agg AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS z_num, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tw GROUP BY doc_id
), m AS (
  SELECT d.doc_id,
         0.5 * (1.0 + (CAST(COALESCE(agg.z_num, 0) AS DOUBLE)
                       / (CAST(GREATEST(COALESCE(agg.n_tok, 0), 1) AS DOUBLE) * {float(scale)}))
                      / (1.0 + abs(CAST(COALESCE(agg.z_num, 0) AS DOUBLE)
                       / (CAST(GREATEST(COALESCE(agg.n_tok, 0), 1) AS DOUBLE) * {float(scale)}))))
           AS score
  FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
), s AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ({sw}))) AS BIGINT) AS sw_hits
  FROM documents
), f AS (
  SELECT doc_id,
         CAST(CASE WHEN n_tokens >= {min_tokens}
                    AND token_chars / n_tokens <= {max_mean_token_len}
                    AND sw_hits / n_tokens >= {min_stopword_ratio}
              THEN 1 ELSE 0 END AS BIGINT) AS label
  FROM s
), j AS (SELECT m.score, f.label FROM m JOIN f USING (doc_id)),
h AS (
  SELECT score, CAST(sum(label) AS BIGINT) AS n1,
         CAST(count(*) - sum(label) AS BIGINT) AS n0
  FROM j GROUP BY score
), w AS (
  SELECT score, n1, n0,
         CAST(COALESCE(sum(n0) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
  FROM h
), t AS (
  SELECT CAST(sum(n1) AS BIGINT) AS n_pos, CAST(sum(n0) AS BIGINT) AS n_neg,
         CAST(sum(n1 * (2 * cum0 + n0)) AS BIGINT) AS num2
  FROM w
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN num2 / (2.0 * n_pos * n_neg) ELSE 0.5 END AS auc
FROM t"""


# ------------------------------------------------ vocabulary-richness audit
def doc_hapax_ratio(sf_dir: str) -> pd.DataFrame:
    """Per-source vocabulary-richness audit — hapax legomena fraction and
    type/token ratio (corpus linguistics' canary for synthetic/templated
    text: generated or boilerplate-heavy sources repeat their vocabulary,
    organic text keeps minting hapaxes; read next to doc_zipf's
    rank-frequency profile).

    Scale shape: per-batch (source, token) count COMBINER → ONE
    vocabulary-bounded exchange → per-source reduction of the count table
    (distinct types, hapax count, token total) → |sources|-row result.
    Integer counts, two float divisions → bitwise oracle."""
    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "toks": batch["text"].to_pandas().str.split(" "),
            }
        )
        e = df.explode("toks").rename(columns={"toks": "tok"})
        e = e[e["tok"] != ""]
        out = e.groupby(["source", "tok"], as_index=False).size()
        out["n"] = out.pop("size").astype(np.int64)
        return out

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["source", "tok"],
        {"n": ("n", "sum")},
    )

    def reduce_source(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        g = df.groupby("source")
        out = pd.DataFrame(
            {
                "n_types": g["tok"].size(),
                "n_tokens": g["n"].sum(),
                "n_hapax": g["n"].apply(lambda v: int((v == 1).sum())),
            }
        ).astype(np.int64)
        return out.reset_index()

    # each source's rows share a partition (grouped_aggregate buckets by the
    # first key col), so per-batch reduction emits complete source rows...
    # except a source CAN span blocks of one partition — finish with a tiny
    # driver-side regroup of the |sources×blocks| partials
    parts = counts.map_batches(reduce_source, batch_format="pyarrow").to_pandas()
    m = parts.groupby("source", as_index=False).sum()
    m = m.astype({"n_types": np.int64, "n_tokens": np.int64, "n_hapax": np.int64})
    m["hapax_ratio"] = m["n_hapax"].to_numpy(dtype=np.int64) / m["n_types"].to_numpy(
        dtype=np.int64
    )
    m["type_token_ratio"] = m["n_types"].to_numpy(dtype=np.int64) / m[
        "n_tokens"
    ].to_numpy(dtype=np.int64)
    return m.sort_values("source", ignore_index=True)


def doc_hapax_ratio_sql(sf_dir: str) -> str:
    return """
WITH e AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
  FROM e WHERE tok <> '' GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS hapax_ratio,
       count(*) / CAST(sum(n) AS DOUBLE) AS type_token_ratio
FROM c GROUP BY source ORDER BY source"""


# ------------------------------------------- rank-correlation audit
def doc_quality_length_corr(sf_dir: str, n_buckets: int = 64, scale: int = 8) -> pd.DataFrame:
    """Exact Spearman rank correlation between the hashed model's quality
    score and raw document length — the "is the learned quality filter
    just a length proxy?" audit (a high |ρ| here means the model ranks
    documents by size, not substance; run next to doc_model_auc before
    trusting the model).

    Exact DISTRIBUTED Spearman with tie handling, no global sort of the
    corpus: average ranks come from the two scores' value HISTOGRAMS
    (score-cardinality-bounded, the doc_model_auc discipline) as
    2r = 2·min_rank + ties − 1 (integer), broadcast as value→2r maps; a
    second pass computes per-batch PYTHON-INT moment partials (Σa, Σb,
    Σa², Σb², Σab over 2r values overflow int64 at corpus scale — the
    doc_checksum arbitrary-precision rule, HUGEINT in the oracle) and the
    driver evaluates Pearson-on-ranks with one float expression:

        ρ = (n·Σab − Σa·Σb) / (sqrt(n·Σa² − (Σa)²) · sqrt(n·Σb² − (Σb)²))
    """
    import hashlib

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    class Scored:
        def __init__(self) -> None:
            self.w = np.array(
                [
                    int(hashlib.md5(f"w{j}".encode()).hexdigest()[:8], 16) % 201 - 100
                    for j in range(n_buckets)
                ],
                dtype=np.int64,
            )
            self.bucket_of: dict[str, int] = {}

        def _score(self, texts: pd.Series) -> np.ndarray:
            toks = texts.str.split(" ")
            e = toks.explode()
            e = e[e != ""]
            for t in pd.unique(e):
                if t not in self.bucket_of:
                    self.bucket_of[t] = (
                        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
                    )
            wt = pd.Series(self.w[e.map(self.bucket_of).to_numpy()], index=e.index)
            g = wt.groupby(level=0)
            idx = pd.RangeIndex(len(texts))
            z_num = g.sum().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
            n_tok = g.size().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
            z = z_num / (np.maximum(n_tok, 1) * float(scale))
            return 0.5 * (1.0 + z / (1.0 + np.abs(z)))

    class Hist(Scored):
        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            texts = batch["text"].to_pandas()
            s = self._score(texts)
            ln = texts.str.len().to_numpy(dtype=np.int64)
            a = pd.DataFrame({"var": "score", "v": s}).groupby(
                ["var", "v"], as_index=False
            ).size()
            b = pd.DataFrame({"var": "len", "v": ln.astype(np.float64)}).groupby(
                ["var", "v"], as_index=False
            ).size()
            out = pd.concat([a, b], ignore_index=True)
            out["n"] = out.pop("size").astype(np.int64)
            return out

    hist = (
        grouped_aggregate(
            docs.map_batches(Hist, batch_format="pyarrow", concurrency=2),
            ["var", "v"],
            {"n": ("n", "sum")},
        )
        .to_pandas()  # value-cardinality-bounded
        .sort_values(["var", "v"], ignore_index=True)
    )

    def rank2_table(sub: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        cnt = sub["n"].to_numpy(dtype=np.int64)
        min_rank = np.concatenate([[1], 1 + np.cumsum(cnt)[:-1]])
        r2 = 2 * min_rank + cnt - 1  # 2 × average rank, integer
        return sub["v"].to_numpy(), r2  # keys sorted (hist was sorted by v)

    ra = ray.put(rank2_table(hist[hist["var"] == "score"]))
    rb = ray.put(rank2_table(hist[hist["var"] == "len"]))

    class Moments(Scored):
        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ka, va = ray.get(ra) if isinstance(ra, ray.ObjectRef) else ra
            kb, vb = ray.get(rb) if isinstance(rb, ray.ObjectRef) else rb
            texts = batch["text"].to_pandas()
            s = self._score(texts)
            ln = texts.str.len().to_numpy(dtype=np.int64).astype(np.float64)
            # vectorized rank lookup: the histogram keys are sorted, so
            # searchsorted replaces any per-row dict probe
            a = va[np.searchsorted(ka, s)]
            b = vb[np.searchsorted(kb, ln)]
            # arbitrary-precision partials (ranks² × corpus size overflow
            # int64 at scale — the doc_checksum rule): split each 2r into
            # hi·2²⁰+lo so every product/sum below stays exact in int64
            # per batch, then recombine as PYTHON ints — no per-row loop
            SH = np.int64(1) << np.int64(20)
            ahi, alo = a // SH, a % SH
            bhi, blo = b // SH, b % SH
            def big(hh, hl, lh, ll):
                return (
                    (int(hh) << 40) + ((int(hl) + int(lh)) << 20) + int(ll)
                )
            saa = big((ahi * ahi).sum(), (ahi * alo).sum(), (alo * ahi).sum(), (alo * alo).sum())
            sbb = big((bhi * bhi).sum(), (bhi * blo).sum(), (blo * bhi).sum(), (blo * blo).sum())
            sab = big((ahi * bhi).sum(), (ahi * blo).sum(), (alo * bhi).sum(), (alo * blo).sum())
            return pd.DataFrame(
                {
                    "n": [len(a)],
                    "sa": [str(int(a.sum()))],
                    "sb": [str(int(b.sum()))],
                    "saa": [str(saa)],
                    "sbb": [str(sbb)],
                    "sab": [str(sab)],
                }
            )

    parts = docs.map_batches(Moments, batch_format="pyarrow", concurrency=2).to_pandas()
    n = int(parts["n"].sum())
    sa = sum(int(x) for x in parts["sa"])
    sb = sum(int(x) for x in parts["sb"])
    saa = sum(int(x) for x in parts["saa"])
    sbb = sum(int(x) for x in parts["sbb"])
    sab = sum(int(x) for x in parts["sab"])
    num = float(n * sab - sa * sb)
    da = float(n * saa - sa * sa)
    db = float(n * sbb - sb * sb)
    rho = num / (np.sqrt(da) * np.sqrt(db)) if da > 0 and db > 0 else 0.0
    return pd.DataFrame({"n_docs": [np.int64(n)], "spearman_rho": [rho]})


def doc_quality_length_corr_sql(sf_dir: str, n_buckets: int = 64, scale: int = 8) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tw AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('w' || CAST(
             ('0x' || substr(md5(tok), 1, 8))::UBIGINT % {n_buckets}
           AS VARCHAR)), 1, 8))::UBIGINT % 201 AS BIGINT) - 100 AS w
  FROM toks WHERE tok <> ''
), agg AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS z_num, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tw GROUP BY doc_id
), sc AS (
  SELECT d.doc_id,
         0.5 * (1.0 + (CAST(COALESCE(agg.z_num, 0) AS DOUBLE)
                       / (CAST(GREATEST(COALESCE(agg.n_tok, 0), 1) AS DOUBLE) * {float(scale)}))
                      / (1.0 + abs(CAST(COALESCE(agg.z_num, 0) AS DOUBLE)
                       / (CAST(GREATEST(COALESCE(agg.n_tok, 0), 1) AS DOUBLE) * {float(scale)}))))
           AS s,
         CAST(length(d.text) AS DOUBLE) AS l
  FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
), rk AS (
  SELECT CAST(2 * rank() OVER (ORDER BY s) + count(*) OVER (PARTITION BY s) - 1 AS HUGEINT) AS a,
         CAST(2 * rank() OVER (ORDER BY l) + count(*) OVER (PARTITION BY l) - 1 AS HUGEINT) AS b
  FROM sc
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(a) AS sa, sum(b) AS sb,
         sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
  FROM rk
)
SELECT n AS n_docs,
       CASE WHEN CAST(n * saa - sa * sa AS DOUBLE) > 0
             AND CAST(n * sbb - sb * sb AS DOUBLE) > 0
            THEN CAST(n * sab - sa * sb AS DOUBLE)
                 / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                    * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))
            ELSE 0.0 END AS spearman_rho
FROM m"""


# -------------------------------------------------- Heaps-law vocab growth
def doc_vocab_growth(sf_dir: str, n_slices: int = 10, batch_size: int = 4096) -> pd.DataFrame:
    """Vocabulary-growth (Heaps-law) curve over the corpus in doc_id
    order: for each of `n_slices` equal rank-slices of documents, how many
    DISTINCT tokens appear there for the first time. The data-value curve
    behind "is more of this feed still adding vocabulary?" — flat tail =
    the source is exhausted, steep tail = keep crawling.

    Scale shape: per-batch combiner collapses to (token, min doc_id)
    partials → ONE vocabulary-bounded exchange takes the global min per
    token (the first-occurrence doc) → token first-seen docs map to rank
    slices via exact doc_id rank boundaries. Ranks come from the unique
    sorted doc_id table (|distinct doc_id|-bounded — for a corpus whose id
    cardinality is row-scaled, swap in the sampled-boundary quantile path
    of stages/normalize; at oracle scale the exact table IS the point).
    All integers → bitwise oracle."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        split = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        keep = pc.not_equal(flat, "")
        ids = batch["doc_id"].to_numpy()
        pairs = pd.DataFrame(
            {
                "token": flat.filter(keep).to_pandas(),
                "first_doc": ids[parent.filter(keep).to_numpy(zero_copy_only=False)],
            }
        )
        return pairs.groupby("token", as_index=False).min()

    firsts = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
            "token",
            {"first_doc": ("first_doc", "min")},
        )
        .to_pandas()  # vocabulary-bounded
    )

    # exact rank slices: slice(doc) = rank(doc) * n_slices // N
    def ids_only(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})

    all_ids = np.sort(
        ds.map_batches(ids_only, batch_format="pyarrow").to_pandas()["doc_id"].to_numpy()
    )
    N = len(all_ids)
    rank = np.searchsorted(all_ids, firsts["first_doc"].to_numpy())
    firsts["slice_idx"] = (rank * n_slices) // N
    new_per = firsts.groupby("slice_idx", as_index=False).agg(n_new_tokens=("token", "size"))
    doc_rank = np.arange(N, dtype=np.int64)
    docs_per = pd.DataFrame({"slice_idx": (doc_rank * n_slices) // N}).groupby(
        "slice_idx", as_index=False
    ).agg(n_docs=("slice_idx", "size"))
    out = docs_per.merge(new_per, on="slice_idx", how="left").fillna({"n_new_tokens": 0})
    out["n_new_tokens"] = out["n_new_tokens"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["cum_vocab"] = out["n_new_tokens"].cumsum()
    out["slice_idx"] = out["slice_idx"].astype(np.int64)
    return out.sort_values("slice_idx", ignore_index=True)


def doc_vocab_growth_sql(sf_dir: str, n_slices: int = 10) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), firsts AS (
  SELECT term, min(doc_id) AS first_doc FROM tok WHERE term <> '' GROUP BY term
), ranks AS (
  SELECT doc_id,
         CAST((row_number() OVER (ORDER BY doc_id) - 1) AS BIGINT) AS rnk
  FROM documents
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
newt AS (
  SELECT (r.rnk * {n_slices}) // nd.n AS slice_idx,
         CAST(count(*) AS BIGINT) AS n_new_tokens
  FROM firsts f JOIN ranks r ON f.first_doc = r.doc_id, nd
  GROUP BY 1
), dps AS (
  SELECT (rnk * {n_slices}) // nd.n AS slice_idx, CAST(count(*) AS BIGINT) AS n_docs
  FROM ranks, nd GROUP BY 1
)
SELECT d.slice_idx, d.n_docs,
       CAST(COALESCE(n.n_new_tokens, 0) AS BIGINT) AS n_new_tokens,
       CAST(sum(COALESCE(n.n_new_tokens, 0)) OVER (ORDER BY d.slice_idx) AS BIGINT) AS cum_vocab
FROM dps d LEFT JOIN newt n USING (slice_idx)
ORDER BY d.slice_idx"""
