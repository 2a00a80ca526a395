"""Dedup / similarity primitives: shingles, MinHash, SimHash, Jaccard.

Designed for the Ray Data patterns in the pipelines:
  * exact dedup: content_hash (hashing.py) + groupby(hash) keep-first;
  * MinHash+LSH near-dup: per-batch signature computation (vectorized over
    the permutation axis) → explode to (band, band_hash, doc_id) rows →
    groupby band bucket → candidate pairs → exact-Jaccard verify;
  * SimHash: 64-bit hyperplane-free bitwise sketch of the token multiset.

All hash functions are seeded/deterministic across processes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of a token list (one per distinct shingle)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """num_perm universal-hash MinHash over shingle hashes.

    h_i(x) = (a_i * x + b_i) mod p  (p = 2^61-1), seeded — identical across
    processes, so signatures computed in different Ray tasks are comparable.
    """

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, text: str, k: int = 3) -> np.ndarray:
        sh = np.unique(_token_hashes(shingles(text, k))) % _MERSENNE
        if len(sh) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n_shingles) — vectorized over both axes
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int = 8) -> np.ndarray:
        """Hash each band of the signature to one uint64 bucket key."""
        rows = self.num_perm // num_bands
        bands = sig.reshape(num_bands, rows)
        out = np.empty(num_bands, dtype=np.uint64)
        for i in range(num_bands):
            out[i] = pd.util.hash_array(bands[i].astype(np.uint64)).sum()
        return out

    def signatures_batch(self, texts: list[str], k: int = 3) -> np.ndarray:
        """Vectorized signatures for a batch: (n_docs, num_perm) uint64.

        The modular arithmetic runs ONCE over the concatenated shingle
        hashes with a per-doc minimum.reduceat — identical values to
        signature() per doc (pinned by tests), no per-doc matmul loop."""
        sh_list = [
            np.unique(_token_hashes(shingles(t, k))) % np.uint64(_MERSENNE) for t in texts
        ]
        if not sh_list:
            return np.zeros((0, self.num_perm), dtype=np.uint64)
        lens = np.fromiter((len(s) for s in sh_list), dtype=np.int64, count=len(sh_list))
        flat = np.concatenate(sh_list) if lens.sum() else np.zeros(0, dtype=np.uint64)
        sigs = np.full((len(texts), self.num_perm), _MERSENNE, dtype=np.uint64)
        nonempty = lens > 0
        if flat.size:
            v = (self.a[:, None] * flat[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
            starts = np.concatenate([[0], np.cumsum(lens[nonempty])[:-1]])
            sigs[nonempty] = np.minimum.reduceat(v, starts, axis=1).T
        return sigs

    def band_keys_batch(self, sigs: np.ndarray, num_bands: int = 8) -> np.ndarray:
        """Band bucket keys for a batch of signatures: (n_docs, num_bands).

        Same value as band_keys() per row: pd.util.hash_array is
        elementwise, so the per-band sum of element hashes is computable
        from one flat hash pass."""
        n = len(sigs)
        rows = self.num_perm // num_bands
        h = pd.util.hash_array(np.ascontiguousarray(sigs).reshape(-1).astype(np.uint64))
        return h.reshape(n, num_bands, rows).sum(axis=2)


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over the token multiset (Charikar STOC'02).

    The per-token hash is md5-lower-64 (hashing.md5_lower64, bit-identical
    to DuckDB's md5_number_lower) so the whole chain — token counts →
    per-bit signed votes → sign threshold — is SQL-expressible and
    doc_simhash / doc_simhash_pairs carry EXACT DuckDB oracles (the
    doc_checksum discipline). md5 runs once per DISTINCT token
    (vocabulary-bounded); duplicate tokens vote via their count."""
    from quant_feature_pipeline_ray.hashing import md5_lower64

    toks = text.split(" ")
    if not toks:
        return np.uint64(0)
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    th = md5_lower64(uniq)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    score = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    return np.uint64(np.bitwise_or.reduce((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))


def jaccard_token_sets(a: str, b: str) -> float:
    sa, sb = set(a.split(" ")), set(b.split(" "))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
