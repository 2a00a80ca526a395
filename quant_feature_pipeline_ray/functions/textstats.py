"""Vectorized text-analysis kernels for document tables.

Large-scale training-data ops: token counting, quality scoring, language-ID
(marker-token heuristic), document fingerprinting (rolling hash). All are
batch → numpy-vectorized (or bounded-python over tokens) functions designed
to run inside map_batches; the heavy per-batch state (marker sets, hash
coefficients) is module-level constant, so stateless tasks suffice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# marker tokens per language for the n-gram-free language-ID heuristic.
# Deterministic and mirrored 1:1 in the DuckDB oracle — prediction quality is
# not the contract, engine/oracle agreement is.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("la", "el", "los", "datos"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "les", "des", "vite"),
}

STOPWORDS = ("the", "a", "of", "and", "to")


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """n_tokens (single-space separated), n_chars, token_chars,
    distinct_tokens, distinct_ratio — all integer/exact-division."""
    n_chars = texts.str.len().astype(np.int64)
    n_tokens = (texts.str.count(" ") + 1).astype(np.int64)
    token_chars = n_chars - (n_tokens - 1)
    toks = texts.str.split(" ")
    distinct = toks.map(lambda t: len(set(t))).astype(np.int64)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "token_chars": token_chars,
            "distinct_tokens": distinct,
            "distinct_ratio": distinct / n_tokens,
            "mean_token_len": token_chars / n_tokens,
        }
    )


def stopword_hits(texts: pd.Series, stopwords: tuple[str, ...] = STOPWORDS) -> np.ndarray:
    toks = texts.str.split(" ")
    sw = frozenset(stopwords)
    return toks.map(lambda t: sum(1 for x in t if x in sw)).to_numpy(dtype=np.int64)


def lang_scores(texts: pd.Series) -> pd.DataFrame:
    """Marker-token hit counts per language + argmax prediction
    (ties and zero-hit rows → 'und'). Deterministic tie-break: first language
    in LANG_MARKERS insertion order wins among equals is NOT used — a strict
    maximum is required, otherwise 'und'."""
    toks = texts.str.split(" ")
    out = {}
    for lang, markers in LANG_MARKERS.items():
        ms = frozenset(markers)
        out[f"hits_{lang}"] = toks.map(lambda t: sum(1 for x in t if x in ms)).to_numpy(
            dtype=np.int64
        )
    df = pd.DataFrame(out)
    hits = df.to_numpy()
    best = hits.max(axis=1)
    is_max = hits == best[:, None]
    unique_max = is_max.sum(axis=1) == 1
    langs = np.array(list(LANG_MARKERS.keys()), dtype=object)
    pred = np.where((best > 0) & unique_max, langs[hits.argmax(axis=1)], "und")
    df["pred_lang"] = pred
    return df


def token_fnv64(
    tokens: list[str], prime: int = 1099511628211, offset: int = 1469598103934665603
) -> np.ndarray:
    """Per-TOKEN FNV-1a 64-bit hash (token bytes + the 0x20 separator —
    one step of fingerprint64's stream), vectorized across the whole
    token list: the loop runs over byte POSITIONS (max token length,
    ~10-20 iterations), each iteration a numpy op over every token at
    once. uint64 multiply wraps mod 2^64 natively."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    encs = [t.encode() for t in tokens]
    lengths = np.fromiter((len(e) + 1 for e in encs), dtype=np.int64, count=len(encs))
    buf = np.frombuffer(b" ".join(encs) + b" ", dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lengths[:-1])))
    h = np.full(len(encs), offset, dtype=np.uint64)
    p = np.uint64(prime)
    for j in range(int(lengths.max())):
        m = lengths > j
        b = buf[starts[m] + j].astype(np.uint64)
        h[m] = (h[m] ^ b) * p
    return h


def fingerprint64(texts: pd.Series, prime: int = 1099511628211, offset: int = 1469598103934665603) -> np.ndarray:
    """FNV-1a-style rolling 64-bit fingerprint over the token stream —
    order-sensitive document fingerprint (reference analogue: schema_sha
    content hashing, tools/export_utils.py:47-50)."""
    mask = (1 << 64) - 1

    def fp(tokens: list[str]) -> np.uint64:
        h = offset
        for t in tokens:
            for b in t.encode():
                h = ((h ^ b) * prime) & mask
            h = ((h ^ 0x20) * prime) & mask
        return np.uint64(h)

    return texts.str.split(" ").map(fp).to_numpy(dtype=np.uint64)
