"""Mergeable cardinality sketch (HyperLogLog) — the unbounded-cardinality
companion to the EXACT value-counts histogram in stages/normalize.py.

The exact histogram is the right tool when value cardinality is bounded
(its driver cost is cardinality-sized and the result is bitwise). For
genuinely unbounded keyspaces (distinct tokens / URLs / ids at 100 TB) a
fixed-size sketch is the only mergeable summary whose driver cost is O(m):
HLL registers are per-batch partials (4096 uint8), merged by elementwise
max — associative, commutative, idempotent, so the merge can ride the
same grouped_aggregate exchange as every other partial in this repo.

Standard HLL from the published algorithm (Flajolet et al. 2007, with the
small-range linear-counting correction): p index bits, rho = position of
the first 1-bit in the remaining 64-p bits.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers -> ~1.04/sqrt(m) = 1.6% std error


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold a uint64 hash array into one HLL register vector (uint8, 2^p)."""
    m = 1 << p
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest_bits = 64 - p
    w = h & np.uint64((1 << rest_bits) - 1)
    # rho = leading zeros within rest_bits + 1 = rest_bits - bit_length(w) + 1
    # values < 2^52 are exact in float64, so log2 is exact at powers of two
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = (rest_bits - bl + 1).astype(np.uint8)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the small-range correction."""
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


# ----------------------------------------------------------- Bloom filter

BLOOM_BITS_DEFAULT = 1 << 17  # 16 KiB per partial; ~1% fp at ~13k keys, k=7
BLOOM_K_DEFAULT = 7


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per key via double hashing h1 + i*h2 (Kirsch &
    Mitzenmacher 2006 — two 64-bit mixes give k independent-enough probes)."""
    h = keys.astype(np.uint64, copy=False)
    h1 = h * np.uint64(0x9E3779B97F4A7C15)
    h1 ^= h1 >> np.uint64(29)
    h2 = (h ^ (h >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F)
    h2 |= np.uint64(1)  # odd stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_partial(
    keys: np.ndarray, m_bits: int = BLOOM_BITS_DEFAULT, k: int = BLOOM_K_DEFAULT
) -> np.ndarray:
    """One batch's Bloom bitmap (uint8, m_bits/8 bytes). Partials merge by
    bitwise OR — associative/commutative/idempotent, so they reduce like
    every other mergeable partial in this repo (HLL max, integer sums)."""
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    if len(keys):
        pos = _bloom_positions(keys, m_bits, k).reshape(-1)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_contains(
    bits: np.ndarray, keys: np.ndarray, k: int = BLOOM_K_DEFAULT
) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (no false
    negatives), False = definitely absent."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    m_bits = len(bits) << 3
    pos = _bloom_positions(keys, m_bits, k)
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)
