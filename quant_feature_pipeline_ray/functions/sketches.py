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


# ------------------------------------------------------------ quantile digest
#
# Mergeable quantile sketch for UNBOUNDED floats — the companion to the
# exact value-counts histogram in stages/normalize.py (which is the right
# tool for bounded-cardinality integer columns, but unusable when every
# value is distinct). Shape follows the t-digest idea (Dunning & Ertl,
# public arXiv:1902.04023): a bounded list of (mean, weight) centroids,
# size-capped by merge-compression; uniform capping (not the tail-biased
# scale function) keeps the code dependency-free and the error bound easy
# to state: each centroid holds <= ceil(n/max_centroids) points, so any
# quantile's rank error is <= 1/max_centroids of the mass.


def qdigest_partial(x: "np.ndarray", max_centroids: int = 512) -> "np.ndarray":
    """Compress one batch into <= max_centroids (mean, weight) rows,
    returned as a (k, 2) float64 array sorted by mean."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if len(x) == 0:
        return np.empty((0, 2))
    x = np.sort(x)
    k = min(max_centroids, len(x))
    # equal-mass bins over the sorted batch
    edges = (np.arange(k + 1) * len(x)) // k
    w = np.diff(edges).astype(np.float64)
    sums = np.add.reduceat(x, edges[:-1])
    return np.column_stack([sums / w, w])


def qdigest_merge(parts: "list[np.ndarray]", max_centroids: int = 512) -> "np.ndarray":
    """Merge any number of partial digests into one, associatively: pool
    centroids, sort by mean, re-bin to equal WEIGHT. Order-insensitive up
    to the stated rank-error bound."""
    pool = np.vstack([p for p in parts if len(p)]) if parts else np.empty((0, 2))
    if len(pool) == 0:
        return pool
    pool = pool[np.argsort(pool[:, 0], kind="stable")]
    if len(pool) <= max_centroids:
        return pool
    cw = np.cumsum(pool[:, 1])
    total = cw[-1]
    # equal-weight bin id per centroid (a centroid is never split — that's
    # what keeps the merge associative and the error bounded by bin mass)
    bins = np.minimum((cw - pool[:, 1] / 2.0) / total * max_centroids, max_centroids - 1e-9).astype(np.int64)
    w = np.bincount(bins, weights=pool[:, 1], minlength=max_centroids)
    s = np.bincount(bins, weights=pool[:, 0] * pool[:, 1], minlength=max_centroids)
    nz = w > 0
    return np.column_stack([s[nz] / w[nz], w[nz]])


def qdigest_quantile(digest: "np.ndarray", q: float) -> float:
    """Estimate the q-quantile: linear interpolation between centroid means
    at the target cumulative weight (each centroid treated as centered
    mass, the standard t-digest readout)."""
    if len(digest) == 0:
        return float("nan")
    means, w = digest[:, 0], digest[:, 1]
    cw = np.cumsum(w) - w / 2.0
    target = q * w.sum()
    return float(np.interp(target, cw, means))


# -------------------------------------------------------------- count-min
#
# Count-Min sketch (Cormode & Muthukrishnan 2005, public): mergeable
# frequency estimator — estimates only ever OVERCOUNT, by at most eps*N
# with probability 1-delta for width >= e/eps, depth >= ln(1/delta).
# Completes the repo's mergeable-sketch family (Bloom membership, HLL
# cardinality, Misra-Gries heavy hitters, q-digest quantiles): per-batch
# partials are plain int64 grids summed by any reduce.

CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def cms_partial(hashes: np.ndarray, width: int = 2048, depth: int = 4) -> np.ndarray:
    """Count one batch of pre-hashed uint64 keys into a (depth, width)
    int64 grid. Merging partials = elementwise sum (associative)."""
    h = np.asarray(hashes, dtype=np.uint64)
    grid = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        idx = ((h * CMS_SEEDS[d]) >> np.uint64(33)) % np.uint64(width)
        np.add.at(grid[d], idx.astype(np.int64), 1)
    return grid


def cms_query(grid: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-estimate counts for pre-hashed keys: min over rows (the CM
    estimate — an upper bound on the true count, never an undercount)."""
    h = np.asarray(hashes, dtype=np.uint64)
    depth, width = grid.shape
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = ((h * CMS_SEEDS[d]) >> np.uint64(33)) % np.uint64(width)
        est = np.minimum(est, grid[d, idx.astype(np.int64)])
    return est
