"""Bounded per-cluster pairwise work (_split_bounded) — VERDICT r2 item 3.

The IVF/SemDeDup family must never run a per-group matmul whose input
grows linearly with the corpus: k scales with corpus size
(_scaled_n_clusters) and any still-oversized (skewed) cluster is
recursively spill-split to <= max_cluster_rows before the pairwise step.
"""

import os

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import (
    _scaled_n_clusters,
    _split_bounded,
)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.sqrt((m * m).sum(axis=1))[:, None], 1e-12)


def test_split_bounds_skewed_cluster():
    rng = np.random.default_rng(5)
    base = rng.normal(size=16)
    # one dominant near-dup direction (the skew) + a diffuse remainder
    m = np.concatenate(
        [base + rng.normal(scale=0.05, size=(2500, 16)), rng.normal(size=(500, 16))]
    )
    u = _unit(m)
    ids = np.arange(len(u), dtype=np.int64)
    parts = _split_bounded(u, ids, max_rows=200)
    sizes = [len(p) for p in parts]
    assert max(sizes) <= 200, f"split left an oversized group: {max(sizes)}"
    # every vector still appears somewhere (spill may duplicate, never drop)
    assert set(np.concatenate(parts).tolist()) == set(range(len(u)))
    # deterministic
    parts2 = _split_bounded(u, ids, max_rows=200)
    assert all((a == b).all() for a, b in zip(parts, parts2))


def test_split_bounds_identical_vectors():
    # the degenerate case: 2-means cannot separate identical vectors; the
    # disjoint id-order fallback must still enforce the bound
    u = _unit(np.tile(np.arange(1.0, 9.0), (1000, 1)))
    ids = np.arange(1000, dtype=np.int64)
    parts = _split_bounded(u, ids, max_rows=100)
    assert max(len(p) for p in parts) <= 100
    got = np.sort(np.concatenate(parts))
    assert (got == ids).all()  # disjoint cover, nothing dropped


def test_scaled_n_clusters_grows_with_corpus(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(4000, dtype=np.int64)),
            "embedding": pa.array([np.zeros(4).tolist()] * 4000, pa.list_(pa.float32())),
        }
    )
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
    # 4000 rows x 4 assignments / 500 max -> needs >= 32 lists
    assert _scaled_n_clusters(d, 16, 4, 500) == 32
    # big bound -> the configured floor wins
    assert _scaled_n_clusters(d, 16, 4, 10**6) == 16


@pytest.fixture(scope="module")
def skewed_emb_dir(tmp_path_factory):
    """Synthetic skewed corpus: 30 near-dup groups of ~25 vectors (pairwise
    cos >= ~0.95) + 250 diffuse singles, dim 16."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(41)
    mats = []
    for _ in range(30):
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        mats.append(base + rng.normal(scale=0.03, size=(25, 16)))
    mats.append(rng.normal(size=(250, 16)))
    m = np.concatenate(mats)
    d = str(tmp_path_factory.mktemp("skewed_emb"))
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
    return d, m


def test_cosine_dups_ivf_bounded_recall(skewed_emb_dir, ray_session):
    from quant_feature_pipeline_ray.pipelines.training_data import emb_cosine_dups_ivf

    d, m = skewed_emb_dir
    mf = m.astype(np.float32).astype(np.float64)  # parquet float32 round-trip
    u = _unit(mf)
    sims = np.round(u @ u.T, 6)
    ai, bi = np.nonzero(np.triu(sims >= 0.9, k=1))
    truth = set(zip(ai.tolist(), bi.tolist()))
    assert len(truth) > 500  # the fixture really is clique-heavy

    got_df = emb_cosine_dups_ivf(d, threshold=0.9, max_cluster_rows=64)
    got = set(zip(got_df["vec_a"].tolist(), got_df["vec_b"].tolist()))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"bounded IVF recall too low: {recall:.3f}"
    assert not (got - truth), "bounded IVF emitted false pairs"


def test_semdedup_bounded_runs_and_is_deterministic(skewed_emb_dir, ray_session):
    from quant_feature_pipeline_ray.pipelines.training_data import emb_semdedup

    d, m = skewed_emb_dir
    a = emb_semdedup(d, threshold=0.9, max_cluster_rows=64)
    b = emb_semdedup(d, threshold=0.9, max_cluster_rows=64)
    assert len(a) == len(m)
    pd.testing.assert_frame_equal(a, b)
    # near-dup groups must lose all but ~one member per (sub)cluster
    assert a["keep"].sum() < len(m) - 400
