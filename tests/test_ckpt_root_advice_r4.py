"""Round-4 regression tests: configurable shared checkpoint root
(GRAFT_CKPT_ROOT), n_classes derivation from parquet footer stats, the
>62-source bitmask guard, and the k-center k>N / logreg-CV empty-fold
guards flagged in round-3 ADVICE."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- ckpt root resolution
def test_ckpt_path_default_and_env(monkeypatch):
    from quant_feature_pipeline_ray.ckpt import ckpt_path, ckpt_root

    monkeypatch.delenv("GRAFT_CKPT_ROOT", raising=False)
    assert ckpt_root() == "/tmp"
    assert ckpt_path("graft_lsh_pairs", "x") == "/tmp/graft_lsh_pairs/x"

    monkeypatch.setenv("GRAFT_CKPT_ROOT", "/mnt/shared/ckpt/")
    assert ckpt_path("graft_cc_labels", "y") == "/mnt/shared/ckpt/graft_cc_labels/y"

    # remote URIs join with '/' and never hit the local-multi-node guard
    monkeypatch.setenv("GRAFT_CKPT_ROOT", "s3://bucket/prefix")
    assert ckpt_path("graft_dedup_state", "z") == "s3://bucket/prefix/graft_dedup_state/z"


def test_ckpt_roots_isolate(ray_session, monkeypatch, tmp_path):
    """Two different GRAFT_CKPT_ROOT values must produce fully disjoint
    on-disk state: a run under root A leaves nothing under root B, and a
    later run under root B starts from scratch there."""
    from quant_feature_pipeline_ray.pipelines import training_data as td

    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    root_a.mkdir()
    root_b.mkdir()

    monkeypatch.setenv("GRAFT_CKPT_ROOT", str(root_a))
    out_a = td.doc_export_shards(SF)
    assert (root_a / "graft_doc_shards").exists()
    assert not (root_b / "graft_doc_shards").exists()

    monkeypatch.setenv("GRAFT_CKPT_ROOT", str(root_b))
    out_b = td.doc_export_shards(SF)
    assert (root_b / "graft_doc_shards").exists()
    pd.testing.assert_frame_equal(
        out_a.reset_index(drop=True), out_b.reset_index(drop=True)
    )


# ------------------------------------------------ n_classes from footer stats
def test_label_n_classes_footer_stats():
    from quant_feature_pipeline_ray.pipelines.training_data import _label_n_classes

    # the fixture writes labels 0..9 with row-group statistics
    assert _label_n_classes(f"{SF}/embeddings.parquet") == 10


def test_label_n_classes_derived_width(ray_session, tmp_path):
    """A 3-class corpus must fit a 3-column model (no silent width-10
    waste) and a negative label must fail fast, not IndexError mid-worker."""
    from quant_feature_pipeline_ray.pipelines import training_data as td

    rng = np.random.RandomState(7)
    n, d = 48, 4
    X = rng.rand(n, d).astype(np.float32)
    y = (np.arange(n) % 3).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(y, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = td.emb_logreg_train(str(tmp_path), epochs=2, lr=1.0)
    assert set(out["class"].unique()) == {0, 1, 2}

    t_bad = t.set_column(
        2, "label", pa.array(np.where(np.arange(n) == 5, -1, y), pa.int32())
    )
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    pq.write_table(t_bad, str(bad_dir / "embeddings.parquet"))
    with pytest.raises(ValueError, match="negative"):
        td.emb_logreg_train(str(bad_dir), epochs=1)


# --------------------------------------------------- >62-source bitmask guard
def test_source_overlap_many_sources_raises(ray_session, tmp_path):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    n_src = 63
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n_src, dtype=np.int64)),
            "text": pa.array([f"tok{i} shared" for i in range(n_src)]),
            "source": pa.array([f"s{i:03d}" for i in range(n_src)]),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    with pytest.raises(ValueError, match="62 distinct sources"):
        td.doc_source_overlap(str(tmp_path))


# --------------------------------------------------------- k-center k>N guard
def test_kcenter_k_exceeds_n(ray_session, tmp_path):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    n, d = 5, 3
    X = np.eye(n, d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = td.emb_kcenter_sample(str(tmp_path), k=10)
    # selection stops when every point is chosen — no NaN crash
    assert len(out) == n
    assert sorted(out["vec_id"]) == list(range(n))
