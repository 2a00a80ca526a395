"""Round-5 ADVICE regression tests.

1. bucketed_map_groups fail-fast contract: partial (killed) backfills are
   rejected via the run_complete marker; disk/manifest disagreement in
   either direction raises; resumed-to-completion outputs pass and match.
2. events interarrival Σgap² split-int64 vectorization is exact.
3. events_seasonality_profile rejects pre-epoch timestamps (oracle modulo
   domain contract).
4. emb_centroid_shift_sql infers d from the parquet instead of a
   hardcoded 64.
"""

import os

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _make_per_conv():
    # returned as a CLOSURE so Ray cloudpickles it by value — a module-level
    # test function would be pickled by reference and fail to import on workers
    def per_conv(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", sort=True).agg(
            n_turns=("turn_idx", "size"), text_chars=("text_len", "sum")
        )
        return g.astype(np.int64).reset_index()

    return per_conv


_per_conv = _make_per_conv()


def test_partial_backfill_rejected_then_resume_passes(ray_session, tmp_path):
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts
    from quant_feature_pipeline_ray.manifest import run_backfill, run_complete_path
    from quant_feature_pipeline_ray.sources.bucketed import bucketed_map_groups

    out = str(tmp_path / "bf")
    inp = ensure_transcripts(SF)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_backfill(inp, out, num_buckets=8, fail_after=3)
    # the killed run wrote run_header + 3 committed parts but NO marker:
    # reuse must fail fast instead of silently processing a partial corpus
    assert os.path.isfile(os.path.join(out, "run_header.json"))
    assert not os.path.isfile(run_complete_path(out))
    with pytest.raises(ValueError, match="run_complete"):
        bucketed_map_groups(out, _per_conv, columns=["conv_id", "turn_idx", "text_len"])
    # resume to completion -> marker appears -> reuse works and is complete
    run_backfill(inp, out, num_buckets=8)
    assert os.path.isfile(run_complete_path(out))
    reused = (
        bucketed_map_groups(out, _per_conv, columns=["conv_id", "turn_idx", "text_len"])
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    fresh = str(tmp_path / "bf_fresh")
    run_backfill(inp, fresh, num_buckets=8)
    expect = (
        bucketed_map_groups(fresh, _per_conv, columns=["conv_id", "turn_idx", "text_len"])
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(reused, expect)


def test_disk_manifest_disagreement_raises(ray_session, tmp_path):
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts
    from quant_feature_pipeline_ray.manifest import run_backfill
    from quant_feature_pipeline_ray.sources.bucketed import manifest_parts

    out = str(tmp_path / "bf")
    run_backfill(ensure_transcripts(SF), out, num_buckets=8)
    parts = manifest_parts(out)
    assert parts and all(os.path.isfile(p) for ps in parts.values() for p in ps)
    # orphan: a data file with no manifest record (task committed, driver
    # died before append_manifest)
    some_dir = os.path.dirname(next(iter(parts.values()))[0])
    orphan = os.path.join(some_dir, "data-99999.parquet")
    import pyarrow.parquet as pq
    import pyarrow as pa

    pq.write_table(pa.table({"x": [1]}), orphan)
    with pytest.raises(ValueError, match="no manifest record"):
        manifest_parts(out)
    os.remove(orphan)
    # missing: a manifest-committed file deleted from disk
    victim = next(iter(parts.values()))[0]
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="missing on disk"):
        manifest_parts(out)


def test_bucketed_reuse_concats_incremental_files(ray_session, tmp_path):
    """A bucket's data-00000 (streaming backfill) + data-00001 (append) must
    reach fn as ONE frame — conv-local completeness across file sequence."""
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts
    from quant_feature_pipeline_ray.manifest import (
        run_incremental_append,
        run_streaming_backfill,
    )
    from quant_feature_pipeline_ray.sources.bucketed import bucketed_map_groups

    import pyarrow.parquet as pq

    inp = ensure_transcripts(SF)
    raw = pq.read_table(inp).to_pandas()
    srt = raw.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    ded = srt[~srt.duplicated(["conv_id", "turn_idx"], keep="last")]
    cutoff = int(ded["ts"].astype("int64").quantile(0.7))
    base, delta = str(tmp_path / "base.parquet"), str(tmp_path / "delta.parquet")
    ded[ded["ts"].astype("int64") <= cutoff].to_parquet(base)
    ded[ded["ts"].astype("int64") > cutoff].to_parquet(delta)
    out = str(tmp_path / "stream")
    run_streaming_backfill(base, out, num_buckets=4)
    run_incremental_append(delta, out, num_buckets=4)
    got = (
        bucketed_map_groups(out, _per_conv, columns=["conv_id", "turn_idx", "text_len"])
        .to_pandas()
        .sort_values("conv_id", ignore_index=True)
    )
    # oracle: same rollup over ALL committed rows at once
    from quant_feature_pipeline_ray.manifest import read_streaming_output

    all_rows = read_streaming_output(out).to_pandas()
    expect = _per_conv(all_rows).sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, expect)


def test_sum_sq_exact_matches_python_loop():
    from quant_feature_pipeline_ray.pipelines.events import _sum_sq_exact

    rng = np.random.default_rng(7)
    gaps = rng.integers(0, 1 << 42, size=200_001, dtype=np.int64)
    assert _sum_sq_exact(gaps) == sum(int(x) * int(x) for x in gaps)
    # fallback path: a gap past the 2^43 split envelope
    big = np.array([1 << 44, 3, 5], dtype=np.int64)
    assert _sum_sq_exact(big) == sum(int(x) * int(x) for x in big)
    assert _sum_sq_exact(np.array([], dtype=np.int64)) == 0


def test_seasonality_rejects_pre_epoch(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quant_feature_pipeline_ray.pipelines.events import events_seasonality_profile

    d = tmp_path / "ev"
    d.mkdir()
    ts = pd.to_datetime(["1969-12-31 23:00:00", "1970-01-02 01:00:00"])
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["a", "a"]),
            }
        ),
        str(d / "events.parquet"),
    )
    with pytest.raises(Exception, match="epoch"):
        events_seasonality_profile(str(d / "events.parquet"))


def test_centroid_shift_sql_infers_d(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quant_feature_pipeline_ray.pipelines.training_data import emb_centroid_shift_sql

    d = tmp_path / "emb"
    d.mkdir()
    vecs = [[float(i) for i in range(17)] for _ in range(4)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "label": pa.array([0, 0, 1, 1], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    sql = emb_centroid_shift_sql(str(d))
    assert "range(1, 18)" in sql  # inferred 17, not the old hardcoded 64
