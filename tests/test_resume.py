"""Kill-after-k-partitions + resume == uninterrupted run (FIXTURES.md inv 6)."""

import numpy as np
import pytest

from quant_feature_pipeline_ray.manifest import load_manifest, read_backfill, run_backfill


def _collect(out_dir):
    return (
        read_backfill(out_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )


def test_kill_and_resume_equals_uninterrupted(ray_session, sf001_transcripts, tmp_path):
    clean_dir = str(tmp_path / "clean")
    res = run_backfill(sf001_transcripts, clean_dir, num_buckets=16)
    assert res["committed"] == 16 and res["skipped"] == 0
    clean = _collect(clean_dir)

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_backfill(sf001_transcripts, crash_dir, num_buckets=16, fail_after=5)
    partial = load_manifest(crash_dir)
    assert 1 <= len(partial) < 16

    res2 = run_backfill(sf001_transcripts, crash_dir, num_buckets=16)
    assert res2["skipped"] == len(partial)
    assert res2["committed"] + res2["skipped"] >= 16

    resumed = _collect(crash_dir)
    assert len(resumed) == len(clean)
    for c in clean.columns:
        a, b = resumed[c].to_numpy(), clean[c].to_numpy()
        if a.dtype.kind == "f":
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"resume differs from uninterrupted in column {c}"


def test_manifest_lineage_fields(ray_session, sf001_transcripts, tmp_path):
    out = str(tmp_path / "m")
    run_backfill(sf001_transcripts, out, num_buckets=8)
    man = load_manifest(out)
    assert len(man) == 8
    rec = next(iter(man.values()))
    for field in ("rows", "bytes", "min_ts_us", "max_ts_us", "n_convs", "schema_sha", "wall_ms", "input"):
        assert field in rec
    assert sum(r["rows"] for r in man.values()) > 0
    shas = {r["schema_sha"] for r in man.values()}
    assert len(shas) == 1  # uniform output contract across partitions
