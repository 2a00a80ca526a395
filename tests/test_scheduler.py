"""Multi-corpus scheduler: per-entity retry, isolation, durable file-level resume.

Reference semantics under test (auto_features_daily/run_daily_features.py:
165-247): each entity retried up to max_retries with a doubled delay, one
entity's failure never stops the others, per-entity success summary. Extra
engine guarantee: progress commits per input FILE (consumed_inputs.jsonl),
so a retry resumes at the failed file instead of redoing the entity.
"""

import json

import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.scheduler import (
    backfill_all,
    backfill_entity,
    consumed_path,
    load_consumed,
)


def _mk_corpus(root, name, files):
    d = root / name
    d.mkdir(parents=True)
    for f in files:
        (d / f).write_bytes(b"")  # never read by fake runners
        # rename to .parquet is implicit: callers pass names ending .parquet
    return str(d)


class FlakyRunner:
    """Fails on a specific input path for the first n_failures calls on it."""

    def __init__(self, fail_path_suffix=None, n_failures=0):
        self.calls = []  # (path, bootstrap)
        self.fail_suffix = fail_path_suffix
        self.failures_left = n_failures

    def __call__(self, path, out_dir, bootstrap, num_buckets):
        self.calls.append((path, bootstrap))
        if self.fail_suffix and path.endswith(self.fail_suffix) and self.failures_left > 0:
            self.failures_left -= 1
            raise RuntimeError(f"injected failure for {path}")
        return {"rows": 1}


def test_entity_applies_in_sorted_order_and_commits(tmp_path):
    corpus = _mk_corpus(tmp_path, "c1", ["b.parquet", "a.parquet", "skip.txt"])
    out = tmp_path / "out" / "c1"
    r = FlakyRunner()
    res = backfill_entity(corpus, str(out), runner=r)
    assert res == {"inputs_applied": 2, "inputs_skipped": 0}
    # sorted order, bootstrap flag False because no manifest is ever written
    # by the fake runner (bootstrap derivation is load_manifest's job)
    assert [p.rsplit("/", 1)[1] for p, _ in r.calls] == ["a.parquet", "b.parquet"]
    assert load_consumed(str(out)) == {f"{corpus}/a.parquet", f"{corpus}/b.parquet"}
    # replay is a durable no-op
    r2 = FlakyRunner()
    res2 = backfill_entity(corpus, str(out), runner=r2)
    assert res2 == {"inputs_applied": 0, "inputs_skipped": 2}
    assert r2.calls == []


def test_retry_resumes_at_failed_file_not_from_scratch(tmp_path):
    corpus = _mk_corpus(tmp_path, "c1", ["0.parquet", "1.parquet", "2.parquet"])
    out_root = tmp_path / "out"
    r = FlakyRunner(fail_path_suffix="1.parquet", n_failures=1)
    delays = []
    res = backfill_all(
        {"c1": corpus},
        str(out_root),
        max_retries=3,
        retry_delay=1.5,
        runner=r,
        sleep=delays.append,
    )
    row = res["c1"]
    assert row["ok"] is True and row["attempts"] == 2 and row["error"] is None
    assert row["inputs_applied"] == 3
    # attempt 1 committed 0.parquet before failing on 1; attempt 2 must NOT
    # re-run 0.parquet — file-level resume
    names = [p.rsplit("/", 1)[1] for p, _ in r.calls]
    assert names == ["0.parquet", "1.parquet", "1.parquet", "2.parquet"]
    assert delays == [3.0]  # reference doubles the delay between attempts


def test_entity_isolation_and_exhausted_retries(tmp_path):
    bad = _mk_corpus(tmp_path, "bad", ["x.parquet"])
    good = _mk_corpus(tmp_path, "good", ["y.parquet"])
    out_root = tmp_path / "out"
    r = FlakyRunner(fail_path_suffix="x.parquet", n_failures=99)
    res = backfill_all({"bad": bad, "good": good}, str(out_root), max_retries=2, runner=r)
    assert res["bad"]["ok"] is False
    assert res["bad"]["attempts"] == 2
    assert "injected failure" in res["bad"]["error"]
    assert res["bad"]["inputs_applied"] == 0
    # the later entity still ran to completion
    assert res["good"] == {"ok": True, "attempts": 1, "inputs_applied": 1, "error": None}


def test_partial_progress_counts_and_carries_across_calls(tmp_path):
    corpus = _mk_corpus(tmp_path, "c1", ["0.parquet", "1.parquet"])
    out_root = tmp_path / "out"
    r = FlakyRunner(fail_path_suffix="1.parquet", n_failures=99)
    res = backfill_all({"c1": corpus}, str(out_root), max_retries=1, runner=r)
    assert res["c1"]["ok"] is False and res["c1"]["inputs_applied"] == 1
    # a later scheduler run (runner healthy now) applies only the failed file
    r2 = FlakyRunner()
    res2 = backfill_all({"c1": corpus}, str(out_root), max_retries=1, runner=r2)
    assert res2["c1"]["ok"] is True and res2["c1"]["inputs_applied"] == 1
    assert [p.rsplit("/", 1)[1] for p, _ in r2.calls] == ["1.parquet"]
    # consumed journal records both files exactly once
    with open(consumed_path(str(out_root / "c1"))) as f:
        recs = [json.loads(line)["input"] for line in f if line.strip()]
    assert sorted(p.rsplit("/", 1)[1] for p in recs) == ["0.parquet", "1.parquet"]


@pytest.fixture(scope="module")
def two_corpora(sf001_transcripts, tmp_path_factory):
    """Two corpora, each split into two arrival files, plus per-corpus
    one-shot reference inputs for the parity check."""
    raw = pq.read_table(sf001_transcripts).to_pandas()
    srt = raw.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    ded = srt[~srt.duplicated(["conv_id", "turn_idx"], keep="last")]
    convs = sorted(ded["conv_id"].unique())
    half = len(convs) // 2
    root = tmp_path_factory.mktemp("sched")
    refs = {}
    for name, sel in [("alpha", set(convs[:half])), ("beta", set(convs[half:]))]:
        sub = ded[ded["conv_id"].isin(sel)]
        cutoff = int(sub["ts"].astype("int64").quantile(0.5))
        d = root / "in" / name
        d.mkdir(parents=True)
        sub[sub["ts"].astype("int64") <= cutoff].to_parquet(d / "0.parquet")
        sub[sub["ts"].astype("int64") > cutoff].to_parquet(d / "1.parquet")
        one = root / f"{name}_full.parquet"
        sub.to_parquet(one)
        refs[name] = str(one)
    return str(root / "in"), refs, str(root / "out")


def test_backfill_all_end_to_end_bitwise(ray_session, two_corpora):
    """Real pipeline: scheduler over 2 corpora × 2 arrival files each equals
    a one-shot streaming backfill of each corpus, bitwise."""
    from quant_feature_pipeline_ray.manifest import read_streaming_output, run_streaming_backfill

    in_root, refs, out_root = two_corpora
    corpora = {n: f"{in_root}/{n}" for n in sorted(refs)}
    res = backfill_all(corpora, out_root, num_buckets=8)
    for name in corpora:
        assert res[name]["ok"] is True and res[name]["inputs_applied"] == 2
        ref_dir = f"{out_root}/../ref_{name}"
        run_streaming_backfill(refs[name], ref_dir, num_buckets=8)
        got = (
            read_streaming_output(f"{out_root}/{name}")
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        )
        want = (
            read_streaming_output(ref_dir)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        )
        assert got.equals(want), f"{name}: scheduler output != one-shot backfill"
    # second pass is a global no-op
    res2 = backfill_all(corpora, out_root, num_buckets=8)
    assert all(r["ok"] and r["inputs_applied"] == 0 for r in res2.values())
