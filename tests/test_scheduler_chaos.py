"""Process-level chaos test for the multi-corpus scheduler (round-5
verdict item 7): SIGKILL scripts/backfill_all.py mid-entity — between
durable commits, at whatever instruction the signal lands on — then
resume with a fresh process and assert the final feature output is
byte-identical to an uninterrupted run. This is the §5(e) kill/resume
property at the SCHEDULER tier (the injected-failure pytest in
test_scheduler.py covers the in-process retry ladder; this covers a real
process death, including mid-write)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpora_root(tmp_path_factory, sf001_transcripts):
    """Two corpora x three time-sliced input files each (the incremental
    append contract: per-conversation strictly later deltas)."""
    raw = pq.read_table(sf001_transcripts).to_pandas()
    srt = raw.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    ded = srt[~srt.duplicated(["conv_id", "turn_idx"], keep="last")]
    tsu = ded["ts"].astype("int64")
    root = tmp_path_factory.mktemp("chaos_corpora")
    cuts = tsu.quantile([1 / 3, 2 / 3]).astype("int64").tolist()
    # corpus 'a' = even conv hash, 'b' = odd — two disjoint entities
    conv_parity = pd.util.hash_array(ded["conv_id"].to_numpy(object)) % 2
    for name, par in (("a", 0), ("b", 1)):
        d = root / name
        d.mkdir()
        sub = ded[conv_parity == par]
        stsu = sub["ts"].astype("int64")
        slices = [
            sub[stsu <= cuts[0]],
            sub[(stsu > cuts[0]) & (stsu <= cuts[1])],
            sub[stsu > cuts[1]],
        ]
        for i, sl in enumerate(slices):
            sl.to_parquet(str(d / f"part{i:02d}.parquet"))
    return str(root)


def _run_backfill(root, out, kill_after_first_commit=False, timeout=300):
    """Launch the real CLI in its own process group; optionally SIGKILL the
    whole group as soon as the first consumed-input record is durable."""
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "backfill_all.py"),
            "--root", root, "--out", out, "--buckets", "4",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        start_new_session=True,  # own process group -> group kill reaps Ray too
    )
    if not kill_after_first_commit:
        outb, errb = proc.communicate(timeout=timeout)
        assert proc.returncode == 0, errb.decode()[-2000:]
        return None
    deadline = time.time() + timeout
    consumed = [os.path.join(out, n, "consumed_inputs.jsonl") for n in ("a", "b")]
    while time.time() < deadline:
        if proc.poll() is not None:  # finished before we could kill it
            return "finished"
        if any(os.path.exists(p) and os.path.getsize(p) > 0 for p in consumed):
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=30)
            return "killed"
        time.sleep(0.02)
    os.killpg(proc.pid, signal.SIGKILL)
    raise AssertionError("backfill made no durable progress before timeout")


def _collect(out_root):
    from quant_feature_pipeline_ray.manifest import read_streaming_output

    frames = []
    for name in ("a", "b"):
        df = read_streaming_output(os.path.join(out_root, name)).to_pandas()
        df["entity"] = name
        frames.append(df)
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values(["entity", "conv_id", "turn_idx"], ignore_index=True)
    )


def test_sigkill_mid_entity_then_resume_is_byte_identical(
    ray_session, corpora_root, tmp_path
):
    out_chaos = str(tmp_path / "chaos")
    out_clean = str(tmp_path / "clean")

    status = _run_backfill(corpora_root, out_chaos, kill_after_first_commit=True)
    # the poll kill lands ~tens of ms after the FIRST durable commit; five
    # more applies (seconds each) remain, so a finished-before-kill race
    # would mean the chaos path was not exercised — fail loudly instead
    assert status == "killed", "backfill finished before the chaos kill"
    # resume from a fresh process finishes the remaining inputs
    _run_backfill(corpora_root, out_chaos)
    # uninterrupted reference run
    _run_backfill(corpora_root, out_clean)

    a = _collect(out_chaos)
    b = _collect(out_clean)
    assert len(a) == len(b) > 0
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            eq = (x == y) | (np.isnan(x) & np.isnan(y))
        else:
            eq = x == y
        assert np.asarray(eq).all(), f"column {c} diverged after kill/resume"
    # every input file is recorded exactly once per entity
    from quant_feature_pipeline_ray.scheduler import load_consumed

    for name in ("a", "b"):
        seen = load_consumed(os.path.join(out_chaos, name))
        assert len(seen) == 3, f"entity {name}: consumed {len(seen)} of 3"
