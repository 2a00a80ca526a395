"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns": N, "turns_per_sec": N}

--scaling: runs the headline job in two fresh processes (num_cpus=8 and 32)
on the same input and reports both throughputs + scaling efficiency
(the sandbox stand-in for the N-node vs 4N-node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quant_feature_pipeline_ray.fixtures import ensure_transcripts
    from quant_feature_pipeline_ray.pipelines import events as ev
    from quant_feature_pipeline_ray.pipelines import tpch
    from quant_feature_pipeline_ray.pipelines import training_data as td
    from quant_feature_pipeline_ray.pipelines.flagship import transcript_features

    path = ensure_transcripts(sf_dir)

    # warm the OS page cache (untimed) so we measure compute+shuffle, not
    # the first cold read
    import pyarrow.parquet as pq

    n_turns = pq.ParquetFile(path).metadata.num_rows
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        queries[name] = round(time.time() - t0, 3)
        return out

    # headline: full feature backfill, consumed through the parquet sink
    out_dir = f"/tmp/bench_out/{os.path.basename(sf_dir)}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    timed("flagship_backfill", lambda: transcript_features(path).write_parquet(out_dir))
    headline = queries["flagship_backfill"]

    timed("events_window_agg", lambda: ev.events_window_agg(f"{sf_dir}/events.parquet").count())
    timed(
        "events_asof_window", lambda: ev.events_asof_window(f"{sf_dir}/events.parquet").count()
    )
    timed("tpch_q1", lambda: tpch.tpch_q1(sf_dir))
    timed("doc_exact_dedup", lambda: td.doc_exact_dedup(sf_dir).count())
    timed("doc_token_stats", lambda: td.doc_token_stats(sf_dir).count())
    timed("emb_ann_topk", lambda: td.emb_ann_topk(sf_dir))

    ray.shutdown()
    return {
        "metric": "end-to-end transcript feature-backfill wall time",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(sf_dir),
        "num_cpus": num_cpus,
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline, 1),
    }


def run_scaling() -> dict:
    """Identical job in two fresh ray.init sessions (8 vs 32 CPUs)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tps_lo, tps_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    eff = (tps_hi / tps_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency 8->32 cpus (N vs 4N stand-in)",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": tps_lo,
        "turns_per_sec_32": tps_hi,
        "scaling_efficiency": round(eff, 3),
        "turns": lo["turns"],
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
