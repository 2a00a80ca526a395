"""End-to-end corpus curation runner: the funnel as a production JOB.

`doc_curation_funnel` (pipelines/training_data.py) decides WHICH documents
survive (quality filter ∩ exact-dedup representative ∖ near-dup victims,
one tagged-union grouped aggregate). This module turns that decision into a
runnable, resumable artifact the way manifest.run_backfill does for the
transcript flagship:

    kept ids  ──┐  one doc_id hash exchange (text joins the verdicts here —
    documents ──┴─ the text column never rides the funnel's own dataflow)
        └─ hive-partitioned parquet shards (lang=<l>/...), resumable layout
        └─ _funnel_summary.json: input/final counts + config ('_' prefix
        keeps parquet dataset readers away from it)

Reference parity: the reference's step5 export writes one NPZ + sidecar
contract (congfigs/config_loader.py, step5 exporter); here the sink is
partitioned parquet + a JSON summary, the cluster-native equivalent.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def curate_corpus(
    input_dir: str,
    out_dir: str,
    threshold: float = 0.82,
    min_tokens: int = 8,
    max_mean_token_len: float = 9.0,
    min_stopword_ratio: float = 0.01,
    resume: bool = True,
) -> dict:
    """Run the curation funnel over `input_dir`/documents.parquet and write
    the surviving documents as lang-partitioned parquet under `out_dir`.

    Returns the funnel summary dict (also persisted as funnel_summary.json).
    Idempotent: a completed run (marker file present) is skipped when
    `resume` — re-submission of a failed job starts clean, a finished one
    is a no-op."""
    from quant_feature_pipeline_ray.pipelines.training_data import doc_curation_funnel
    from quant_feature_pipeline_ray.stages.partition import partition_map_groups

    marker = os.path.join(out_dir, "_funnel_summary.json")
    if resume and os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)

    t0 = time.time()
    kept = doc_curation_funnel(
        input_dir,
        threshold=threshold,
        min_tokens=min_tokens,
        max_mean_token_len=max_mean_token_len,
        min_stopword_ratio=min_stopword_ratio,
    )

    docs = ray.data.read_parquet(
        os.path.join(input_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    n_input = docs.count()

    kept_tagged = kept.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "text": pa.array([""] * len(b), pa.string()),
                "lang": pa.array([""] * len(b), pa.string()),
                "source": pa.array([""] * len(b), pa.string()),
                "n_chars": pa.array(np.zeros(len(b), np.int64)),
                "is_verdict": pa.array(np.ones(len(b), bool)),
            }
        ),
        batch_format="pyarrow",
    )
    doc_tagged = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "lang": b["lang"],
                "source": b["source"],
                "n_chars": b["n_chars"].cast(pa.int64()),
                "is_verdict": pa.array(np.zeros(len(b), bool)),
            }
        ),
        batch_format="pyarrow",
    )

    def join_keep(g: pd.DataFrame) -> pd.DataFrame:
        keep_ids = set(g.loc[g["is_verdict"], "doc_id"].to_numpy())
        d = g[~g["is_verdict"]]
        m = d["doc_id"].isin(keep_ids).to_numpy()
        return d[m].drop(columns=["is_verdict"]).reset_index(drop=True)

    surviving = partition_map_groups(
        kept_tagged.union(doc_tagged), join_keep, key="doc_id", num_buckets=32
    )

    tmp_out = out_dir + ".tmp"
    shutil.rmtree(tmp_out, ignore_errors=True)
    surviving.write_parquet(tmp_out, partition_cols=["lang"])

    back = ray.data.read_parquet(tmp_out)
    n_final = back.count()
    chars_kept = int(
        back.map_batches(
            lambda b: pd.DataFrame({"s": [int(np.asarray(b["n_chars"]).sum())]}),
            batch_format="pyarrow",
        )
        .to_pandas()["s"]
        .sum()
    )
    # the previous good artifact survives until the replacement is fully
    # written AND verified (the read-back above) — only then swap
    # (round-2 ADVICE: an early rmtree destroyed the old output on any
    # failure during the funnel/write)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_out, out_dir)

    summary = {
        "n_input": int(n_input),
        "n_final": int(n_final),
        "chars_kept": chars_kept,
        "threshold": threshold,
        "min_tokens": min_tokens,
        "wall_s": round(time.time() - t0, 2),
        "out_dir": out_dir,
    }
    with open(marker, "w") as f:
        json.dump(summary, f)
    return summary
