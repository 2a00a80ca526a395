"""Flagship pipeline: transcript Parquet → per-turn feature vectors.

The end-to-end analogue of the reference's offline build
(run2_offline_pipeline.py → Step2 resample → Step3 indicators → Step4
merge_asof → Step5 feature contract), fused Ray-Data-first:

    read_parquet (column-pruned)
      → ONE hash shuffle: groupby(hash(conv_id) % B)
        → per bucket: sort → dedup keep-last → sessionize → rolling
          kernels (SMA/EMA/std/lag/rank/events) → leak-free window
          aggregates per agg window → backward as-of merge back onto turns
      → feature table (stable (conv_id, turn_idx) order inside each bucket)

Fusing Steps 2-5 into the single per-bucket kernel avoids materializing the
intermediate K-line/indicator tables the reference writes to disk between
steps — at 100 TB those intermediates are the difference between one pass
and four.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
from quant_feature_pipeline_ray.stages.asof import merge_asof_frames
from quant_feature_pipeline_ray.stages.turn_features import compute_turn_features
from quant_feature_pipeline_ray.stages.window_agg import window_aggregate_frame
from quant_feature_pipeline_ray.sources.transcripts import (
    INPUT_COLUMNS,
    cluster_cpus,
    read_transcripts,
)


def featurize_bucket(df: pd.DataFrame, cfg: FeatureConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """One bucket end-to-end: turn kernels + window aggregates + as-of."""
    if len(df) == 0:
        return _empty_output(cfg)
    turns = compute_turn_features(df, cfg)
    for p in cfg.agg_windows_s:
        wf = window_aggregate_frame(turns, p)
        wf = wf.drop(columns=["first_turn", "last_turn", "dt_sum_us"])
        turns = merge_asof_frames(
            turns, wf, on="ts_us", right_on="w_end_us", by="conv_id", prefix=f"w{p}_"
        )
        for c in (f"w{p}_turns", f"w{p}_tool_turns", f"w{p}_text_chars", f"w{p}_w_end_us"):
            turns[c] = turns[c].fillna(0).astype("int64")
        turns[f"w{p}_dt_mean"] = turns[f"w{p}_dt_mean"].fillna(0.0)
    return turns.sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)


def transcript_features(
    path: "str | ray.data.Dataset",
    cfg: FeatureConfig = DEFAULT_CONFIG,
    num_buckets: int | None = None,
    text_exchange: str = "inline",
) -> ray.data.Dataset:
    """Build the full per-turn feature table from a transcript parquet path
    (or an already-constructed transcript Dataset).

    num_buckets defaults to the cluster CPU count — one shuffle partition
    per core keeps every core busy without fragmenting the exchange (the
    measured sweet spot; 200 auto-split blocks cost ~8x the wall time of 32
    right-sized ones at sf0.1).

    text_exchange:
      * "inline" (default): whole rows through the one hash exchange.
        MEASURED best on a single node, where the exchange is
        shared-memory plasma (bytes are one memcpy) and the blob codec +
        extra text sort cost real CPU: sf1.0 2->8 cpu A/B over 3 clean
        rounds — inline 62-66 s @2 / 18-23 s @8, blob 83-112 s @2 /
        29-35 s @8, same 2->8 efficiency band (BASELINE.md).
      * "blob": text bypasses the per-row exchange — text_len is derived
        pre-shuffle and text crosses as one lz4-compressed Arrow-IPC blob
        row per (block, bucket), reattached post-kernel
        (stages/text_exchange.py). ~60% of the exchange bytes are text at
        a 4-6x codec ratio, so this is the path for a REAL multi-node
        cluster where the exchange crosses the network. Bitwise parity
        with inline is pinned (tests/test_flagship.py).

    The per-bucket kernel is the ARROW-native path
    (stages/turn_features_arrow) so string columns never become pickled
    pandas object blocks in the object store; it is pinned bitwise-equal to
    the pandas path by tests/test_arrow_parity.py."""
    from quant_feature_pipeline_ray.stages.partition import BUCKET_COL, with_bucket
    from quant_feature_pipeline_ray.stages.turn_features_arrow import featurize_bucket_arrow

    ds = path if isinstance(path, ray.data.Dataset) else read_transcripts(path)
    B = num_buckets or max(32, cluster_cpus())
    if text_exchange == "blob":
        from quant_feature_pipeline_ray.stages.text_exchange import (
            pack_for_exchange,
            run_bucket_with_text,
        )

        packed = ds.map_batches(
            lambda t: pack_for_exchange(t, B), batch_format="pyarrow"
        )
        return packed.groupby(BUCKET_COL).map_groups(
            lambda t: run_bucket_with_text(t, cfg), batch_format="pyarrow"
        )
    bucketed = with_bucket(ds, key="conv_id", num_buckets=B)
    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda t: featurize_bucket_arrow(t.drop_columns([BUCKET_COL]), cfg),
        batch_format="pyarrow",
    )


def _probe_output(cfg: FeatureConfig) -> pd.DataFrame:
    probe = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["x"],
            "tool": [""],
            "ts": [pd.Timestamp("2024-01-01")],
        }
    )
    return featurize_bucket(probe, cfg)


def _empty_output(cfg: FeatureConfig) -> pd.DataFrame:
    """Correctly-typed empty frame so empty buckets don't emit a divergent
    block schema into the stream."""
    return _probe_output(cfg).head(0)


def feature_schema_names(cfg: FeatureConfig = DEFAULT_CONFIG) -> list[str]:
    """Ordered output feature-name contract (reference: NPZ feature_names +
    schema_sha, tools/export_utils.py:268-283). Derived from a probe row so
    it can never drift from the kernels."""
    return list(_probe_output(cfg).columns)
