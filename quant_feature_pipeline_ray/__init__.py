"""quant_feature_pipeline_ray — a Ray-Data-native point-in-time / as-of join +
windowed feature-engineering engine over multi-turn transcript Parquet.

Built from scratch on ray.data.Dataset pipelines (map_batches over zero-copy
Arrow batches, groupby/map_groups for the one hash shuffle, actor pools for
stateful streaming kernels). Re-derives the *semantics* of the reference
pipeline (tuotuo512/quant-feature-pipeline — rolling means/std, EMA registers,
momentum-style lag deltas, resample-window aggregates, backward as-of merge,
incremental checkpointing) in the transcript domain:

    symbol        -> conv_id        (entity / partition key)
    1m OHLCV bar  -> transcript turn (conv_id, turn_idx, role, text, tool, ts)
    log return    -> inter-turn latency dt_secs
    SMA/EMA/std   -> rolling latency stats
    momentum      -> lag/lead deltas
    resample(tf)  -> per-window turn aggregates, leak-free [T-p, T)
    merge_asof    -> point-in-time as-of join of window features onto turns
    grid fill     -> gap-based sessionize

Nothing here calls ray.init(); the driver / bench / test fixture owns the Ray
session (Ray Data auto-inits when run standalone).
"""

from quant_feature_pipeline_ray.config import FeatureConfig

__all__ = ["FeatureConfig"]
__version__ = "0.1.0"
