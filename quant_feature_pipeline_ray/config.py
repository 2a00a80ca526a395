"""Feature-engineering configuration.

The reference drives everything from YAML (congfigs/main_config.yaml,
congfigs/base_indicators.yaml — indicator windows, enabled lists, merge
flags). We use one small typed dataclass instead: every window/lag/threshold
the kernels consume lives here so the feature contract is reproducible and
hashable (schema_sha analogue of tools/export_utils.py:47-50).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FeatureConfig:
    """Windows are counted in turns; aggregate windows in seconds.

    Defaults mirror the *shape* of the reference's indicator battery
    (congfigs/base_indicators.yaml:1-52 — SMA/EMA window lists, RSI
    persistence min_persist=2, ATR/rv windows) transposed to the transcript
    domain per SURVEY.md §7.0.
    """

    # rolling mean / std over inter-turn latency (reference: SMA windows
    # base_indicators.yaml sma [5..200]; rolling std = rv_win20/50/100)
    sma_windows: tuple[int, ...] = (5, 20)
    # EMA spans (reference: ema [7..200]; recursive adjust=False register —
    # e <- a*x + (1-a)*e, the streaming-friendly form)
    ema_spans: tuple[int, ...] = (5, 20)
    # momentum-style lag deltas in turns (reference: mom14 / real-sliding
    # momentum tools/real_sliding_simple.py:30-78)
    lag_turns: tuple[int, ...] = (1, 5)
    # lead deltas (explicitly non-causal; excluded from the leak-free subset)
    lead_turns: tuple[int, ...] = (1,)
    # rolling percentile-rank window (reference: calc_percentile_rank
    # step5_featueres_unified.py:101-154, clip [0.01, 0.99])
    rank_window: int = 20
    rank_clip: tuple[float, float] = (0.01, 0.99)
    # rolling rates (role transitions / tool usage) window in turns
    rate_window: int = 20
    # run-length persistence event (reference: _persist min_persist
    # step5_featueres_unified.py:1027-1093): dt_secs > threshold for >= n turns
    gap_event_threshold_s: float = 120.0
    gap_event_min_persist: int = 3
    # gap-based sessionize threshold (reference grid-fill analogue,
    # tools/filling.py:19-39 -> SURVEY.md M8)
    session_gap_s: float = 1800.0
    # fixed aggregate windows in seconds, leak-free [T-p, T)
    # (reference: FOUR resample targets 3m/15m/30m/2h,
    # congfigs/main_config.yaml — mirrored at 5m/30m/1h/2h so the as-of
    # merge runs at reference-like width, step4_merge_features.py:340-359)
    agg_windows_s: tuple[int, ...] = (300, 1800, 3600, 7200)
    # MACD-style EMA-difference composite (reference: macd(12,26,9),
    # congfigs/base_indicators.yaml:27-31, composed
    # step5_featueres_unified.py:547-587): fast/slow are the first/last
    # members of ema_spans; the signal line is an EMA of the difference
    macd_signal_span: int = 9
    # Bollinger-width composite (reference bb(20, 2.0) -> bb_width
    # = (ma+2s - (ma-2s))/ma, congfigs/base_indicators.yaml:13-17): the
    # base window must be a member of sma_windows; the fused feature is
    # the mean of two rolling percentile ranks of the width
    bw_window: int = 20
    bw_rank_windows: tuple[int, int] = (5, 20)
    # number of hash buckets for the conv_id partition backbone
    num_buckets: int = 64
    # winsorize bounds for governed latency normalization (reference:
    # winsorize [0.1%, 99.9%] step5_featueres_unified.py:1208-1210) —
    # FROZEN constants (single-pass, train/live-consistent like the
    # reference's fixed_gamma mode, congfigs/step5_mapping.yaml:136-153)
    winsor_lo_s: float = 0.0
    winsor_hi_s: float = 3600.0
    tanh_scale_s: float = 120.0

    def max_lookback_turns(self) -> int:
        """Longest finite turn-window any kernel needs — the exact-overlap
        length used by salted mega-conversation splitting (SURVEY.md §4.2.3)."""
        return max(
            max(self.sma_windows),
            max(self.lag_turns),
            self.rank_window,
            self.rate_window,
            self.gap_event_min_persist,
            # bw_rank_fuse ranks a value that itself has bw_window-1 rows
            # of lookback: the composed horizon is the sum of both windows
            max(self.bw_rank_windows) + self.bw_window - 1,
        )

    def schema_sha(self, feature_names: list[str]) -> str:
        """SHA-1 over the '|'-joined ordered feature-name list
        (reference contract: tools/export_utils.py:47-50)."""
        return hashlib.sha1("|".join(feature_names).encode()).hexdigest()


DEFAULT_CONFIG = FeatureConfig()
