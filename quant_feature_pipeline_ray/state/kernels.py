"""Sequential carry-state kernels for streaming / actor-pool execution.

The batch path (stages/turn_features*) computes per-conversation features
from fully co-located rows. This module provides the STREAMING form of the
same kernels: state that survives across Arrow batch boundaries inside one
logical partition — the "actor pools carrying sequential window state (ring
buffers for rolling stats, monotonic timestamp watermarks) across batch
boundaries" architecture. The reference's online mode is the analogue:
micro-batch rebuilds against a warm cache (unified_feature_pipeline.py:311-531).

Exactness strategy (pinned by tests/test_streaming.py — outputs are BITWISE
equal to the batch path):

  * bounded-window kernels (rolling mean/std, rank, lag, rates): the state
    is the last `overlap` raw rows (ring buffers IN DATA FORM); each batch
    is computed over [carried_tail + batch] and the tail's outputs dropped;
  * EMA: the register is the last emitted EMA value; prepending it as a
    pseudo-row makes pandas' cython ewm continue the recurrence exactly;
  * run-length events: integer carry (current run length) + a vectorized
    fix-up of the batch's leading run;
  * sessionize / cumulative counters: integer offsets;
  * watermark: the last seen ts per conversation — a batch that time-travels
    backwards is a fatal ordering violation (zero-leakage guard).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
from quant_feature_pipeline_ray.stages.turn_features import (
    _windowed_sum_int,
    rolling_mean_std_int,
)


@dataclass
class WindowState:
    """Streaming window-aggregate cursor for one (conv, scale):
    the current partial window plus the latest completed window's stats —
    exactly the monotonic as-of cursor of SURVEY.md J1."""

    w_end: int = -1                       # current partial window's end label
    turns: int = 0
    tool_turns: int = 0
    text_chars: int = 0
    dt_sum_us: int = 0
    last_w_end: int = 0                   # latest completed window (0 = none)
    last_turns: int = 0
    last_tool_turns: int = 0
    last_text_chars: int = 0
    last_dt_sum_us: int = 0


@dataclass
class ConvState:
    """All sequential state for one conversation."""

    cfg: FeatureConfig
    rn_next: int = 0                      # next global row number
    last_ts_us: int = -1                  # watermark
    tail_dt_us: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))
    tail_is_tool: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))
    tail_role_change: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))
    tail_text_len: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))
    ema: dict[int, float] = field(default_factory=dict)      # span -> register
    macd_signal: float | None = None      # EMA register of the macd line
    run_len: int = 0                      # current consecutive-over-threshold run
    session_id: int = 0
    session_rows: int = 0                 # rows in the current session so far
    last_role: object = None
    windows: dict[int, WindowState] = field(default_factory=dict)  # scale_s -> cursor
    # time-bounded tail for the trailing (ts-p, ts] windows: all rows within
    # max(agg_windows_s) of the watermark (row count varies with turn density)
    tail_tw_ts_us: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))
    tail_tw_text_len: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))

    def overlap(self) -> int:
        return max(self.cfg.max_lookback_turns(), self.cfg.rank_window)


class StreamingTurnKernel:
    """Per-partition streaming turn-feature kernel.

    Feed it consecutive, per-conversation-sorted row batches (the partition
    backbone's ordering invariant); it emits the turn-level feature columns
    of compute_turn_features (sans the as-of window columns, which belong to
    the windowed right-side table) BITWISE identical to the batch path.
    Designed as the body of a map_batches(Cls, concurrency=N) actor pool;
    per-conversation state lives in self.state across batches.
    """

    def __init__(self, cfg: FeatureConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.state: dict[object, ConvState] = {}

    def process_batch(self, df: pd.DataFrame) -> pd.DataFrame:
        conv = df["conv_id"].to_numpy()
        n = len(df)
        if n == 0:
            return df
        bounds = np.flatnonzero(np.concatenate(([True], conv[1:] != conv[:-1]))).tolist() + [n]
        parts = [self._process_conv(df.iloc[a:b]) for a, b in zip(bounds[:-1], bounds[1:])]
        # each conv yields a dict of numpy columns; ONE concatenate per column
        # builds the batch frame (a per-conv DataFrame + per-column __setitem__
        # was 75% of incremental-append kernel time — pandas block-manager
        # inserts, profiled round 5)
        if len(parts) == 1:
            return pd.DataFrame(parts[0])
        return pd.DataFrame(
            {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        )

    __call__ = process_batch

    def _process_conv(self, g: pd.DataFrame) -> dict:
        cfg = self.cfg
        cid = g["conv_id"].iloc[0]
        st = self.state.get(cid)
        if st is None:
            st = self.state[cid] = ConvState(cfg)
        m = len(g)
        idx = np.arange(m, dtype=np.int64)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if st.last_ts_us >= 0 and ts_us[0] < st.last_ts_us:
            raise AssertionError(f"watermark violated for {cid!r}: batch time-travels")
        if np.any(np.diff(ts_us) < 0):
            raise AssertionError(f"watermark violated inside batch for {cid!r}")

        first_ever = st.rn_next == 0
        dt_us = np.empty(m, dtype=np.int64)
        dt_us[0] = 0 if first_ever else ts_us[0] - st.last_ts_us
        dt_us[1:] = np.diff(ts_us)
        dt_secs = dt_us / 1e6
        rn = np.arange(st.rn_next, st.rn_next + m, dtype=np.int64)

        roles = g["role"].to_numpy()
        prev_roles = np.empty(m, dtype=object)
        prev_roles[0] = st.last_role
        prev_roles[1:] = roles[:-1]
        role_change = np.where(
            (prev_roles != None) & (roles != prev_roles), 1, 0  # noqa: E711
        ).astype(np.int64)
        is_tool = (g["tool"].to_numpy() != "").astype(np.int64)
        text_len = g["text"].str.len().to_numpy().astype(np.int64)

        # plain dict of numpy columns; the DataFrame is built once per BATCH
        # in process_batch (never per conv, never per column)
        out: dict[str, np.ndarray] = {
            "conv_id": g["conv_id"].to_numpy(),
            "turn_idx": g["turn_idx"].to_numpy(),
            "ts_us": ts_us,
            "role": roles,
            "tool": g["tool"].to_numpy(),
            "text": g["text"].to_numpy(),
            "dt_secs": dt_secs,
            "cum_turns": rn + 1,
            "text_len": text_len,
            "is_tool": is_tool,
            "role_change": role_change,
        }

        # --- sessionize: integer offsets against carried counters
        gap_start = dt_us > np.int64(cfg.session_gap_s * 1e6)
        out["session_id"] = st.session_id + np.cumsum(gap_start.astype(np.int64))
        starts = np.where(gap_start, idx, -1)
        last_start = np.maximum.accumulate(starts)
        out["session_turn"] = np.where(
            last_start >= 0, idx - last_start + 1, st.session_rows + idx + 1
        )
        is_start = gap_start.copy()
        if first_ever:
            is_start[0] = True
        out["is_session_start"] = is_start.astype(np.int64)

        # --- bounded-window kernels over [carried tail + batch]
        t = len(st.tail_dt_us)
        ext_rn = np.arange(st.rn_next - t, st.rn_next + m, dtype=np.int64)
        ext_dt_us = np.concatenate([st.tail_dt_us, dt_us])
        ext_dt_secs = ext_dt_us / 1e6
        for w in cfg.sma_windows:
            sma, std = rolling_mean_std_int(ext_dt_us, ext_rn, w)
            out[f"lat_sma_{w}"] = sma[t:]
            out[f"lat_std_{w}"] = std[t:]

        rw = cfg.rate_window
        ext_tool = np.concatenate([st.tail_is_tool, is_tool])
        ext_rc = np.concatenate([st.tail_role_change, role_change])
        ext_tl = np.concatenate([st.tail_text_len, text_len])
        s_tool, n_in = _windowed_sum_int(ext_tool, ext_rn, rw)
        out[f"tool_rate_{rw}"] = (s_tool / n_in)[t:]
        s_rc, _ = _windowed_sum_int(ext_rc, ext_rn, rw)
        out[f"role_change_rate_{rw}"] = (s_rc / n_in)[t:]
        s_tl, _ = _windowed_sum_int(ext_tl, ext_rn, rw)
        out[f"text_len_sma_{rw}"] = (s_tl / n_in)[t:]

        for k in cfg.lag_turns:
            valid = ext_rn >= k
            src = np.where(valid, np.arange(len(ext_dt_secs)) - k, 0)
            lagv = np.where(valid, ext_dt_secs[src], 0.0)
            out[f"lat_lag_{k}"] = lagv[t:]
            out[f"lat_delta_{k}"] = np.where(valid, ext_dt_secs - lagv, 0.0)[t:]

        rk = (
            pd.Series(ext_dt_secs)
            .rolling(cfg.rank_window, min_periods=1)
            .rank(method="average", pct=True)
            .to_numpy()
        )
        out[f"lat_rank_{cfg.rank_window}"] = np.clip(rk, cfg.rank_clip[0], cfg.rank_clip[1])[t:]

        # --- EMA register continuation
        for span in cfg.ema_spans:
            alpha = 2.0 / (span + 1.0)
            if span in st.ema:
                seq = np.concatenate([[st.ema[span]], dt_secs])
                ema = pd.Series(seq).ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
            else:
                ema = pd.Series(dt_secs).ewm(alpha=alpha, adjust=False).mean().to_numpy()
            out[f"lat_ema_{span}"] = ema
            st.ema[span] = float(ema[-1])

        # --- composite indicators (MACD diff / band-width fuse): the macd
        # signal line continues from its register exactly like the base
        # EMAs; band_width + its rank fuse recompute over the carried tail
        # (the tail is sized for the composed horizon, cfg.max_lookback)
        fast, slow = cfg.ema_spans[0], cfg.ema_spans[-1]
        macd = out[f"lat_ema_{fast}"] - out[f"lat_ema_{slow}"]
        out["macd"] = macd
        a_sig = 2.0 / (cfg.macd_signal_span + 1.0)
        if st.macd_signal is not None:
            seq = np.concatenate([[st.macd_signal], macd])
            sig = pd.Series(seq).ewm(alpha=a_sig, adjust=False).mean().to_numpy()[1:]
        else:
            sig = pd.Series(macd).ewm(alpha=a_sig, adjust=False).mean().to_numpy()
        out["macd_signal"] = sig
        out["macd_hist"] = macd - sig
        st.macd_signal = float(sig[-1])

        w_bw = cfg.bw_window
        sma_e, std_e = rolling_mean_std_int(ext_dt_us, ext_rn, w_bw)
        with np.errstate(invalid="ignore", divide="ignore"):
            bw_e = np.where(sma_e > 0, 4.0 * std_e / sma_e, 0.0)
        out[f"band_width_{w_bw}"] = bw_e[t:]
        rks = []
        for rw_b in cfg.bw_rank_windows:
            rk_b = (
                pd.Series(bw_e)
                .rolling(rw_b, min_periods=1)
                .rank(method="average", pct=True)
                .to_numpy()
            )
            rks.append(np.clip(rk_b, cfg.rank_clip[0], cfg.rank_clip[1]))
        out["bw_rank_fuse"] = (0.5 * (rks[0] + rks[1]))[t:]

        # --- trailing TIME-window aggregates over a time-bounded tail
        max_p_us = np.int64(max(cfg.agg_windows_s)) * 1_000_000
        t2 = len(st.tail_tw_ts_us)
        ext_ts2 = np.concatenate([st.tail_tw_ts_us, ts_us])
        ext_tl2 = np.concatenate([st.tail_tw_text_len, text_len])
        pos = np.arange(1, len(ext_ts2) + 1)
        cs_c = np.concatenate([[0], np.cumsum(ext_tl2)])
        from quant_feature_pipeline_ray.stages.turn_features import (
            sliding_minmax_from_bounds,
        )

        for p_s in cfg.agg_windows_s:
            p_us = np.int64(p_s) * 1_000_000
            lo = np.searchsorted(ext_ts2, ext_ts2 - p_us, side="right")
            out[f"turns_roll_{p_s}s"] = (pos - lo)[t2:]
            out[f"chars_roll_{p_s}s"] = (cs_c[pos] - cs_c[lo])[t2:]
            # sliding first/min/max/last over the same (ts-p, ts] window:
            # the time-bounded tail already carries every row any batch
            # window can reach (same retention argument as *_roll_*s)
            out[f"tlen_first_roll_{p_s}s"] = ext_tl2[lo][t2:]
            mn, mx = sliding_minmax_from_bounds(ext_tl2, lo)
            out[f"tlen_min_roll_{p_s}s"] = mn[t2:]
            out[f"tlen_max_roll_{p_s}s"] = mx[t2:]
            out[f"tlen_last_roll_{p_s}s"] = text_len
        hour = (ts_us // 3_600_000_000) % 24
        days = ts_us // 86_400_000_000
        isodow = (days + 3) % 7 + 1
        out["hour"] = hour
        out["isodow"] = isodow
        out["hour_sin"] = np.sin(2 * np.pi * hour / 24.0)
        out["hour_cos"] = np.cos(2 * np.pi * hour / 24.0)
        out["dow_sin"] = np.sin(2 * np.pi * (isodow - 1) / 7.0)
        out["dow_cos"] = np.cos(2 * np.pi * (isodow - 1) / 7.0)

        # --- streaming window aggregates + as-of cursor columns.
        # NOTE: lat_lead_* (non-causal lookahead) is deliberately absent in
        # streaming mode — a point-in-time stream cannot read the future.
        for p_s in cfg.agg_windows_s:
            p = np.int64(p_s) * 1_000_000
            ws = st.windows.get(p_s)
            if ws is None:
                ws = st.windows[p_s] = WindowState()
            w_end = (ts_us // p + 1) * p
            gb = np.empty(m, dtype=bool)
            gb[0] = True
            gb[1:] = w_end[1:] != w_end[:-1]
            starts = np.flatnonzero(gb)
            ng = len(starts)
            g_end = w_end[starts]
            g_turns = np.diff(np.append(starts, m)).astype(np.int64)
            g_tool = np.add.reduceat(is_tool, starts)
            g_chars = np.add.reduceat(text_len, starts)
            g_dtsum = np.add.reduceat(dt_us, starts)
            merged = ws.w_end == g_end[0]
            if merged:  # carried partial continues into the batch's first group
                g_turns[0] += ws.turns
                g_tool[0] += ws.tool_turns
                g_chars[0] += ws.text_chars
                g_dtsum[0] += ws.dt_sum_us
            # completed-window stats visible to rows of group j
            comp_end = np.zeros(ng, dtype=np.int64)
            comp_turns = np.zeros(ng, dtype=np.int64)
            comp_tool = np.zeros(ng, dtype=np.int64)
            comp_chars = np.zeros(ng, dtype=np.int64)
            comp_dtsum = np.zeros(ng, dtype=np.int64)
            if ng > 1:
                comp_end[1:] = g_end[:-1]
                comp_turns[1:] = g_turns[:-1]
                comp_tool[1:] = g_tool[:-1]
                comp_chars[1:] = g_chars[:-1]
                comp_dtsum[1:] = g_dtsum[:-1]
            if ws.w_end >= 0 and not merged:
                # the carried partial window completed before this batch
                comp_end[0], comp_turns[0] = ws.w_end, ws.turns
                comp_tool[0], comp_chars[0], comp_dtsum[0] = (
                    ws.tool_turns, ws.text_chars, ws.dt_sum_us,
                )
            else:
                comp_end[0], comp_turns[0] = ws.last_w_end, ws.last_turns
                comp_tool[0], comp_chars[0], comp_dtsum[0] = (
                    ws.last_tool_turns, ws.last_text_chars, ws.last_dt_sum_us,
                )
            own = np.cumsum(gb.astype(np.int64)) - 1
            hit = comp_end[own] > 0
            pre = f"w{p_s}_"
            out[pre + "w_end_us"] = comp_end[own]
            out[pre + "turns"] = comp_turns[own]
            out[pre + "tool_turns"] = comp_tool[own]
            out[pre + "text_chars"] = comp_chars[own]
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = comp_dtsum[own] / (comp_turns[own] * 1e6)
            out[pre + "dt_mean"] = np.where(hit, mean, 0.0)
            # advance the cursor
            if ng > 1:
                ws.last_w_end, ws.last_turns = int(g_end[-2]), int(g_turns[-2])
                ws.last_tool_turns, ws.last_text_chars, ws.last_dt_sum_us = (
                    int(g_tool[-2]), int(g_chars[-2]), int(g_dtsum[-2]),
                )
            elif ws.w_end >= 0 and not merged:
                ws.last_w_end, ws.last_turns = ws.w_end, ws.turns
                ws.last_tool_turns, ws.last_text_chars, ws.last_dt_sum_us = (
                    ws.tool_turns, ws.text_chars, ws.dt_sum_us,
                )
            ws.w_end, ws.turns = int(g_end[-1]), int(g_turns[-1])
            ws.tool_turns, ws.text_chars, ws.dt_sum_us = (
                int(g_tool[-1]), int(g_chars[-1]), int(g_dtsum[-1]),
            )

        # --- run-length persistence with carry + leading-run fix-up
        mask = dt_us > np.int64(cfg.gap_event_threshold_s * 1e6)
        anchor = np.maximum.accumulate(np.where(~mask, idx, -1))
        run = np.where(mask, idx - anchor, 0)
        lead = (anchor == -1) & mask
        run = np.where(lead, st.run_len + idx + 1, run)
        out["gap_event"] = (run >= cfg.gap_event_min_persist).astype(np.int64)

        # --- update carried state
        st.rn_next += m
        st.last_ts_us = int(ts_us[-1])
        keep = st.overlap()
        st.tail_dt_us = ext_dt_us[-keep:].copy()
        st.tail_is_tool = ext_tool[-keep:].copy()
        st.tail_role_change = ext_rc[-keep:].copy()
        st.tail_text_len = ext_tl[-keep:].copy()
        st.run_len = int(run[-1]) if mask[-1] else 0
        tw_keep = ext_ts2 > ts_us[-1] - max_p_us
        st.tail_tw_ts_us = ext_ts2[tw_keep].copy()
        st.tail_tw_text_len = ext_tl2[tw_keep].copy()
        if gap_start.any():
            st.session_id = int(out["session_id"][-1])
            st.session_rows = int(out["session_turn"][-1])
        else:
            st.session_rows += m
        st.last_role = roles[-1]
        return out


def streaming_columns(cfg: FeatureConfig = DEFAULT_CONFIG) -> list[str]:
    """The streaming kernel's output column order (probe-derived)."""
    import pandas as pd

    probe = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["x"],
            "tool": [""],
            "ts": pd.to_datetime([0], unit="us"),
        }
    )
    return list(StreamingTurnKernel(cfg)(probe).columns)


def bootstrap_states_from_batch(out, cfg: FeatureConfig = DEFAULT_CONFIG) -> StreamingTurnKernel:
    """Build a ready-to-append StreamingTurnKernel from the BATCH path's
    output for one bucket — the fast exact-incremental bootstrap.

    The batch (arrow) kernel is ~4-10x faster than the per-conversation
    streaming loop; everything the streaming state needs is either in the
    batch output (EMA registers = last emitted values, session counters,
    as-of cursor = the last row's w{p}_ columns) or derivable from the raw
    arrays with vectorized scans (trailing run length, tails, current
    partial window). tests/test_incremental.py pins that appends on a
    bootstrapped kernel are byte-identical to pure-streaming processing.
    """
    import pandas as pd
    import pyarrow as pa

    if isinstance(out, pa.Table):
        out = out.to_pandas()
    kern = StreamingTurnKernel(cfg)
    if len(out) == 0:
        return kern
    conv = out["conv_id"].to_numpy()
    n = len(conv)
    new_conv = np.empty(n, dtype=bool)
    new_conv[0] = True
    np.not_equal(conv[1:], conv[:-1], out=new_conv[1:])
    starts = np.flatnonzero(new_conv)
    ends = np.append(starts[1:], n)

    ts_us = out["ts_us"].to_numpy()
    dt_us = np.round(out["dt_secs"].to_numpy() * 1e6).astype(np.int64)
    text_len = out["text_len"].to_numpy().astype(np.int64)
    is_tool = out["is_tool"].to_numpy().astype(np.int64)
    role_change = out["role_change"].to_numpy().astype(np.int64)
    roles = out["role"].to_numpy()

    # trailing run length per conv (vectorized: distance from last break)
    thr = np.int64(cfg.gap_event_threshold_s * 1e6)
    mask = dt_us > thr
    idx = np.arange(n, dtype=np.int64)
    anchor = np.maximum.accumulate(np.where((~mask) | new_conv, idx, -1))
    # at a conv start with mask False the anchor is the start row itself;
    # a True first row cannot happen (dt=0 at conv start)
    trail_run = np.where(mask, idx - anchor, 0)

    keep = max(cfg.max_lookback_turns(), cfg.rank_window)
    max_p_us = np.int64(max(cfg.agg_windows_s)) * 1_000_000

    for a, b in zip(starts, ends):
        cid = conv[a]
        st = ConvState(cfg)
        st.rn_next = int(b - a)
        st.last_ts_us = int(ts_us[b - 1])
        lo = max(a, b - keep)
        st.tail_dt_us = dt_us[lo:b].copy()
        st.tail_is_tool = is_tool[lo:b].copy()
        st.tail_role_change = role_change[lo:b].copy()
        st.tail_text_len = text_len[lo:b].copy()
        for span in cfg.ema_spans:
            st.ema[span] = float(out[f"lat_ema_{span}"].iloc[b - 1])
        st.macd_signal = float(out["macd_signal"].iloc[b - 1])
        st.run_len = int(trail_run[b - 1])
        st.session_id = int(out["session_id"].iloc[b - 1])
        st.session_rows = int(out["session_turn"].iloc[b - 1])
        st.last_role = roles[b - 1]
        tw_lo = a + int(np.searchsorted(ts_us[a:b], ts_us[b - 1] - max_p_us, side="right"))
        st.tail_tw_ts_us = ts_us[tw_lo:b].copy()
        st.tail_tw_text_len = text_len[tw_lo:b].copy()
        for p_s in cfg.agg_windows_s:
            p = np.int64(p_s) * 1_000_000
            ws = WindowState()
            # latest completed window = the last row's as-of columns
            ws.last_w_end = int(out[f"w{p_s}_w_end_us"].iloc[b - 1])
            ws.last_turns = int(out[f"w{p_s}_turns"].iloc[b - 1])
            ws.last_tool_turns = int(out[f"w{p_s}_tool_turns"].iloc[b - 1])
            ws.last_text_chars = int(out[f"w{p_s}_text_chars"].iloc[b - 1])
            # dt_mean was dt_sum/(turns*1e6); the integer sum round-trips
            ws.last_dt_sum_us = int(
                round(out[f"w{p_s}_dt_mean"].iloc[b - 1] * ws.last_turns * 1e6)
            )
            # current partial window = rows in [floor(last_ts/p)*p, last_ts]
            w_start = (ts_us[b - 1] // p) * p
            plo = a + int(np.searchsorted(ts_us[a:b], w_start, side="left"))
            ws.w_end = int(w_start + p)
            ws.turns = int(b - plo)
            ws.tool_turns = int(is_tool[plo:b].sum())
            ws.text_chars = int(text_len[plo:b].sum())
            ws.dt_sum_us = int(dt_us[plo:b].sum())
            st.windows[p_s] = ws
        kern.state[cid] = st
    return kern


def snapshot_states(kernel: StreamingTurnKernel) -> "pa.Table":
    """Serialize all per-conversation state to an Arrow table — the
    checkpoint that makes incremental append EXACT (not warm-start
    approximate like the reference's lookback re-read,
    step2_resample.py:370-397)."""
    import pyarrow as pa

    cfg = kernel.cfg
    rows: dict[str, list] = {
        "conv_id": [], "rn_next": [], "last_ts_us": [], "run_len": [],
        "session_id": [], "session_rows": [], "last_role": [],
        "tail_dt_us": [], "tail_is_tool": [], "tail_role_change": [],
        "tail_text_len": [], "tail_tw_ts_us": [], "tail_tw_text_len": [],
    }
    for span in cfg.ema_spans:
        rows[f"ema_{span}"] = []
    rows["macd_signal"] = []
    wfields = (
        "w_end", "turns", "tool_turns", "text_chars", "dt_sum_us",
        "last_w_end", "last_turns", "last_tool_turns", "last_text_chars",
        "last_dt_sum_us",
    )
    for p in cfg.agg_windows_s:
        for f in wfields:
            rows[f"w{p}_{f}"] = []
    for cid, st in kernel.state.items():
        rows["conv_id"].append(cid)
        rows["rn_next"].append(st.rn_next)
        rows["last_ts_us"].append(st.last_ts_us)
        rows["run_len"].append(st.run_len)
        rows["session_id"].append(st.session_id)
        rows["session_rows"].append(st.session_rows)
        rows["last_role"].append(st.last_role)
        rows["tail_dt_us"].append(st.tail_dt_us.tolist())
        rows["tail_is_tool"].append(st.tail_is_tool.tolist())
        rows["tail_role_change"].append(st.tail_role_change.tolist())
        rows["tail_text_len"].append(st.tail_text_len.tolist())
        rows["tail_tw_ts_us"].append(st.tail_tw_ts_us.tolist())
        rows["tail_tw_text_len"].append(st.tail_tw_text_len.tolist())
        for span in cfg.ema_spans:
            rows[f"ema_{span}"].append(st.ema.get(span))
        rows["macd_signal"].append(st.macd_signal)
        for p in cfg.agg_windows_s:
            ws = st.windows.get(p, WindowState())
            for f in wfields:
                rows[f"w{p}_{f}"].append(getattr(ws, f))
    return pa.table(rows)


def restore_states(kernel: StreamingTurnKernel, table: "pa.Table") -> None:
    cfg = kernel.cfg
    d = table.to_pydict()
    wfields = (
        "w_end", "turns", "tool_turns", "text_chars", "dt_sum_us",
        "last_w_end", "last_turns", "last_tool_turns", "last_text_chars",
        "last_dt_sum_us",
    )
    for i, cid in enumerate(d["conv_id"]):
        st = ConvState(cfg)
        st.rn_next = d["rn_next"][i]
        st.last_ts_us = d["last_ts_us"][i]
        st.run_len = d["run_len"][i]
        st.session_id = d["session_id"][i]
        st.session_rows = d["session_rows"][i]
        st.last_role = d["last_role"][i]
        st.tail_dt_us = np.asarray(d["tail_dt_us"][i], dtype=np.int64)
        st.tail_is_tool = np.asarray(d["tail_is_tool"][i], dtype=np.int64)
        st.tail_role_change = np.asarray(d["tail_role_change"][i], dtype=np.int64)
        st.tail_text_len = np.asarray(d["tail_text_len"][i], dtype=np.int64)
        st.tail_tw_ts_us = np.asarray(d["tail_tw_ts_us"][i], dtype=np.int64)
        st.tail_tw_text_len = np.asarray(d["tail_tw_text_len"][i], dtype=np.int64)
        for span in cfg.ema_spans:
            v = d[f"ema_{span}"][i]
            if v is not None:
                st.ema[span] = v
        st.macd_signal = d.get("macd_signal", [None] * len(d["conv_id"]))[i]
        for p in cfg.agg_windows_s:
            ws = WindowState()
            for f in wfields:
                setattr(ws, f, d[f"w{p}_{f}"][i])
            st.windows[p] = ws
        kernel.state[cid] = st

