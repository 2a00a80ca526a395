"""Arrow-native per-bucket kernel — the flagship's hot path.

Produces BITWISE-identical output to the pandas path
(stages/turn_features.compute_turn_features + window_agg + asof fused), but:

  * string columns (conv_id, role, tool, text) never materialize as Python
    objects — they ride through as zero-copy Arrow arrays and are gathered
    once per sort/filter. Pandas object blocks would be pickled in/out of
    the object store (the measured dominant cost at sf0.3);
  * conversations are dictionary-encoded to int32 codes; every kernel runs
    on numpy views over Arrow buffers;
  * the (conv, window) aggregation exploits that rows are sorted by
    (conv, turn_idx) with ts monotone per conv → groups are CONTIGUOUS runs
    → np.add.reduceat, no hash groupby;
  * the as-of merge is a per-conversation searchsorted over the contiguous
    window runs (the "sorted merge with a monotonic cursor" of SURVEY.md
    J1), not a pandas merge_asof over object keys.

tests/test_arrow_parity.py pins arrow-path == pandas-path bitwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
from quant_feature_pipeline_ray.stages.turn_features import (
    _conv_segments,
    _lag_within_conv,
    _lead_within_conv,
    _run_length_event,
    _windowed_sum_int,
    rolling_mean_std_int,
)


def _chunk0(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # pyarrow version-dependent
            return col.chunk(0) if col.num_chunks else pa.array([], type=col.type)
    return col


def _sorted_dedup(tbl: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """Canonical sort + dedup keep-last-by-ts; returns (table, conv_codes)."""
    idx = pc.sort_indices(
        tbl,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")],
    )
    tbl = tbl.take(idx).combine_chunks()
    conv_dict = pc.dictionary_encode(_chunk0(tbl["conv_id"]))
    codes = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = tbl["turn_idx"].to_numpy(zero_copy_only=False)
    n = len(codes)
    keep = np.empty(n, dtype=bool)
    keep[-1:] = True
    keep[:-1] = (codes[:-1] != codes[1:]) | (turn[:-1] != turn[1:])
    if not keep.all():
        # determinism guard (mirrors dedup_keep_last): equal-ts duplicates
        # must carry identical payloads, else keep-last is arrival-order-
        # dependent — fail fast
        ts = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eq_key = ~keep[:-1] & (ts[:-1] == ts[1:])
        if eq_key.any() and "text" in tbl.column_names:
            pos = np.flatnonzero(eq_key)
            t_a = tbl["text"].take(pa.array(pos))
            t_b = tbl["text"].take(pa.array(pos + 1))
            if not pc.all(pc.equal(t_a, t_b)).as_py():
                raise ValueError(
                    "duplicate (conv_id, turn_idx) rows share a ts but differ "
                    "in payload — nondeterministic keep-last"
                )
        mask = pa.array(keep)
        tbl = tbl.filter(mask).combine_chunks()
        codes = codes[keep]
    return tbl, codes


def featurize_bucket_arrow(tbl: pa.Table, cfg: FeatureConfig = DEFAULT_CONFIG) -> pa.Table:
    if tbl.num_rows == 0:
        return _empty_table(cfg)
    tbl, conv = _sorted_dedup(tbl)
    n = tbl.num_rows

    ts_us = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    new_conv, rn = _conv_segments(conv)
    bad = (~new_conv) & (np.diff(ts_us, prepend=ts_us[:1]) < 0)
    if bad.any():
        raise AssertionError("temporal watermark violated — ordering lost upstream")

    dt_us = np.diff(ts_us, prepend=ts_us[:1])
    dt_us[new_conv] = 0
    dt_secs = dt_us / 1e6

    has_text = "text" in tbl.column_names
    cols: dict[str, object] = {
        "conv_id": tbl["conv_id"],
        "turn_idx": tbl["turn_idx"],
        "ts_us": ts_us,
        "role": tbl["role"],
        "tool": tbl["tool"],
        "dt_secs": dt_secs,
    }
    if has_text:
        # without text (blob-exchange light rows), the caller reattaches
        # the column at this position after the kernel
        cols = {**dict(list(cols.items())[:5]), "text": tbl["text"], "dt_secs": dt_secs}

    # sessionize
    gap_us = np.int64(cfg.session_gap_s * 1e6)
    new_session = new_conv | (dt_us > gap_us)
    sid_global = np.cumsum(new_session.astype(np.int64))
    conv_first_sid = np.maximum.accumulate(np.where(new_conv, sid_global, 0))
    cols["session_id"] = sid_global - conv_first_sid
    idx = np.arange(n, dtype=np.int64)
    sess_start_idx = np.maximum.accumulate(np.where(new_session, idx, 0))
    cols["session_turn"] = idx - sess_start_idx + 1
    cols["is_session_start"] = new_session.astype(np.int64)
    cols["cum_turns"] = rn + 1

    # scalar derivations — arrow kernels, no Python strings
    if has_text:
        text_len = pc.utf8_length(tbl["text"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
    else:  # derived pre-shuffle by the blob exchange's pack stage
        text_len = tbl["text_len"].to_numpy(zero_copy_only=False)
    cols["text_len"] = text_len
    is_tool = pc.not_equal(tbl["tool"], "").to_numpy(zero_copy_only=False).astype(np.int64)
    cols["is_tool"] = is_tool
    role_codes = (
        pc.dictionary_encode(_chunk0(tbl["role"]))
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    prev_role, valid = _lag_within_conv(role_codes, rn, 1)
    role_change = ((role_codes != prev_role) & valid).astype(np.int64)
    cols["role_change"] = role_change

    # rolling mean/std (integer-exact — the one shared kernel)
    for w in cfg.sma_windows:
        cols[f"lat_sma_{w}"], cols[f"lat_std_{w}"] = rolling_mean_std_int(dt_us, rn, w)

    rw = cfg.rate_window
    s_tool, n_in = _windowed_sum_int(is_tool, rn, rw)
    cols[f"tool_rate_{rw}"] = s_tool / n_in
    s_rc, _ = _windowed_sum_int(role_change, rn, rw)
    cols[f"role_change_rate_{rw}"] = s_rc / n_in
    s_tl, _ = _windowed_sum_int(text_len, rn, rw)
    cols[f"text_len_sma_{rw}"] = s_tl / n_in

    for k in cfg.lag_turns:
        lagv, valid = _lag_within_conv(dt_secs, rn, k)
        cols[f"lat_lag_{k}"] = np.where(valid, lagv, 0.0)
        cols[f"lat_delta_{k}"] = np.where(valid, dt_secs - lagv, 0.0)
    for k in cfg.lead_turns:
        leadv, valid = _lead_within_conv(dt_secs, rn, new_conv, k)
        cols[f"lat_lead_{k}"] = np.where(valid, leadv, 0.0)

    mask = dt_us > np.int64(cfg.gap_event_threshold_s * 1e6)
    cols["gap_event"] = _run_length_event(mask, conv, cfg.gap_event_min_persist)

    # trailing TIME-window aggregates (W2/W9 analogue)
    from quant_feature_pipeline_ray.stages.turn_features import (
        time_window_counts,
        time_window_ohlc,
    )

    for p_s in cfg.agg_windows_s:
        cols[f"turns_roll_{p_s}s"] = time_window_counts(ts_us, new_conv, p_s)
        cols[f"chars_roll_{p_s}s"] = time_window_counts(ts_us, new_conv, p_s, weights=text_len)
        f, mn, mx = time_window_ohlc(ts_us, new_conv, p_s, text_len)
        cols[f"tlen_first_roll_{p_s}s"] = f
        cols[f"tlen_min_roll_{p_s}s"] = mn
        cols[f"tlen_max_roll_{p_s}s"] = mx
        cols[f"tlen_last_roll_{p_s}s"] = text_len

    # EMA + rolling rank — cython-grouped pandas over NUMERIC columns only
    import pandas as pd

    pdf = pd.DataFrame({"conv": conv, "dt": dt_secs})
    g = pdf.groupby("conv", sort=False)
    for span in cfg.ema_spans:
        alpha = 2.0 / (span + 1.0)
        cols[f"lat_ema_{span}"] = g["dt"].ewm(alpha=alpha, adjust=False).mean().to_numpy()
    rk = g["dt"].rolling(cfg.rank_window, min_periods=1).rank(method="average", pct=True).to_numpy()
    cols[f"lat_rank_{cfg.rank_window}"] = np.clip(rk, cfg.rank_clip[0], cfg.rank_clip[1])

    # composite indicators (MACD diff / band-width fuse) — shared kernel
    from quant_feature_pipeline_ray.stages.turn_features import composite_features

    for name, v in composite_features(conv, cols, cfg).items():
        cols[name] = v

    # time encodings
    hour = (ts_us // 3_600_000_000) % 24
    days = ts_us // 86_400_000_000
    isodow = (days + 3) % 7 + 1
    cols["hour"] = hour
    cols["isodow"] = isodow
    cols["hour_sin"] = np.sin(2 * np.pi * hour / 24.0)
    cols["hour_cos"] = np.cos(2 * np.pi * hour / 24.0)
    cols["dow_sin"] = np.sin(2 * np.pi * (isodow - 1) / 7.0)
    cols["dow_cos"] = np.cos(2 * np.pi * (isodow - 1) / 7.0)

    # leak-free window aggregates + as-of merge, contiguous-run reduceat
    for p_s in cfg.agg_windows_s:
        p = np.int64(p_s) * 1_000_000
        w_end = (ts_us // p + 1) * p
        # group boundaries: (conv, w_end) change — contiguous because rows
        # are conv-major and ts (hence w_end) is monotone within conv
        gb = np.empty(n, dtype=bool)
        gb[0] = True
        gb[1:] = (conv[1:] != conv[:-1]) | (w_end[1:] != w_end[:-1])
        starts = np.flatnonzero(gb)
        g_conv = conv[starts]
        g_end = w_end[starts]
        g_turns = np.diff(np.append(starts, n))
        g_tool = np.add.reduceat(is_tool, starts)
        g_chars = np.add.reduceat(text_len, starts)
        g_dtsum = np.add.reduceat(dt_us, starts)
        g_dt_mean = g_dtsum / (g_turns * 1e6)

        # as-of: latest window (same conv) with w_end <= ts. Window ends
        # are STRICTLY increasing per conv and every row's ts sits inside
        # its own (last) window, so the rightmost qualifying group is
        # always the row's own group minus one — provided that neighbor
        # belongs to the same conversation. O(n), no per-conv loop.
        own = np.cumsum(gb.astype(np.int64)) - 1
        conv_first_group = np.maximum.accumulate(np.where(new_conv, own, 0))
        j = own - 1
        hit = own > conv_first_group
        jj = np.maximum(j, 0)
        pre = f"w{p_s}_"
        cols[pre + "w_end_us"] = np.where(hit, g_end[jj], 0)
        cols[pre + "turns"] = np.where(hit, g_turns[jj], 0).astype(np.int64)
        cols[pre + "tool_turns"] = np.where(hit, g_tool[jj], 0).astype(np.int64)
        cols[pre + "text_chars"] = np.where(hit, g_chars[jj], 0).astype(np.int64)
        cols[pre + "dt_mean"] = np.where(hit, g_dt_mean[jj], 0.0)

    arrays, names = [], []
    for name, v in cols.items():
        names.append(name)
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            arrays.append(v)
        else:
            arrays.append(pa.array(v))
    return pa.Table.from_arrays(arrays, names=names)


def _empty_table(cfg: FeatureConfig) -> pa.Table:
    probe = pa.table(
        {
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["x"], pa.string()),
            "tool": pa.array([""], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    return featurize_bucket_arrow(probe, cfg).slice(0, 0)
