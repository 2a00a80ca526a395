"""Per-bucket turn-level feature kernels (the computational core).

Transposes the reference's rolling-indicator battery (SURVEY.md §2.3) to the
transcript domain, vectorized ACROSS conversations inside one hash bucket:

    W10 log return        -> inter-turn latency dt_secs
    W7/W8 rolling mean    -> lat_sma_{w} (integer-exact cumsum windows)
    W7 rolling std        -> lat_std_{w}
    W12 EMA register      -> lat_ema_{s} (recursive, adjust=False)
    W3/W5 momentum        -> lat_lag_{k} / lat_delta_{k} / lat_lead_{k}
    W6 percentile rank    -> lat_rank_{w} (clip [0.01, 0.99])
    W11 persistence event -> gap_event (dt > thr for >= n consecutive turns)
    M8 grid fill          -> gap-based sessionize (session_id, session_turn)
    M9 date parts         -> hour / isodow (+ sin/cos encodings)
    M4 dedup keep-last    -> per (conv_id, turn_idx), keep max-ts row

Numerical-parity discipline: every column the DuckDB oracle checks is derived
from int64 sums (exact in int64 / representable in float64) followed by the
SAME float expression the SQL uses, so engine and oracle agree bitwise — no
tolerance fudging. EMA and percentile-rank are not expressible in ANSI window
SQL; they are gated by pytest allclose against a straight-line per-turn
oracle instead (FIXTURES.md invariant 2).

All kernels assume canonical per-partition ordering (sort_partition) and are
O(N) numpy passes — no Python loop over rows, no loop over conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
from quant_feature_pipeline_ray.stages.partition import assert_watermark, sort_partition


def dedup_keep_last(df: pd.DataFrame) -> pd.DataFrame:
    """Exact dedup: keep the max-ts row per (conv_id, turn_idx).

    Reference: duplicate-timestamp dedup keep-last at every stage
    (tools/incremental.py:31-40, step2_resample.py:143). Input must be
    sort_partition()-ordered, so keep='last' is keep-max-ts.

    Determinism guard: duplicates with EQUAL ts but DIFFERENT text would
    make "keep last" depend on block arrival order (and diverge from any
    SQL oracle's arbitrary tie pick) — fail fast instead. Equal-ts dups
    with identical text are harmless: any pick yields identical output."""
    if len(df) > 1:
        eq_key = (
            (df["conv_id"].to_numpy()[:-1] == df["conv_id"].to_numpy()[1:])
            & (df["turn_idx"].to_numpy()[:-1] == df["turn_idx"].to_numpy()[1:])
            & (df["ts"].to_numpy()[:-1] == df["ts"].to_numpy()[1:])
        )
        if eq_key.any() and "text" in df.columns:
            t = df["text"].to_numpy()
            bad = np.flatnonzero(eq_key & (t[:-1] != t[1:]))
            if len(bad):
                raise ValueError(
                    f"{len(bad)} duplicate (conv_id, turn_idx) rows share a ts "
                    "but differ in payload — nondeterministic keep-last; "
                    "fix the upstream writer or add a tie-break column"
                )
    return df[~df.duplicated(["conv_id", "turn_idx"], keep="last")].reset_index(drop=True)


def _conv_segments(conv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(new_conv bool mask, 0-based row number within conversation)."""
    n = len(conv)
    new_conv = np.empty(n, dtype=bool)
    new_conv[0] = True
    np.not_equal(conv[1:], conv[:-1], out=new_conv[1:])
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(new_conv, idx, 0))
    return new_conv, idx - seg_start


def _windowed_sum_int(x: np.ndarray, rn: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact trailing-window sum over int64 `x` within conversation segments.

    Returns (window_sum int64, n_in_window int64) for window = last
    min(rn+1, w) rows. Uses per-conversation cumulative sums (int64-exact) +
    gather — the vectorized form of the reference's cumsum rolling kernels
    (step5_featueres_unified.py:157-196, 1010-1025)."""
    idx = np.arange(len(x), dtype=np.int64)
    cs = np.cumsum(x)  # global cumsum; differences below never cross segments
    n_in = np.minimum(rn + 1, w)
    prev = idx - n_in  # row *before* the window start (>= seg_start-1)
    sums = cs[idx] - np.where(prev >= 0, cs[np.maximum(prev, 0)], 0)
    return sums, n_in


def rolling_mean_std_int(
    dt_us: np.ndarray, rn: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Integer-exact rolling mean (seconds) and sample std over latency.

    THE shared kernel behind lat_sma_w / lat_std_w in every execution path
    (batch pandas, batch arrow, salted chunks, streaming) — one home so the
    bitwise SQL-parity expressions can never drift apart. Std is defined
    over centisecond-quantized latency so squares stay int64-exact."""
    s_us, n_in = _windowed_sum_int(dt_us, rn, w)
    sma = s_us / (n_in * 1e6)
    dt_cs = dt_us // 10_000
    # Exactness bound: the global cumsum may wrap (two's-complement), but
    # window DIFFERENCES stay exact as long as every true window sum of
    # squares fits int64, i.e. w * max(dt_cs)^2 < 2^63. A single gap over
    # ~2.1e9 cs (~240 days at w=20) breaks that silently — fail fast.
    if len(dt_cs):
        m = int(dt_cs.max())
        if w * m * m >= 2**63:
            raise ValueError(
                f"dt gap of {m} cs exceeds the int64-exact bound for the "
                f"rolling std window (w={w}); winsorize dt upstream"
            )
    s_cs, _ = _windowed_sum_int(dt_cs, rn, w)
    ssq_cs, _ = _windowed_sum_int(dt_cs * dt_cs, rn, w)
    nf = n_in.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        var_cs2 = (ssq_cs.astype(np.float64) - s_cs.astype(np.float64) ** 2 / nf) / (nf - 1)
        std = np.sqrt(np.maximum(var_cs2, 0.0)) / 100.0
    std[n_in < 2] = 0.0
    return sma, std


def _lag_within_conv(x: np.ndarray, rn: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """x shifted k rows back within each conversation; (values, valid_mask)."""
    idx = np.arange(len(x), dtype=np.int64)
    valid = rn >= k
    src = np.where(valid, idx - k, idx)
    return x[src], valid


def _lead_within_conv(
    x: np.ndarray, rn: np.ndarray, new_conv: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    n = len(x)
    idx = np.arange(n, dtype=np.int64)
    # rows remaining in the conversation after row i
    seg_len = np.zeros(n, dtype=np.int64)
    starts = np.flatnonzero(new_conv)
    ends = np.append(starts[1:], n)
    seg_len_per = ends - starts
    seg_len = np.repeat(seg_len_per, seg_len_per)
    valid = rn + k < seg_len
    src = np.where(valid, np.minimum(idx + k, n - 1), idx)
    return x[src], valid


def _run_length_event(mask: np.ndarray, conv_codes: np.ndarray, min_persist: int) -> np.ndarray:
    """W11 analogue: 1 when `mask` held for >= min_persist consecutive turns
    within a conversation (step5_featueres_unified.py:1027-1093). O(N)."""
    n = len(mask)
    idx = np.arange(n, dtype=np.int64)
    new_conv = np.empty(n, dtype=bool)
    new_conv[0] = True
    np.not_equal(conv_codes[1:], conv_codes[:-1], out=new_conv[1:])
    anchor = np.where((~mask) | new_conv, idx, 0)  # last row where the run broke
    anchor = np.maximum.accumulate(anchor)
    run_len = np.where(mask & ~new_conv, idx - anchor, 0)
    return (run_len >= min_persist).astype(np.int64)


def time_window_counts(
    ts_us: np.ndarray, new_conv: np.ndarray, window_s: int, weights: np.ndarray | None = None
) -> np.ndarray:
    """Trailing TIME-window aggregate (W2/W9 analogue): for each row, the
    count (or weighted sum) of rows of the same conversation with
    ts in (ts_i - p, ts_i] — a sliding window at event resolution, unlike
    the fixed [W-p, W) buckets. Causal (includes only the past + current).

    Vectorized per conversation segment via searchsorted on the sorted ts;
    integer arithmetic end-to-end → exact vs DuckDB's RANGE frame."""
    p = np.int64(window_s) * 1_000_000
    n = len(ts_us)
    out = np.empty(n, dtype=np.int64)
    w = weights if weights is not None else np.ones(n, dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(w)])
    starts = np.flatnonzero(new_conv)
    ends = np.append(starts[1:], n)
    idx = np.arange(n, dtype=np.int64)
    for a, b in zip(starts, ends):
        seg = ts_us[a:b]
        lo = a + np.searchsorted(seg, seg - p, side="right")
        out[a:b] = cs[idx[a:b] + 1] - cs[lo]
    return out


def sliding_minmax_from_bounds(
    x: np.ndarray, lo: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact min/max of x over the variable trailing windows [lo_i, i]
    (lo non-decreasing) via a sparse-table RMQ — O(n log W) pure-numpy
    integer ops, ~20-30x pandas' variable-window time rolling on this
    workload. Windows never cross conversations because the caller's lo
    is segment-clamped."""
    n = len(x)
    idx = np.arange(n, dtype=np.int64)
    length = idx - lo + 1
    maxlen = int(length.max()) if n else 1
    levels = max(1, maxlen.bit_length())
    st_min, st_max = [x], [x]
    size = 1
    for _ in range(1, levels):
        prev_n = len(st_min[-1])
        m = prev_n - size
        if m <= 0:
            break
        st_min.append(np.minimum(st_min[-1][:m], st_min[-1][size:]))
        st_max.append(np.maximum(st_max[-1][:m], st_max[-1][size:]))
        size *= 2
    k = np.int64(np.log2(length.astype(np.float64))).clip(0, len(st_min) - 1)
    mn = np.empty(n, dtype=x.dtype)
    mx = np.empty(n, dtype=x.dtype)
    for kk in range(len(st_min)):
        rows = np.flatnonzero(k == kk)
        if len(rows) == 0:
            continue
        p2 = 1 << kk
        a = lo[rows]
        b = rows - p2 + 1
        mn[rows] = np.minimum(st_min[kk][a], st_min[kk][b])
        mx[rows] = np.maximum(st_max[kk][a], st_max[kk][b])
    return mn, mx


def time_window_ohlc(
    ts_us: np.ndarray, new_conv: np.ndarray, window_s: int, x: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """W2 completion: (first, min, max) of `x` over the trailing
    (ts-p, ts] time window per conversation — the sliding o/h/l of the
    reference's rolling_preview_ohlcv (step2_resample.py:298-322)
    transposed to event resolution ('close' is x itself; emit separately).

    'first' is a searchsorted gather — rows are turn-ordered with ts
    monotone per conv, so the window's first row is its min-turn_idx row
    (deterministic even under equal-ts ties); min/max run through the
    integer sparse-table RMQ over the same window bounds."""
    p = np.int64(window_s) * 1_000_000
    n = len(ts_us)
    lo = np.empty(n, dtype=np.int64)
    starts = np.flatnonzero(new_conv)
    ends = np.append(starts[1:], n)
    for a, b in zip(starts, ends):
        seg = ts_us[a:b]
        lo[a:b] = a + np.searchsorted(seg, seg - p, side="right")
    first = x[lo]
    mn, mx = sliding_minmax_from_bounds(x, lo)
    return first, mn, mx


def compute_turn_features(
    df: pd.DataFrame, cfg: FeatureConfig = DEFAULT_CONFIG, leak_free_only: bool = False
) -> pd.DataFrame:
    """The per-bucket kernel chain: sort → dedup → sessionize → rolling stats.

    `df` is one hash bucket of raw transcript rows (many conversations).
    Output keeps the input per-turn columns (text passthrough for the
    text-equality invariant) plus the feature columns, ordered by
    (conv_id, turn_idx).
    """
    df = sort_partition(df)
    df = dedup_keep_last(df)
    n = len(df)
    if n == 0:
        return df

    conv = df["conv_id"].to_numpy()
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    new_conv, rn = _conv_segments(conv)
    assert_watermark(ts_us, new_conv)

    # --- inter-turn latency (W10 analogue; first turn of a conv = 0)
    dt_us = np.diff(ts_us, prepend=ts_us[:1])
    dt_us[new_conv] = 0
    dt_secs = dt_us / 1e6

    out = pd.DataFrame(
        {
            "conv_id": df["conv_id"].to_numpy(),
            "turn_idx": df["turn_idx"].to_numpy().astype(np.int32),
            "ts_us": ts_us,
            "role": df["role"].to_numpy(),
            "tool": df["tool"].to_numpy(),
            "text": df["text"].to_numpy(),
            "dt_secs": dt_secs,
        }
    )

    # --- sessionize (M8 analogue): new session when dt > gap threshold
    gap_us = np.int64(cfg.session_gap_s * 1e6)
    new_session = new_conv | (dt_us > gap_us)
    sid_global = np.cumsum(new_session.astype(np.int64))
    conv_first_sid = np.maximum.accumulate(np.where(new_conv, sid_global, 0))
    out["session_id"] = sid_global - conv_first_sid  # 0-based within conv
    idx = np.arange(n, dtype=np.int64)
    sess_start_idx = np.maximum.accumulate(np.where(new_session, idx, 0))
    out["session_turn"] = idx - sess_start_idx + 1  # 1-based within session
    out["is_session_start"] = new_session.astype(np.int64)
    out["cum_turns"] = rn + 1  # cumulative counter per conversation

    # --- scalar derivations
    text_len = df["text"].str.len().to_numpy().astype(np.int64)
    out["text_len"] = text_len
    is_tool = (df["tool"].to_numpy() != "").astype(np.int64)
    out["is_tool"] = is_tool
    role_arr = df["role"].to_numpy()
    prev_role, valid = _lag_within_conv(role_arr, rn, 1)
    out["role_change"] = ((role_arr != prev_role) & valid).astype(np.int64)

    # --- rolling mean / std over latency (integer-exact window sums)
    for w in cfg.sma_windows:
        out[f"lat_sma_{w}"], out[f"lat_std_{w}"] = rolling_mean_std_int(dt_us, rn, w)

    # --- rolling rates (mean of 0/1 — integer sums, exact)
    rw = cfg.rate_window
    s_tool, n_in = _windowed_sum_int(is_tool, rn, rw)
    out[f"tool_rate_{rw}"] = s_tool / n_in
    s_rc, _ = _windowed_sum_int(out["role_change"].to_numpy(), rn, rw)
    out[f"role_change_rate_{rw}"] = s_rc / n_in
    s_tl, _ = _windowed_sum_int(text_len, rn, rw)
    out[f"text_len_sma_{rw}"] = s_tl / n_in

    # --- lag / lead deltas (momentum analogue W3/W5)
    for k in cfg.lag_turns:
        lagv, valid = _lag_within_conv(dt_secs, rn, k)
        out[f"lat_lag_{k}"] = np.where(valid, lagv, 0.0)
        out[f"lat_delta_{k}"] = np.where(valid, dt_secs - lagv, 0.0)
    if not leak_free_only:
        for k in cfg.lead_turns:
            leadv, valid = _lead_within_conv(dt_secs, rn, new_conv, k)
            out[f"lat_lead_{k}"] = np.where(valid, leadv, 0.0)

    # --- run-length persistence event (W11 analogue)
    mask = dt_us > np.int64(cfg.gap_event_threshold_s * 1e6)
    out["gap_event"] = _run_length_event(mask, conv, cfg.gap_event_min_persist)

    # --- trailing TIME-window aggregates (W2/W9 analogue)
    for p_s in cfg.agg_windows_s:
        out[f"turns_roll_{p_s}s"] = time_window_counts(ts_us, new_conv, p_s)
        out[f"chars_roll_{p_s}s"] = time_window_counts(ts_us, new_conv, p_s, weights=text_len)
        f, mn, mx = time_window_ohlc(ts_us, new_conv, p_s, text_len)
        out[f"tlen_first_roll_{p_s}s"] = f
        out[f"tlen_min_roll_{p_s}s"] = mn
        out[f"tlen_max_roll_{p_s}s"] = mx
        out[f"tlen_last_roll_{p_s}s"] = text_len  # sliding 'close'

    # --- EMA registers (W12 EMA; recursive adjust=False) and percentile rank
    # (W6) — cython-grouped pandas; pytest-oracled, not SQL-expressible
    pdf = pd.DataFrame({"conv": conv, "dt": dt_secs})
    g = pdf.groupby("conv", sort=False)
    for span in cfg.ema_spans:
        alpha = 2.0 / (span + 1.0)
        out[f"lat_ema_{span}"] = (
            g["dt"].ewm(alpha=alpha, adjust=False).mean().to_numpy()
        )
    rk = (
        g["dt"]
        .rolling(cfg.rank_window, min_periods=1)
        .rank(method="average", pct=True)
        .to_numpy()
    )
    out[f"lat_rank_{cfg.rank_window}"] = np.clip(rk, cfg.rank_clip[0], cfg.rank_clip[1])

    # --- composite indicators (MACD diff / band-width fuse)
    for name, v in composite_features(conv, out, cfg).items():
        out[name] = v

    # --- time encodings (M9 / step5_featueres_unified.py:1095-1122)
    hour = (ts_us // 3_600_000_000) % 24
    # ISO dow: epoch 1970-01-01 was a Thursday (isodow=4)
    days = ts_us // 86_400_000_000
    isodow = (days + 3) % 7 + 1
    out["hour"] = hour
    out["isodow"] = isodow
    if not leak_free_only:
        out["hour_sin"] = np.sin(2 * np.pi * hour / 24.0)
        out["hour_cos"] = np.cos(2 * np.pi * hour / 24.0)
        out["dow_sin"] = np.sin(2 * np.pi * (isodow - 1) / 7.0)
        out["dow_cos"] = np.cos(2 * np.pi * (isodow - 1) / 7.0)
    return out


def composite_features(
    conv: np.ndarray, cols: dict | pd.DataFrame, cfg: FeatureConfig = DEFAULT_CONFIG
) -> dict[str, np.ndarray]:
    """MACD-style EMA-difference + Bollinger-width composites (W12
    composition; reference step5_featueres_unified.py:547-587, macd/bb
    params congfigs/base_indicators.yaml:1-52) over already-computed base
    columns. THE shared kernel for every execution path (pandas, arrow,
    salted full pass) so the compositions can never drift apart.

    `cols` must contain lat_ema_{fast}, lat_ema_{slow},
    lat_sma_{bw_window}, lat_std_{bw_window}; `conv` is the (sorted,
    conv-major) conversation key/codes array.

      macd        = ema_fast − ema_slow
      macd_signal = EMA(macd, macd_signal_span)   (recursive adjust=False)
      macd_hist   = macd − macd_signal
      band_width  = 4·std/sma  (== ((ma+2σ)−(ma−2σ))/ma), 0 when sma == 0
      bw_rank_fuse= mean of two rolling percentile ranks of band_width
                    (rank is invariant under the reference's log1p — a
                    strictly monotone map — so the log is omitted)

    band_width is one CASE + one IEEE division over already-SQL-pinned
    inputs → exact DuckDB oracle (t_composites); the EMA chain and the
    rank fuse are pytest-parity-gated (tests/test_composites.py)."""
    fast, slow = cfg.ema_spans[0], cfg.ema_spans[-1]
    macd = np.asarray(cols[f"lat_ema_{fast}"]) - np.asarray(cols[f"lat_ema_{slow}"])
    g = pd.DataFrame({"conv": conv, "m": macd}).groupby("conv", sort=False)
    alpha = 2.0 / (cfg.macd_signal_span + 1.0)
    signal = g["m"].ewm(alpha=alpha, adjust=False).mean().to_numpy()
    out: dict[str, np.ndarray] = {
        "macd": macd,
        "macd_signal": signal,
        "macd_hist": macd - signal,
    }

    w = cfg.bw_window
    sma = np.asarray(cols[f"lat_sma_{w}"])
    std = np.asarray(cols[f"lat_std_{w}"])
    with np.errstate(invalid="ignore", divide="ignore"):
        bw = np.where(sma > 0, 4.0 * std / sma, 0.0)
    out[f"band_width_{w}"] = bw
    bg = pd.DataFrame({"conv": conv, "b": bw}).groupby("conv", sort=False)
    ranks = []
    for rw in cfg.bw_rank_windows:
        rk = bg["b"].rolling(rw, min_periods=1).rank(method="average", pct=True).to_numpy()
        ranks.append(np.clip(rk, cfg.rank_clip[0], cfg.rank_clip[1]))
    out["bw_rank_fuse"] = 0.5 * (ranks[0] + ranks[1])
    return out


def rolling_cov_corr_int(
    dt_us: np.ndarray, y: np.ndarray, rn: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Integer-exact trailing-window covariance numerators + correlation
    between centisecond latency and an int64 companion series (W12-family
    pair statistics; reference's rolling corr indicators live in the same
    cumsum battery, step5_featueres_unified.py:157-196).

    Emits the EXACT integer numerators
        cov_num  = n·Σxy − Σx·Σy
        varx_num = n·Σx² − (Σx)²      (x = dt_us // 10⁴, centiseconds)
        vary_num = n·Σy² − (Σy)²
    and corr = cov_num / sqrt(float(varx_num) · float(vary_num)) — every
    float op is a correctly-rounded IEEE primitive on exactly-equal
    integers, so a SQL window-frame oracle matches bitwise.

    Exactness bound: every product the numerators touch is ≤ w²·max(x)²,
    so require w²·max(dt_cs)² < 2^63 (a ~17-day in-conversation gap at
    w=20) and w²·max(y)² < 2^63 — fail fast like rolling_mean_std_int."""
    x = dt_us // 10_000
    for name, arr in (("dt_cs", x), ("y", y)):
        if len(arr):
            m = int(np.abs(arr).max())
            if w * w * m * m >= 2**63:
                raise ValueError(
                    f"rolling_cov_corr_int: {name} magnitude {m} exceeds the "
                    f"int64-exact bound for w={w}; winsorize upstream"
                )
    sx, n_in = _windowed_sum_int(x, rn, w)
    sy, _ = _windowed_sum_int(y, rn, w)
    sxx, _ = _windowed_sum_int(x * x, rn, w)
    syy, _ = _windowed_sum_int(y * y, rn, w)
    sxy, _ = _windowed_sum_int(x * y, rn, w)
    cov_num = n_in * sxy - sx * sy
    varx_num = n_in * sxx - sx * sx
    vary_num = n_in * syy - sy * sy
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = cov_num / np.sqrt(varx_num.astype(np.float64) * vary_num.astype(np.float64))
    corr = np.where((n_in >= 2) & (varx_num > 0) & (vary_num > 0), corr, np.nan)
    return cov_num, varx_num, vary_num, corr
