"""DuckDB oracle SQL for the transcript feature kernels.

Each SQL string reproduces an engine operator over the SAME transcript
parquet file (fixtures.ensure_transcripts), written so the float arithmetic
is bitwise-identical to the numpy kernels: every rolling statistic is an
integer window sum (exact in both engines) followed by the same IEEE double
expression. EMA and percentile-rank are not expressible in ANSI window SQL
and are oracled by pytest instead (tests/test_kernels.py).

The CTE `t` is the shared turn-level base: dedup keep-last, per-conversation
ordering by turn_idx, integer dt_us.
"""

from __future__ import annotations

from quant_feature_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig


def base_cte(
    path: str, cfg: FeatureConfig = DEFAULT_CONFIG, *, with_text: bool = False
) -> str:
    """`with_text=False` (default) computes `text_len` before the dedup and
    drops the raw `text` column so DuckDB never carries document bytes
    through the three window passes — ~3x faster on every oracle that only
    needs lengths. Oracles that emit or regex the text itself pass
    `with_text=True`; the keep-last dedup semantics are identical either
    way (same partition/order keys)."""
    import os

    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    gap_us = int(cfg.session_gap_s * 1e6)
    text_raw = "text, " if with_text else ""
    text_t0 = "text, " if with_text else ""
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx, role, {text_raw}length(text) AS text_len, tool, ts
  FROM read_parquet('{path}')
  QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ts DESC) = 1
), t0 AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us, role, tool, {text_t0}
         text_len,
         CAST(CASE WHEN tool <> '' THEN 1 ELSE 0 END AS BIGINT) AS is_tool,
         COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS dt_us,
         CAST(CASE WHEN role <> lag(role) OVER w THEN 1 ELSE 0 END AS BIGINT) AS role_change,
         CAST(row_number() OVER w AS BIGINT) AS cum_turns
  FROM raw
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), t AS (
  SELECT * EXCLUDE (session_id_raw),
         CAST(session_id_raw AS BIGINT) AS session_id
  FROM (
    SELECT *,
           SUM(CASE WHEN dt_us > {gap_us} THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx) AS session_id_raw
    FROM t0
  )
)"""


def sql_turn_base(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """dedup + latency + sessionize + cumulative counters (M4/M8/W10)."""
    return base_cte(path, cfg, with_text=True) + """
SELECT conv_id, turn_idx, ts_us, role, tool, text, text_len, is_tool,
       role_change, cum_turns, dt_us / 1000000.0 AS dt_secs, session_id,
       CAST(row_number() OVER (PARTITION BY conv_id, session_id ORDER BY turn_idx) AS BIGINT) AS session_turn
FROM t
ORDER BY conv_id, turn_idx"""


def sql_rolling(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """rolling mean/std + rates + lag/lead/delta + persistence event."""
    parts = ["conv_id", "turn_idx", "ts_us", "dt_us / 1000000.0 AS dt_secs"]
    for w in cfg.sma_windows:
        win = f"(PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
        parts.append(
            f"SUM(dt_us) OVER {win} / (COUNT(*) OVER {win} * 1000000.0) AS lat_sma_{w}"
        )
        parts.append(
            f"""CASE WHEN COUNT(*) OVER {win} < 2 THEN 0.0 ELSE
            sqrt(greatest((CAST(SUM((dt_us // 10000) * (dt_us // 10000)) OVER {win} AS DOUBLE)
              - CAST(SUM(dt_us // 10000) OVER {win} AS DOUBLE) * CAST(SUM(dt_us // 10000) OVER {win} AS DOUBLE)
                / CAST(COUNT(*) OVER {win} AS DOUBLE))
              / (CAST(COUNT(*) OVER {win} AS DOUBLE) - 1), 0.0)) / 100.0 END AS lat_std_{w}"""
        )
    rw = cfg.rate_window
    win = f"(PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN {rw - 1} PRECEDING AND CURRENT ROW)"
    parts.append(f"SUM(is_tool) OVER {win} / COUNT(*) OVER {win} AS tool_rate_{rw}")
    parts.append(f"SUM(role_change) OVER {win} / COUNT(*) OVER {win} AS role_change_rate_{rw}")
    parts.append(f"SUM(text_len) OVER {win} / COUNT(*) OVER {win} AS text_len_sma_{rw}")
    wc = "(PARTITION BY conv_id ORDER BY turn_idx)"
    for k in cfg.lag_turns:
        parts.append(f"COALESCE(lag(dt_us, {k}) OVER {wc} / 1000000.0, 0.0) AS lat_lag_{k}")
        parts.append(
            f"CASE WHEN lag(dt_us, {k}) OVER {wc} IS NULL THEN 0.0 "
            f"ELSE dt_us / 1000000.0 - lag(dt_us, {k}) OVER {wc} / 1000000.0 END AS lat_delta_{k}"
        )
    for k in cfg.lead_turns:
        parts.append(f"COALESCE(lead(dt_us, {k}) OVER {wc} / 1000000.0, 0.0) AS lat_lead_{k}")
    thr = int(cfg.gap_event_threshold_s * 1e6)
    return (
        base_cte(path, cfg)
        + ", runs AS (SELECT *, SUM(CASE WHEN dt_us <= "
        + str(thr)
        + " THEN 1 ELSE 0 END) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS _grp FROM t)\n"
        + "SELECT "
        + ",\n       ".join(parts)
        + f""",
       CAST(CASE WHEN dt_us > {thr}
              AND row_number() OVER (PARTITION BY conv_id, _grp ORDER BY turn_idx) - 1
                  >= {cfg.gap_event_min_persist}
            THEN 1 ELSE 0 END AS BIGINT) AS gap_event
FROM runs
ORDER BY conv_id, turn_idx"""
    )


def sql_composites(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Band-width composite (reference bb_width,
    step5_featueres_unified.py:547-587): the SQL-expressible member of the
    composite family — 4·std/sma over the SAME integer-window expressions
    the t_rolling oracle pins, then one CASE + one IEEE division (exact).
    The macd EMA chain and the rank fuse are pytest-parity-gated instead
    (tests/test_composites.py)."""
    w = cfg.bw_window
    win = (
        f"(PARTITION BY conv_id ORDER BY turn_idx "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    sma = f"(SUM(dt_us) OVER {win} / (COUNT(*) OVER {win} * 1000000.0))"
    std = f"""(CASE WHEN COUNT(*) OVER {win} < 2 THEN 0.0 ELSE
        sqrt(greatest((CAST(SUM((dt_us // 10000) * (dt_us // 10000)) OVER {win} AS DOUBLE)
          - CAST(SUM(dt_us // 10000) OVER {win} AS DOUBLE) * CAST(SUM(dt_us // 10000) OVER {win} AS DOUBLE)
            / CAST(COUNT(*) OVER {win} AS DOUBLE))
          / (CAST(COUNT(*) OVER {win} AS DOUBLE) - 1), 0.0)) / 100.0 END)"""
    return base_cte(path, cfg) + f"""
, s AS (
  SELECT conv_id, turn_idx, ts_us, {sma} AS sma, {std} AS std
  FROM t
)
SELECT conv_id, turn_idx, ts_us,
       CASE WHEN sma > 0 THEN 4.0 * std / sma ELSE 0.0 END AS band_width_{w}
FROM s ORDER BY conv_id, turn_idx"""


def sql_window_agg(path: str, window_s: int, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """W1 analogue: leak-free [W-p, W) per-(conv, window) aggregates."""
    p = window_s * 1_000_000
    return base_cte(path, cfg) + f"""
SELECT conv_id,
       ((ts_us // {p}) + 1) * {p} AS w_end_us,
       CAST(COUNT(*) AS BIGINT) AS turns,
       CAST(SUM(is_tool) AS BIGINT) AS tool_turns,
       CAST(SUM(text_len) AS BIGINT) AS text_chars,
       CAST(SUM(dt_us) AS BIGINT) AS dt_sum_us,
       CAST(MIN(turn_idx) AS BIGINT) AS first_turn,
       CAST(MAX(turn_idx) AS BIGINT) AS last_turn,
       SUM(dt_us) / (COUNT(*) * 1000000.0) AS dt_mean
FROM t
GROUP BY conv_id, ((ts_us // {p}) + 1) * {p}
ORDER BY conv_id, w_end_us"""


def sql_time_windows(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Oracle for the trailing TIME-window aggregates — DuckDB RANGE frame
    over integer microseconds: RANGE (p-1) PRECEDING ⟺ ts > ts_i - p."""
    parts, windows = [], []
    for p_s in cfg.agg_windows_s:
        p_us = p_s * 1_000_000
        wname = f"tw{p_s}"
        windows.append(
            f"{wname} AS (PARTITION BY conv_id ORDER BY ts_us "
            f"RANGE BETWEEN {p_us - 1} PRECEDING AND CURRENT ROW)"
        )
        parts.append(f"CAST(COUNT(*) OVER {wname} AS BIGINT) AS turns_roll_{p_s}s")
        parts.append(f"CAST(SUM(text_len) OVER {wname} AS BIGINT) AS chars_roll_{p_s}s")
        # sliding first/min/max/last (W2 completion): first = the window's
        # min-turn_idx row (ts is monotone per conv ⇒ deterministic under
        # equal-ts ties, matching the engine's searchsorted gather)
        parts.append(
            f"CAST(arg_min(text_len, turn_idx) OVER {wname} AS BIGINT) AS tlen_first_roll_{p_s}s"
        )
        parts.append(f"CAST(MIN(text_len) OVER {wname} AS BIGINT) AS tlen_min_roll_{p_s}s")
        parts.append(f"CAST(MAX(text_len) OVER {wname} AS BIGINT) AS tlen_max_roll_{p_s}s")
        parts.append(f"CAST(text_len AS BIGINT) AS tlen_last_roll_{p_s}s")
    return (
        base_cte(path, cfg)
        + "\nSELECT conv_id, turn_idx, ts_us, "
        + ",\n       ".join(parts)
        + "\nFROM t WINDOW "
        + ", ".join(windows)
        + "\nORDER BY conv_id, turn_idx"
    )


def sql_continuity(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Per-conversation continuity metrics (M11/A5 analogue: max gap,
    turn count, span — run1_step1_data.py:30-46)."""
    return base_cte(path, cfg) + """
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS turns,
       CAST(MAX(dt_us) AS BIGINT) AS max_gap_us,
       CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS span_us,
       CAST(SUM(CASE WHEN dt_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions_minus_1
FROM t GROUP BY conv_id ORDER BY conv_id"""


def sql_role_counts(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Value-counts distribution (A3 analogue: np.unique + balance check,
    step5_featueres_unified.py:292-313)."""
    return base_cte(path, cfg) + """
SELECT role, CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY role ORDER BY role"""


def sql_loop_detect(
    path: str, cfg: FeatureConfig = DEFAULT_CONFIG, min_run: int = 3
) -> str:
    """Stuck-agent loop detection: gaps-and-islands run-length encoding of
    the (role, tool) step sequence; a loop is a run of >= min_run equal
    steps. Exact: run ids are integer cumsums, loop_frac is one IEEE
    int/int divide on both sides."""
    return base_cte(path, cfg) + f""",
s AS (
  SELECT conv_id, turn_idx, role || '|' || tool AS step FROM t
), flags AS (
  SELECT conv_id, turn_idx,
         CASE WHEN step = lag(step)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx)
              THEN 0 ELSE 1 END AS new_run
  FROM s
), r AS (
  SELECT conv_id,
         SUM(new_run) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM flags
), rl AS (
  SELECT conv_id, run_id, COUNT(*) AS rl FROM r GROUP BY conv_id, run_id
)
SELECT conv_id,
       CAST(SUM(rl) AS BIGINT) AS turns,
       CAST(MAX(rl) AS BIGINT) AS max_run,
       CAST(SUM(CASE WHEN rl >= {min_run} THEN 1 ELSE 0 END) AS BIGINT) AS n_loops,
       CAST(SUM(CASE WHEN rl >= {min_run} THEN rl ELSE 0 END) AS BIGINT) AS looped_turns,
       CAST(SUM(CASE WHEN rl >= {min_run} THEN rl ELSE 0 END) AS BIGINT)
         / CAST(SUM(rl) AS BIGINT) AS loop_frac
FROM rl GROUP BY conv_id ORDER BY conv_id"""


def sql_session_stats(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Per-session rollup (sessionize product table)."""
    return base_cte(path, cfg) + """
SELECT conv_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS turns,
       CAST(MIN(ts_us) AS BIGINT) AS start_us,
       CAST(MAX(ts_us) AS BIGINT) AS end_us,
       CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us,
       CAST(SUM(is_tool) AS BIGINT) AS tool_turns,
       CAST(SUM(text_len) AS BIGINT) AS text_chars
FROM t GROUP BY conv_id, session_id ORDER BY conv_id, session_id"""


def sql_conv_rollup(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Per-conversation feature vector (entity-level aggregate)."""
    return base_cte(path, cfg) + """
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS turns,
       CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
       CAST(SUM(is_tool) AS BIGINT) AS tool_turns,
       CAST(SUM(role_change) AS BIGINT) AS role_changes,
       CAST(SUM(text_len) AS BIGINT) AS text_chars,
       SUM(dt_us) / (COUNT(*) * 1000000.0) AS dt_mean,
       CAST(MAX(dt_us) AS BIGINT) AS max_gap_us,
       CAST(MIN(ts_us) AS BIGINT) AS first_ts_us,
       CAST(MAX(ts_us) AS BIGINT) AS last_ts_us
FROM t GROUP BY conv_id ORDER BY conv_id"""


def sql_events_window_agg(window_s: int = 3600) -> str:
    """Oracle for pipelines.events.events_window_agg (tables view: events)."""
    p = window_s * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events
)
SELECT user_id,
       (ts_us // {p} + 1) * {p} AS w_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       first(value ORDER BY ts_us) AS first_value,
       last(value ORDER BY ts_us) AS last_value,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(SUM(value_c) AS BIGINT) / 100.0 AS sum_value
FROM e
GROUP BY user_id, (ts_us // {p} + 1) * {p}
ORDER BY user_id, w_end_us"""


def sql_events_sessionize(gap_s: float = 1800.0) -> str:
    gap_us = int(gap_s * 1e6)
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS dt_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *,
         CAST(SUM(CASE WHEN dt_us > {gap_us} THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
  FROM e
)
SELECT event_id, user_id, ts_us, dt_us / 1000000.0 AS dt_secs, session_id,
       CAST(row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts_us, event_id) AS BIGINT) AS session_evt
FROM s
ORDER BY user_id, ts_us, event_id"""


def sql_events_asof_window(window_s: int = 3600) -> str:
    p = window_s * 1_000_000
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events
), w AS (
  SELECT user_id,
         (ts_us // {p} + 1) * {p} AS w_end_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(value_c) AS BIGINT) / 100.0 AS sum_value
  FROM e GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts_us,
       COALESCE(w.n_events, 0) AS w_n_events,
       COALESCE(w.sum_value, 0.0) AS w_sum_value,
       COALESCE(w.w_end_us, 0) AS w_w_end_us
FROM e ASOF LEFT JOIN w ON e.user_id = w.user_id AND e.ts_us >= w.w_end_us
ORDER BY e.event_id"""


def sql_asof_staleness(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """Leak-freedom + staleness audit over the J1 as-of join: per aggregate
    window, match rate, leak count (matched window ending after the turn —
    must be 0) and the staleness distribution in integer µs."""
    ctes = []
    for ws in cfg.agg_windows_s:
        p_us = ws * 1_000_000
        ctes.append(
            f"""w{ws} AS (
  SELECT conv_id, ((ts_us // {p_us}) + 1) * {p_us} AS w_end_us
  FROM t GROUP BY 1, 2
), j{ws} AS (
  SELECT t.ts_us, w{ws}.w_end_us
  FROM t ASOF LEFT JOIN w{ws}
    ON t.conv_id = w{ws}.conv_id AND t.ts_us >= w{ws}.w_end_us
), a{ws} AS (
  SELECT CAST({ws} AS BIGINT) AS window_s,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(w_end_us) AS BIGINT) AS n_matched,
         CAST(COALESCE(sum(CASE WHEN ts_us - w_end_us < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_leaks,
         CAST(COALESCE(min(ts_us - w_end_us), 0) AS BIGINT) AS stale_min_us,
         CAST(COALESCE(max(ts_us - w_end_us), 0) AS BIGINT) AS stale_max_us,
         CAST(COALESCE(sum(ts_us - w_end_us), 0) AS BIGINT) AS stale_sum_us
  FROM j{ws}
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM a{ws}" for ws in cfg.agg_windows_s)
    return (
        base_cte(path, cfg)
        + ", "
        + ", ".join(ctes)
        + f"""
SELECT window_s, n_turns, n_matched, n_leaks, stale_min_us, stale_max_us,
       n_matched / CAST(n_turns AS DOUBLE) AS match_rate,
       stale_sum_us / (GREATEST(n_matched, 1) * 1000000.0) AS stale_avg_s
FROM ({union})
ORDER BY window_s"""
    )


def sql_asof_features(path: str, cfg: FeatureConfig = DEFAULT_CONFIG) -> str:
    """J1 analogue: turns ASOF-joined to every agg window's features."""
    ctes, selects, joins = [], [], []
    for pnum, ws in enumerate(cfg.agg_windows_s):
        p = ws * 1_000_000
        ctes.append(
            f"""w{ws} AS (
  SELECT conv_id, ((ts_us // {p}) + 1) * {p} AS w_end_us,
         CAST(COUNT(*) AS BIGINT) AS turns,
         CAST(SUM(is_tool) AS BIGINT) AS tool_turns,
         CAST(SUM(text_len) AS BIGINT) AS text_chars,
         SUM(dt_us) / (COUNT(*) * 1000000.0) AS dt_mean
  FROM t GROUP BY 1, 2
)"""
        )
        selects += [
            f"COALESCE(w{ws}.w_end_us, 0) AS w{ws}_w_end_us",
            f"COALESCE(w{ws}.turns, 0) AS w{ws}_turns",
            f"COALESCE(w{ws}.tool_turns, 0) AS w{ws}_tool_turns",
            f"COALESCE(w{ws}.text_chars, 0) AS w{ws}_text_chars",
            f"COALESCE(w{ws}.dt_mean, 0.0) AS w{ws}_dt_mean",
        ]
        joins.append(
            f"ASOF LEFT JOIN w{ws} ON t.conv_id = w{ws}.conv_id AND t.ts_us >= w{ws}.w_end_us"
        )
    return (
        base_cte(path, cfg, with_text=True)
        + ", "
        + ", ".join(ctes)
        + "\nSELECT t.conv_id, t.turn_idx, t.ts_us, t.text, "
        + ",\n       ".join(selects)
        + "\nFROM t "
        + " ".join(joins)
        + "\nORDER BY t.conv_id, t.turn_idx"
    )
