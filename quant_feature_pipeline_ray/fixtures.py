"""Deterministic synthetic transcript generator (FIXTURES.md F1).

The reference ingests external exchange data (step1_data.py:426-668, CCXT
paginated fetcher); the graft has no network, so the primary input — a
multi-turn transcript Parquet table with columns

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

is synthesized deterministically (seed=42, pure numpy) at a scale derived
from the sf directory name. Properties exercised by tests:

  * rows are written SHUFFLED — engines must re-sort by (conv_id, turn_idx)
  * ~0.5% duplicate (conv_id, turn_idx) rows with strictly smaller ts and a
    ":stale" text suffix — dedup keep-last-by-ts must drop them
    (reference analogue: keep-last per timestamp, tools/incremental.py:31-40)
  * conv 0 is a "mega" conversation with ~100x the median turn count — skew
  * inter-turn latency ~ exponential(mean 30 s) with seeded >30 min session
    gaps — sessionize boundaries
  * text is a pure function of (conv_id, turn_idx) — per-turn text equality

Generation is identical for a given sf regardless of chunking (single numpy
pass), so the DuckDB oracle and the Ray pipeline read the same bytes.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, naive UTC
TOOLS = np.array(["search", "python", "browser", "calculator", "sql"])
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog while agent model tool call "
    "result stream token window feature pipeline shuffle partition state "
    "latency session turn reply question answer context memory plan".split()
)

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def sf_from_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' -> 0.01 (defaults to 0.01 if unparsable)."""
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.01


def n_convs_for_sf(sf: float) -> int:
    return max(20, int(round(200_000 * sf)))


def _texts(
    conv_strs: np.ndarray,
    conv_ids: np.ndarray,
    turn_idx: np.ndarray,
    stale: np.ndarray,
) -> np.ndarray:
    """text = f(conv_id, turn_idx): '{conv_id}:{turn_idx}:' + word blob whose
    length is a deterministic arithmetic function (no RNG → chunking-proof).

    The blob depends only on (start_word, n_words) — a tiny precomputed
    lookup table — so generation is vectorized fancy-indexing, not a per-row
    word join."""
    h = (turn_idx.astype(np.int64) * 2654435761 + conv_ids * 97) & 0x7FFFFFFF
    n_words = 1 + (h % 37) + np.where(h % 211 == 0, 300, 0)  # mostly short, a few ~2000 chars
    w0 = h % len(_WORDS)

    nw = len(_WORDS)
    kmax = int(n_words.max())
    blob_tab = np.empty((nw, kmax + 1), dtype=object)
    for s in range(nw):
        cyc = [_WORDS[(s + j) % nw] for j in range(kmax)]
        joined = ""
        blob_tab[s, 0] = ""
        for k in range(1, kmax + 1):
            joined = cyc[k - 1] if k == 1 else joined + " " + cyc[k - 1]
            blob_tab[s, k] = joined

    blob = blob_tab[w0, n_words]
    ti_tab = np.array([str(i) + ":" for i in range(int(turn_idx.max()) + 1)], dtype=object)
    out = (conv_strs + ":") + ti_tab[turn_idx] + blob
    out[stale] = out[stale] + ":stale"
    return out


def generate_transcripts(sf: float, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_convs = n_convs_for_sf(sf)

    turns = 4 + rng.geometric(1.0 / 56.0, size=n_convs).astype(np.int64)
    turns = np.minimum(turns, 800)
    turns[0] = int(np.median(turns)) * 100  # mega conversation (skew fixture)
    n = int(turns.sum())

    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), turns)
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(turns)[:-1]
    turn_idx = (np.arange(n, dtype=np.int64) - starts[conv_num]).astype(np.int32)

    # roles: alternate user/assistant; sprinkle tool turns; some convs open
    # with a system turn
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    u = rng.random(n)
    is_tool = (u < 0.12) & (turn_idx > 0)
    role[is_tool] = "tool"
    sys_conv = rng.random(n_convs) < 0.3
    first_row = turn_idx == 0
    role[first_row & sys_conv[conv_num]] = "system"
    tool = np.where(is_tool, TOOLS[rng.integers(0, len(TOOLS), size=n)], "").astype(object)

    # timestamps: conv start + cumulative exponential latencies (integer us,
    # strictly increasing within a conversation), seeded session gaps
    dt_s = rng.exponential(30.0, size=n) + 0.5
    gap_rows = (rng.random(n) < 0.02) & (turn_idx > 0)
    dt_s[gap_rows] += 1800.0 + rng.exponential(1200.0, size=int(gap_rows.sum()))
    dt_us = np.maximum((dt_s * 1e6).astype(np.int64), 500_000)
    cs = np.cumsum(dt_us)
    ts_rel = cs - cs[starts[conv_num]] + dt_us[starts[conv_num]]
    conv_start = BASE_EPOCH_US + conv_num * 977_000_000 + (
        rng.integers(0, 3600, size=n_convs) * 1_000_000
    )[conv_num]
    ts_us = conv_start + ts_rel

    stale = np.zeros(n, dtype=bool)

    # duplicate-row fixture: ~0.5% of non-first turns get an extra stale row
    # with the same (conv_id, turn_idx) and ts' = ts - dt/2 (strictly between
    # the previous turn and the real row → distinct, keep-last removes it)
    dup_mask = (rng.random(n) < 0.005) & (turn_idx > 0)
    di = np.nonzero(dup_mask)[0]
    d_conv, d_turn = conv_num[di], turn_idx[di]
    d_role, d_tool = role[di], tool[di]
    d_ts = ts_us[di] - dt_us[di] // 2
    d_stale = np.ones(len(di), dtype=bool)

    conv_num = np.concatenate([conv_num, d_conv])
    turn_idx = np.concatenate([turn_idx, d_turn])
    role = np.concatenate([role, d_role])
    tool = np.concatenate([tool, d_tool])
    ts_us = np.concatenate([ts_us, d_ts])
    stale = np.concatenate([stale, d_stale])

    conv_tab = np.array([f"conv-{c:06d}" for c in range(n_convs)], dtype=object)
    conv_strs = conv_tab[conv_num]
    text = _texts(conv_strs, conv_num, turn_idx.astype(np.int64), stale)

    perm = rng.permutation(len(conv_num))  # stored shuffled on purpose
    conv_id = conv_strs[perm]
    return pa.Table.from_arrays(
        [
            pa.array(conv_id, type=pa.string()),
            pa.array(turn_idx[perm], type=pa.int32()),
            pa.array(np.asarray(role, dtype=object)[perm], type=pa.string()),
            pa.array(np.asarray(text, dtype=object)[perm], type=pa.string()),
            pa.array(np.asarray(tool, dtype=object)[perm], type=pa.string()),
            pa.array(ts_us[perm], type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def transcripts_path(sf_dir: str, root: str = "/tmp/graft_transcripts") -> str:
    return os.path.join(root, Path(sf_dir).name, "transcripts_pq")


def ensure_transcripts(
    sf_dir: str, root: str = "/tmp/graft_transcripts", num_files: int = 32
) -> str:
    """Generate (once, atomically) the transcript parquet DIRECTORY for an
    sf dir — num_files part files so a distributed read parallelizes at the
    file level (a single 230 MB file reads as ONE serial Ray task).

    Both the Ray pipelines and the DuckDB oracle SQL (read_parquet('<dir>/*.parquet'))
    read these same bytes. Atomic publish = write to tmp dir + os.rename
    (reference: tools/export_utils.py:264-283)."""
    path = transcripts_path(sf_dir, root)
    if os.path.isdir(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = generate_transcripts(sf_from_dir(sf_dir))
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path))
    try:
        n = table.num_rows
        step = (n + num_files - 1) // num_files
        for i in range(num_files):
            part = table.slice(i * step, step)
            if part.num_rows == 0:
                break
            pq.write_table(
                part, os.path.join(tmp, f"part-{i:04d}.parquet"), row_group_size=32_768
            )
        os.rename(tmp, path)
    finally:
        if os.path.isdir(tmp):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return path


def transcripts_glob(sf_dir: str, root: str = "/tmp/graft_transcripts") -> str:
    """Glob form of the dataset path for DuckDB's read_parquet()."""
    return os.path.join(transcripts_path(sf_dir, root), "*.parquet")
