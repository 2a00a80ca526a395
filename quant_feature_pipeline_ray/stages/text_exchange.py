"""Text-bypass exchange for the flagship backfill.

Why: `text` is ~60% of the bytes moving through the flagship's single
hash exchange (measured, BASELINE.md), but no kernel consumes it — only
`text_len` does. Raw text rows also pay the sort-exchange's buffer
copies on every byte. This stage:

  * derives `text_len` BEFORE the exchange and drops the text column from
    the per-row stream (the "light" rows: short, fixed-width);
  * forwards each (input block, bucket)'s text as ONE zstd-compressed
    Arrow-IPC blob row — the groupby(bucket) key routes blobs and light
    rows to the same bucket task, so text crosses the exchange once,
    compressed, and never participates in the sort's per-row work;
  * in the bucket task: decodes the blobs, applies the IDENTICAL
    keep-last dedup rule (stages/turn_features_arrow._sorted_dedup — same
    sort keys, same equal-ts payload guard), verifies (conv_id, turn_idx)
    alignment against the feature rows, and reattaches text at its
    contract position.

Output is BITWISE identical to the inline path (pinned by
tests/test_flagship.py::test_blob_exchange_parity); only the bytes
through the exchange change. At 100 TB the same trick applies per node:
the blob rows are the only text bytes in the all-to-all, at the zstd
ratio of concatenated same-corpus text (~3-6x).

Reference analogue: none — the reference is single-process and never
shuffles (unified_feature_pipeline.py:534-701); this is the Ray-native
scale lever for its Step2-5 fusion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from quant_feature_pipeline_ray.hashing import stable_bucket
from quant_feature_pipeline_ray.stages.partition import BUCKET_COL

BLOB_COL = "_tblob"


_CODEC = "lz4"  # ~2x faster than zstd at enc+dec; ratio 4.3x vs 6.4x on
# transcript text — the wall-time sweet spot for this exchange


def _ipc_zstd(tbl: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=_CODEC)
    with pa.ipc.new_stream(sink, tbl.schema, options=opts) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def decode_text_blobs(blobs: list[bytes]) -> pa.Table:
    """Concatenated (conv_id, turn_idx, ts, text) rows from blob payloads."""
    parts = [pa.ipc.open_stream(pa.BufferReader(b)).read_all() for b in blobs]
    return pa.concat_tables(parts).combine_chunks()


def pack_for_exchange(batch: pa.Table, num_buckets: int) -> pa.Table:
    """One input block → light rows (text_len derived, text dropped) +
    one compressed text-blob row per bucket present in the block."""
    b = stable_bucket(batch["conv_id"].to_numpy(zero_copy_only=False), num_buckets)
    light = pa.table(
        {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "role": batch["role"],
            "tool": batch["tool"],
            "ts": batch["ts"],
            "text_len": pc.utf8_length(batch["text"]).cast(pa.int64()),
            BUCKET_COL: pa.array(b, type=pa.int32()),
            BLOB_COL: pa.nulls(len(batch), pa.large_binary()),
        }
    )
    sub_all = pa.table(
        {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "ts": batch["ts"],
            "text": batch["text"],
        }
    )
    order = np.argsort(b, kind="stable")
    sb = b[order]
    # ONE gather into bucket order, then O(1) zero-copy slices per bucket
    # (32 scattered takes cost ~10x one take + slices)
    sub_sorted = sub_all.take(pa.array(order)).combine_chunks()
    bounds = np.flatnonzero(np.concatenate(([True], sb[1:] != sb[:-1])))
    ends = np.append(bounds[1:], len(sb))
    bucket_ids, blobs = [], []
    for a, e in zip(bounds, ends):
        bucket_ids.append(int(sb[a]))
        blobs.append(_ipc_zstd(sub_sorted.slice(a, e - a)))
    cols = {}
    for f in light.schema:
        if f.name == BUCKET_COL:
            cols[f.name] = pa.array(bucket_ids, type=pa.int32())
        elif f.name == BLOB_COL:
            cols[f.name] = pa.array(blobs, type=pa.large_binary())
        else:
            cols[f.name] = pa.nulls(len(bucket_ids), f.type)
    # NOTE: no combine_chunks — it would copy the whole light table once
    # more per block; downstream take/filter handle chunked tables
    return pa.concat_tables([light, pa.table(cols)])


def run_bucket_with_text(tbl: pa.Table, cfg) -> pa.Table:
    """Per-bucket kernel for the blob exchange: featurize the light rows,
    decode + dedup the text blobs with the identical rule, verify
    alignment, reattach text at its contract position."""
    from quant_feature_pipeline_ray.stages.turn_features_arrow import (
        _sorted_dedup,
        featurize_bucket_arrow,
    )

    is_blob = pc.is_valid(tbl[BLOB_COL])
    blobs = tbl.filter(is_blob)[BLOB_COL].to_pylist()
    light = tbl.filter(pc.invert(is_blob)).drop_columns([BLOB_COL, BUCKET_COL])
    light = light.combine_chunks()
    feat = featurize_bucket_arrow(light, cfg)

    ttbl = decode_text_blobs(blobs)
    ttbl, _ = _sorted_dedup(ttbl)
    if feat.num_rows != ttbl.num_rows or not (
        pc.all(pc.equal(feat["conv_id"], ttbl["conv_id"])).as_py()
        and pc.all(pc.equal(feat["turn_idx"], ttbl["turn_idx"])).as_py()
    ):
        raise AssertionError(
            "text/feature row alignment lost across the blob exchange — "
            "dedup rules diverged"
        )
    # contract position: between `tool` and `dt_secs` (index 5)
    return feat.add_column(5, "text", ttbl["text"])
