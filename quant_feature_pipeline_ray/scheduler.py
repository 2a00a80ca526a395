"""Multi-corpus backfill scheduler — the reference's daily multi-symbol
cron driver re-expressed for transcript corpora.

Reference semantics (auto_features_daily/run_daily_features.py:165-247):
loop over the enabled entities, run the per-entity update with up to
``max_retries`` attempts (doubled delay between attempts), record a
per-entity success flag, NEVER let one entity's failure stop the others,
and print a summary at the end. Here the per-entity unit of work is the
exact incremental-append pipeline (manifest.run_streaming_backfill /
run_incremental_append), and per-entity progress is durable: every applied
input file is recorded in the entity output's ``consumed_inputs.jsonl``
(idempotent replay — a retry resumes after the last committed input
instead of redoing the whole entity).

Library-first so the retry/skip logic is pytest-drivable without a
subprocess; ``scripts/backfill_all.py`` is the thin CLI that owns the Ray
session.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

CONSUMED_NAME = "consumed_inputs.jsonl"


def consumed_path(out_dir: str) -> str:
    return os.path.join(out_dir, CONSUMED_NAME)


def load_consumed(out_dir: str) -> set[str]:
    """Input files already committed for this entity (durable skip set)."""
    seen: set[str] = set()
    p = consumed_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                if line.strip():
                    seen.add(json.loads(line)["input"])
    return seen


def _default_runner(path: str, out_dir: str, bootstrap: bool, num_buckets: int | None) -> dict:
    from quant_feature_pipeline_ray.manifest import (
        run_incremental_append,
        run_streaming_backfill,
    )

    if bootstrap:
        return run_streaming_backfill(path, out_dir, num_buckets=num_buckets)
    return run_incremental_append(path, out_dir, num_buckets=num_buckets)


def backfill_entity(
    input_dir: str,
    out_dir: str,
    num_buckets: int | None = None,
    runner: Callable[[str, str, bool, int | None], dict] | None = None,
    on_applied: Callable[[str, dict], None] | None = None,
) -> dict:
    """Apply every not-yet-consumed parquet file under ``input_dir`` to the
    entity's incremental output, in deterministic sorted order. Each file
    commits its consumed record immediately after it is applied, so a crash
    or raised error mid-entity loses at most the in-flight file — and
    replaying THAT file is a no-op inside run_incremental_append (state
    snapshots record the last applied input; see manifest.py:295-301)."""
    from quant_feature_pipeline_ray.manifest import load_manifest

    runner = runner or _default_runner
    os.makedirs(out_dir, exist_ok=True)
    seen = load_consumed(out_dir)
    new = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet") and os.path.join(input_dir, f) not in seen
    )
    applied = 0
    for path in new:
        bootstrap = not load_manifest(out_dir)
        res = runner(path, out_dir, bootstrap, num_buckets)
        with open(consumed_path(out_dir), "a") as f:
            f.write(json.dumps({"input": path, "ts": time.time(), **res}) + "\n")
        applied += 1
        if on_applied is not None:
            on_applied(path, res)
    return {"inputs_applied": applied, "inputs_skipped": len(seen)}


def backfill_all(
    corpora: dict[str, str],
    out_root: str,
    max_retries: int = 3,
    retry_delay: float = 0.0,
    entity_delay: float = 0.0,
    num_buckets: int | None = None,
    runner: Callable[[str, str, bool, int | None], dict] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[str, dict]:
    """Run ``backfill_entity`` for every corpus with per-entity retry.

    One entity failing (after ``max_retries`` attempts) never stops the
    rest — its error is recorded in the result row and the loop moves on
    (the reference's per-symbol isolation). Because consumed records commit
    per input FILE, a retry does not redo work that already committed: it
    resumes at the file that failed.

    Returns ``{name: {"ok", "attempts", "inputs_applied", "error"}}``.
    """
    results: dict[str, dict] = {}
    names = list(corpora)
    for i, name in enumerate(names):
        input_dir = corpora[name]
        out_dir = os.path.join(out_root, name)
        os.makedirs(out_dir, exist_ok=True)
        seen0 = len(load_consumed(out_dir))
        row = {"ok": False, "attempts": 0, "inputs_applied": 0, "error": None}
        for attempt in range(1, max_retries + 1):
            if attempt > 1 and retry_delay > 0:
                sleep(retry_delay * 2)  # reference doubles the delay on retry
            row["attempts"] = attempt
            try:
                backfill_entity(input_dir, out_dir, num_buckets=num_buckets, runner=runner)
                row["ok"] = True
                row["error"] = None
                break
            except Exception as e:  # noqa: BLE001 — entity isolation is the contract
                row["error"] = f"{type(e).__name__}: {e}"
        # whatever committed during THIS call, across all attempts — partial
        # progress before a failure is already durable in consumed_inputs.jsonl
        row["inputs_applied"] = len(load_consumed(out_dir)) - seen0
        results[name] = row
        if entity_delay > 0 and i < len(names) - 1:
            sleep(entity_delay)
    return results
