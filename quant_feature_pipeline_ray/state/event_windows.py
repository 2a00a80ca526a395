"""Event-time tumbling windows over an UNORDERED stream: watermark +
allowed lateness + late-row side output — the Flink/Beam-shape streaming
aggregation the transcript kernels don't need (transcripts arrive
conv-ordered; events arrive in arrival order, not event order).

Semantics (standard event-time processing, public Dataflow-model shape):

  watermark = max(event ts seen) - allowed_lateness
  a window [W-p, W) FIRES exactly once, when the watermark passes W;
  rows landing in an already-fired window are LATE -> side output
  (counted + returned, never silently dropped, never double-emitted).

The aggregator is a per-partition kernel: hash-partition the stream by
user_id (the repo's standard single exchange) and run one instance per
partition — watermarks are per-partition, which is the correct unit when
each partition is an independent key range. State (open windows + max ts)
serializes to plain arrays, same discipline as state/kernels.ConvState.

Pinned by tests/test_event_windows.py: for ANY chunking and any
within-lateness shuffle of the input, emitted windows == the batch
groupby of the on-time rows, bitwise (integer sums)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class StreamingEventWindows:
    """Tumbling [W-p, W) count/sum windows keyed by (user_id, w_end)."""

    def __init__(self, window_s: int, allowed_lateness_s: int = 0) -> None:
        self.period_us = np.int64(window_s) * 1_000_000
        self.lateness_us = np.int64(allowed_lateness_s) * 1_000_000
        self.max_ts = np.int64(-(2**62))  # watermark source
        self.open: dict[tuple[int, int], list[int]] = {}  # (user, w_end) -> [n, sum_c]
        self.fired: np.int64 = np.int64(-(2**62))  # highest fired w_end
        self.n_late = 0

    # -- core -----------------------------------------------------------
    def process(self, df: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Feed one arrival-order batch with columns user_id, ts_us,
        value_c. Returns (emitted, late): emitted = windows newly closed by
        the advanced watermark; late = input rows whose window already
        fired (side output)."""
        ts = df["ts_us"].to_numpy(np.int64)
        users = df["user_id"].to_numpy(np.int64)
        vals = df["value_c"].to_numpy(np.int64)
        w_end = (ts // self.period_us + 1) * self.period_us

        late_mask = w_end <= self.fired
        self.n_late += int(late_mask.sum())
        late = df[late_mask].reset_index(drop=True)

        ok = ~late_mask
        # accumulate on-time rows into open windows (vectorized per group)
        acc = pd.DataFrame({"u": users[ok], "w": w_end[ok], "v": vals[ok]})
        if len(acc):
            g = acc.groupby(["u", "w"], as_index=False).agg(n=("v", "size"), s=("v", "sum"))
            for u, w, n, s in zip(g["u"], g["w"], g["n"], g["s"]):
                st = self.open.setdefault((int(u), int(w)), [0, 0])
                st[0] += int(n)
                st[1] += int(s)
            self.max_ts = max(self.max_ts, np.int64(ts[ok].max()))

        # advance watermark; fire every open window with w_end <= watermark
        watermark = self.max_ts - self.lateness_us
        to_fire = [k for k in self.open if k[1] <= watermark]
        rows = []
        for k in sorted(to_fire):
            n, s = self.open.pop(k)
            rows.append((k[0], k[1], n, s))
            self.fired = max(self.fired, np.int64(k[1]))
        emitted = pd.DataFrame(
            rows, columns=["user_id", "w_end_us", "n_events", "sum_value_c"]
        ).astype("int64") if rows else pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "w_end_us": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value_c": pd.Series(dtype="int64"),
            }
        )
        return emitted, late

    def flush(self) -> pd.DataFrame:
        """End-of-stream: emit every still-open window (ordered)."""
        rows = [(k[0], k[1], v[0], v[1]) for k, v in sorted(self.open.items())]
        self.open.clear()
        return pd.DataFrame(
            rows, columns=["user_id", "w_end_us", "n_events", "sum_value_c"]
        ).astype("int64") if rows else pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "w_end_us": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "sum_value_c": pd.Series(dtype="int64"),
            }
        )

    # -- state ----------------------------------------------------------
    def snapshot(self) -> dict:
        keys = np.array(sorted(self.open), dtype=np.int64).reshape(-1, 2)
        vals = np.array([self.open[tuple(k)] for k in keys], dtype=np.int64).reshape(-1, 2)
        return {
            "period_us": int(self.period_us),
            "lateness_us": int(self.lateness_us),
            "max_ts": int(self.max_ts),
            "fired": int(self.fired),
            "n_late": self.n_late,
            "keys": keys,
            "vals": vals,
        }

    @classmethod
    def restore(cls, snap: dict) -> "StreamingEventWindows":
        k = cls(1)
        k.period_us = np.int64(snap["period_us"])
        k.lateness_us = np.int64(snap["lateness_us"])
        k.max_ts = np.int64(snap["max_ts"])
        k.fired = np.int64(snap["fired"])
        k.n_late = snap["n_late"]
        k.open = {
            (int(a), int(b)): [int(x), int(y)]
            for (a, b), (x, y) in zip(snap["keys"], snap["vals"])
        }
        return k
