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


class StreamingSessionWindows:
    """Event-time SESSION windows over an unordered stream: gap-merge
    semantics (two sessions MERGE when a bridging event arrives — the case
    tumbling windows never face), watermark + allowed lateness + late-row
    side output. Standard Dataflow-model session windowing (public shape).

    A session is a maximal run of a key's events where consecutive gaps are
    <= gap. A session FIRES when watermark > end + gap (no admissible
    future event can extend or merge it); an arriving event is LATE when it
    would have attached to an already-fired session (ts <= fired_end + gap
    for its key). Sessions of one key fire in start order, so the emitted
    per-key session_id counter equals the batch cumulative-gap numbering —
    which is what lets the driver oracle be plain SQL over the sorted
    table."""

    def __init__(self, gap_s: int, allowed_lateness_s: int = 0) -> None:
        self.gap_us = np.int64(gap_s) * 1_000_000
        self.lateness_us = np.int64(allowed_lateness_s) * 1_000_000
        self.max_ts = np.int64(-(2**62))
        # user -> list of open [start, end, n, sum] (disjoint, start-sorted)
        self.open: dict[int, list[list[int]]] = {}
        self.fired_end: dict[int, int] = {}  # user -> end of last fired session
        self.next_sid: dict[int, int] = {}  # user -> next session_id to assign
        self.n_late = 0

    _COLS = ["user_id", "session_id", "start_us", "end_us", "n_events", "sum_value_c"]

    def _empty(self) -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in self._COLS})

    def process(self, df: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Feed one arrival-order batch (user_id, ts_us, value_c). Returns
        (emitted, late)."""
        ts = df["ts_us"].to_numpy(np.int64)
        users = df["user_id"].to_numpy(np.int64)
        vals = df["value_c"].to_numpy(np.int64)

        fired_end = np.array([self.fired_end.get(int(u), -(2**62)) for u in users])
        late_mask = ts <= fired_end + self.gap_us
        self.n_late += int(late_mask.sum())
        late = df[late_mask].reset_index(drop=True)

        ok = ~late_mask
        if ok.any():
            self.max_ts = max(self.max_ts, np.int64(ts[ok].max()))
            order = np.lexsort((ts[ok], users[ok]))
            u_s, t_s, v_s = users[ok][order], ts[ok][order], vals[ok][order]
            # batch-local mini-sessions via the gap rule (vectorized)
            new_key = np.ones(len(u_s), dtype=bool)
            new_key[1:] = (u_s[1:] != u_s[:-1]) | (t_s[1:] - t_s[:-1] > self.gap_us)
            sid = np.cumsum(new_key) - 1
            mini = pd.DataFrame({"u": u_s, "sid": sid, "t": t_s, "v": v_s}).groupby(
                ["u", "sid"], as_index=False
            ).agg(start=("t", "min"), end=("t", "max"), n=("t", "size"), s=("v", "sum"))
            # merge mini-sessions into the per-user open interval lists
            for u, grp in mini.groupby("u", sort=False):
                ivs = self.open.get(int(u), []) + [
                    [int(a), int(b), int(n), int(sv)]
                    for a, b, n, sv in zip(grp["start"], grp["end"], grp["n"], grp["s"])
                ]
                ivs.sort()
                merged = [ivs[0]]
                for iv in ivs[1:]:
                    if iv[0] - merged[-1][1] <= self.gap_us:  # gap-merge
                        merged[-1][1] = max(merged[-1][1], iv[1])
                        merged[-1][2] += iv[2]
                        merged[-1][3] += iv[3]
                    else:
                        merged.append(iv)
                self.open[int(u)] = merged

        # fire every session no admissible event can still touch
        watermark = self.max_ts - self.lateness_us
        rows = []
        for u in sorted(self.open):
            ivs = self.open[u]
            k = 0
            while k < len(ivs) and watermark > ivs[k][1] + self.gap_us:
                st, en, n, sv = ivs[k]
                sid = self.next_sid.get(u, 1)
                rows.append((u, sid, st, en, n, sv))
                self.next_sid[u] = sid + 1
                self.fired_end[u] = en
                k += 1
            if k:
                self.open[u] = ivs[k:]
                if not self.open[u]:
                    del self.open[u]
        emitted = (
            pd.DataFrame(rows, columns=self._COLS).astype("int64") if rows else self._empty()
        )
        return emitted, late

    def flush(self) -> pd.DataFrame:
        rows = []
        for u in sorted(self.open):
            for st, en, n, sv in self.open[u]:
                sid = self.next_sid.get(u, 1)
                rows.append((u, sid, st, en, n, sv))
                self.next_sid[u] = sid + 1
                self.fired_end[u] = en
        self.open.clear()
        return pd.DataFrame(rows, columns=self._COLS).astype("int64") if rows else self._empty()

    def snapshot(self) -> dict:
        flat = [
            (u, *iv) for u in sorted(self.open) for iv in self.open[u]
        ]  # (u, start, end, n, sum)
        return {
            "gap_us": int(self.gap_us),
            "lateness_us": int(self.lateness_us),
            "max_ts": int(self.max_ts),
            "n_late": self.n_late,
            "open": np.array(flat, dtype=np.int64).reshape(-1, 5),
            "fired_end": np.array(sorted(self.fired_end.items()), dtype=np.int64).reshape(-1, 2),
            "next_sid": np.array(sorted(self.next_sid.items()), dtype=np.int64).reshape(-1, 2),
        }

    @classmethod
    def restore(cls, snap: dict) -> "StreamingSessionWindows":
        k = cls(1)
        k.gap_us = np.int64(snap["gap_us"])
        k.lateness_us = np.int64(snap["lateness_us"])
        k.max_ts = np.int64(snap["max_ts"])
        k.n_late = snap["n_late"]
        k.open = {}
        for u, a, b, n, s in snap["open"]:
            k.open.setdefault(int(u), []).append([int(a), int(b), int(n), int(s)])
        k.fired_end = {int(a): int(b) for a, b in snap["fired_end"]}
        k.next_sid = {int(a): int(b) for a, b in snap["next_sid"]}
        return k
