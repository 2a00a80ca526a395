"""Driver-shaped correctness harness: run every __ray_entry__ query at
sf0.01 and compare to its DuckDB oracle (row count, schema names, values).

Usage: python scripts/check_contract.py [sf_dir]
Owns its Ray session (the real driver inits Ray itself)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


import os as _os

ORACLE_TIMEOUT_S = float(_os.environ.get("GRAFT_ORACLE_TIMEOUT", "0"))


class OracleTimeout(Exception):
    pass


def run_oracle(con, sql: str) -> pd.DataFrame:
    """Run an oracle query; with GRAFT_ORACLE_TIMEOUT set, interrupt DuckDB
    after that many seconds (used by cross-scale spot runs where a few
    recursive-CTE oracles are super-linear in DuckDB)."""
    if not ORACLE_TIMEOUT_S:
        return con.sql(sql).df()
    import threading

    timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
    timer.start()
    try:
        return con.sql(sql).df()
    except Exception as e:
        if "INTERRUPT" in str(e).upper() or type(e).__name__ == "InterruptException":
            raise OracleTimeout() from e
        raise
    finally:
        timer.cancel()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def compare(name: str, got: pd.DataFrame, ref: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(ref):
        return [f"rowcount {len(got)} != {len(ref)}"]
    gcols, rcols = sorted(got.columns), sorted(ref.columns)
    if gcols != rcols:
        return [f"schema {gcols} != {rcols}"]
    g = got[gcols].sort_values(gcols, ignore_index=True)
    r = ref[gcols].sort_values(gcols, ignore_index=True)
    for c in gcols:
        a, b = g[c].to_numpy(), r[c].to_numpy()
        if a.dtype.kind == "f" or (b.dtype.kind == "f"):
            a = a.astype(np.float64)
            b = b.astype(np.float64)
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            eq = a == b
        bad = int((~np.asarray(eq)).sum())
        if bad:
            i = int(np.flatnonzero(~np.asarray(eq))[0])
            problems.append(f"col {c}: {bad} mismatches (first: {a[i]!r} vs {b[i]!r})")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # literal-path oracles (transcripts dir / media fixtures) must point at
    # the SAME sf the engine queries run at — set before __ray_entry__ import
    import os

    os.environ["GRAFT_SQL_SF_DIR"] = sf_dir
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    only = [a for a in sys.argv[2:] if not a.startswith("-")]
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    import gc
    import time

    for name, fn in qs.items():
        # Abandoned streaming executors / actor pools from the previous
        # query release their CPUs only on garbage collection; without
        # this a straggler actor can squat a slot and deadlock a later
        # actor-pool stage (same fix as tests/conftest.py's autouse gc —
        # observed live: doc_graph_pagerank frozen behind an idle pool).
        gc.collect()
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: engine raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        el = time.time() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows x {len(got.columns)} cols ({el:.1f}s)")
            continue
        try:
            ref = run_oracle(con, sqls[name])
        except OracleTimeout:
            # cross-scale spot runs only (GRAFT_ORACLE_TIMEOUT set): the
            # WITH RECURSIVE replays (EMA/Wilder chains) are exact at the
            # driver's sf0.01 gate but DuckDB's recursive execution does
            # not scale to 1.2M rows — report the engine rows and move on
            # rather than hang the whole artifact behind one oracle.
            print(
                f"[oracle-timeout] {name}: engine {len(got)} rows ({el:.1f}s); "
                f"oracle exceeded {ORACLE_TIMEOUT_S:.0f}s at this scale "
                "(exact at sf0.01)"
            )
            continue
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL raised {e}")
            failed.append(name)
            continue
        problems = compare(name, got, ref)
        if problems:
            print(f"[FAIL] {name} ({len(got)} rows, {el:.1f}s): " + "; ".join(problems[:4]))
            failed.append(name)
        else:
            print(f"[OK]   {name}: {len(got)} rows match oracle exactly ({el:.1f}s)")

    smoke = to_pandas(entrymod.entry())
    print(f"entry(): {len(smoke)} rows x {len(smoke.columns)} cols")
    ray.shutdown()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
