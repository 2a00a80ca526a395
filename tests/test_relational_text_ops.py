"""Round-2 widening ops: TPC-H-style join compositions (q3/q6), global
vocabulary build, grouped top-k, rolling-hash fingerprint query.

Each SQL-expressible op is compared EXACTLY (integer-money discipline, no
tolerance) against DuckDB on the sf0.001 tables; doc_fingerprint is pinned
against the straight-line scalar implementation."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _duck(sf_dir: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _assert_exact(got: pd.DataFrame, ref: pd.DataFrame, name: str):
    assert len(got) == len(ref), f"{name}: row count {len(got)} != {len(ref)}"
    cols = sorted(got.columns)
    assert cols == sorted(ref.columns), f"{name}: schema mismatch"
    g = got[cols].sort_values(cols, ignore_index=True)
    r = ref[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        a, b = g[c].to_numpy(), r[c].to_numpy()
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            a, b = a.astype(np.float64), b.astype(np.float64)
            ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
        else:
            ok = (a == b).all()
        assert ok, f"{name}: column {c} mismatches oracle"


def test_tpch_q3_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import tpch

    con = _duck(SF, ["customer", "orders", "lineitem"])
    got = tpch.tpch_q3(SF)
    ref = con.execute(tpch.tpch_q3_sql(SF)).df()
    con.close()
    _assert_exact(got, ref, "tpch_q3")


def test_tpch_q6_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import tpch

    con = _duck(SF, ["lineitem"])
    got = tpch.tpch_q6(SF)
    ref = con.execute(tpch.tpch_q6_sql(SF)).df()
    con.close()
    _assert_exact(got, ref, "tpch_q6")


def test_doc_vocab_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    con = _duck(SF, ["documents"])
    got = td.doc_vocab(SF).to_pandas()
    ref = con.execute(td.doc_vocab_sql(SF)).df()
    con.close()
    _assert_exact(got, ref, "doc_vocab")


def test_doc_vocab_partials_are_batch_invariant(ray_session):
    """The combiner must be associative: tf/df totals cannot depend on how
    rows split into batches. Compare batch_size=7 against one big batch."""
    from quant_feature_pipeline_ray.pipelines import training_data as td

    big = td.doc_vocab(SF).to_pandas().sort_values("token", ignore_index=True)
    small = td.doc_vocab(SF, batch_size=7).to_pandas().sort_values("token", ignore_index=True)
    pd.testing.assert_frame_equal(big, small)


def test_doc_topk_per_lang_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    con = _duck(SF, ["documents"])
    got = td.doc_topk_per_lang(SF)
    ref = con.execute(td.doc_topk_per_lang_sql(SF)).df()
    con.close()
    _assert_exact(got, ref, "doc_topk_per_lang")


def test_doc_fingerprint_matches_scalar_reference(ray_session):
    from quant_feature_pipeline_ray.functions.textstats import fingerprint64
    from quant_feature_pipeline_ray.pipelines import training_data as td

    got = td.doc_fingerprint(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).sort_values(
        "doc_id", ignore_index=True
    )
    ref = fingerprint64(docs["text"]).view(np.int64)
    assert (got["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (got["fp64"].to_numpy() == ref).all()
    # distinct texts -> distinct fingerprints on this fixture
    assert got["fp64"].nunique() == docs["text"].nunique()


def test_doc_quality_filter_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    con = _duck(SF, ["documents"])
    got = td.doc_quality_filter(SF).to_pandas()
    ref = con.execute(td.doc_quality_filter_sql(SF)).df()
    con.close()
    assert 0 < len(ref) < 500, "filter should drop some docs and keep some"
    _assert_exact(got, ref, "doc_quality_filter")


def test_doc_pack_sequences_invariants_and_parity(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    L = 512
    got = td.doc_pack_sequences(SF, context_len=L).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == len(docs)

    # invariant: bins never exceed the budget; offsets are the running fill
    agg = got.groupby("bin_id")["packed_tokens"].sum()
    assert (agg <= L).all()
    for _, g in got.sort_values(["bin_id", "bin_offset"]).groupby("bin_id"):
        fills = np.concatenate([[0], np.cumsum(g["packed_tokens"].to_numpy())[:-1]])
        assert (g["bin_offset"].to_numpy() == fills).all()

    # straight-line parity: replay first-fit per md5 partition in doc_id
    # order (the op's SQL-expressible partition key since round 5)
    import hashlib

    from quant_feature_pipeline_ray.functions.textstats import token_counts

    nt = token_counts(docs["text"]).loc[:, "n_tokens"].to_numpy()
    part = np.array(
        [
            int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 32
            for d in docs["doc_id"].to_numpy()
        ],
        dtype=np.int64,
    )
    ref_rows = {}
    for p in np.unique(part):
        sel = np.flatnonzero(part == p)
        order = sel[np.argsort(docs["doc_id"].to_numpy()[sel])]
        cur_bin, cur_fill = 0, 0
        for i in order:
            t = int(min(nt[i], L))
            if cur_fill + t > L and cur_fill > 0:
                cur_bin, cur_fill = cur_bin + 1, 0
            ref_rows[int(docs["doc_id"].iat[i])] = (int(p) << 32 | cur_bin, cur_fill)
            cur_fill += t
    ref_bin = np.array([ref_rows[d][0] for d in got["doc_id"]])
    ref_off = np.array([ref_rows[d][1] for d in got["doc_id"]])
    assert (got["bin_id"].to_numpy() == ref_bin).all()
    assert (got["bin_offset"].to_numpy() == ref_off).all()
    # determinism: a second run is identical
    again = td.doc_pack_sequences(SF, context_len=L).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
    pd.testing.assert_frame_equal(got, again)


def test_doc_curation_funnel_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    con = _duck(SF, ["documents"])
    got = td.doc_curation_funnel(SF).to_pandas()
    ref = con.execute(td.doc_curation_funnel_sql(SF)).df()
    con.close()
    # the funnel must actually remove docs at every stage on this fixture
    n_docs = 500
    n_filter = len(td.doc_quality_filter(SF).to_pandas())
    assert 0 < len(ref) < n_filter < n_docs
    _assert_exact(got, ref, "doc_curation_funnel")


def test_events_running_total_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import events as ev

    con = _duck(SF, ["events"])
    got = ev.events_running_total(f"{SF}/events.parquet").to_pandas()
    ref = con.execute(ev.events_running_total_sql()).df()
    con.close()
    _assert_exact(got, ref, "e_running_total")


def test_events_running_total_handles_negative_values(ray_session):
    """The per-user base must be ffilled by START INDEX, not by a running
    max of partial sums — negative values make the global cumsum
    non-monotone and would corrupt a max-based reset."""
    import ray.data

    from quant_feature_pipeline_ray.pipelines import events as ev

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(
                np.sort(rng.integers(0, 10**9, n)).astype("int64"), unit="us"
            ),
            "value": np.round(rng.normal(0, 50, n), 2),  # signed!
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td_:
        p = os.path.join(td_, "events.parquet")
        df.to_parquet(p, index=False)
        got = ev.events_running_total(p).to_pandas().sort_values("event_id", ignore_index=True)
        import duckdb

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}'")
        ref = con.execute(ev.events_running_total_sql()).df()
        con.close()
    _assert_exact(got, ref, "e_running_total_signed")


def test_events_pivot_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import events as ev

    con = _duck(SF, ["events"])
    got = ev.events_pivot(f"{SF}/events.parquet").to_pandas()
    ref = con.execute(ev.events_pivot_sql()).df()
    con.close()
    _assert_exact(got, ref, "e_pivot")


def test_emb_label_centroids_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    con = _duck(SF, ["embeddings"])
    got = td.emb_label_centroids(SF).to_pandas()
    ref = con.execute(td.emb_label_centroids_sql(SF)).df()
    con.close()
    _assert_exact(got, ref, "emb_label_centroids")


def test_doc_tfidf_topk_matches_duckdb(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    con = _duck(SF, ["documents"])
    got = td.doc_tfidf_topk(SF).to_pandas()
    ref = con.execute(td.doc_tfidf_topk_sql(SF)).df()
    con.close()
    _assert_exact(got, ref, "doc_tfidf_topk")


def test_hll_distinct_tokens_within_5pct(ray_session):
    import duckdb as _dd

    from quant_feature_pipeline_ray.pipelines import training_data as td

    d = "/root/testdata/sf0.01"
    est = float(td.doc_distinct_tokens_hll(d)["distinct_tokens_est"].iloc[0])
    con = _dd.connect()
    exact = con.execute(
        f"SELECT count(DISTINCT token) FROM (SELECT unnest(string_split(text,' ')) AS token "
        f"FROM '{d}/documents.parquet') WHERE token <> ''"
    ).fetchone()[0]
    con.close()
    assert exact > 0
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_merge_is_order_invariant():
    """Registers must merge associatively: folding one big array equals
    max-merging the registers of any split of it."""
    import numpy as np

    from quant_feature_pipeline_ray.functions.sketches import hll_estimate, hll_registers

    rng = np.random.default_rng(0)
    h = rng.integers(0, 2**64, 100_000, dtype=np.uint64)
    whole = hll_registers(h)
    parts = np.maximum.reduce([hll_registers(c) for c in np.array_split(h, 7)])
    assert (whole == parts).all()
    assert abs(hll_estimate(whole) - 100_000) / 100_000 < 0.05


def test_grouped_hll_within_error(ray_session):
    """Per-group HLL estimates land within 5% of the exact per-group
    distinct counts (4096 registers -> ~1.6% std error)."""
    import pandas as pd

    from quant_feature_pipeline_ray.pipelines.events import (
        events_distinct_users,
        events_distinct_users_hll,
    )

    p = "/root/testdata/sf0.01/events.parquet"
    exact = events_distinct_users(p).set_index("event_type")["n_users"]
    est = events_distinct_users_hll(p).set_index("event_type")["n_users_est"]
    assert set(est.index) == set(exact.index)
    for t in exact.index:
        assert abs(est[t] - exact[t]) / exact[t] <= 0.05, (t, est[t], exact[t])
