"""Round-5 operators: cohort retention, funnel conversion, TF-IDF top-k,
Heaps-law vocabulary growth. Invariants + straight-line parity (the exact
DuckDB comparison lives in the contract harness)."""

import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as em

SF = "/root/testdata/sf0.001"


def _oracle(name: str, sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con.sql(em.oracle_sql()[name]).df()


def test_retention_cohorts_exact_and_invariants(ray_session):
    got = em.queries()["e_retention_cohorts"](SF)
    # offset 0 is the cohort itself: retention exactly 1.0
    z = got[got["day_offset"] == 0]
    assert (z["n_active"] == z["n_cohort"]).all()
    assert (z["retention"] == 1.0).all()
    assert (got["retention"] <= 1.0).all() and (got["retention"] > 0).all()
    ref = _oracle("e_retention_cohorts", SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True), check_dtype=False
    )


def test_funnel_strict_order_and_monotone(ray_session):
    got = em.queries()["e_funnel_conversion"](SF)
    n = got["n_users"].to_numpy()
    assert list(got["step"]) == ["view", "click", "purchase"]
    assert (np.diff(n) <= 0).all()  # a funnel can only narrow
    ref = _oracle("e_funnel_conversion", SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True), check_dtype=False
    )
    # strict order: a user whose only purchase precedes every view must not
    # count at the purchase step — synthesize and check via the oracle CTE
    # semantics replicated in pandas
    ev = pd.read_parquet(f"{SF}/events.parquet")
    v = ev[ev["event_type"] == "view"].groupby("user_id")["ts"].min()
    manual = 0
    for u, t1 in v.items():
        c = ev[(ev["event_type"] == "click") & (ev["user_id"] == u) & (ev["ts"] > t1)]["ts"]
        if c.empty:
            continue
        p = ev[
            (ev["event_type"] == "purchase") & (ev["user_id"] == u) & (ev["ts"] > c.min())
        ]
        if not p.empty:
            manual += 1
    assert manual == int(n[2])


def test_tfidf_topk_shape_and_ranking(ray_session):
    got = em.queries()["doc_tfidf_topk"](SF).to_pandas().sort_values(
        ["doc_id", "rank"], ignore_index=True
    )
    per = got.groupby("doc_id").size()
    assert (per <= 3).all() and (per >= 1).all()
    # within a doc, scores are nonincreasing and ranks are 1..k
    for _, g in got.groupby("doc_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["score"].to_numpy()) <= 1e-12).all()
    assert (got["tf"] >= 1).all()


def test_vocab_growth_totals(ray_session):
    got = em.queries()["doc_vocab_growth"](SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = set()
    for t in docs["text"]:
        toks.update(x for x in t.split(" ") if x)
    assert int(got["cum_vocab"].iloc[-1]) == len(toks)
    assert int(got["n_docs"].sum()) == len(docs)
    assert (got["n_new_tokens"] >= 0).all()
    # first slice contributes the most new vocabulary (Heaps-law shape)
    assert got["n_new_tokens"].iloc[0] == got["n_new_tokens"].max()
