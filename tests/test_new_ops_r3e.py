"""Round-3 session-3 additions: segment-level dedup with reassembly,
DSIR importance weights, TPC-H Q21 waiting-suppliers shape."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _con(tables: dict[str, str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, path in tables.items():
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _cmp(got: pd.DataFrame, odf: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    assert sorted(odf.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_segment_dedup_oracle(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    got = td.doc_segment_dedup(SF).to_pandas()
    con = _con({"documents": f"{SF}/documents.parquet"})
    odf = con.sql(td.doc_segment_dedup_sql(SF)).df()
    _cmp(got, odf)
    # the operator must actually remove something on the dup-heavy fixture
    assert (got["n_kept"] < got["n_segs"]).any()


def test_segment_dedup_edge_cases(ray_session, tmp_path):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    # doc 0: two copies of the same 8-token segment WITHIN one doc (later
    #   copy removed), doc 1: exact copy of doc 0 (loses everything),
    # doc 2: empty text, doc 3: short unique doc (< 1 segment boundary)
    seg = " ".join(f"w{i}" for i in range(8))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [f"{seg} {seg}", f"{seg} {seg}", "", "only three tokens"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0, 0, 0, 0],
        }
    )
    p = tmp_path / "documents.parquet"
    docs.to_parquet(p)
    got = (
        td.doc_segment_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_segs"].tolist() == [2, 2, 1, 1]
    assert got["n_kept"].tolist() == [1, 0, 1, 1]
    assert got["text_dedup"].tolist() == [seg, "", "", "only three tokens"]
    con = _con({"documents": str(p)})
    odf = con.sql(td.doc_segment_dedup_sql(str(tmp_path))).df()
    _cmp(got, odf)


def test_dsir_weights_oracle_and_direction(ray_session):
    from quant_feature_pipeline_ray.pipelines import training_data as td

    got = td.doc_dsir_weights(SF).to_pandas()
    con = _con({"documents": f"{SF}/documents.parquet"})
    odf = con.sql(td.doc_dsir_weights_sql(SF)).df()
    _cmp(got, odf)
    # direction: target-source docs must score higher ON AVERAGE than the
    # rest (their own token profile defines the target distribution)
    src = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    m = got.merge(src, on="doc_id")
    is_t = m["source"].isin(["src0", "src1"])
    if is_t.any() and (~is_t).any():
        assert m.loc[is_t, "dsir_score"].mean() > m.loc[~is_t, "dsir_score"].mean()
    # score identity: w_num / D telescopes to sum of per-token probability
    # differences — spot-check one doc against a straight-line recompute
    import hashlib

    B = 128
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    toks = docs.assign(tok=docs["text"].str.split(" ")).explode("tok")
    toks = toks[toks["tok"] != ""]
    toks["b"] = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B for t in toks["tok"]]
    r = toks.groupby("b").size()
    t = toks[toks["source"].isin(["src0", "src1"])].groupby("b").size()
    r_b = np.zeros(B, dtype=np.int64)
    t_b = np.zeros(B, dtype=np.int64)
    r_b[r.index] = r.to_numpy()
    t_b[t.index] = t.to_numpy()
    R, T = int(r_b.sum()), int(t_b.sum())
    w = (t_b + 1) * (R + B) - (r_b + 1) * (T + B)
    d0 = toks[toks["doc_id"] == got["doc_id"].iloc[0]]
    expect = int(w[d0["b"].to_numpy()].sum())
    assert int(got["w_num"].iloc[0]) == expect


def test_waiting_suppliers_oracle(ray_session):
    from quant_feature_pipeline_ray.pipelines import tpch

    got = tpch.waiting_suppliers(SF)
    con = _con(
        {
            "lineitem": f"{SF}/lineitem.parquet",
            "orders": f"{SF}/orders.parquet",
            "supplier": f"{SF}/supplier.parquet",
        }
    )
    odf = con.sql(tpch.waiting_suppliers_sql(SF)).df()
    _cmp(got, odf)
    assert len(got) > 0


def test_waiting_suppliers_sole_blame_semantics(ray_session, tmp_path):
    from quant_feature_pipeline_ray.pipelines import tpch

    t0 = pd.Timestamp("2024-01-01")
    late = t0 + pd.Timedelta(days=90)
    ok = t0 + pd.Timedelta(days=10)
    # order 1: supp 1 late, supp 2 on time  -> blame supp 1
    # order 2: both late                    -> nobody blamed (NOT EXISTS)
    # order 3: single supplier late         -> not blamed (EXISTS fails)
    # order 4: status 'O'                   -> excluded entirely
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
            "l_suppkey": [1, 2, 1, 2, 1, 1, 2],
            "l_shipdate": [late, ok, late, late, late, late, ok],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": [t0] * 4,
            "o_orderstatus": ["F", "F", "F", "O"],
        }
    )
    supp = pd.DataFrame({"s_suppkey": [1, 2], "s_name": ["SuppA", "SuppB"]})
    li.to_parquet(tmp_path / "lineitem.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    supp.to_parquet(tmp_path / "supplier.parquet")
    got = tpch.waiting_suppliers(str(tmp_path))
    assert got["s_name"].tolist() == ["SuppA"]
    assert got["numwait"].tolist() == [1]
