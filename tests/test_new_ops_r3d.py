"""Round-3 batch d: simhash hamming-ball self-join + model-score actor pool."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from quant_feature_pipeline_ray.functions.dedupfns import simhash64
from quant_feature_pipeline_ray.pipelines.training_data import (
    doc_model_score,
    doc_simhash_pairs,
)

SF = "/root/testdata/sf0.001"


def _brute_pairs(path: str, max_hamming: int) -> set[tuple[int, int, int]]:
    df = pq.read_table(f"{path}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    sigs = {int(d): int(simhash64(t)) for d, t in zip(df["doc_id"], df["text"])}
    ids = sorted(sigs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= max_hamming:
                out.add((a, b, h))
    return out


def test_simhash_pairs_exact_vs_bruteforce(ray_session):
    got = doc_simhash_pairs(SF, max_hamming=3).to_pandas()
    got_set = set(
        zip(got["doc_a"].astype(int), got["doc_b"].astype(int), got["hamming"].astype(int))
    )
    assert got_set == _brute_pairs(SF, 3)
    # pair list is unique
    assert len(got) == len(got.drop_duplicates(["doc_a", "doc_b"]))


def test_simhash_pairs_wider_radius(ray_session):
    # radius 5 with 8 bands still lossless by pigeonhole
    got = doc_simhash_pairs(SF, max_hamming=5, n_bands=8).to_pandas()
    got_set = set(
        zip(got["doc_a"].astype(int), got["doc_b"].astype(int), got["hamming"].astype(int))
    )
    assert got_set == _brute_pairs(SF, 5)


def test_model_score_matches_straightline(ray_session):
    got = doc_model_score(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    w = [int(hashlib.md5(f"w{j}".encode()).hexdigest()[:8], 16) % 201 - 100 for j in range(64)]
    rows = []
    for d, t in zip(df["doc_id"], df["text"]):
        toks = [x for x in t.split(" ") if x != ""]
        if not toks:
            continue
        z_num = sum(w[int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % 64] for x in toks)
        z = z_num / (len(toks) * 8.0)
        rows.append((int(d), len(toks), z_num, 0.5 * (1.0 + z / (1.0 + abs(z))), int(z_num >= 0)))
    ref = pd.DataFrame(rows, columns=["doc_id", "n_tok", "z_num", "quality_score", "keep"])
    ref = ref.sort_values("doc_id", ignore_index=True)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), ref["doc_id"].to_numpy())
    np.testing.assert_array_equal(got["z_num"].to_numpy(), ref["z_num"].to_numpy())
    np.testing.assert_array_equal(got["n_tok"].to_numpy(), ref["n_tok"].to_numpy())
    np.testing.assert_array_equal(
        got["quality_score"].to_numpy(), ref["quality_score"].to_numpy()
    )
    np.testing.assert_array_equal(got["keep"].to_numpy(), ref["keep"].to_numpy())
    # the keep flag is exactly sign(z_num)
    assert ((got["z_num"] >= 0) == (got["keep"] == 1)).all()


def test_attribution_last_touch_and_direct(ray_session, tmp_path):
    import duckdb

    from quant_feature_pipeline_ray.pipelines.events import (
        events_attribution,
        events_attribution_sql,
    )

    # user 1: click then purchase (credited to click, the most recent touch);
    # user 2: purchase with the only touch outside the 7-day horizon -> direct;
    # user 3: two touches at the SAME ts -> larger event_id (signup) wins.
    t0 = pd.Timestamp("2024-03-01")
    d = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "ts": [
                t0, t0 + pd.Timedelta("1h"),            # u1 view, click
                t0 + pd.Timedelta("2h"),                # u1 purchase
                t0 - pd.Timedelta("10d"),               # u2 touch (stale)
                t0, t0,                                 # u3 view+signup same ts
                t0 + pd.Timedelta("1min"),              # u3 purchase
                t0 + pd.Timedelta("12d"),               # u2 purchase (direct)
            ],
            "user_id": [1, 1, 1, 2, 3, 3, 3, 2],
            "event_type": [
                "view", "click", "purchase", "view",
                "view", "signup", "purchase", "purchase",
            ],
            "value": [0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 5.5, 2.25],
            "props": [""] * 8,
        }
    )
    p = tmp_path / "events.parquet"
    d.to_parquet(p)
    got = events_attribution(str(p))
    ref = dict(zip(got["channel"], zip(got["n_conv"], got["total_value"])))
    assert ref == {"click": (1, 10.0), "direct": (1, 2.25), "signup": (1, 5.5)}
    # and the oracle agrees on the same bytes
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    odf = con.sql(events_attribution_sql()).df()
    assert got.reset_index(drop=True).equals(odf[got.columns].reset_index(drop=True))


def test_attribution_bucket_with_no_touches(ray_session, tmp_path):
    from quant_feature_pipeline_ray.pipelines.events import events_attribution

    # every event is a purchase: merge_asof sees an EMPTY touch frame in
    # every partition and all conversions must fall through to 'direct'
    t0 = pd.Timestamp("2024-03-01")
    d = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [t0, t0 + pd.Timedelta("1h"), t0 + pd.Timedelta("2h")],
            "user_id": [1, 2, 3],
            "event_type": ["purchase"] * 3,
            "value": [1.0, 2.0, 3.0],
            "props": [""] * 3,
        }
    )
    p = tmp_path / "events.parquet"
    d.to_parquet(p)
    got = events_attribution(str(p))
    assert got["channel"].tolist() == ["direct"]
    assert got["n_conv"].tolist() == [3]
    assert got["total_value"].tolist() == [6.0]
