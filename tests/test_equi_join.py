"""Distributed hash equi-join (stages/equi_join.py) vs pandas merge, plus
the tpch_q18 broadcast-cap fallback it guards."""

import numpy as np
import pandas as pd
import pytest


def _frames(seed=7, n_left=400, n_right=300, n_keys=60):
    rng = np.random.default_rng(seed)
    L = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "k2": rng.integers(0, 3, n_left),
            "lid": np.arange(n_left, dtype=np.int64) + 10**12,  # > 2^53-safe int ids
            "txt": [f"l{i}" for i in range(n_left)],
            "ts": pd.to_datetime(rng.integers(0, 10**6, n_left), unit="s"),
        }
    )
    R = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 10, n_right),  # some keys miss
            "k2": rng.integers(0, 3, n_right),
            "val": rng.normal(size=n_right),
            "txt": [f"r{i}" for i in range(n_right)],  # overlaps left non-key col
        }
    )
    return L, R


def _canon(df, cols):
    return df.sort_values(cols, kind="mergesort", ignore_index=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_single_key_matches_pandas(ray_session, how):
    import ray.data

    from quant_feature_pipeline_ray.stages.equi_join import hash_equi_join

    L, R = _frames()
    got = hash_equi_join(
        ray.data.from_pandas(L), ray.data.from_pandas(R), "k", how=how, num_partitions=8
    ).to_pandas()
    if how in ("semi", "anti"):
        m = L["k"].isin(R["k"])
        want = (L[m] if how == "semi" else L[~m]).reset_index(drop=True)
        key = ["k", "lid"]
    else:
        want = L.merge(
            R.rename(columns={"txt": "txt_r", "k2": "k2_r"}), on="k", how=how, sort=False
        )
        key = ["k", "lid", "val", "txt_r"]
    assert sorted(got.columns) == sorted(want.columns)
    g, w = _canon(got, key), _canon(want[got.columns], key)
    assert g.equals(w), f"{how} join mismatch"


def test_multi_key_inner(ray_session):
    import ray.data

    from quant_feature_pipeline_ray.stages.equi_join import hash_equi_join

    L, R = _frames(seed=11)
    got = hash_equi_join(
        ray.data.from_pandas(L),
        ray.data.from_pandas(R),
        ["k", "k2"],
        how="inner",
        num_partitions=8,
    ).to_pandas()
    want = L.merge(R.rename(columns={"txt": "txt_r"}), on=["k", "k2"], how="inner", sort=False)
    key = ["k", "k2", "lid", "val"]
    assert _canon(got, key).equals(_canon(want[got.columns], key))
    # big int ids survived the tagged union without float promotion
    assert got["lid"].dtype == np.int64


def test_q18_fallback_matches_broadcast_path(ray_session):
    from quant_feature_pipeline_ray.pipelines.tpch import tpch_q18

    sf = "/root/testdata/sf0.001"
    a = tpch_q18(sf, qty_threshold=150)
    b = tpch_q18(sf, qty_threshold=150, broadcast_cap=0)  # force distributed plan
    assert len(a) > 0
    assert a.equals(b)
