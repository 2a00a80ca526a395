"""grouped_aggregate (stages/hash_aggregate.py) — operator-level contract.

Must equal a driver-side pandas groupby exactly for every supported
aggfunc, across key types (int64, string, multi-key) and group counts,
independent of how rows split into blocks."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(df: pd.DataFrame, key, aggs, nblocks: int, num_partitions: int = 8) -> pd.DataFrame:
    import ray.data

    from quant_feature_pipeline_ray.stages.hash_aggregate import grouped_aggregate

    ds = ray.data.from_pandas(df).repartition(nblocks)
    return grouped_aggregate(ds, key, aggs, num_partitions=num_partitions).to_pandas()


def _ref(df: pd.DataFrame, key, aggs) -> pd.DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupby(keys, as_index=False).agg(
        **{o: pd.NamedAgg(column=c, aggfunc=f) for o, (c, f) in aggs.items()}
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


@pytest.mark.parametrize("nblocks", [1, 7])
@pytest.mark.parametrize("ngroups", [3, 1000])
def test_int_key_all_funcs(ray_session, nblocks, ngroups):
    rng = np.random.default_rng(ngroups + nblocks)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(-ngroups, ngroups, n),
            "v": rng.integers(-(10**9), 10**9, n),
            "w": rng.normal(size=n),
        }
    )
    aggs = {
        "v_sum": ("v", "sum"),
        "v_min": ("v", "min"),
        "v_max": ("v", "max"),
        "n": ("v", "size"),
        "w_sum": ("w", "sum"),
    }
    got = _canon(_run(df, "k", aggs, nblocks))
    ref = _canon(_ref(df, "k", aggs))
    # integer columns must be bitwise; float sums may differ by summation
    # order after the shuffle (assert_frame_equal's default rtol covers it —
    # exactness for floats is the caller's job via integer scaling)
    pd.testing.assert_frame_equal(got, ref)


def test_string_key_and_multikey(ray_session):
    rng = np.random.default_rng(0)
    n = 3000
    df = pd.DataFrame(
        {
            "tok": rng.choice(["alpha", "beta", "gamma", "delta", ""], n),
            "sub": rng.integers(0, 4, n),
            "v": rng.integers(0, 100, n),
        }
    )
    aggs = {"v_sum": ("v", "sum"), "n": ("v", "size"), "v_min": ("v", "min")}
    got = _canon(_run(df, ["tok", "sub"], aggs, nblocks=5))
    ref = _canon(_ref(df, ["tok", "sub"], aggs))
    pd.testing.assert_frame_equal(got, ref)


def test_groups_never_split_across_partitions(ray_session):
    """Each output group key must appear exactly once — the bucketing
    invariant (all rows of a group share a hash partition)."""
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"k": rng.integers(0, 500, 4000), "v": np.ones(4000, dtype=np.int64)})
    out = _run(df, "k", {"n": ("v", "sum")}, nblocks=9, num_partitions=16)
    assert out["k"].is_unique
    assert int(out["n"].sum()) == 4000
