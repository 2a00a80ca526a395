"""Generic two-Dataset as-of join vs DuckDB ASOF JOIN + leak-freedom."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.stages.asof import asof_join, merge_asof_frames


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(3)
    n_keys = 12
    left_rows, right_rows = [], []
    for k in range(n_keys):
        key = f"k{k:02d}"
        lts = np.sort(rng.integers(0, 10_000, size=rng.integers(5, 60)))
        for t in lts:
            left_rows.append((key, int(t)))
        rts = np.sort(rng.integers(0, 10_000, size=rng.integers(0, 15)))
        for j, t in enumerate(rts):
            right_rows.append((key, int(t), float(j), int(t) * 2))
    left = pd.DataFrame(left_rows, columns=["conv_id", "ts_us"])
    left["lval"] = np.arange(len(left), dtype=np.int64)
    right = pd.DataFrame(right_rows, columns=["conv_id", "w_end_us", "fval", "ival"])
    return left, right


def test_asof_join_matches_duckdb(ray_session, frames):
    import ray.data

    left, right = frames
    out = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="ts_us",
            right_on="w_end_us",
            by="conv_id",
            num_buckets=8,
            prefix="r_",
            fill_zero=False,
        )
        .to_pandas()
        .sort_values(["conv_id", "ts_us", "lval"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ref = con.sql(
        """
        SELECT l.conv_id, l.ts_us, l.lval,
               r.w_end_us AS r_w_end_us, r.fval AS r_fval, r.ival AS r_ival
        FROM l ASOF LEFT JOIN r
          ON l.conv_id = r.conv_id AND l.ts_us >= r.w_end_us
        ORDER BY l.conv_id, l.ts_us, l.lval
        """
    ).df()
    assert len(out) == len(ref)
    for c in ["conv_id", "ts_us", "lval"]:
        assert (out[c].to_numpy() == ref[c].to_numpy()).all()
    for c in ["r_w_end_us", "r_fval", "r_ival"]:
        a = out[c].to_numpy(dtype=float)
        b = ref[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c


def test_asof_never_reads_future(frames):
    left, right = frames
    out = merge_asof_frames(left, right, on="ts_us", right_on="w_end_us", prefix="r_")
    m = out["r_w_end_us"].notna()
    assert (out.loc[m, "r_w_end_us"] <= out.loc[m, "ts_us"]).all()


def test_asof_directions_match_pandas(ray_session):
    """forward/nearest distributed as-of == a single-frame pd.merge_asof on
    a fuzzed co-partitioned fixture (distinct timestamps, so 'nearest' has
    no distance ties and every direction is uniquely defined)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from quant_feature_pipeline_ray.stages.asof import asof_join

    rng = np.random.default_rng(23)
    n_l, n_r = 4000, 900
    left = pd.DataFrame(
        {
            "conv_id": rng.integers(0, 37, n_l),
            "ts_us": rng.choice(np.arange(1, 10_000_000, 2), size=n_l, replace=False).astype(np.int64),
            "x": rng.integers(0, 100, n_l).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "conv_id": rng.integers(0, 37, n_r),
            "w_ts": rng.choice(np.arange(0, 10_000_000, 2), size=n_r, replace=False).astype(np.int64),
            "v": rng.integers(0, 1000, n_r).astype(np.int64),
        }
    )
    for direction in ("forward", "nearest"):
        got = (
            asof_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on="ts_us",
                right_on="w_ts",
                by="conv_id",
                num_buckets=8,
                prefix="r_",
                fill_zero=False,
                direction=direction,
            )
            .to_pandas()
            .sort_values(["conv_id", "ts_us"], ignore_index=True)
        )
        exp = pd.merge_asof(
            left.sort_values("ts_us", kind="mergesort"),
            right.sort_values("w_ts", kind="mergesort").rename(
                columns={"w_ts": "r_w_ts", "v": "r_v"}
            ),
            left_on="ts_us",
            right_on="r_w_ts",
            by="conv_id",
            direction=direction,
        ).sort_values(["conv_id", "ts_us"], ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["conv_id", "ts_us", "x", "r_w_ts", "r_v"]],
            exp[["conv_id", "ts_us", "x", "r_w_ts", "r_v"]],
            check_dtype=False,
        )
