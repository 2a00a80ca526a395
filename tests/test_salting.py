"""Salted mega-conversation path == unsalted, bitwise (FIXTURES.md inv 5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quant_feature_pipeline_ray.stages.salting import featurize_conversation_salted
from quant_feature_pipeline_ray.stages.turn_features_arrow import featurize_bucket_arrow


@pytest.fixture(scope="module")
def mega_conv():
    rng = np.random.default_rng(11)
    n = 60_000
    dt = rng.exponential(30.0, size=n) + 0.5
    gaps = rng.random(n) < 0.01
    dt[gaps] += 2400.0
    ts = 1_700_000_000_000_000 + np.cumsum((dt * 1e6).astype(np.int64))
    roles = np.where(np.arange(n) % 2 == 0, "user", "assistant")
    perm = rng.permutation(n)  # shuffled input: salted path must sort too
    return pa.table(
        {
            "conv_id": pa.array(np.repeat("conv-mega", n)),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)[perm]),
            "role": pa.array(roles[perm]),
            "text": pa.array([f"t{i}" for i in perm]),
            "tool": pa.array(np.where(rng.random(n) < 0.1, "search", "")[perm]),
            "ts": pa.array(ts[perm], pa.timestamp("us")),
        }
    )


def _cmp(a: pa.Table, b: pa.Table):
    assert a.column_names == b.column_names
    af, bf = a.to_pandas(), b.to_pandas()
    for c in af.columns:
        x, y = af[c].to_numpy(), bf[c].to_numpy()
        if x.dtype.kind == "f":
            ok = ((x == y) | (np.isnan(x) & np.isnan(y))).all()
        else:
            ok = (x == y).all()
        assert ok, f"salted path diverges in column {c}"


def test_salted_equals_unsalted_serial(mega_conv):
    unsalted = featurize_bucket_arrow(mega_conv)
    salted = featurize_conversation_salted(mega_conv, chunk_rows=7_000, parallel=False)
    _cmp(salted, unsalted)


def test_salted_equals_unsalted_parallel(ray_session, mega_conv):
    unsalted = featurize_bucket_arrow(mega_conv)
    salted = featurize_conversation_salted(mega_conv, chunk_rows=7_000, parallel=True)
    _cmp(salted, unsalted)


def test_small_conv_short_circuits(mega_conv):
    small = mega_conv.slice(0, 500)
    out = featurize_conversation_salted(small, chunk_rows=7_000)
    assert out.num_rows == 500
