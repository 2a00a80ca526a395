"""Binary sign-quantized Hamming ANN (emb_hamming_topk): straight-line numpy
parity on the sf0.001 embeddings, SWAR popcount vs int.bit_count, sign-bit
tie rule (0.0 maps to bit 0), and the d>64 guard."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quant_feature_pipeline_ray.pipelines.training_data import (  # noqa: E402
    _popcount64,
    _sign_codes,
)

SF = "/root/testdata/sf0.001"


def test_popcount_matches_python():
    rng = np.random.RandomState(7)
    x = rng.randint(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    x[:4] = [0, 1, np.uint64(2**64 - 1), np.uint64(1) << np.uint64(63)]
    got = _popcount64(x)
    ref = np.array([int(v).bit_count() for v in x], dtype=np.uint64)
    assert (got == ref).all()


def test_sign_codes_tie_rule():
    mat = np.array([[0.0, -0.0, 1e-300, -1e-300], [1.0, 0.0, -1.0, 2.0]])
    codes = _sign_codes(mat)
    # strict > 0: +0.0 and -0.0 both OFF, tiny positives ON
    assert codes[0] == 0b0100
    assert codes[1] == 0b1001
    with pytest.raises(ValueError):
        _sign_codes(np.zeros((2, 65)))


def straight_hamming_topk(sf_dir, n_queries=10, k=5):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vids = emb["vec_id"].to_numpy()
    codes = _sign_codes(mat)
    qmask = vids < n_queries
    rows = []
    for qi in np.flatnonzero(qmask):
        d = np.array(
            [int(codes[qi] ^ c).bit_count() for c in codes], dtype=np.int64
        )
        order = sorted(
            (int(d[j]), int(vids[j])) for j in range(len(vids)) if j != qi
        )
        for rank, (ham, vid) in enumerate(order[:k], 1):
            rows.append(
                {
                    "query_id": int(vids[qi]),
                    "vec_id": vid,
                    "hamming": ham,
                    "rank": rank,
                }
            )
    return pd.DataFrame(rows).sort_values(["query_id", "rank"], ignore_index=True)


def test_engine_parity(ray_session):
    import __ray_entry__ as entrymod

    got = (
        entrymod.queries()["emb_hamming_topk"](SF)
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    ref = straight_hamming_topk(SF)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], ref[sorted(ref.columns)])
