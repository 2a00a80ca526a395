"""emb_jl_project: exact parity vs a straight-line ±1 projection, the
hash-derived sign matrix's determinism, and the JL distance-preservation
sanity bound."""

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_ray.pipelines.training_data import emb_jl_project

GOLD, M64 = 0x9E3779B97F4A7C15, 1 << 64
MDIM = 16


def straight_project(mat: np.ndarray, m: int = MDIM) -> np.ndarray:
    n, d = mat.shape
    q = np.floor(mat.astype(np.float64) * 65536.0 + 0.5).astype(np.int64)
    y = np.zeros((n, m), dtype=np.int64)
    for j in range(1, m + 1):
        for i in range(1, d + 1):
            h = (((j - 1) * d + i) * GOLD) % M64
            s = 1 if h < (1 << 63) else -1
            y[:, j - 1] += s * q[:, i - 1]
    return y


@pytest.fixture(scope="module")
def projected(ray_session, tmp_path_factory):
    rng = np.random.RandomState(11)
    mat = rng.randn(120, 64).astype(np.float32)
    sf = tmp_path_factory.mktemp("jl")
    pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64), "embedding": list(mat)}
    ).to_parquet(sf / "embeddings.parquet")
    got = (
        emb_jl_project(str(sf))
        .to_pandas()
        .sort_values(["vec_id", "jdim"], ignore_index=True)
    )
    return mat, got


def test_matches_straight_line(projected):
    mat, got = projected
    exp = straight_project(mat)
    y = got.pivot(index="vec_id", columns="jdim", values="y").to_numpy()
    assert (y == exp).all()


def test_batch_size_invariance(projected, tmp_path):
    # the hash-derived matrix is identical in every task: tiny batches
    # must produce the same projection bit-for-bit
    mat, got = projected
    sf = tmp_path
    pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64), "embedding": list(mat)}
    ).to_parquet(sf / "embeddings.parquet")
    small = (
        emb_jl_project(str(sf), batch_size=7)
        .to_pandas()
        .sort_values(["vec_id", "jdim"], ignore_index=True)
    )
    assert (small["y"].to_numpy() == got["y"].to_numpy()).all()


def test_distance_preservation(projected):
    mat, got = projected
    q = np.floor(mat.astype(np.float64) * 65536.0 + 0.5)
    y = got.pivot(index="vec_id", columns="jdim", values="y").to_numpy().astype(
        np.float64
    ) / np.sqrt(MDIM)
    rng = np.random.RandomState(0)
    pairs = rng.randint(0, len(mat), (300, 2))
    dq = np.linalg.norm(q[pairs[:, 0]] - q[pairs[:, 1]], axis=1)
    dy = np.linalg.norm(y[pairs[:, 0]] - y[pairs[:, 1]], axis=1)
    ok = dq > 0
    ratio = dy[ok] / dq[ok]
    # m=16 gives loose JL bounds; the MEDIAN must sit near 1 and the
    # distribution must not collapse or blow up
    assert 0.6 < np.median(ratio) < 1.5
    assert np.percentile(ratio, 99) < 3.0
