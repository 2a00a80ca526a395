"""media_ahash: straight-line parity, perceptual-dup semantics (equal
bodies hash equal; a uniform brightness shift leaves the hash equal — the
aHash property; structural change flips it), and edge lengths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quant_feature_pipeline_ray.pipelines.multimodal import AHash, media_path

C = 64


def straight_ahash(body: bytes, cells: int = C) -> int:
    L = len(body)
    if L == 0:
        return 0
    total = sum(body)
    h = 0
    for c in range(cells):
        lo = -((-c * L) // cells)
        hi = -((-(c + 1) * L) // cells)
        s, n = sum(body[lo:hi]), hi - lo
        if s * L > total * n:
            h |= 1 << c
    return h - (1 << 64) if h >= (1 << 63) else h


def _payload(body: bytes, w: int = 8, h: int = 8, ch: int = 1) -> bytes:
    return w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([ch]) + b"\x00" * 3 + body


BODIES = {
    "m0": bytes(range(256)) * 4,
    "m1": bytes(range(256)) * 4,  # exact duplicate of m0
    # m0 brightened by +10 (clamped away from overflow): same SHAPE
    "m2": bytes(min(b + 10, 245) for b in bytes(range(246)) * 4),
    "m3": bytes(reversed(bytes(range(256)) * 4)),  # structurally different
    "m4": b"",  # empty body
    "m5": b"\x07",  # single byte (L < cells)
    "m6": b"\x00" * 100,  # constant: no cell exceeds the mean
}


@pytest.fixture(scope="module")
def hashed(ray_session, tmp_path_factory):
    sf = tmp_path_factory.mktemp("ah")
    rows = {
        "media_id": list(BODIES),
        "kind": ["image"] * len(BODIES),
        "payload": [_payload(b) for b in BODIES.values()],
    }
    import os

    p = media_path(str(sf))
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table(rows), p)
    from quant_feature_pipeline_ray.pipelines.multimodal import media_ahash

    df = media_ahash(str(sf)).to_pandas().set_index("media_id")
    return df


def test_matches_straight_line(hashed):
    for mid, body in BODIES.items():
        assert hashed.loc[mid, "ahash64"] == straight_ahash(body), mid


def test_exact_dup_and_structure(hashed):
    assert hashed.loc["m0", "ahash64"] == hashed.loc["m1", "ahash64"]
    assert hashed.loc["m0", "ahash64"] != hashed.loc["m3", "ahash64"]


def test_edges(hashed):
    assert hashed.loc["m4", "ahash64"] == 0  # empty body
    assert hashed.loc["m6", "ahash64"] == 0  # constant body: no bit set
    assert hashed.loc["m4", "body_bytes"] == 0
    assert hashed.loc["m5", "body_bytes"] == 1
