"""Real PPM/WAV codecs (round-5 verdict item 6): known-payload decode,
spec edge cases (header comments, non-canonical chunk order), fail-fast on
corrupt input, and the end-to-end Ray decode query."""

import numpy as np
import pytest

from quant_feature_pipeline_ray.functions.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)

SF = "/root/testdata/sf0.001"


def test_ppm_roundtrip_pixel_exact():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()


def test_ppm_known_payload():
    # hand-built 2x1 image: red pixel then blue pixel
    payload = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    arr = decode_ppm(payload)
    assert arr.shape == (1, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 0, 255]


def test_ppm_header_comments():
    # Netpbm allows '#' comments anywhere whitespace may appear
    payload = b"P6\n# a comment\n2 1 # trailing\n255\n" + bytes(6)
    assert decode_ppm(payload).shape == (1, 2, 3)


def test_ppm_rejects_corrupt():
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_wav_roundtrip_sample_exact():
    s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert (out == s).all()


def test_wav_chunk_walk_noncanonical():
    # a conformant reader must skip unknown chunks between fmt and data
    s = np.array([5, -5], dtype=np.int16)
    canon = encode_wav(s, 16000)
    fmt_chunk = canon[12:36]  # 'fmt ' + size + 16 body bytes
    data_chunk = canon[36:]
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    body = fmt_chunk + extra + data_chunk
    riff = b"RIFF" + len(body + b"WAVE").to_bytes(4, "little") + b"WAVE" + body
    out, rate = decode_wav(riff)
    assert rate == 16000 and (out == s).all()


def test_wav_rejects_corrupt():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + bytes(40))
    s = np.array([1], dtype=np.int16)
    stereoish = bytearray(encode_wav(s))
    stereoish[22] = 2  # channels=2
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(stereoish))


def test_media_real_decode_end_to_end(ray_session):
    from quant_feature_pipeline_ray.pipelines.multimodal import (
        ensure_media_real,
        media_real_decode,
    )
    import pyarrow.parquet as pq

    got = (
        media_real_decode(SF)
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    fix = pq.read_table(ensure_media_real(SF)).to_pandas()
    assert len(got) == len(fix) >= 50
    # decoded dims must equal the metadata the encoder recorded
    img = got[got["kind"] == "image_ppm"].merge(fix, on="media_id")
    assert (img["width_decoded"] == img["width"]).all()
    assert (img["height_decoded"] == img["height"]).all()
    assert (img["n_values"] == img["width"] * img["height"] * 3).all()
    wav = got[got["kind"] == "audio_wav"].merge(fix, on="media_id")
    assert (wav["sample_rate_decoded"] == wav["sample_rate"]).all()
    assert (wav["n_values"] == wav["n_samples"]).all()
    assert (wav["val_min"] >= -32768).all() and (wav["val_max"] <= 32767).all()
