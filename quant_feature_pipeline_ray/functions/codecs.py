"""Dependency-free REAL codecs for the multimodal family.

The container ships no image/audio libraries, so most codec stages are
honest stubs (pipelines/multimodal.py). Two formats, however, are fully
decodable in pure python/numpy — binary PPM (P6, the Netpbm raw RGB
format) and PCM WAV (RIFF little-endian) — so for those the decode math
is REAL end-to-end: `media_ppm_decode` / `media_wav_decode` parse actual
file bytes produced by these encoders (or any other conformant writer)
and the Ray-side plumbing (actor pool, small binary batches, integer
stat outputs) is identical to what a PIL/av deployment would use.

reference parity note: the reference has no media path at all; this
family is part of the beyond-reference LLM-curation surface (SURVEY §2
extension), built on the public Netpbm and RIFF/WAVE specifications.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------------ PPM (P6)
def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_read_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token after `pos`, skipping `#` comments
    (Netpbm spec: a comment runs from '#' to end-of-line and may appear
    anywhere whitespace may)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c == b"#":
            while pos < n and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace() and buf[pos : pos + 1] != b"#":
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return buf[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL binary-PPM decode: parse the ASCII header (magic, width,
    height, maxval, with comment support), then view the raw RGB plane.
    Returns (h, w, 3) uint8. Raises on wrong magic / truncation / maxval
    != 255 (the 2-byte-per-sample variant is out of scope)."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a binary PPM (magic {payload[:2]!r})")
    pos = 2
    wtok, pos = _ppm_read_token(payload, pos)
    htok, pos = _ppm_read_token(payload, pos)
    mtok, pos = _ppm_read_token(payload, pos)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # exactly ONE whitespace byte separates maxval from the raster
    need = w * h * 3
    body = payload[pos : pos + need]
    if len(body) != need:
        raise ValueError(f"truncated PPM raster: {len(body)} of {need} bytes")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------ PCM WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono int16 PCM -> RIFF/WAVE bytes (canonical 44-byte header)."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE decode: walk the chunk list (fmt may be followed by
    LIST/fact/etc. before data — the spec allows any order after fmt),
    validate PCM16 mono, return (int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt} ch={channels} bits={bits})")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return np.frombuffer(data, dtype="<i2"), rate
