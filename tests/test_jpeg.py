"""Baseline JPEG codec tests (functions/jpeg.py) — round-trip
properties, exactness contracts, and untrusted-input hardening.

The load-bearing contract: a CONSTANT-color image round-trips
bit-exactly (DC-only blocks, all-ones quantization), because that is
what makes the m1/m3 JPEG fixture rows SQL-oracle-predictable despite
JPEG being lossy in general. Arbitrary images round-trip within a
small tolerance (all-ones quant ⇒ the only loss is coefficient
rounding).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mistral_ocr_app_spark.functions.jpeg import (
    _A,
    JpegError,
    UnsupportedJpegError,
    decode_jpeg,
    encode_jpeg,
)
from mistral_ocr_app_spark.functions.png import build_jpeg, parse_jpeg_dims


def test_dct_matrix_orthonormal():
    """IDCT is exactly the transpose pipeline of FDCT: A·Aᵀ = I. A bug
    here would cancel out in encode→decode round-trips, so it gets its
    own direct check."""
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("w,h", [(8, 8), (20, 12), (17, 9), (1, 1), (33, 7)])
@pytest.mark.parametrize("v", [0, 77, 128, 255])
def test_constant_gray_roundtrip_exact(w, h, v):
    data = encode_jpeg(w, h, bytes([v]) * (w * h))
    assert parse_jpeg_dims(data) == (w, h)
    W, H, C, px = decode_jpeg(data)
    assert (W, H, C) == (w, h, 1)
    assert px == bytes([v]) * (w * h)


def test_constant_achromatic_rgb_420_exact():
    """Solid gray RGB survives 4:2:0 chroma subsampling exactly
    (Cb = Cr = 128 everywhere ⇒ subsample/upsample are identities)."""
    img = bytes([123]) * (20 * 20 * 3)
    data = encode_jpeg(20, 20, img, channels=3, subsample=True)
    W, H, C, px = decode_jpeg(data)
    assert (W, H, C) == (20, 20, 3)
    assert px == img


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_random_gray_roundtrip_tolerance(w, h, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    W, H, C, px = decode_jpeg(encode_jpeg(w, h, img.tobytes()))
    assert (W, H, C) == (w, h, 1)
    got = np.frombuffer(px, np.uint8).reshape(h, w).astype(int)
    # all-ones quant: only loss is per-coefficient rounding (≤0.5 each)
    assert np.abs(got - img.astype(int)).max() <= 2


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), subsample=st.booleans())
def test_random_rgb_roundtrip_tolerance(seed, subsample):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    data = encode_jpeg(24, 16, img.tobytes(), channels=3, subsample=subsample)
    W, H, C, px = decode_jpeg(data)
    assert (W, H, C) == (24, 16, 3)
    got = np.frombuffer(px, np.uint8).reshape(16, 24, 3).astype(int)
    err = np.abs(got - img.astype(int)).max()
    # 4:4:4 loses only YCbCr+coefficient rounding; 4:2:0 genuinely
    # averages chroma over 2x2 so neighboring-hue bleed is expected
    assert err <= (255 if subsample else 4)
    # luma survives subsampling ON AVERAGE even when chroma bleeds
    # (per-pixel luma can shift where wrong chroma clips R/G/B at
    # 0/255 — random noise is the worst case for 4:2:0 by design)
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    got_luma = 0.299 * got[..., 0] + 0.587 * got[..., 1] + 0.114 * got[..., 2]
    if subsample:
        assert np.abs(got_luma - luma).mean() <= 4
    else:
        assert np.abs(got_luma - luma).max() <= 6


def test_restart_markers_roundtrip():
    """DRI + RSTn path: byte-aligned markers every N MCUs, DC
    predictors reset — decoder must resync exactly."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    data = encode_jpeg(40, 24, img.tobytes(), restart_interval=2)
    assert b"\xff\xdd" in data  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    W, H, C, px = decode_jpeg(data)
    got = np.frombuffer(px, np.uint8).reshape(24, 40).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 2


def test_quantized_lossy_still_decodes():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    W, H, C, px = decode_jpeg(encode_jpeg(16, 16, img.tobytes(), quant=16))
    got = np.frombuffer(px, np.uint8).reshape(16, 16).astype(int)
    # coarse quant is lossy but bounded by sum of quant steps / worst case
    assert np.abs(got - img.astype(int)).max() <= 128
    assert np.abs(got.mean() - img.mean()) <= 8  # DC survives roughly


def test_header_only_fixture_falls_back():
    """build_jpeg (png.py) carries no DQT/DHT — the full decoder must
    raise (→ decode_media falls back to the header parse), never
    produce fake pixels."""
    with pytest.raises(JpegError):
        decode_jpeg(build_jpeg(33, 44, b"opaque"))


def test_progressive_unsupported():
    data = bytearray(encode_jpeg(8, 8, bytes(64)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(bytes(data))


def test_truncated_stream_raises():
    data = encode_jpeg(16, 16, bytes(range(256)))
    for cut in (4, len(data) // 2, len(data) - 3):
        with pytest.raises(JpegError):
            decode_jpeg(data[:cut])


def test_bomb_guard_rejects_huge_geometry():
    """A crafted SOF declaring ~4.3 G pixels must be rejected BEFORE
    any entropy decode (same MAX_PIXEL_BYTES policy as png.py)."""
    data = bytearray(encode_jpeg(8, 8, bytes(64)))
    i = data.find(b"\xff\xc0")
    struct.pack_into(">HH", data, i + 5, 65535, 65535)
    with pytest.raises(JpegError, match="bomb guard"):
        decode_jpeg(bytes(data))


_REAL_JPEG = "/root/reference/assets/img/banner.jpg"


@pytest.mark.skipif(not __import__("os").path.exists(_REAL_JPEG),
                    reason="reference assets not present")
def test_decodes_real_world_jpeg():
    """The decoder must handle a REAL encoder's output (the reference
    repo's banner: real Huffman tables, subsampling, multi-marker
    stream) — not just our own encoder's. Geometry is ground truth
    (SOF header); the payload hash pins decode behavior so any codec
    change that alters real-world output is caught (self-consistency
    pin — no independent pixel ground truth in this container)."""
    import hashlib

    data = open(_REAL_JPEG, "rb").read()
    w, h, c, px = decode_jpeg(data)
    assert (w, h, c) == (1728, 576, 3)
    assert len(px) == w * h * c
    assert hashlib.sha256(px).hexdigest() == (
        "43d25be0119f18c61e8e1b11fe942945d06fba5050104bede9d2dc1fca35ddfd"
    )


def test_bad_magic_and_garbage():
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xe0\x00\x04ab\xde\xad\xbe\xef")


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    val=st.integers(0, 255),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_single_byte_mutation_never_crashes(pos, val, seed):
    """Untrusted-corpus hardening: this decoder runs inside executor
    tasks over arbitrary bytes. Any single-byte corruption of a valid
    stream must either still decode (entropy-data bit flips usually
    produce wrong-but-valid pixels) or raise JpegError — never
    IndexError/struct.error/ValueError, and never hang."""
    rng = np.random.RandomState(seed % 5)  # a few base images
    img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    data = bytearray(encode_jpeg(16, 16, img.tobytes(), restart_interval=1))
    data[pos % len(data)] = val
    try:
        w, h, c, px = decode_jpeg(bytes(data))
        assert len(px) == w * h * c
    except JpegError:
        pass  # the documented containment path


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_fuzz_random_bytes_never_crash(data):
    for payload in (data, b"\xff\xd8\xff" + data):
        try:
            decode_jpeg(payload)
        except JpegError:
            pass
