"""Multimodal binary-column plumbing: REAL PNG codec (stdlib zlib +
unfilter), real WAV/mp4 header parsing, batch fan-out shapes.

The PNG decoder is differential-tested against an independent
spec-transcription decoder written in this file (separate code path:
naive loops straight off the W3C reconstruction formulas)."""

import struct
import zlib

import pytest
from pandas import isna as pd_isna
from pyspark.sql import functions as F

from mistral_ocr_app_spark.functions.png import (
    MAX_PIXEL_BYTES,
    PngError,
    WavError,
    build_jpeg,
    build_wav,
    decode_png,
    encode_png,
    parse_jpeg_dims,
    parse_wav_header,
    resize_nearest,
)
from mistral_ocr_app_spark.functions.mp4 import build_mp4
from mistral_ocr_app_spark.operators.multimodal import (
    decode_media,
    extract_media_features,
    media_from_documents,
    parse_png_dims,
    resize_images,
    sample_video_frames,
    sniff_format,
    thumbnail_pixel_stats,
)

SF_DIR = "/root/testdata/sf0.001"

PNG_HDR = bytes.fromhex("89504e470d0a1a0a0000000d49484452") + struct.pack(">II", 800, 600)


def test_magic_sniffing():
    assert sniff_format(PNG_HDR) == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"RIFF....WEBP") == "webp"
    assert sniff_format(b"RIFF....WAVE") == "wav"
    assert sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert sniff_format(b"") == "empty"
    assert sniff_format(b"garbage") == "unknown"


def test_png_header_parse_is_real():
    assert parse_png_dims(PNG_HDR) == (800, 600)
    assert parse_png_dims(b"notpng") is None


# ------------------------------------------------------------ PNG codec ---


def _independent_decode(data: bytes):
    """Naive spec transcription (W3C PNG §6 reconstruction formulas),
    deliberately written differently from functions/png.py: collects
    chunks with a simple scan, reconstructs with Recon(x) formulas."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos < len(data):
        n = int.from_bytes(data[pos : pos + 4], "big")
        chunks.append((data[pos + 4 : pos + 8], data[pos + 8 : pos + 8 + n]))
        pos += 12 + n
    ihdr = dict(chunks)[b"IHDR"]
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    raw = zlib.decompress(b"".join(c[1] for c in chunks if c[0] == b"IDAT"))
    recon = [[0] * w for _ in range(h)]
    for y in range(h):
        line = raw[y * (w + 1) : (y + 1) * (w + 1)]
        ft = line[0]
        for x in range(w):
            a = recon[y][x - 1] if x > 0 else 0
            b = recon[y - 1][x] if y > 0 else 0
            c = recon[y - 1][x - 1] if x > 0 and y > 0 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            recon[y][x] = (line[1 + x] + pred) % 256
    return w, h, bytes(v for row in recon for v in row)


def test_png_roundtrip_every_filter():
    w, h = 13, 10
    px = bytes((7 * x + 31 * y + 3) % 256 for y in range(h) for x in range(w))
    for ft in range(5):
        data = encode_png(w, h, px, lambda y, ft=ft: ft)
        assert decode_png(data) == (w, h, 1, px)
        # differential: independent spec-transcription decoder agrees
        assert _independent_decode(data) == (w, h, px)


def test_png_mixed_filters_differential():
    w, h = 32, 36
    px = bytes((x + 3 * y + 12) % 256 for y in range(h) for x in range(w))
    data = encode_png(w, h, px, lambda y: (y * 3 + 1) % 5)
    assert decode_png(data) == (w, h, 1, px)
    assert _independent_decode(data) == (w, h, px)


def test_png_rgb_roundtrip_every_filter():
    """Truecolor (color type 2): filters are byte-wise with left = 3
    bytes back — a wrong bpp offset corrupts every Sub/Average/Paeth
    scanline."""
    w, h = 11, 9
    px = bytes(
        (7 * x + 31 * y + 5 * c + 3) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )
    for ft in range(5):
        data = encode_png(w, h, px, lambda y, ft=ft: ft, channels=3)
        assert decode_png(data) == (w, h, 3, px)


def test_png_rgba_roundtrip():
    w, h = 6, 7
    px = bytes((x * y + c) % 256 for y in range(h) for x in range(w) for c in range(4))
    data = encode_png(w, h, px, channels=4)
    assert decode_png(data) == (w, h, 4, px)


def test_png_palette_decode():
    """Color type 3: indices filter at bpp=1, then expand through PLTE."""
    import struct as _s
    import zlib as _z

    w, h = 4, 2
    palette = bytes(range(30))  # 10 RGB entries
    idx = bytes([0, 1, 2, 3, 9, 8, 7, 6])

    def chunk(typ, body):
        return _s.pack(">I", len(body)) + typ + body + _s.pack(
            ">I", _z.crc32(typ + body) & 0xFFFFFFFF
        )

    raw = b"".join(b"\x00" + idx[y * w : (y + 1) * w] for y in range(h))
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert decode_png(data) == (w, h, 3, expect)


def test_png_bomb_guard():
    """A crafted IHDR declaring absurd geometry is rejected BEFORE any
    inflate — and an over-long deflate stream behind honest dims fails."""
    import struct as _s
    import zlib as _z

    def chunk(typ, body):
        return _s.pack(">I", len(body)) + typ + body + _s.pack(
            ">I", _z.crc32(typ + body) & 0xFFFFFFFF
        )

    huge = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="bomb guard"):
        decode_png(huge)
    assert (1 << 40) > MAX_PIXEL_BYTES  # the guard is what rejected it
    # honest 2x2 dims, but the stream inflates to far more than 2 rows
    overlong = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * 1_000_000))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="filtered bytes"):
        decode_png(overlong)


def test_png_bad_ihdr_length():
    """A CRC-valid IHDR with length != 13 raises PngError, not
    struct.error (ADVICE r3)."""
    import struct as _s
    import zlib as _z

    def chunk(typ, body):
        return _s.pack(">I", len(body)) + typ + body + _s.pack(
            ">I", _z.crc32(typ + body) & 0xFFFFFFFF
        )

    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00" * 5) + chunk(b"IEND", b"")
    with pytest.raises(PngError, match="IHDR length"):
        decode_png(data)


def test_png_crc_corruption_detected():
    data = bytearray(encode_png(4, 4, bytes(range(16))))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(PngError):
        decode_png(bytes(data))


def test_png_truncation_detected():
    data = encode_png(4, 4, bytes(range(16)))
    with pytest.raises(PngError):
        decode_png(data[:-8])


def test_resize_nearest_exact_sampling():
    w, h = 20, 10
    px = bytes((x + 100 * y) % 256 for y in range(h) for x in range(w))
    tw, th, tpx = resize_nearest(w, h, px, 5)
    assert (tw, th) == (5, 2)
    for j in range(th):
        for i in range(tw):
            assert tpx[j * tw + i] == px[((j * h) // th) * w + (i * w) // tw]
    # no-op below max_side
    assert resize_nearest(w, h, px, 64) == (w, h, px)


def test_wav_header_roundtrip():
    data = b"payload-bytes!"  # 14 bytes, block_align 2 → 7 frames
    wav = build_wav(data)
    assert sniff_format(wav) == "wav"
    assert parse_wav_header(wav) == (8000, 2, 7)


def test_wav_sample_stats_real_pcm():
    """parse_wav_samples: exact int16 LE stats; non-PCM shapes raise
    WavError (the containment path); empty data chunk → None."""
    import struct as _s

    from mistral_ocr_app_spark.functions.png import parse_wav_samples

    samples = [-100, 0, 77, 32767, -32768]
    wav = build_wav(_s.pack("<5h", *samples))
    assert parse_wav_samples(wav) == (
        -32768, 32767, sum(s * s for s in samples)
    )
    assert parse_wav_samples(build_wav(b"")) is None
    eight_bit = build_wav(b"\x01\x02", bits=8)
    with pytest.raises(WavError):
        parse_wav_samples(eight_bit)
    # single-byte mutations must never escape as struct/IndexError
    for pos in range(len(wav)):
        for val in (0x00, 0xFF):
            mutated = bytearray(wav)
            mutated[pos] = val
            try:
                parse_wav_samples(bytes(mutated))
            except WavError:
                pass


def test_wav_truncated_fmt_raises_waverror():
    """fmt chunk declaring 16 bytes over a truncated buffer → WavError,
    not struct.error (ADVICE r3: one malformed RIFF must take the
    documented fallback, never crash the Spark stage)."""
    wav = build_wav(b"payload-bytes!")
    truncated = wav[:22]  # cuts inside the fmt chunk body
    with pytest.raises(WavError):
        parse_wav_header(truncated)
    # decode_media survives it via the fallback path
    d = decode_media(truncated, "audio")
    assert d["format"] == "wav" and d["n_frames"] == 1 and not d["decoded"]


def test_jpeg_sof_header_parse():
    """build_jpeg carries real geometry in SOF0; parse_jpeg_dims walks
    the marker stream to recover it (ITU T.81 §B.2.2)."""
    data = build_jpeg(640, 480, b"opaque-entropy-payload\xff\x00etc")
    assert sniff_format(data) == "jpeg"
    assert parse_jpeg_dims(data) == (640, 480)
    assert parse_jpeg_dims(b"\xff\xd8\xff\xe0") is None  # truncated
    assert parse_jpeg_dims(b"notjpeg") is None
    # marker walk skips variable-length segments correctly: insert a
    # comment segment before SOF
    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"hello world"
    patched = data[:2] + com + data[2:]
    assert parse_jpeg_dims(patched) == (640, 480)


def test_decode_media_real_paths():
    d = decode_media(encode_png(6, 5, bytes(range(30))), "image")
    assert d["decoded"] and (d["width"], d["height"]) == (6, 5)
    assert d["pixel_sum"] == sum(range(30))
    rgb = bytes(range(90))
    d = decode_media(encode_png(6, 5, rgb, channels=3), "image")
    assert d["decoded"] and (d["width"], d["height"]) == (6, 5)
    assert d["pixel_sum"] == sum(rgb)
    d = decode_media(build_jpeg(33, 44), "image")
    assert d["format"] == "jpeg" and not d["decoded"]
    assert (d["width"], d["height"]) == (33, 44) and d["pixel_sum"] is None
    d = decode_media(build_wav(b"x" * 10), "audio")
    assert d["format"] == "wav" and d["n_frames"] == 5 and not d["decoded"]
    mp4 = build_mp4([10] * 40, [(40, 512)])
    d = decode_media(mp4, "video")
    assert d["format"] == "mp4" and d["n_frames"] == 40 and not d["decoded"]
    # sniffs as mp4 but no parseable moov/stbl → honest n_frames = 1
    d = decode_media(b"\x00\x00\x00\x18ftypmp42" + bytes(16), "video")
    assert d["format"] == "mp4" and d["n_frames"] == 1 and not d["decoded"]


# --------------------------------------------------------- Spark stages ---


def _media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return media_from_documents(docs)


def test_feature_extraction_real_decode(spark):
    feats = extract_media_features(_media(spark))
    pdf = feats.toPandas()
    assert len(pdf) == 500
    img = pdf[pdf["kind"] == "image"]
    jpeg = img["media_id"] % 9 == 6
    assert (img.loc[~jpeg, "format"] == "png").all()
    assert (img.loc[jpeg, "format"] == "jpeg").all()
    # gray AND rgb PNGs decode, and baseline JPEGs decode for real too
    assert img["decoded"].all()
    # width/height real for ALL image rows
    assert (img["width"] == 16 + (img["media_id"] % 5) * 4).all()
    assert (img["height"] == 12 + (img["media_id"] % 7) * 4).all()
    # pixel_sum: genuinely decoded pixels match the synthesis formula
    for _, r in img.head(30).iterrows():
        d, w, h = int(r["media_id"]), int(r["width"]), int(r["height"])
        if d % 9 == 6:
            # constant-color JPEG: DC-only blocks round-trip bit-exactly
            assert r["pixel_sum"] == w * h * ((d * 7 + 13) % 256)
        elif d % 9 == 3:
            assert r["pixel_sum"] == sum(
                (x + 3 * y + 5 * c + d) % 256
                for y in range(h) for x in range(w) for c in range(3)
            )
        else:
            assert r["pixel_sum"] == sum(
                (x + 3 * y + d) % 256 for y in range(h) for x in range(w)
            )
    vid = pdf[pdf["kind"] == "video"]
    avi = vid["media_id"] % 9 == 1
    mjp4 = vid["media_id"] % 9 == 7  # Motion-JPEG-in-MP4 (round 6b)
    raw4 = ~avi & ~mjp4
    assert (vid.loc[avi, "format"] == "avi").all()
    assert (vid.loc[~avi, "format"] == "mp4").all()
    # MJPEG rows (AVI container AND mp4 container): real container
    # parse + real frame-0 pixel decode of the shared constant frames
    assert (vid.loc[avi | mjp4, "n_frames"]
            == 2 + vid.loc[avi | mjp4, "media_id"] % 4).all()
    assert vid.loc[avi | mjp4, "decoded"].all()
    assert (
        vid.loc[avi | mjp4, "pixel_sum"]
        == 128 * ((vid.loc[avi | mjp4, "media_id"] * 7 + 5) % 256)
    ).all()
    assert (vid.loc[raw4, "n_frames"]
            == 24 + (vid.loc[raw4, "media_id"] % 7) * 16).all()
    assert (~vid.loc[raw4, "decoded"]).all()  # demux-only: no codec
    aud = pdf[pdf["kind"] == "audio"]
    assert (aud["format"] == "wav").all()
    assert (aud["n_frames"] >= 0).all()  # octet_length(text) // 2
    # real 16-bit PCM sample decode: exact stats of the fixture wave
    for _, r in aud.head(10).iterrows():
        d, n = int(r["media_id"]), int(r["n_frames"])
        samples = [((i * 31 + d) % 201) - 100 for i in range(n)]
        if n == 0:
            assert pd_isna(r["sample_min"]) and pd_isna(r["sample_sumsq"])
        else:
            assert r["sample_min"] == min(samples)
            assert r["sample_max"] == max(samples)
            assert r["sample_sumsq"] == sum(s * s for s in samples)


def test_feature_extraction_deterministic(spark):
    a = extract_media_features(_media(spark)).toPandas().sort_values("media_id")
    b = (
        extract_media_features(_media(spark).repartition(7))
        .toPandas()
        .sort_values("media_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_resize_real_png_thumbnails(spark):
    thumbs = resize_images(_media(spark), max_side=16)
    stats = thumbnail_pixel_stats(thumbs).toPandas()
    assert len(stats) > 0
    png = stats[stats["media_id"] % 9 != 6]
    assert (png[["thumb_w", "thumb_h"]].max(axis=1) <= 16).all()
    assert (png[["thumb_w", "thumb_h"]] >= 1).all().all()
    # JPEG rows decode for real now: constant-color thumb, exact sum
    jpeg = stats[stats["media_id"] % 9 == 6]
    assert len(jpeg) > 0
    for _, r in jpeg.head(10).iterrows():
        d = int(r["media_id"])
        expect = int(r["thumb_w"]) * int(r["thumb_h"]) * ((d * 7 + 13) % 256)
        assert r["thumb_pixel_sum"] == expect
    # the re-encoded thumbnails are valid PNGs whose pixels are the exact
    # nearest-neighbor samples of the source formula (all channels)
    for _, r in png.head(20).iterrows():
        d = int(r["media_id"])
        w, h = 16 + (d % 5) * 4, 12 + (d % 7) * 4
        tw, th = int(r["thumb_w"]), int(r["thumb_h"])
        nch = 3 if d % 9 == 3 else 1
        expect = sum(
            ((i * w) // tw + 3 * ((j * h) // th) + 5 * c + d) % 256
            for j in range(th)
            for i in range(tw)
            for c in range(nch)
        )
        assert r["thumb_pixel_sum"] == expect


def test_frame_sampling_fanout(spark):
    media = _media(spark)
    frames = sample_video_frames(media, every_k=16)
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert pdf["media_id"].nunique() == n_videos
    assert len(pdf) > n_videos  # fan-out: multiple frames per video
    assert (pdf["frame_idx"] % 16 == 0).all()
    per = pdf.groupby("media_id")["frame_idx"].min()
    assert (per == 0).all()


def test_avi_real_frame_sample_decode(spark):
    """MJPEG-AVI rows: the sampled frame digest is over the REAL
    decoded pixels — verify against the known constant-color frame
    (value (d*7 + 0*11 + 5) % 256 over 16x8 grayscale)."""
    import hashlib

    frames = sample_video_frames(_media(spark), every_k=16).toPandas()
    avi = frames[frames["media_id"] % 9 == 1]
    assert len(avi) > 0
    for _, r in avi.head(8).iterrows():
        d = int(r["media_id"])
        expect_px = bytes([(d * 7 + 5) % 256]) * 128
        assert r["frame_digest"] == hashlib.sha256(expect_px).hexdigest()[:16]
        assert r["frame_idx"] == 0  # 2-5 frames, every_k=16 samples one
        assert pd_isna(r["sample_size"]) and pd_isna(r["sample_dur"])


def test_mp4_real_sample_demux(spark):
    """mp4 rows (round 6): sampled digests are over the ACTUAL mdat
    sample bytes located through the real stsc/stco/stsz mapping, and
    sample_size/sample_dur carry the real stsz/stts values — verify
    against the fixture synthesis formulas."""
    import hashlib

    frames = sample_video_frames(_media(spark), every_k=16).toPandas()
    mp4 = frames[frames["media_id"] % 9 == 4]
    assert len(mp4) > 0
    for _, r in mp4.head(24).iterrows():
        d, fi = int(r["media_id"]), int(r["frame_idx"])
        n = 24 + (d % 7) * 16
        assert r["sample_size"] == 20 + ((fi * 7 + d) % 32)
        assert r["sample_dur"] == (512 + d % 3 if fi < n // 2 else 1024)
        payload = bytes(
            (fi + 3 * j + d) % 256 for j in range(int(r["sample_size"]))
        )
        assert r["frame_digest"] == hashlib.sha256(payload).hexdigest()[:16]


def test_mjpeg_mp4_real_pixel_decode(spark):
    """Motion-JPEG-in-MP4 rows (round 6b, doc_id%9==7): the stsd names
    codec 'jpeg', so the sampled digest is over REAL decoded pixels
    (like AVI) while sample_size/sample_dur stay the real — and
    oracle-predictable — stsz/stts values (samples padded to 512)."""
    import hashlib

    frames = sample_video_frames(_media(spark), every_k=16).toPandas()
    mjp4 = frames[frames["media_id"] % 9 == 7]
    assert len(mjp4) > 0
    for _, r in mjp4.head(8).iterrows():
        d = int(r["media_id"])
        assert r["frame_idx"] == 0  # 2-5 frames, every_k=16 samples one
        assert r["sample_size"] == 512
        assert r["sample_dur"] == 1500 + d % 7
        expect_px = bytes([(d * 7 + 5) % 256]) * 128
        assert r["frame_digest"] == hashlib.sha256(expect_px).hexdigest()[:16]


def test_avi_container_roundtrip_and_fuzz():
    """build → parse identity; single-byte mutations raise only
    AviError (or still parse) — the untrusted-corpus contract."""
    from mistral_ocr_app_spark.functions.avi import (
        AviError,
        build_avi_mjpeg,
        parse_avi_mjpeg,
    )
    from mistral_ocr_app_spark.functions.jpeg import decode_jpeg, encode_jpeg

    frames = [encode_jpeg(16, 8, bytes([v]) * 128) for v in (3, 250)]
    avi = build_avi_mjpeg(frames, 16, 8)
    w, h, out = parse_avi_mjpeg(avi)
    assert (w, h) == (16, 8) and out == frames
    assert decode_jpeg(out[1])[3] == bytes([250]) * 128
    for pos in range(0, len(avi), 7):
        for val in (0x00, 0xFF):
            mutated = bytearray(avi)
            mutated[pos] = val
            try:
                parse_avi_mjpeg(bytes(mutated))
            except AviError:
                pass
    # a frame payload that is not JPEG must be contained by decode_media
    bad = build_avi_mjpeg([b"not a jpeg"], 4, 4)
    d = decode_media(bad, "video")
    assert d["format"] == "avi" and d["n_frames"] == 1 and not d["decoded"]
