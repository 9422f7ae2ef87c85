"""Stdlib-only media codecs: PNG (full pixel decode) + WAV header parse
+ JPEG header parse.

The reference genuinely decodes media: it writes base64 image payloads
to real files (app.py:201, 585-589), accepts ``{'pdf','png','jpg',
'jpeg','docx'}`` uploads (app.py:46), and rasterizes PDF pages to PNGs
(app.py:283-300). This container has no PIL/ffmpeg, but PNG needs only
``zlib`` (IDAT inflate) plus the five per-scanline filters of the public
W3C PNG spec — so the image path is implemented for real here:

* ``encode_png``  — 8-bit grayscale / RGB / RGBA, any per-scanline
  filter (0–4), CRC-correct chunks.
* ``decode_png``  — chunk walk with CRC verification, IDAT inflate
  (bounded — see below), per-scanline unfilter (None/Sub/Up/Average/
  Paeth with the byte-wise bpp offset of spec §6), palette expansion
  for color type 3. Returns ``(width, height, channels, pixels)``.
* ``parse_jpeg_dims`` — JPEG/JFIF marker walk to the SOF0..SOF15 frame
  header (public ITU T.81 spec) → real width/height for the
  reference's other image format. Header-only (no entropy decode).
* ``parse_wav_header`` — RIFF/WAVE chunk walk (public spec): fmt + data
  chunks → (sample_rate, block_align, n_frames).
* ``build_wav`` / ``build_jpeg`` — minimal containers for fixtures.

Scope: 8-bit non-interlaced PNG, color types 0 (gray), 2 (truecolor),
3 (palette), 4 (gray+alpha), 6 (RGBA). Other shapes raise
``UnsupportedPngError`` so callers can fall back to the header-only
path rather than silently producing wrong pixels.

Untrusted-corpus hardening (this code runs inside executor tasks over
arbitrary bytes): IHDR dimensions are sanity-capped BEFORE the IDAT
stream is inflated, and inflation goes through ``zlib.decompressobj``
with ``max_length`` pinned to the exact expected filtered size — a
crafted high-ratio deflate stream cannot expand past the declared
geometry (decompression-bomb guard). All struct unpacks are
bounds-checked so truncated containers raise ``PngError``/``WavError``
(the documented fallback trigger), never ``struct.error``.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# decompression-bomb ceiling: decoded pixel bytes (w*h*channels) above
# this are rejected before any inflate. 256 MiB ≈ a 9000×9000 RGBA
# image — far beyond any thumbnail/figure payload this engine carries.
MAX_PIXEL_BYTES = 1 << 28

# PNG color type → channels (8-bit, non-interlaced subset we decode)
_CTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_CHANNELS_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}


class PngError(ValueError):
    """Malformed PNG (bad magic, truncated chunk, CRC mismatch...)."""


class UnsupportedPngError(PngError):
    """Valid PNG but outside the supported 8-bit non-interlaced subset."""


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply filter ``ftype`` to one scanline. Filters are byte-wise with
    the "left" neighbor ``bpp`` bytes back (PNG spec §6.2)."""
    w = len(row)
    if ftype == 0:
        return row
    out = bytearray(w)
    for x in range(w):
        left = row[x - bpp] if x >= bpp else 0
        up = prev[x]
        upleft = prev[x - bpp] if x >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise PngError(f"bad filter type {ftype}")
        out[x] = (row[x] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, fil: bytes, prev: bytes, bpp: int) -> bytes:
    """Invert ``_filter_row`` — reconstruction per PNG spec §6."""
    w = len(fil)
    if ftype == 0:
        return fil
    out = bytearray(w)
    for x in range(w):
        left = out[x - bpp] if x >= bpp else 0
        up = prev[x]
        upleft = prev[x - bpp] if x >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise PngError(f"bad filter type {ftype}")
        out[x] = (fil[x] + pred) & 0xFF
    return bytes(out)


def encode_png(
    width: int, height: int, pixels: bytes, filter_for_row=None, channels: int = 1
) -> bytes:
    """8-bit PNG from raw pixels (row-major, channel-interleaved,
    ``width*height*channels`` bytes). ``channels`` 1/2/3/4 → color type
    0/4/2/6. ``filter_for_row(y) -> 0..4`` picks each scanline's filter
    (default ``y % 5`` so every filter type is exercised on any image
    ≥5 rows)."""
    if channels not in _CHANNELS_CTYPE:
        raise PngError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise PngError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _CHANNELS_CTYPE[channels], 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = (filter_for_row(y) if filter_for_row else y % 5) % 5
        raw.append(ft)
        raw += _filter_row(ft, row, prev, channels)
        prev = row
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Full PNG decode → (width, height, channels, raw pixel bytes).

    Walks chunks with CRC verification, inflates the IDAT stream
    (bounded by the declared geometry — bomb guard), and unfilters
    every scanline; palette images (color type 3) are expanded through
    PLTE to 3-channel RGB. Raises ``PngError`` on corruption and
    ``UnsupportedPngError`` outside the 8-bit non-interlaced subset.
    """
    if not data.startswith(PNG_MAGIC):
        raise PngError("bad PNG magic")
    pos = len(PNG_MAGIC)
    width = height = None
    ctype = 0
    palette = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"truncated {typ!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(typ + body) & 0xFFFFFFFF:
            raise PngError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            if length != 13:
                raise PngError(f"bad IHDR length {length}")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp or filt or interlace or ctype not in _CTYPE_CHANNELS:
                raise UnsupportedPngError(
                    f"unsupported PNG: depth={depth} color={ctype} interlace={interlace}"
                )
            out_ch = 3 if ctype == 3 else _CTYPE_CHANNELS[ctype]
            if not width or not height or width * height * out_ch > MAX_PIXEL_BYTES:
                raise PngError(
                    f"implausible PNG geometry {width}x{height} (bomb guard)"
                )
        elif typ == b"PLTE":
            if length % 3 or length > 768:
                raise PngError(f"bad PLTE length {length}")
            palette = bytes(body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or not seen_end:
        raise PngError("missing IHDR or IEND")
    bpp = _CTYPE_CHANNELS[ctype]  # filter bpp (palette filters on indices)
    stride = width * bpp + 1
    expected = stride * height
    try:
        # bounded inflate: a high-ratio stream cannot expand past the
        # declared geometry (+1 so over-long streams are detected)
        dobj = zlib.decompressobj()
        raw = dobj.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    if len(raw) != expected or not dobj.eof:
        raise PngError(f"expected {expected} filtered bytes, got {len(raw)}{'+' if not dobj.eof else ''}")
    pixels = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        row = _unfilter_row(line[0], line[1:], prev, bpp)
        pixels += row
        prev = row
    if ctype == 3:
        if palette is None:
            raise PngError("palette image missing PLTE chunk")
        n_entries = len(palette) // 3
        out = bytearray(width * height * 3)
        for i, idx in enumerate(pixels):
            if idx >= n_entries:
                raise PngError(f"palette index {idx} out of range")
            out[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(out)
    return width, height, bpp, bytes(pixels)


def resize_nearest(
    width: int, height: int, pixels: bytes, max_side: int, channels: int = 1
) -> tuple[int, int, bytes]:
    """Nearest-neighbor downsample to fit in ``max_side`` (exact integer
    math so an oracle can predict every output pixel):

    * no-op when ``max(w, h) <= max_side``
    * else ``tw = max(1, w*max_side // max(w,h))`` (same for ``th``) and
      ``thumb[i, j] = pixels[(i*w)//tw, (j*h)//th]`` (all ``channels``
      bytes of the sampled pixel are copied).
    """
    mx = max(width, height)
    if mx <= max_side:
        return width, height, pixels
    tw = max(1, width * max_side // mx)
    th = max(1, height * max_side // mx)
    out = bytearray(tw * th * channels)
    for j in range(th):
        src_y = (j * height) // th
        base = src_y * width
        for i in range(tw):
            src = (base + (i * width) // tw) * channels
            dst = (j * tw + i) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return tw, th, bytes(out)


# ----------------------------------------------------------------- JPEG ---


def parse_jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """Header-only JPEG parse: marker walk to the first SOF0..SOF15
    frame header (ITU T.81 §B.2.2) → (width, height). Returns ``None``
    for non-JPEG or truncated streams — callers treat that as the
    header-less fallback, matching ``parse_png_dims``. No entropy
    decode (that genuinely needs a codec library)."""
    if len(data) < 4 or data[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None  # lost marker sync
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2  # standalone markers (RSTn/SOI/EOI/TEM) have no length
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2:
            return None
        # SOFn carry frame geometry; C4/C8/CC are DHT/JPG/DAC, not frames
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen >= 7 and pos + 9 <= len(data):
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return int(w), int(h)
            return None
        if marker == 0xDA:  # SOS: entropy data follows; no SOF seen first
            return None
        pos += 2 + seglen
    return None


def build_jpeg(width: int, height: int, body: bytes = b"") -> bytes:
    """Minimal structurally-valid JPEG for fixtures: SOI + JFIF APP0 +
    SOF0 frame header carrying the real geometry + SOS + ``body`` as
    the (opaque) entropy payload + EOI. ``parse_jpeg_dims`` recovers
    (width, height); pixel decode is intentionally impossible here —
    the fixture models real-world JPEGs this container cannot decode."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    sos = b"\x01\x01\x00\x00\x3f\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        + body.replace(b"\xff", b"\xfe")  # keep marker space clean
        + b"\xff\xd9"
    )


# ------------------------------------------------------------------ WAV ---


class WavError(ValueError):
    """Malformed RIFF/WAVE container."""


def build_wav(
    data: bytes, sample_rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """Minimal PCM WAV: RIFF header + fmt chunk + data chunk (public
    spec). ``data`` is carried verbatim as the sample payload."""
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_samples(data: bytes) -> tuple[int, int, int] | None:
    """16-bit mono/stereo PCM sample stats → (min, max, sum of squares)
    over all int16 little-endian samples in the data chunk, or ``None``
    when the container holds no complete sample. REAL sample decode —
    pure ``struct`` like the header parse, closing the "audio decode is
    a stub" gap for PCM WAV (sum-of-squares instead of rms so the stat
    is exact-integer and value-oracle-able; rms = sqrt(ssq/n) for
    callers that want it). Raises ``WavError`` for non-PCM/non-16-bit
    shapes (compressed WAV genuinely needs a codec library)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    fmt_tag = bits = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt " and length >= 16:
            if pos + 24 > len(data):
                raise WavError("truncated fmt chunk")
            fmt_tag, _, _, _, _, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            end = pos + 8 + min(length, len(data) - pos - 8)
            payload = data[pos + 8 : end]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt_tag is None or payload is None:
        raise WavError("missing fmt or data chunk")
    if fmt_tag != 1 or bits != 16:
        raise WavError(f"unsupported WAV shape (fmt={fmt_tag}, bits={bits})")
    n = len(payload) // 2
    if n == 0:
        return None
    samples = struct.unpack(f"<{n}h", payload[: 2 * n])
    return min(samples), max(samples), sum(s * s for s in samples)


def parse_wav_header(data: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE chunk walk → (sample_rate, block_align, n_frames) where
    ``n_frames = data_chunk_bytes // block_align``. Real header parse —
    the number of PCM frames is read from the container, not guessed.
    A chunk that declares more bytes than the buffer holds raises
    ``WavError`` (not ``struct.error``) so corpus-scale callers take
    the documented fallback path on truncated files."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    sample_rate = block_align = data_size = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt " and length >= 16:
            if pos + 24 > len(data):
                raise WavError("truncated fmt chunk")
            _, _, sample_rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = min(length, len(data) - pos - 8)
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data_size is None or not block_align:
        raise WavError("missing fmt or data chunk")
    return sample_rate, block_align, data_size // block_align
