"""Stdlib-only media codecs: PNG (full pixel decode) + WAV header parse.

The reference genuinely decodes media: it writes base64 image payloads
to real files (app.py:201, 585-589) and rasterizes PDF pages to PNGs
(app.py:283-300). This container has no PIL/ffmpeg, but PNG needs only
``zlib`` (IDAT inflate) plus the five per-scanline filters of the public
W3C PNG spec — so the image path is implemented for real here:

* ``encode_png``  — 8-bit grayscale, any per-scanline filter (0–4),
  CRC-correct chunks.
* ``decode_png``  — chunk walk with CRC verification, IDAT inflate,
  per-scanline unfilter (None/Sub/Up/Average/Paeth), returns raw pixels.
* ``parse_wav_header`` — RIFF/WAVE chunk walk (public spec): fmt + data
  chunks → (sample_rate, block_align, n_frames).
* ``build_wav`` — minimal PCM WAV container for fixtures.

Scope: grayscale 8-bit non-interlaced PNG (color type 0, bit depth 8) —
the shape the engine's synthetic media tables use. Other color types
raise ``UnsupportedPngError`` so callers can fall back to the
header-only path rather than silently producing wrong pixels.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    """Malformed PNG (bad magic, truncated chunk, CRC mismatch...)."""


class UnsupportedPngError(PngError):
    """Valid PNG but outside the supported grayscale-8 subset."""


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


def _filter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    """Apply filter ``ftype`` to one grayscale scanline (bpp = 1)."""
    w = len(row)
    if ftype == 0:
        return row
    out = bytearray(w)
    for x in range(w):
        left = row[x - 1] if x else 0
        up = prev[x]
        upleft = prev[x - 1] if x else 0
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


def _unfilter_row(ftype: int, fil: bytes, prev: bytes) -> bytes:
    """Invert ``_filter_row`` — reconstruction per PNG spec §6."""
    w = len(fil)
    if ftype == 0:
        return fil
    out = bytearray(w)
    for x in range(w):
        left = out[x - 1] if x else 0
        up = prev[x]
        upleft = prev[x - 1] if x else 0
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


def encode_png(width: int, height: int, pixels: bytes, filter_for_row=None) -> bytes:
    """Grayscale-8 PNG from raw pixels (row-major, ``width*height`` bytes).

    ``filter_for_row(y) -> 0..4`` picks each scanline's filter (default
    ``y % 5`` so every filter type is exercised on any image ≥5 rows).
    """
    if len(pixels) != width * height:
        raise PngError(f"expected {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        ft = (filter_for_row(y) if filter_for_row else y % 5) % 5
        raw.append(ft)
        raw += _filter_row(ft, row, prev)
        prev = row
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Full PNG decode → (width, height, raw grayscale pixels).

    Walks chunks with CRC verification, inflates the IDAT stream, and
    unfilters every scanline. Raises ``PngError`` on corruption and
    ``UnsupportedPngError`` outside grayscale-8 non-interlaced.
    """
    if not data.startswith(PNG_MAGIC):
        raise PngError("bad PNG magic")
    pos = len(PNG_MAGIC)
    width = height = None
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
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise UnsupportedPngError(
                    f"unsupported PNG: depth={depth} color={ctype} interlace={interlace}"
                )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or not seen_end:
        raise PngError("missing IHDR or IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    stride = width + 1
    if len(raw) != stride * height:
        raise PngError(f"expected {stride * height} filtered bytes, got {len(raw)}")
    pixels = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        row = _unfilter_row(line[0], line[1:], prev)
        pixels += row
        prev = row
    return width, height, bytes(pixels)


def resize_nearest(
    width: int, height: int, pixels: bytes, max_side: int
) -> tuple[int, int, bytes]:
    """Nearest-neighbor downsample to fit in ``max_side`` (exact integer
    math so an oracle can predict every output pixel):

    * no-op when ``max(w, h) <= max_side``
    * else ``tw = max(1, w*max_side // max(w,h))`` (same for ``th``) and
      ``thumb[i, j] = pixels[(i*w)//tw, (j*h)//th]``.
    """
    mx = max(width, height)
    if mx <= max_side:
        return width, height, pixels
    tw = max(1, width * max_side // mx)
    th = max(1, height * max_side // mx)
    out = bytearray(tw * th)
    for j in range(th):
        src_y = (j * height) // th
        base = src_y * width
        for i in range(tw):
            out[j * tw + i] = pixels[base + (i * width) // tw]
    return tw, th, bytes(out)


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


def parse_wav_header(data: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE chunk walk → (sample_rate, block_align, n_frames) where
    ``n_frames = data_chunk_bytes // block_align``. Real header parse —
    the number of PCM frames is read from the container, not guessed."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    sample_rate = block_align = data_size = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt " and length >= 16:
            _, _, sample_rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = min(length, len(data) - pos - 8)
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data_size is None or not block_align:
        raise WavError("missing fmt or data chunk")
    return sample_rate, block_align, data_size // block_align
