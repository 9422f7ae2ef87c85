"""Minimal Motion-JPEG AVI container codec (public RIFF/AVI spec).

Closes the last media-decode stub for one legitimate real-world format:
an MJPEG AVI's frames are plain JPEG streams, so with
``functions/jpeg.py`` this container is FULLY decodable here — build,
parse, and per-frame pixel decode — with stdlib ``struct`` only.
MP4/H.264 remains the documented stub (inter-frame codecs genuinely
need ffmpeg; reference media handling is app.py:218-246, 585-589).

Layout written/understood (the standard minimal shape):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' (56-byte MainAVIHeader: frame timing, total frames, dims)
        LIST 'strl' ('strh' vids/MJPG + 'strf' BITMAPINFOHEADER)
      LIST 'movi'
        '00dc' <jpeg bytes>  (one per frame, word-aligned)

Untrusted-corpus hardening matches png/jpeg/wav: every read is
bounds-checked and raises ``AviError`` (never ``struct.error``), chunk
walks cannot loop forever (monotone position), and the frame count is
capped before any payload slicing.
"""

from __future__ import annotations

import struct

# frame-count sanity cap: a crafted avih cannot make callers iterate
# billions of declared frames (payload slicing is bounded by the buffer
# anyway; this bounds the per-row work)
MAX_FRAMES = 100_000


class AviError(ValueError):
    """Malformed RIFF/AVI container."""


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def build_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Structurally-valid MJPEG AVI carrying ``frames`` (each a complete
    JPEG stream) as '00dc' video chunks."""
    n = len(frames)
    avih = struct.pack(
        "<10I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0, 0, 0,
        n,  # dwTotalFrames
        0, 1, 0,
        width, height,
    ) + b"\x00" * 16  # dwReserved[4]
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, max(fps, 1), 0, n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(data: bytes) -> tuple[int, int, list[bytes]]:
    """RIFF/AVI walk → (width, height, frame payload list).

    Dims come from the avih header; frames are the '00dc' chunk bodies
    inside the movi LIST, in stream order. Raises ``AviError`` on any
    malformed/truncated shape."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI container")
    width = height = None
    declared_frames = None
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, declared_frames
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_end = pos + 8 + length
            if body_end > end:
                raise AviError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                if length < 4:
                    raise AviError("short LIST")
                ltype = data[pos + 8 : pos + 12]
                walk(pos + 12, body_end, in_movi or ltype == b"movi")
            elif cid == b"avih":
                if length < 40:
                    raise AviError("short avih")
                vals = struct.unpack("<10I", data[pos + 8 : pos + 48])
                declared_frames = vals[4]
                if declared_frames > MAX_FRAMES:
                    raise AviError(f"implausible frame count {declared_frames}")
                width, height = vals[8], vals[9]
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                if len(frames) >= MAX_FRAMES:
                    raise AviError("frame count exceeds cap")
                frames.append(data[pos + 8 : body_end])
            pos = body_end + (length & 1)  # word alignment

    walk(12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]), False)
    if width is None or declared_frames is None:
        raise AviError("missing avih header")
    return int(width), int(height), frames
