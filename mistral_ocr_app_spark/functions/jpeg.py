"""Baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman) — real
pixel decode, no codec library.

The reference accepts ``jpg``/``jpeg`` uploads first-class (app.py:46)
and writes image payloads to real files (app.py:585-589). Round 4 gave
JPEG rows a real SOF header parse only (``png.py:parse_jpeg_dims``);
this module closes the remaining gap with a full baseline decode so the
media feature/thumbnail pipeline treats JPEG like PNG: real pixels, no
NULL-stat branch.

Public-spec scope (ITU-T T.81, public JFIF spec):

* ``decode_jpeg`` — baseline/extended-sequential Huffman JPEG (SOF0/
  SOF1): DQT (8/16-bit), DHT (canonical code build per Annex C), DRI +
  restart markers, interleaved and single-component scans, sampling
  factors 1-2 per axis (4:4:4, 4:2:2, 4:2:0...), 1 or 3 components.
  Chroma upsampling is pixel replication; IDCT is the orthonormal
  float DCT-II matrix (numpy), rounded and clipped. Returns
  ``(width, height, channels, pixels)`` like ``decode_png``.
  Progressive (SOF2) and arithmetic coding raise
  ``UnsupportedJpegError`` so callers fall back to the header-only
  parse — the honest path for shapes outside baseline.
* ``encode_jpeg`` — baseline encoder (standard Annex K Huffman tables;
  quant tables default to all-ones ≈ near-lossless) for grayscale and
  RGB (4:4:4 or 2x2-subsampled YCbCr). Exists for fixtures and the
  round-trip property tests: a CONSTANT-color image survives
  encode→decode bit-exactly (only the DC coefficient is nonzero and
  all-ones quantization is exact), which is what makes JPEG fixture
  rows SQL-oracle-predictable.

Untrusted-corpus hardening (runs inside executor tasks over arbitrary
bytes): frame geometry is capped (``MAX_PIXEL_BYTES``, same bomb guard
as png.py) BEFORE any entropy decode; all segment reads are
bounds-checked and raise ``JpegError`` (never ``struct.error`` /
``IndexError``); the entropy decoder consumes at most the scan's own
bytes and a Huffman lookup miss raises rather than spinning.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import MAX_PIXEL_BYTES


class JpegError(ValueError):
    """Malformed JPEG (bad marker stream, truncated segment, bad code)."""


class UnsupportedJpegError(JpegError):
    """Valid JPEG outside the baseline-Huffman subset (progressive...)."""


# zigzag scan order (T.81 Figure 5): zigzag index -> raster index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard Huffman tables, T.81 Annex K.3 (public spec constants):
# (BITS counts per code length 1..16, HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix A: FDCT S = A s Aᵀ, IDCT s = Aᵀ S A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder's bit-at-a-time walk."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# ------------------------------------------------------------- encoder ---


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (T.81 §B.1.1.5)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, appended bits) per T.81 Table F.1/F.2."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_block(
    w: _BitWriter, coefs: np.ndarray, dc_pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Huffman-encode one quantized 8x8 block (zigzag order). Returns
    the new DC predictor."""
    zz = [int(coefs.flat[ZIGZAG[i]]) for i in range(64)]
    t, bits = _magnitude(zz[0] - dc_pred)
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        w.write(bits, t)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            zrl, zl = ac_codes[0xF0]
            w.write(zrl, zl)
            run -= 16
        t, bits = _magnitude(zz[k])
        code, length = ac_codes[(run << 4) | t]
        w.write(code, length)
        w.write(bits, t)
        run = 0
    if run:
        eob, el = ac_codes[0x00]
        w.write(eob, el)
    return zz[0]


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Level-shift, FDCT and quantize every 8x8 block of a padded plane.
    Returns an array of shape (blocks_y, blocks_x, 8, 8) of ints."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    by, bx = h // 8, w // 8
    blocks = shifted.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    return np.round(coefs / q).astype(np.int64)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad a plane up to (h, w)."""
    ph, pw = h - plane.shape[0], w - plane.shape[1]
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    subsample: bool = False,
    quant: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from raw 8-bit pixels (row-major, interleaved).

    ``channels`` 1 (grayscale, single-component scan) or 3 (RGB →
    JFIF YCbCr, interleaved scan; ``subsample=True`` emits 4:2:0).
    ``quant`` scales a flat quantization table — the default all-ones
    table makes constant-color images round-trip exactly and keeps
    arbitrary images within a small tolerance (round-trip-tested).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (exercises the decoder's restart path).
    """
    if channels not in (1, 3):
        raise JpegError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise JpegError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    if not width or not height:
        raise JpegError("empty image")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    q = np.full((8, 8), quant, dtype=np.float64)
    qzz = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))

    if channels == 1:
        comps = [(1, 1, 0)]  # (h_samp, v_samp, quant table id)
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample:
            comps = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
            # 2x2 mean; odd edges replicate first
            def down(p: np.ndarray) -> np.ndarray:
                p = _pad_to(p, (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2)
                return np.round(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4
                )
            planes = [y, down(cb), down(cr)]
        else:
            comps = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
            planes = [y, cb, cr]

    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    quantized = []
    for (hs, vs, _qid), plane in zip(comps, planes):
        quantized.append(_fdct_quant(_pad_to(plane, mcuy * vs * 8, mcux * hs * 8), q))

    luma_dc = _canonical_codes(*_DC_LUMA)
    luma_ac = _canonical_codes(*_AC_LUMA)
    chroma_dc = _canonical_codes(*_DC_CHROMA)
    chroma_ac = _canonical_codes(*_AC_CHROMA)
    w = _BitWriter()
    preds = [0] * len(comps)
    mcu_index = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                w.flush()  # byte-align, then the restart marker
                w.out += bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (hs, vs, _qid) in enumerate(comps):
                dc = luma_dc if ci == 0 else chroma_dc
                ac = luma_ac if ci == 0 else chroma_ac
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            w, quantized[ci][my * vs + by, mx * hs + bx],
                            preds[ci], dc, ac,
                        )
            mcu_index += 1
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + qzz)  # DQT table 0, 8-bit
    if channels == 3:
        out += seg(0xDB, b"\x01" + qzz)  # same flat table as id 1
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for ci, (hs, vs, qid) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, qid])
    out += seg(0xC0, sof)
    dht_body = dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if channels == 3:
        dht_body += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    out += seg(0xC4, dht_body)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder ---


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte
    de-stuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise JpegError("entropy data truncated at 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                raise JpegError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bits(self, n: int) -> int:
        while self._n < n:
            self._fill()
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def align_restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker between restart
        intervals (T.81 §E.2.4)."""
        self._acc = 0
        self._n = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF or d[self.pos + 1] != (
            0xD0 + (n & 7)
        ):
            raise JpegError(f"expected RST{n & 7} marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 §F.2.2.1 EXTEND: map t appended bits to a signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Full baseline JPEG decode → (width, height, channels, pixels).

    Raises ``JpegError`` on corruption / truncation and
    ``UnsupportedJpegError`` for shapes outside baseline sequential
    Huffman (progressive, arithmetic, 12-bit, >2 sampling factors,
    2 or >3 components) — callers fall back to ``parse_jpeg_dims``.
    """
    if len(data) < 4 or data[:3] != b"\xff\xd8\xff":
        raise JpegError("bad JPEG magic")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (height, width, comps: [(cid, hs, vs, qid)])
    restart_interval = 0
    scan = None

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("lost marker sync")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise JpegError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise JpegError("truncated segment body")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                if p + n > len(body):
                    raise JpegError("truncated DQT")
                if pq:
                    vals = struct.unpack(f">{64}H", body[p : p + n])
                else:
                    vals = body[p : p + 64]
                q = np.zeros(64)
                for i in range(64):
                    q[ZIGZAG[i]] = vals[i]
                if not q.all():
                    raise JpegError("zero quantization entry")
                qtables[tq] = q.reshape(8, 8)
                p += n
        elif marker == 0xC4:  # DHT: one or more tables
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(body):
                    raise JpegError("truncated DHT")
                vals = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline decode ok
            if len(body) < 6:
                raise JpegError("truncated SOF")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise UnsupportedJpegError(f"{prec}-bit precision")
            if nc not in (1, 3):
                raise UnsupportedJpegError(f"{nc} components")
            if len(body) < 6 + 3 * nc:
                raise JpegError("truncated SOF components")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise UnsupportedJpegError(f"sampling {hs}x{vs}")
                comps.append((cid, hs, vs, qid))
            # stricter than the PNG cap: the decoder holds per-component
            # float32 coefficient planes (4 bytes/sample), so the
            # transient allocation is 4x the pixel bytes — cap pixels at
            # MAX_PIXEL_BYTES/4 (64 MiB ≈ an 8k x 8k grayscale frame)
            # to bound executor memory per decoded image
            if not w or not h or w * h * nc > MAX_PIXEL_BYTES // 4:
                raise JpegError(f"implausible JPEG geometry {w}x{h} (bomb guard)")
            frame = (h, w, comps)
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise UnsupportedJpegError(f"SOF{marker - 0xC0} (non-baseline)")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0] if body else 0
            if len(body) < 1 + 2 * ns + 3:
                raise JpegError("truncated SOS")
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            scan = (scan_comps, pos + 2 + seglen)
            break  # entropy-coded data follows
        pos += 2 + seglen

    if frame is None or scan is None:
        raise JpegError("missing SOF or SOS")
    h, w, comps = frame
    scan_comps, data_pos = scan
    if len(scan_comps) != len(comps):
        raise UnsupportedJpegError("multi-scan (non-interleaved color) JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component spatial planes (padded to whole MCUs); float32 —
    # values are in [-128, 383] pre-clip where 24 mantissa bits are
    # exact to ~1e-5, far below the 0.5 rounding threshold
    planes = [
        np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float32)
        for (_c, hs, vs, _q) in comps
    ]
    dc_t, ac_t, dq = [], [], []
    for (cid, hs, vs, qid) in comps:
        match = [s for s in scan_comps if s[0] == cid]
        if not match:
            raise JpegError(f"scan missing component {cid}")
        _, td, ta = match[0]
        if (0, td) not in htables or (1, ta) not in htables:
            raise JpegError("scan references undefined Huffman table")
        if qid not in qtables:
            raise JpegError("frame references undefined quant table")
        dc_t.append(htables[(0, td)])
        ac_t.append(htables[(1, ta)])
        dq.append(qtables[qid])

    r = _BitReader(data, data_pos)
    preds = [0] * len(comps)
    n_rst = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                r.align_restart(n_rst)
                n_rst = (n_rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (_cid, hs, vs, _qid) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64)
                        t = r.huffman(dc_t[ci])
                        diff = _extend(r.bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = r.huffman(ac_t[ci])
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise JpegError("AC index out of range")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz
                        coefs = block.reshape(8, 8) * dq[ci]
                        spatial = _A.T @ coefs @ _A + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_index += 1

    # upsample to full geometry (pixel replication), crop, color-convert
    full = []
    for ci, (_cid, hs, vs, _qid) in enumerate(comps):
        p = planes[ci]
        if hs < hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs < vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()
