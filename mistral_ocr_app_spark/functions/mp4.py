"""Real ISO-BMFF (mp4) sample-table codec — stdlib ``struct`` only.

The engine's video rows previously used a synthetic ``ftyp`` container
whose frame count sat in the box payload — header-parse real, sample
decode stubbed. Full H.264 *pixel* decode stays out of scope without
ffmpeg (documented), but the mp4 ``stbl`` sample tables are pure
big-endian struct parses, so per-sample sizes/offsets/durations can be
genuinely real:

* ``build_mp4`` — minimal valid ISO-BMFF writer: ``ftyp`` + ``mdat``
  (concatenated sample payloads) + trailing ``moov`` whose
  ``trak/mdia/minf/stbl`` carries real ``stsd``/``stts`` (duration
  runs)/``stsc`` (sample→chunk map)/``stsz`` (per-sample sizes)/
  ``stco`` (chunk offsets). moov-after-mdat layout keeps chunk offsets
  independent of the moov size (classic non-faststart files).
* ``parse_mp4_sample_table`` — real parse: bounded box walk (32-bit and
  64-bit largesize headers, unknown boxes skipped, every step must
  advance), container descent ``moov → trak → mdia → minf → stbl``,
  then the stsd sample entry (codec fourcc + declared width/height —
  a ``jpeg`` entry marks Motion-JPEG-in-MP4, whose sample payloads the
  engine pixel-decodes with ``functions/jpeg.py``; round 6b) and the
  stts/stsc/stsz/stco(co64) tables. Returns per-sample sizes,
  durations (stts runs expanded lazily via ``sample_duration``), and
  absolute file offsets computed through the real stsc chunk mapping —
  so ``sample_payload`` can hand back the actual sample bytes a
  demuxer would feed a codec.

Hardening as in png/jpeg/wav/avi/pdf/docx: all malformed input raises
``Mp4Error`` (never ``struct.error``/``IndexError``), box and sample
caps, offsets validated against the file length before any slice.
"""

from __future__ import annotations

import struct

MAX_BOXES = 10_000
MAX_SAMPLES = 1_000_000
MAX_TABLE_ENTRIES = 1_000_000

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class Mp4Error(ValueError):
    """Malformed or unsupported mp4."""


# ------------------------------------------------------------- writer ---


def _box(kind: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + kind + body


def _full_box(kind: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(kind, struct.pack(">I", version << 24) + body)


def _visual_sample_entry(codec: bytes, width: int, height: int) -> bytes:
    """Real ISO 14496-12 §12.1.3 VisualSampleEntry: SampleEntry header
    (6 reserved bytes + data_reference_index) then the visual fields.
    ``codec`` is the 4-byte sample-entry fourcc (e.g. ``b"jpeg"`` for
    Motion JPEG in MP4, ``b"avc1"`` for H.264)."""
    if len(codec) != 4:
        raise Mp4Error(f"sample-entry fourcc must be 4 bytes, got {codec!r}")
    body = (
        bytes(6) + struct.pack(">H", 1)          # reserved + data_ref_index
        + struct.pack(">HH", 0, 0) + bytes(12)   # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x0048_0000, 0x0048_0000)  # 72 dpi fixed-point
        + struct.pack(">I", 0)                   # reserved
        + struct.pack(">H", 1)                   # frame_count
        + bytes(32)                              # compressorname (pascal, empty)
        + struct.pack(">Hh", 0x0018, -1)         # depth, pre_defined
    )
    return _box(codec, body)


def build_mp4(
    sample_sizes: list[int],
    stts_runs: list[tuple[int, int]],
    payload: bytes | None = None,
    timescale: int = 90_000,
    codec: bytes | None = None,
    width: int = 0,
    height: int = 0,
) -> bytes:
    """Minimal real mp4: samples with the given sizes live in one mdat
    chunk; ``stts_runs`` is a list of (sample_count, delta) duration
    runs that must cover exactly ``len(sample_sizes)`` samples.
    ``payload`` (default zeros) is the concatenated sample bytes and
    must be ``sum(sample_sizes)`` long. When ``codec`` is given the
    stsd carries a real VisualSampleEntry with that fourcc and
    ``width``/``height`` (omitting it keeps the legacy empty stsd, so
    pre-round-6b fixture bytes are unchanged)."""
    n = len(sample_sizes)
    if sum(c for c, _ in stts_runs) != n:
        raise Mp4Error("stts runs do not cover the sample count")
    total = sum(sample_sizes)
    if payload is None:
        payload = bytes(total)
    if len(payload) != total:
        raise Mp4Error("payload length != sum(sample_sizes)")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = _box(b"mdat", payload)
    chunk_offset = len(ftyp) + 8  # first sample byte inside mdat

    mvhd = _full_box(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale,
                    sum(c * d for c, d in stts_runs)) + bytes(80),
    )
    if codec is None:
        stsd = _full_box(b"stsd", struct.pack(">I", 0))
    else:
        stsd = _full_box(
            b"stsd",
            struct.pack(">I", 1) + _visual_sample_entry(codec, width, height),
        )
    stts = _full_box(
        b"stts",
        struct.pack(">I", len(stts_runs))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_runs),
    )
    stsc = _full_box(b"stsc", struct.pack(">IIII", 1, 1, max(n, 1), 1))
    stsz = _full_box(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stco = _full_box(b"stco", struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------------- parser ---


def _walk(data: bytes, start: int, end: int):
    """Yield (kind, body_start, body_end) for sibling boxes in
    data[start:end]; every malformed header raises Mp4Error."""
    pos = start
    n_seen = 0
    while pos < end:
        n_seen += 1
        if n_seen > MAX_BOXES:
            raise Mp4Error("box count cap exceeded")
        if pos + 8 > end:
            raise Mp4Error("truncated box header")
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        kind = data[pos + 4:pos + 8]
        body_start = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise Mp4Error("truncated largesize header")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body_start = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body_start - pos or pos + size > end:
            raise Mp4Error(f"box {kind!r} size out of bounds")
        yield kind, body_start, pos + size
        pos += size  # size >= header length > 0: always advances


def _find(data: bytes, start: int, end: int, kind: bytes) -> tuple[int, int]:
    for k, s, e in _walk(data, start, end):
        if k == kind:
            return s, e
    raise Mp4Error(f"no {kind.decode('ascii', 'replace')} box")


def _u32s(data: bytes, start: int, count: int, end: int) -> list[int]:
    if start + 4 * count > end:
        raise Mp4Error("table entries past box end")
    return list(struct.unpack(f">{count}I", data[start:start + 4 * count]))


def _table(data: bytes, s: int, e: int, per_entry: int) -> tuple[int, int]:
    """Full-box header + entry_count; validates the entry span."""
    if s + 8 > e:
        raise Mp4Error("truncated table box")
    count = struct.unpack(">I", data[s + 4:s + 8])[0]
    if count > MAX_TABLE_ENTRIES:
        raise Mp4Error(f"table entry cap exceeded ({count})")
    if s + 8 + per_entry * count > e:
        raise Mp4Error("table entries past box end")
    return count, s + 8


class SampleTable:
    """Parsed stbl: ``sizes[i]``, ``offsets[i]`` (absolute file offset
    of sample i via the real stsc chunk mapping), ``stts_runs``, plus
    the stsd sample-entry ``codec`` fourcc and its declared
    ``width``/``height`` (all None for an entry-less stsd)."""

    __slots__ = ("sizes", "offsets", "stts_runs", "codec", "width", "height")

    def __init__(self, sizes, offsets, stts_runs,
                 codec=None, width=None, height=None):
        self.sizes = sizes
        self.offsets = offsets
        self.stts_runs = stts_runs
        self.codec = codec
        self.width = width
        self.height = height

    @property
    def n_samples(self) -> int:
        return len(self.sizes)

    def sample_duration(self, i: int) -> int:
        """Expand the stts runs lazily: delta of sample i."""
        if not 0 <= i < self.n_samples:
            raise Mp4Error(f"sample index {i} out of range")
        seen = 0
        for count, delta in self.stts_runs:
            seen += count
            if i < seen:
                return delta
        raise Mp4Error("stts runs do not cover sample index")


def parse_mp4_sample_table(data: bytes) -> SampleTable:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise Mp4Error("not an mp4 (no leading ftyp box)")
    s, e = _find(data, 0, len(data), b"moov")
    for part in (b"trak", b"mdia", b"minf", b"stbl"):
        s, e = _find(data, s, e, part)
    stbl_s, stbl_e = s, e

    # stsd — sample description: first entry's fourcc names the codec
    # (the box kind IS the codec id in ISO-BMFF); a visual entry also
    # declares width/height at fixed offsets past the SampleEntry
    # header (6 reserved + data_ref_index) + 16 pre_defined/reserved
    codec = sd_width = sd_height = None
    s, e = _find(data, stbl_s, stbl_e, b"stsd")
    count, pos = _table(data, s, e, 0)
    if count >= 1:
        for k, bs, be in _walk(data, pos, e):
            codec = k.decode("ascii", "replace").strip()
            if be - bs >= 28:
                sd_width, sd_height = struct.unpack(">HH", data[bs + 24:bs + 28])
            break

    # stts — duration runs
    s, e = _find(data, stbl_s, stbl_e, b"stts")
    count, pos = _table(data, s, e, 8)
    raw = _u32s(data, pos, 2 * count, e)
    stts_runs = [(raw[2 * i], raw[2 * i + 1]) for i in range(count)]

    # stsz — per-sample sizes (uniform-size form supported)
    s, e = _find(data, stbl_s, stbl_e, b"stsz")
    if s + 12 > e:
        raise Mp4Error("truncated stsz box")
    uniform, n_samples = struct.unpack(">II", data[s + 4:s + 12])
    if n_samples > MAX_SAMPLES:
        raise Mp4Error(f"sample cap exceeded ({n_samples})")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = _u32s(data, s + 12, n_samples, e)
    if sum(c for c, _ in stts_runs) != n_samples:
        raise Mp4Error("stts sample count != stsz sample count")

    # stco / co64 — chunk offsets
    try:
        s, e = _find(data, stbl_s, stbl_e, b"stco")
        count, pos = _table(data, s, e, 4)
        chunk_offsets = _u32s(data, pos, count, e)
    except Mp4Error:
        s, e = _find(data, stbl_s, stbl_e, b"co64")
        count, pos = _table(data, s, e, 8)
        if pos + 8 * count > e:
            raise Mp4Error("co64 entries past box end") from None
        chunk_offsets = list(
            struct.unpack(f">{count}Q", data[pos:pos + 8 * count])
        )

    # stsc — sample→chunk runs: (first_chunk, samples_per_chunk, _desc)
    s, e = _find(data, stbl_s, stbl_e, b"stsc")
    count, pos = _table(data, s, e, 12)
    raw = _u32s(data, pos, 3 * count, e)
    stsc = [(raw[3 * i], raw[3 * i + 1]) for i in range(count)]

    offsets = _resolve_offsets(sizes, chunk_offsets, stsc, len(data))
    return SampleTable(sizes, offsets, stts_runs, codec, sd_width, sd_height)


def _resolve_offsets(
    sizes: list[int],
    chunk_offsets: list[int],
    stsc: list[tuple[int, int]],
    file_len: int,
) -> list[int]:
    """The real ISO-BMFF algorithm: stsc runs say how many samples each
    chunk holds (run applies from first_chunk until the next run's
    first_chunk); samples pack back-to-back inside a chunk starting at
    its stco offset."""
    if not stsc or stsc[0][0] != 1:
        raise Mp4Error("stsc must start at chunk 1")
    offsets: list[int] = []
    si = 0
    n_chunks = len(chunk_offsets)
    for run_idx, (first_chunk, per_chunk) in enumerate(stsc):
        last_chunk = (
            stsc[run_idx + 1][0] - 1 if run_idx + 1 < len(stsc) else n_chunks
        )
        if first_chunk < 1 or last_chunk > n_chunks or per_chunk < 0:
            raise Mp4Error("stsc run out of chunk range")
        for chunk in range(first_chunk, last_chunk + 1):
            pos = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return offsets  # trailing over-wide run: done
                if pos + sizes[si] > file_len:
                    raise Mp4Error(f"sample {si} extends past end of file")
                offsets.append(pos)
                pos += sizes[si]
                si += 1
    if si != len(sizes):
        raise Mp4Error("stsc mapping covers fewer samples than stsz")
    return offsets


def sample_payload(data: bytes, table: SampleTable, i: int) -> bytes:
    """The actual bytes of sample ``i`` — what a demuxer feeds the
    codec. Offsets were bounds-checked at parse time."""
    if not 0 <= i < table.n_samples:
        raise Mp4Error(f"sample index {i} out of range")
    off = table.offsets[i]
    return data[off:off + table.sizes[i]]
