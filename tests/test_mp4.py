"""ISO-BMFF sample-table codec (functions/mp4.py): round-trip identity,
the real stsc/stco/stsz/stts semantics, untrusted-input fuzz. The m2
Spark path over these tables is covered in test_multimodal.py."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mistral_ocr_app_spark.functions.mp4 import (
    Mp4Error,
    SampleTable,
    _resolve_offsets,
    build_mp4,
    parse_mp4_sample_table,
    sample_payload,
)

sizes_st = st.lists(st.integers(0, 64), min_size=1, max_size=40)


def _runs_for(n: int, rng_seed: int) -> list[tuple[int, int]]:
    """Deterministic multi-run stts covering n samples."""
    if n <= 1:
        return [(n, 100 + rng_seed % 900)]
    k = 1 + rng_seed % (n - 1) if n > 1 else n
    return [(k, 100 + rng_seed % 900), (n - k, 1000 + rng_seed % 24)]


@settings(max_examples=60, deadline=None)
@given(sizes=sizes_st, seed=st.integers(0, 10_000))
def test_mp4_roundtrip(sizes, seed):
    runs = _runs_for(len(sizes), seed)
    payload = bytes(
        (i * 17 + j) % 256
        for i, s in enumerate(sizes)
        for j in range(s)
    )
    data = build_mp4(sizes, runs, payload)
    t = parse_mp4_sample_table(data)
    assert t.sizes == sizes
    assert t.stts_runs == runs
    # offsets are absolute and contiguous inside the single mdat chunk
    expect = []
    pos = t.offsets[0] if t.offsets else 0
    for s in sizes:
        expect.append(pos)
        pos += s
    assert t.offsets == expect
    for i, s in enumerate(sizes):
        assert sample_payload(data, t, i) == bytes(
            (i * 17 + j) % 256 for j in range(s)
        )
    # durations expand the runs exactly
    durs = [t.sample_duration(i) for i in range(len(sizes))]
    flat = [d for c, d in runs for _ in range(c)]
    assert durs == flat


def _hand_mp4(stsz_body: bytes, chunk_box: bytes,
              largesize_moov: bool = False) -> bytes:
    """Assemble an mp4 from hand-built stbl boxes (one 3×8-byte-sample
    mdat chunk) using the writer's box helpers."""
    from mistral_ocr_app_spark.functions.mp4 import _box, _full_box

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = _box(b"mdat", bytes(24))
    stbl = _box(
        b"stbl",
        _full_box(b"stsd", struct.pack(">I", 0))
        + _full_box(b"stts", struct.pack(">III", 1, 3, 512))
        + _full_box(b"stsc", struct.pack(">IIII", 1, 1, 3, 1))
        + _full_box(b"stsz", stsz_body)
        + chunk_box
    )
    moov_body = _box(b"trak", _box(b"mdia", _box(b"minf", stbl)))
    if largesize_moov:
        moov = struct.pack(">I", 1) + b"moov" \
            + struct.pack(">Q", 16 + len(moov_body)) + moov_body
    else:
        moov = _box(b"moov", moov_body)
    return ftyp + mdat + moov


def test_mp4_uniform_stsz_co64_and_largesize():
    """Uniform-size stsz form, 64-bit co64 offsets, and a 64-bit
    largesize moov header all parse to the same table."""
    from mistral_ocr_app_spark.functions.mp4 import _full_box

    chunk_offset = 32  # ftyp(24) + mdat header(8)
    uniform_stsz = struct.pack(">II", 8, 3)  # sample_size=8, count=3
    stco = _full_box(b"stco", struct.pack(">II", 1, chunk_offset))
    co64 = _full_box(b"co64", struct.pack(">I", 1)
                     + struct.pack(">Q", chunk_offset))
    t = parse_mp4_sample_table(_hand_mp4(uniform_stsz, stco))
    assert t.sizes == [8, 8, 8]
    assert t.offsets == [32, 40, 48]
    t2 = parse_mp4_sample_table(_hand_mp4(uniform_stsz, co64))
    assert t2.sizes == t.sizes and t2.offsets == t.offsets
    t3 = parse_mp4_sample_table(
        _hand_mp4(uniform_stsz, stco, largesize_moov=True)
    )
    assert t3.sizes == t.sizes and t3.offsets == t.offsets


def test_mp4_multichunk_stsc_mapping():
    """The real sample→chunk algorithm: stsc runs with different
    samples-per-chunk across chunks."""
    sizes = [10, 20, 30, 40, 50]
    # chunks at offsets 100 and 300; run1: chunk1 holds 2 samples,
    # run2 (from chunk 2): 3 samples per chunk
    offsets = _resolve_offsets(sizes, [100, 300], [(1, 2), (2, 3)], 10_000)
    assert offsets == [100, 110, 300, 330, 370]
    with pytest.raises(Mp4Error, match="chunk 1"):
        _resolve_offsets(sizes, [100], [(2, 5)], 10_000)
    with pytest.raises(Mp4Error, match="fewer samples"):
        _resolve_offsets(sizes, [100], [(1, 2)], 10_000)
    with pytest.raises(Mp4Error, match="past end"):
        _resolve_offsets(sizes, [9_990], [(1, 5)], 10_000)


def test_mp4_structural_errors():
    with pytest.raises(Mp4Error, match="ftyp"):
        parse_mp4_sample_table(b"\x00" * 40)
    with pytest.raises(Mp4Error, match="no moov"):
        parse_mp4_sample_table(
            struct.pack(">I", 16) + b"ftypisom" + bytes(4)
        )
    with pytest.raises(Mp4Error, match="stts runs do not cover"):
        build_mp4([5, 5], [(1, 512)])
    with pytest.raises(Mp4Error, match="payload length"):
        build_mp4([5, 5], [(2, 512)], b"short")


def test_mp4_sample_index_bounds():
    data = build_mp4([4, 4], [(2, 256)])
    t = parse_mp4_sample_table(data)
    with pytest.raises(Mp4Error, match="out of range"):
        sample_payload(data, t, 2)
    with pytest.raises(Mp4Error, match="out of range"):
        t.sample_duration(-1)


@settings(max_examples=150, deadline=None)
@given(pos=st.integers(0, 5_000), val=st.integers(0, 255))
def test_mp4_single_byte_mutation_never_crashes(pos, val):
    base = build_mp4(
        [12, 7, 31, 24], [(2, 512), (2, 1024)],
        bytes(range(74)),
    )
    data = bytearray(base)
    data[pos % len(data)] = val
    try:
        t = parse_mp4_sample_table(bytes(data))
        assert isinstance(t, SampleTable)
        for i in range(t.n_samples):
            assert isinstance(sample_payload(bytes(data), t, i), bytes)
            assert isinstance(t.sample_duration(i), int)
    except Mp4Error:
        pass  # documented containment path


def test_mp4_stsd_codec_roundtrip():
    """Round 6b: a codec-bearing build writes a real VisualSampleEntry
    (fourcc + declared dims) that the parser reads back; the legacy
    entry-less stsd still parses with codec None."""
    data = build_mp4(
        [8, 8], [(2, 3000)], bytes(16), codec=b"jpeg", width=640, height=480
    )
    t = parse_mp4_sample_table(data)
    assert (t.codec, t.width, t.height) == ("jpeg", 640, 480)
    legacy = parse_mp4_sample_table(build_mp4([8], [(1, 100)]))
    assert legacy.codec is None and legacy.width is None
    with pytest.raises(Mp4Error, match="fourcc"):
        build_mp4([8], [(1, 100)], codec=b"toolong")


def test_mp4_stsd_short_entry_dims_none():
    """An stsd entry too short for the visual fields yields the codec
    fourcc but no dims — lenient on real-world audio/short entries."""
    from mistral_ocr_app_spark.functions.mp4 import _box, _full_box

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = _box(b"mdat", bytes(8))
    stbl = _box(
        b"stbl",
        _full_box(b"stsd", struct.pack(">I", 1) + _box(b"mp4a", bytes(8)))
        + _full_box(b"stts", struct.pack(">III", 1, 1, 512))
        + _full_box(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
        + _full_box(b"stsz", struct.pack(">III", 0, 1, 8))
        + _full_box(b"stco", struct.pack(">II", 1, 32))
    )
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", _box(b"minf", stbl))))
    t = parse_mp4_sample_table(ftyp + mdat + moov)
    assert t.codec == "mp4a" and t.width is None and t.height is None


@settings(max_examples=150, deadline=None)
@given(pos=st.integers(0, 5_000), val=st.integers(0, 255))
def test_mp4_codec_file_mutation_never_crashes(pos, val):
    """Same mutation contract over a codec-bearing file: the stsd walk
    must contain corruption like every other table."""
    base = build_mp4(
        [12, 7, 31, 24], [(2, 512), (2, 1024)],
        bytes(range(74)), codec=b"jpeg", width=16, height=8,
    )
    data = bytearray(base)
    data[pos % len(data)] = val
    try:
        t = parse_mp4_sample_table(bytes(data))
        assert isinstance(t, SampleTable)
        assert t.codec is None or isinstance(t.codec, str)
    except Mp4Error:
        pass  # documented containment path
