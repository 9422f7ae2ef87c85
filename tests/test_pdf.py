"""Real PDF span parse (functions/pdf.py + extract.parse_pdf_bytes_udf):
round-trip identity, operator coverage, untrusted-input fuzz, and the
Spark fan-out path."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mistral_ocr_app_spark.functions.pdf import (
    CHAR_WIDTH,
    PdfError,
    build_pdf,
    parse_pdf_spans,
)

span_text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=30,
)
span_st = st.fixed_dictionaries(
    {
        "text": span_text_st,
        "x0": st.integers(0, 600),
        "y0": st.integers(0, 780),
        "size": st.integers(6, 24),
    }
)
pages_st = st.lists(st.lists(span_st, max_size=5), min_size=1, max_size=4)


@settings(max_examples=60, deadline=None)
@given(pages=pages_st, compress=st.booleans())
def test_pdf_roundtrip(pages, compress):
    spans = parse_pdf_spans(build_pdf(pages, compress=compress))
    flat = [(i, s) for i, page in enumerate(pages) for s in page]
    assert len(spans) == len(flat)
    for got, (page_no, src) in zip(spans, flat):
        assert got["page"] == page_no
        assert got["text"] == src["text"]
        assert got["x0"] == float(src["x0"]) and got["y0"] == float(src["y0"])
        assert got["x1"] == round(
            src["x0"] + CHAR_WIDTH * src["size"] * len(src["text"]), 3
        )
        assert got["y1"] == round(src["y0"] + src["size"], 3)
        assert got["kind"] == "pdf"
    # span_idx restarts per page and is dense
    for page_no in range(len(pages)):
        idxs = [s["span_idx"] for s in spans if s["page"] == page_no]
        assert idxs == list(range(len(idxs)))


def _pdf_with_content(content: bytes) -> bytes:
    """Wrap a raw content stream in a 1-page PDF skeleton."""
    pdf = build_pdf([[{"text": "placeholder", "x0": 0, "y0": 0}]], compress=True)
    # splice: rebuild with our own stream via the writer's plumbing
    deflated = zlib.compress(content, 6)
    body = (
        b"2 0 obj\n<< /Length " + str(len(deflated)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + deflated + b"\nendstream\nendobj\n"
    )
    # replace object 2 (the content stream) wholesale
    start = pdf.find(b"2 0 obj")
    end = pdf.find(b"endobj", start) + len(b"endobj\n")
    return pdf[:start] + body + pdf[end:]


def test_pdf_tj_array_and_leading_operators():
    """TJ (array show), TL/T* (leading) and ' (next-line show) paths."""
    content = (
        b"BT /F1 10 Tf 50 700 Td [(ab) -120 (cd)] TJ ET\n"
        b"BT /F1 12 Tf 50 600 Td 14 TL (first) Tj T* (second) ' ET"
    )
    spans = parse_pdf_spans(_pdf_with_content(content))
    texts = [s["text"] for s in spans]
    assert texts == ["ab", "cd", "first", "second"]
    # TJ advances x between array strings by the fixed-advance estimate
    assert spans[1]["x0"] == spans[0]["x1"]
    # T* + ' dropped y by the leading twice from 600
    assert spans[3]["y0"] == 600 - 2 * 14


def test_pdf_escapes_and_octal():
    content = rb"BT /F1 12 Tf 10 10 Td (a\(b\)c\\d\ne\101) Tj ET"
    spans = parse_pdf_spans(_pdf_with_content(content))
    assert spans[0]["text"] == "a(b)c\\d\neA"


def test_pdf_bomb_guard():
    huge = zlib.compress(b"(x) Tj " * 3_000_000, 9)  # inflates > 16 MiB
    body = (
        b"2 0 obj\n<< /Length " + str(len(huge)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + huge + b"\nendstream\nendobj\n"
    )
    pdf = build_pdf([[{"text": "x", "x0": 0, "y0": 0}]])
    start = pdf.find(b"2 0 obj")
    end = pdf.find(b"endobj", start) + len(b"endobj\n")
    with pytest.raises(PdfError, match="cap"):
        parse_pdf_spans(pdf[:start] + body + pdf[end:])


@settings(max_examples=120, deadline=None)
@given(pos=st.integers(0, 5_000), val=st.integers(0, 255))
def test_pdf_single_byte_mutation_never_crashes(pos, val):
    base = build_pdf(
        [[{"text": "mutation target", "x0": 72, "y0": 700}],
         [{"text": "page 2", "x0": 10, "y0": 20}]]
    )
    data = bytearray(base)
    data[pos % len(data)] = val
    try:
        spans = parse_pdf_spans(bytes(data))
        assert isinstance(spans, list)
    except PdfError:
        pass  # documented containment path


def test_pdf_pageless_and_objstm_raise():
    """A structurally-PDF-ish stream with no reachable page objects
    (e.g. an object-stream document whose pages hide in /ObjStm) must
    raise the explicit unsupported signal, never silently return []."""
    with pytest.raises(PdfError, match="no page objects"):
        parse_pdf_spans(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n%%EOF")
    with pytest.raises(PdfError, match="ObjStm"):
        parse_pdf_spans(
            b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /N 3 >>\nendobj\n%%EOF"
        )


def test_spark_pdf_span_fanout(spark):
    """Binary PDF column → exploded span rows via the Arrow-batched
    UDF: the real-PDF S4 path end to end on Spark."""
    from mistral_ocr_app_spark.operators.extract import extract_pdf_spans

    rows = [
        (0, build_pdf([[{"text": "doc0 span0", "x0": 72, "y0": 700},
                        {"text": "doc0 span1", "x0": 72, "y0": 680}]])),
        (1, build_pdf([[{"text": "doc1 p0", "x0": 10, "y0": 10}],
                       [{"text": "doc1 p1", "x0": 10, "y0": 10}]])),
        (2, b"not a pdf"),  # contained: contributes zero rows
    ]
    df = spark.createDataFrame(rows, "doc_id int, content binary")
    out = extract_pdf_spans(df).toPandas().sort_values(
        ["doc_id", "page", "span_idx"]
    ).reset_index(drop=True)
    assert list(out["text"]) == ["doc0 span0", "doc0 span1", "doc1 p0", "doc1 p1"]
    assert list(out["page"]) == [0, 0, 0, 1]
    assert out["kind"].eq("pdf").all()
