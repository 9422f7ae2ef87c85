"""Real DOCX span parse (functions/docx.py + extract.parse_docx_bytes_udf):
round-trip identity, nested-structure walk, untrusted-input fuzz, and the
Spark fan-out path. Reference parity: app.py:46 allow-lists .docx but the
OCR API never extracts it (the app's own TODO) — the engine parser is the
real extraction the reference lacks."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mistral_ocr_app_spark.functions.docx import (
    CHAR_WIDTH,
    FONT_SIZE,
    LINE_HEIGHT,
    MAX_XML_BYTES,
    DocxError,
    build_docx,
    paragraph_texts,
    parse_docx_spans,
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

run_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1,
    max_size=20,
)
para_st = st.one_of(run_st, st.lists(run_st, min_size=1, max_size=4))
paras_st = st.lists(para_st, min_size=1, max_size=6)


@settings(max_examples=60, deadline=None)
@given(paras=paras_st)
def test_docx_roundtrip(paras):
    data = build_docx(paras)
    spans = parse_docx_spans(data)
    expected = [
        [p] if isinstance(p, str) else [r for r in p if r] for p in paras
    ]
    # run concatenation per paragraph must be exact
    assert paragraph_texts(data) == [
        "".join(runs) for runs in expected if "".join(runs)
    ]
    # span geometry: fixed-advance x within a paragraph, one
    # LINE_HEIGHT row per paragraph, dense global span_idx
    assert [s["span_idx"] for s in spans] == list(range(len(spans)))
    for s in spans:
        assert s["page"] == 0 and s["kind"] == "docx"
        assert s["x1"] == round(
            s["x0"] + CHAR_WIDTH * FONT_SIZE * len(s["text"]), 3
        )
    for para_idx, runs in enumerate(expected):
        got = [s for s in spans if s["y0"] == round(para_idx * LINE_HEIGHT, 3)]
        assert [s["text"] for s in got] == [r for r in runs if r]
        x = 0.0
        for s in got:
            assert s["x0"] == round(x, 3)
            x += CHAR_WIDTH * FONT_SIZE * len(s["text"])


def test_docx_tabs_breaks_and_escapes_roundtrip():
    paras = ["col1\tcol2", "line1\nline2", 'a<b>&amp;</b> "q" \'s\'',
             "  leading and trailing  "]
    assert paragraph_texts(build_docx(paras)) == paras


def _docx_with_document(document_xml: str) -> bytes:
    """Wrap a raw document part in an otherwise-valid DOCX container."""
    base = build_docx(["placeholder"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, \
            zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as dst:
        for info in src.infolist():
            if info.filename == "word/document.xml":
                dst.writestr(info.filename, document_xml)
            else:
                dst.writestr(info.filename, src.read(info))
    return buf.getvalue()


def test_docx_table_and_hyperlink_nesting():
    """Paragraphs inside w:tbl cells and runs inside w:hyperlink must be
    walked in document order — body.iter covers nesting python-docx
    users rely on."""
    doc = (
        f'<w:document xmlns:w="{_W}"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc>"
        "<w:p><w:r><w:t>cell one</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
        "<w:p><w:hyperlink><w:r><w:t>linked</w:t></w:r></w:hyperlink>"
        "<w:r><w:t> after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    assert paragraph_texts(_docx_with_document(doc)) == [
        "before", "cell one", "cell two", "linked after"
    ]


def test_docx_empty_runs_and_paragraphs_dropped():
    data = build_docx(["", ["", ""], "real", [""]])
    assert paragraph_texts(data) == ["real"]
    assert [s["text"] for s in parse_docx_spans(data)] == ["real"]


def test_docx_bomb_guard():
    huge = "<w:p><w:r><w:t>x</w:t></w:r></w:p>" * (MAX_XML_BYTES // 30)
    doc = f'<w:document xmlns:w="{_W}"><w:body>' + huge + "</w:body></w:document>"
    with pytest.raises(DocxError, match="too large|cap"):
        parse_docx_spans(_docx_with_document(doc))


def test_docx_missing_part_and_bad_xml_raise():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/other.xml", "<a/>")
    with pytest.raises(DocxError, match="document.xml"):
        parse_docx_spans(buf.getvalue())
    with pytest.raises(DocxError, match="malformed"):
        parse_docx_spans(_docx_with_document("<w:document"))
    with pytest.raises(DocxError, match="root"):
        parse_docx_spans(_docx_with_document("<other/>"))
    with pytest.raises(DocxError, match="magic"):
        parse_docx_spans(b"not a zip at all")


@settings(max_examples=120, deadline=None)
@given(pos=st.integers(0, 5_000), val=st.integers(0, 255))
def test_docx_single_byte_mutation_never_crashes(pos, val):
    base = build_docx(["mutation target paragraph", ["two ", "runs"]])
    data = bytearray(base)
    data[pos % len(data)] = val
    try:
        spans = parse_docx_spans(bytes(data))
        assert isinstance(spans, list)
    except DocxError:
        pass  # documented containment path


def test_spark_docx_span_fanout(spark):
    """Binary DOCX column → exploded run-span rows via the Arrow-batched
    UDF: the real-DOCX S4 path end to end on Spark."""
    from mistral_ocr_app_spark.operators.extract import extract_docx_spans

    rows = [
        (0, build_docx(["doc0 para0", ["doc0 ", "para1"]])),
        (1, build_docx(["doc1 only"])),
        (2, b"not a docx"),  # contained: contributes zero rows
    ]
    df = spark.createDataFrame(rows, "doc_id int, content binary")
    out = extract_docx_spans(df).toPandas().sort_values(
        ["doc_id", "span_idx"]
    ).reset_index(drop=True)
    assert list(out["text"]) == ["doc0 para0", "doc0 ", "para1", "doc1 only"]
    assert list(out["y0"]) == [0.0, LINE_HEIGHT, LINE_HEIGHT, 0.0]
    assert out["kind"].eq("docx").all()
    assert out["page"].eq(0).all()


def test_spark_mixed_document_router(spark):
    """extract_document_spans routes a MIXED pdf/docx binary column by
    magic bytes in one pass — row-identical to running the per-format
    extractors on the pre-split corpus."""
    import pandas as pd
    from mistral_ocr_app_spark.functions.pdf import build_pdf
    from mistral_ocr_app_spark.operators.extract import (
        extract_document_spans,
        extract_docx_spans,
        extract_pdf_spans,
    )

    rows = [
        (0, build_pdf([[{"text": "pdf span", "x0": 72, "y0": 700}]])),
        (1, build_docx(["docx para", ["two ", "runs"]])),
        (2, b"neither format"),   # contained: zero rows
        (3, None),                # NULL payload: zero rows
        (4, b"PK\x03\x04 but not a real zip"),  # sniffs docx, contained
    ]
    df = spark.createDataFrame(rows, "doc_id int, content binary")
    got = extract_document_spans(df).toPandas().sort_values(
        ["doc_id", "page", "span_idx"]
    ).reset_index(drop=True)
    want = pd.concat([
        extract_pdf_spans(df.filter("doc_id = 0")).toPandas(),
        extract_docx_spans(df.filter("doc_id = 1")).toPandas(),
    ]).sort_values(["doc_id", "page", "span_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["kind"]) == {"pdf", "docx"}
