"""Vectorized per-turn extraction — the engine's hot path.

Replaces the reference's per-document synchronous worker
(/root/reference/app.py:697-735 process_ocr_document and its callees)
with Arrow-batched stages over the transcripts table. Extraction is
per-turn embarrassingly parallel: **no shuffle is needed or introduced**
— ``mapInArrow`` runs on the scan partitions as-is, and only the
optional per-conversation assembly (operators/assemble.py) shuffles.

Zero per-row Python at the Spark level (no ``F.udf`` anywhere): batches
cross the JVM↔Python boundary as Arrow record batches, pass-through
columns are re-emitted zero-copy from the input batch's own buffers
(round 7), and the per-kind parsers (functions/*) run inside the worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import html_strip, markdown as md, spans as sp
from ..functions.classify import (
    KIND_BASE64,
    KIND_DOC,
    KIND_EMPTY,
    KIND_HTML,
    KIND_MARKDOWN,
    KIND_SPANS,
    classify_payload,
)

# per-turn extraction output (input cols passed through + derived cols)
EXTRACT_FIELDS = [
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("kind", T.StringType()),
    T.StructField("extracted_text", T.StringType()),
    T.StructField("n_refs", T.IntegerType()),
    T.StructField("n_images", T.IntegerType()),
    T.StructField("n_rewritten", T.IntegerType()),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("valid", T.BooleanType()),
]
EXTRACT_SCHEMA = T.StructType(EXTRACT_FIELDS)

SPAN_STRUCT = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("kind", T.StringType()),
    ]
)


def _extract_one(text: str | None, tool: str | None, turn_idx: int) -> tuple:
    """(kind, extracted_text, n_refs, n_images, n_rewritten, n_spans, valid)."""
    if tool:
        text_out, n_spans, n_images = sp.span_text_stats(tool)
        return (KIND_SPANS, text_out, 0, n_images, 0, n_spans, True)
    kind = classify_payload(text)
    if kind == KIND_EMPTY:
        return (kind, "", 0, 0, 0, 0, True)
    if kind == KIND_MARKDOWN:
        new_md, n_refs, n_imgs, n_upd = md.rewrite_markdown_links(text, turn_idx)
        return (kind, new_md, n_refs, n_imgs, n_upd, 0, True)
    if kind == KIND_DOC:
        combined, n_imgs, n_empty = md.extract_mock_document(text)
        return (kind, combined, 0, n_imgs, n_empty, 0, True)
    if kind == KIND_HTML:
        return (kind, html_strip.strip_boilerplate(text), 0, 0, 0, 0, True)
    # base64 image payload
    parsed = md.parse_base64_payload(text)
    if parsed["valid"]:
        return (kind, f"[image {parsed['format']} {parsed['size']}B]", 0, 1, 0, 0, True)
    return (kind, "[invalid image]", 0, 0, 0, 0, False)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        rows = [
            _extract_one(text, tool, turn_idx)
            for text, tool, turn_idx in zip(
                pdf["text"].to_numpy(), pdf["tool"].to_numpy(), pdf["turn_idx"].to_numpy()
            )
        ]
        kinds, texts_out, n_refs, n_images, n_rewritten, n_spans, valid = zip(*rows)
        idx = pdf.index
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "role": pdf["role"],
                "ts": pdf["ts"],
                "kind": pd.Series(kinds, index=idx),
                "extracted_text": pd.Series(texts_out, index=idx),
                "n_refs": pd.Series(n_refs, index=idx, dtype="int32"),
                "n_images": pd.Series(n_images, index=idx, dtype="int32"),
                "n_rewritten": pd.Series(n_rewritten, index=idx, dtype="int32"),
                "n_spans": pd.Series(n_spans, index=idx, dtype="int32"),
                "valid": pd.Series(valid, index=idx, dtype="bool"),
            }
        )


def _extract_arrow_batches(batches) -> "Iterator":
    """Arrow-native variant of ``_extract_batches`` (round 7, guide §4.2):
    the pass-through columns (conv_id, role, ts) are re-emitted as the
    INPUT batch's own Arrow buffers — zero-copy, never materialized as
    Python/pandas objects — and only text/tool/turn_idx (what
    ``_extract_one`` actually reads) cross into Python-object land.
    Measured on the 1M-turn bench corpus: the worker computes ~23
    core-seconds but the mapInPandas stage burned ~54 — over half the
    stage was Arrow↔pandas conversion, most of it for columns the
    extractor never touches."""
    import pyarrow as pa

    for b in batches:
        if not b.num_rows:
            continue
        idx = {name: i for i, name in enumerate(b.schema.names)}
        turn_idx = b.column(idx["turn_idx"])
        rows = [
            _extract_one(text, tool, ti)
            for text, tool, ti in zip(
                b.column(idx["text"]).to_pylist(),
                b.column(idx["tool"]).to_pylist(),
                turn_idx.to_pylist(),
            )
        ]
        kinds, texts_out, n_refs, n_images, n_rewritten, n_spans, valid = zip(*rows)
        yield pa.RecordBatch.from_arrays(
            [
                b.column(idx["conv_id"]),
                turn_idx.cast(pa.int32()),
                b.column(idx["role"]),
                b.column(idx["ts"]),
                pa.array(kinds, pa.string()),
                pa.array(texts_out, pa.string()),
                pa.array(n_refs, pa.int32()),
                pa.array(n_images, pa.int32()),
                pa.array(n_rewritten, pa.int32()),
                pa.array(n_spans, pa.int32()),
                pa.array(valid, pa.bool_()),
            ],
            names=[f.name for f in EXTRACT_FIELDS],
        )


def extract_turns(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → per-turn
    extraction output (EXTRACT_SCHEMA). Narrow (no shuffle);
    Arrow-native with zero-copy pass-through of untouched columns."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return transcripts.select(*cols).mapInArrow(
        _extract_arrow_batches, EXTRACT_SCHEMA
    )


def salted_repartition(
    transcripts: DataFrame, n_partitions: int, salt: int = 16
) -> DataFrame:
    """conv_id-salted repartition (SURVEY §4.3): partition key is
    (conv_id, xxhash64(turn_idx) mod salt), so one pathological
    conversation spreads across up to ``salt`` partitions instead of
    pinning a single task. Extraction is per-turn parallel, so salting
    cannot change results (pinned by the shuffle-invariance property
    test); assembly re-shuffles by bare conv_id afterwards regardless.

    Use when the upstream file layout is conversation-clustered (e.g.
    ingest wrote one file per conversation); when the scan partitioning
    is already uniform, prefer the shuffle-free narrow path."""
    return transcripts.repartition(
        n_partitions,
        F.col("conv_id"),
        F.pmod(F.xxhash64("turn_idx"), F.lit(salt)),
    )


@F.pandas_udf(T.ArrayType(SPAN_STRUCT))
def parse_spans_udf(tool: pd.Series) -> pd.Series:
    """V3 — span-source payload → ordered span structs (app.py:273-360
    analog). Scalar pandas UDF: Arrow in, Arrow out."""
    return tool.map(lambda t: sp.parse_span_source(t) if t else [])


def extract_spans(transcripts: DataFrame) -> DataFrame:
    """Rows with a span-source payload → (conv_id, turn_idx, spans[])."""
    return (
        transcripts.filter((F.col("tool").isNotNull()) & (F.col("tool") != ""))
        .select(
            "conv_id",
            "turn_idx",
            parse_spans_udf(F.col("tool")).alias("spans"),
        )
    )


def exploded_spans(transcripts: DataFrame) -> DataFrame:
    """Relational span view: one row per span, reading order preserved by
    (conv_id, turn_idx, page, span_idx)."""
    return (
        extract_spans(transcripts)
        .select("conv_id", "turn_idx", F.explode("spans").alias("s"))
        .select("conv_id", "turn_idx", "s.*")
    )


@F.pandas_udf(T.ArrayType(SPAN_STRUCT))
def parse_pdf_bytes_udf(pdf_bytes: pd.Series) -> pd.Series:
    """S4 for REAL PDF bytes — ``functions/pdf.py`` byte-level parse
    (object scan → page-tree walk → FlateDecode → content-stream text
    matrix) to the same ordered span structs as ``parse_spans_udf``.
    Malformed PDFs yield an empty span list (the documented containment
    path), never a task failure."""
    from ..functions import pdf as pdfmod

    def _parse(b) -> list[dict]:
        if b is None:
            return []
        try:
            return pdfmod.parse_pdf_spans(bytes(b))
        except pdfmod.PdfError:
            return []

    return pdf_bytes.map(_parse)


def extract_pdf_spans(pdfs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, <binary PDF column>) → one row per text span, ordered by
    (doc_id, page, span_idx) — the real-PDF analog of ``exploded_spans``."""
    return (
        pdfs.select("doc_id", parse_pdf_bytes_udf(F.col(content_col)).alias("spans"))
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.*")
    )


@F.pandas_udf(T.ArrayType(SPAN_STRUCT))
def parse_docx_bytes_udf(docx_bytes: pd.Series) -> pd.Series:
    """S4 for REAL DOCX bytes — ``functions/docx.py`` ZIP + XML parse
    (bounded zip open → document-order paragraph/run walk) to the same
    ordered span structs as ``parse_pdf_bytes_udf``. The reference
    allow-lists .docx (app.py:46) but never extracts it; this is the
    engine's real extraction path. Malformed DOCX yields an empty span
    list (containment), never a task failure."""
    from ..functions import docx as docxmod

    def _parse(b) -> list[dict]:
        if b is None:
            return []
        try:
            return docxmod.parse_docx_spans(bytes(b))
        except docxmod.DocxError:
            return []

    return docx_bytes.map(_parse)


def extract_docx_spans(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, <binary DOCX column>) → one row per run span, ordered by
    (doc_id, page, span_idx) — the DOCX analog of ``extract_pdf_spans``."""
    return (
        docs.select("doc_id", parse_docx_bytes_udf(F.col(content_col)).alias("spans"))
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.*")
    )


@F.pandas_udf(T.ArrayType(SPAN_STRUCT))
def parse_document_bytes_udf(blob: pd.Series) -> pd.Series:
    """Format-routing S4: sniff each payload's magic bytes and dispatch
    to the matching byte-level parser — ``%PDF-`` → ``functions/pdf.py``,
    ZIP local-file header (``PK\\x03\\x04``, the DOCX container) →
    ``functions/docx.py``. A mixed corpus of the reference's document
    formats (app.py:46 allow-list) extracts in ONE pass with no
    per-format pre-split. Unknown formats and malformed payloads yield
    an empty span list (containment), never a task failure."""
    from ..functions import docx as docxmod
    from ..functions import pdf as pdfmod

    def _parse(b) -> list[dict]:
        if b is None:
            return []
        b = bytes(b)
        try:
            if b.startswith(b"%PDF-"):
                return pdfmod.parse_pdf_spans(b)
            if b.startswith(b"PK\x03\x04"):
                return docxmod.parse_docx_spans(b)
        except (pdfmod.PdfError, docxmod.DocxError):
            pass
        return []

    return blob.map(_parse)


def extract_document_spans(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, <binary column of mixed PDF/DOCX payloads>) → one row
    per span, ordered by (doc_id, page, span_idx): the single-pass
    mixed-format router over ``extract_pdf_spans`` /
    ``extract_docx_spans`` (equality-tested against both)."""
    return (
        docs.select(
            "doc_id", parse_document_bytes_udf(F.col(content_col)).alias("spans")
        )
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.*")
    )


_DOCX_RT_STRUCT = T.StructType(
    [
        T.StructField("n_paras", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


@F.pandas_udf(_DOCX_RT_STRUCT)
def docx_roundtrip_udf(text: pd.Series) -> pd.DataFrame:
    """Build a REAL DOCX from the document's words (one paragraph per
    word, each word split into two runs) and parse it back with the
    byte-level parser — the same build→decode trick the PNG/JPEG media
    fixtures use to make a real codec's output SQL-predictable: the
    oracle recomputes the expected extraction as
    ``array_to_string(list_filter(string_split(text,' '), w<>''),
    chr(10))`` while THIS side goes through genuine ZIP deflate →
    inflate → WordprocessingML parse → run concatenation."""
    from ..functions import docx as docxmod

    def _rt(t) -> tuple:
        if t is None:
            return None, None
        words = [w for w in t.split(" ") if w]
        paras = [[w[: len(w) // 2], w[len(w) // 2:]] for w in words]
        extracted = docxmod.paragraph_texts(docxmod.build_docx(paras))
        return len(extracted), "\n".join(extracted)
    out = [_rt(t) for t in text]
    return pd.DataFrame(out, columns=["n_paras", "text"]).astype(
        {"n_paras": "Int32"}
    )


@F.pandas_udf(T.StringType())
def strip_html_udf(html: pd.Series) -> pd.Series:
    """V2 — north-rule HTML boilerplate stripper as a scalar pandas UDF."""
    return html.map(lambda h: html_strip.strip_boilerplate(h) if h else "")


@F.pandas_udf(T.StringType())
def rewrite_markdown_udf(text: pd.Series, turn_idx: pd.Series) -> pd.Series:
    """V1 — markdown link rewrite (first-occurrence-only, app.py:64-115)."""
    return pd.Series(
        [
            md.rewrite_markdown_links(t or "", int(i))[0]
            for t, i in zip(text, turn_idx)
        ],
        index=text.index,
    )
