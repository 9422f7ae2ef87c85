"""Real DOCX (OOXML WordprocessingML) text-span codec — stdlib only.

The reference allow-lists ``.docx`` uploads first-class (app.py:46)
but its own TODO admits the OCR API never processes them — a docx
corpus extracts nothing. This module closes that gap for the engine:
a DOCX is a ZIP archive whose main part is ``word/document.xml``
(ECMA-376 WordprocessingML), so a stdlib ``zipfile`` + ElementTree
walk yields the ordered paragraph/run text with no native deps.

* ``build_docx`` — minimal valid DOCX writer: ``[Content_Types].xml``,
  ``_rels/.rels`` and ``word/document.xml`` with one ``<w:p>`` per
  paragraph and one ``<w:r><w:t>`` per run (tabs/newlines inside run
  text become ``<w:tab/>``/``<w:br/>`` elements, per the spec). Exists
  for fixtures and the round-trip property tests.
* ``parse_docx_spans`` — real parse: bounded ZIP open, XML parse of
  the document part, document-order walk of every ``<w:p>`` (including
  paragraphs nested in tables) and its ``<w:r>`` runs (including runs
  inside hyperlinks), concatenating ``<w:t>`` text with ``<w:tab/>`` →
  ``\\t`` and ``<w:br/>``/``<w:cr/>`` → ``\\n``. Output rows use the
  engine span struct (``functions/pdf.py`` keys): ``{page, span_idx,
  text, x0, y0, x1, y1, kind='docx'}`` — one span per run. DOCX has no
  page geometry before layout, so ``page`` is always 0 and the bbox is
  the same deterministic fixed-advance estimate the PDF parser uses
  (``CHAR_WIDTH·size`` per char, one ``LINE_HEIGHT`` row per
  paragraph), identical in writer and parser (round-trip-exact).
* ``paragraph_texts`` — convenience: spans → ordered paragraph strings
  (runs of one paragraph concatenated), the per-document extraction
  the F1/S4 pipeline consumes.

Hardening as in png/jpeg/wav/avi/pdf: every malformed input raises
``DocxError`` (never ``BadZipFile``/``ParseError``/``KeyError``),
inflate bounded by ``MAX_XML_BYTES`` *before* extraction (zip-bomb
guard on the declared size AND on the actual read), entry-count cap.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
import xml.etree.ElementTree as ET

MAX_XML_BYTES = 1 << 24  # 16 MiB document part after inflate
MAX_ENTRIES = 10_000
MAX_PARAGRAPHS = 100_000
CHAR_WIDTH = 0.6  # same fixed-advance convention as functions/pdf.py
FONT_SIZE = 12.0
LINE_HEIGHT = 14.0  # vertical advance per paragraph

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


class DocxError(ValueError):
    """Malformed or unsupported DOCX."""


# ------------------------------------------------------------- writer ---

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)


def _xml_escape(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _run_xml(run: str) -> str:
    """One ``<w:r>``: text split at tabs/newlines into ``<w:t>`` chunks
    interleaved with ``<w:tab/>``/``<w:br/>`` elements (spec encoding —
    literal \\t/\\n inside ``<w:t>`` would be XML-whitespace-mangled)."""
    parts: list[str] = []
    for piece in re.split(r"([\t\n])", run):
        if piece == "\t":
            parts.append("<w:tab/>")
        elif piece == "\n":
            parts.append("<w:br/>")
        elif piece:
            # xml:space="preserve" keeps leading/trailing spaces intact
            parts.append(
                f'<w:t xml:space="preserve">{_xml_escape(piece)}</w:t>'
            )
    return "<w:r>" + "".join(parts) + "</w:r>"


def build_docx(paragraphs: list) -> bytes:
    """Minimal DOCX. ``paragraphs`` is a list where each element is a
    paragraph: either a plain string (one run) or a list of run
    strings (concatenated without separators on parse)."""
    body_parts: list[str] = []
    for para in paragraphs:
        runs = [para] if isinstance(para, str) else list(para)
        body_parts.append("<w:p>" + "".join(_run_xml(r) for r in runs) + "</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + "".join(body_parts)
        + "<w:sectPr/></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()


# ------------------------------------------------------------- parser ---


def _document_xml(data: bytes) -> bytes:
    """Bounded extraction of the main document part."""
    if len(data) < 4 or not data.startswith(b"PK\x03\x04"):
        raise DocxError("not a DOCX (bad ZIP magic)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError, ValueError, NotImplementedError) as e:
        # ValueError: mutated central-directory offsets (negative seek);
        # NotImplementedError: mutated "version needed to extract" field
        raise DocxError(f"bad ZIP container: {e}") from None
    with zf:
        infos = zf.infolist()
        if len(infos) > MAX_ENTRIES:
            raise DocxError(f"too many ZIP entries ({len(infos)})")
        try:
            info = zf.getinfo("word/document.xml")
        except KeyError:
            raise DocxError("no word/document.xml part") from None
        # bomb guard: reject on the DECLARED size, then cap the actual
        # read too (the local header's size field can lie)
        if info.file_size > MAX_XML_BYTES:
            raise DocxError(f"document part too large ({info.file_size} B)")
        try:
            with zf.open(info) as f:
                xml = f.read(MAX_XML_BYTES + 1)
        except (zipfile.BadZipFile, OSError, zlib.error, EOFError,
                NotImplementedError, RuntimeError, ValueError) as e:
            # zlib.error: mutated deflate stream; NotImplementedError:
            # mutated compression-method field; RuntimeError: spurious
            # encryption flag bit; ValueError: mutated local-header
            # offset (negative seek inside zf.open)
            raise DocxError(f"corrupt document part: {e}") from None
    if len(xml) > MAX_XML_BYTES:
        raise DocxError("document part exceeds inflate cap")
    return xml


def parse_docx_spans(data: bytes) -> list[dict]:
    """DOCX bytes → ordered span dicts, one per run (engine span-struct
    shape — see module docstring for the bbox convention)."""
    xml = _document_xml(data)
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise DocxError(f"malformed document XML: {e}") from None
    if root.tag != f"{{{_W}}}document":
        raise DocxError(f"unexpected root element {root.tag!r}")
    body = root.find(f"{{{_W}}}body")
    if body is None:
        raise DocxError("document has no body")
    spans: list[dict] = []
    span_idx = 0
    # body.iter walks nested structures (tables, hyperlinks) in
    # document order — exactly the reading order a text extractor wants
    paragraphs = list(body.iter(f"{{{_W}}}p"))
    if len(paragraphs) > MAX_PARAGRAPHS:
        raise DocxError(f"too many paragraphs ({len(paragraphs)})")
    for para_idx, p in enumerate(paragraphs):
        x = 0.0
        y0 = round(para_idx * LINE_HEIGHT, 3)
        for r in p.iter(f"{{{_W}}}r"):
            pieces: list[str] = []
            for child in r:
                tag = child.tag
                if tag == f"{{{_W}}}t":
                    pieces.append(child.text or "")
                elif tag == f"{{{_W}}}tab":
                    pieces.append("\t")
                elif tag in (f"{{{_W}}}br", f"{{{_W}}}cr"):
                    pieces.append("\n")
            text = "".join(pieces)
            if not text:
                continue
            width = CHAR_WIDTH * FONT_SIZE * len(text)
            spans.append(
                {
                    "page": 0,
                    "span_idx": span_idx,
                    "text": text,
                    "x0": round(x, 3),
                    "y0": y0,
                    "x1": round(x + width, 3),
                    "y1": round(para_idx * LINE_HEIGHT + FONT_SIZE, 3),
                    "kind": "docx",
                }
            )
            span_idx += 1
            x += width
    return spans


def paragraph_texts(data: bytes) -> list[str]:
    """DOCX bytes → ordered paragraph strings (runs concatenated).
    Empty paragraphs (no text in any run) are dropped — the extraction
    the pipeline consumes, mirroring how the reference app treats
    whitespace-only OCR output (app.py markdown assembly skips blanks)."""
    paras: dict[float, list[str]] = {}
    order: list[float] = []
    for s in parse_docx_spans(data):
        key = s["y0"]
        if key not in paras:
            paras[key] = []
            order.append(key)
        paras[key].append(s["text"])
    return ["".join(paras[k]) for k in order if "".join(paras[k])]
