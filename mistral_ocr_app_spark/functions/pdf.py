"""Minimal real PDF text-span codec (stdlib + zlib, public PDF 1.4 spec).

The reference opens PDFs with PyMuPDF (app.py:273-356: per-page walk,
image rects, 200-dpi rasters); the north rule asks for "PDF layout
parsing into ordered text spans with page/bbox structure". The engine's
span source (`functions/spans.py`) covers the *shape*; this module adds
a genuine byte-level PDF parse so the S4 path is real for actual PDF
files, not only for pre-serialized payloads:

* ``build_pdf`` — minimal PDF writer: catalog → pages tree → per-page
  FlateDecode content streams of ``BT /F1 <size> Tf <x> <y> Td (text)
  Tj ET`` runs, correct xref table. Exists for fixtures and the
  round-trip property tests.
* ``parse_pdf_spans`` — real parse: object scan, page-tree walk
  (/Root → /Pages → /Kids, nested kids supported), FlateDecode
  inflate (bounded), content-stream tokenizer tracking the text matrix
  (``Td``/``TD``/``Tm``), font size (``Tf``), leading (``TL``/``T*``)
  and the ``Tj``/``'``/``TJ`` show operators with PDF string escapes
  (``\\(``, ``\\)``, ``\\\\``, ``\\n``..., octal). Output rows use the
  engine's span struct: ``{page, span_idx, text, x0, y0, x1, y1,
  kind='pdf'}``. Glyph metrics are not embedded in minimal PDFs, so
  the bbox convention is the fixed-advance estimate ``x1 = x0 +
  0.6·size·len(text)``, ``y1 = y0 + size`` — deterministic and
  identical in writer and parser (round-trip-exact).

Hardening as in png/jpeg/wav/avi: bounds-checked reads raising
``PdfError`` (never ``struct.error``/``IndexError``), inflate bounded
by ``MAX_STREAM_BYTES``, object and page caps, no position can fail to
advance (no infinite chunk walks).
"""

from __future__ import annotations

import re
import zlib

MAX_STREAM_BYTES = 1 << 24  # 16 MiB per content stream after inflate
MAX_OBJECTS = 10_000
MAX_PAGES = 5_000
CHAR_WIDTH = 0.6  # fixed-advance width estimate, fraction of font size


class PdfError(ValueError):
    """Malformed or unsupported PDF."""


# ------------------------------------------------------------- writer ---


def _esc(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: list[list[dict]], compress: bool = True) -> bytes:
    """Minimal one-font PDF. ``pages`` is a list of pages, each a list
    of span dicts with keys ``text`` (str), ``x0``/``y0`` (numbers) and
    optional ``size`` (default 12)."""
    objs: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for spans in pages:
        parts = []
        for s in spans:
            size = float(s.get("size", 12))
            parts.append(
                f"BT /F1 {size:g} Tf {float(s['x0']):g} {float(s['y0']):g} Td "
                f"({_esc(s['text'])}) Tj ET".encode("latin-1", "replace")
            )
        stream = b"\n".join(parts)
        if compress:
            deflated = zlib.compress(stream, 6)
            body = (
                b"<< /Length " + str(len(deflated)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + deflated + b"\nendstream"
            )
        else:
            body = (
                b"<< /Length " + str(len(stream)).encode()
                + b" >>\nstream\n" + stream + b"\nendstream"
            )
        content_ids.append(add(body))
    pages_id = len(objs) + len(pages) + 1  # after all page objects
    for cid in content_ids:
        page_ids.append(
            add(
                f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font} 0 R >> >> "
                f"/Contents {cid} 0 R >>".encode()
            )
        )
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    assert add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode()
    ) == pages_id
    root = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root {root} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


# ------------------------------------------------------------- parser ---

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b", re.S)
_STRING_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _objects(data: bytes) -> dict[int, bytes]:
    """object number → raw body (between ``obj`` and ``endobj``)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        if len(objs) >= MAX_OBJECTS:
            raise PdfError("object count exceeds cap")
        end = data.find(b"endobj", m.end())
        if end < 0:
            raise PdfError("unterminated object")
        objs[int(m.group(1))] = data[m.end() : end]
    return objs


def _ref(body: bytes, name: bytes) -> int | None:
    m = re.search(rb"/" + name + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _stream(body: bytes) -> bytes:
    i = body.find(b"stream")
    if i < 0:
        raise PdfError("content object has no stream")
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] in (b"\n", b"\r"):
        j += 1
    k = body.rfind(b"endstream")
    if k < 0 or k < j:
        raise PdfError("unterminated stream")
    raw = body[j:k].rstrip(b"\r\n")
    if b"/FlateDecode" in body[:i]:
        try:
            dobj = zlib.decompressobj()
            out = dobj.decompress(raw, MAX_STREAM_BYTES + 1)
        except zlib.error as e:
            raise PdfError(f"stream inflate failed: {e}") from None
        if len(out) > MAX_STREAM_BYTES:
            raise PdfError("content stream exceeds size cap (bomb guard)")
        return out
    if len(raw) > MAX_STREAM_BYTES:
        raise PdfError("content stream exceeds size cap")
    return raw


def _page_ids(objs: dict[int, bytes]) -> list[int]:
    """Page object ids in page-tree order (Kids walk, nesting ok)."""
    root_id = None
    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            root_id = _ref(body, b"Pages")
            break
    order: list[int] = []

    def walk(node_id: int, depth: int = 0) -> None:
        if depth > 32 or len(order) > MAX_PAGES:
            raise PdfError("page tree too deep or too large")
        body = objs.get(node_id)
        if body is None:
            return
        if b"/Page" in body and b"/Pages" not in body:
            order.append(node_id)
            return
        m = re.search(rb"/Kids\s*\[([^\]]*)\]", body)
        if not m:
            return
        for km in re.finditer(rb"(\d+)\s+\d+\s+R", m.group(1)):
            walk(int(km.group(1)), depth + 1)

    if root_id is not None:
        walk(root_id)
    if not order:  # degraded PDFs: fall back to document order
        order = [
            oid for oid, body in sorted(objs.items())
            if b"/Type" in body and b"/Page" in body and b"/Pages" not in body
        ]
    return order


def _pdf_string(tok: bytes) -> str:
    """Decode one ( ... ) string literal with PDF escapes."""
    out: list[str] = []
    i = 0
    while i < len(tok):
        c = tok[i]
        if c == 0x5C and i + 1 < len(tok):  # backslash
            n = tok[i + 1]
            if 0x30 <= n <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(tok) and len(oct_digits) < 3 and 0x30 <= tok[j] <= 0x37:
                    oct_digits += bytes([tok[j]])
                    j += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
                i = j
                continue
            out.append(_STRING_ESCAPES.get(n, chr(n)))
            i += 2
            continue
        out.append(chr(c))
        i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"     # string literal
    rb"|\[(?:[^\]\\]|\\.)*\]"    # TJ array
    rb"|/[A-Za-z0-9]+"           # name
    rb"|[-+]?\d*\.?\d+"          # number
    rb"|[A-Za-z'\"*]+"           # operator
)


def parse_pdf_spans(data: bytes) -> list[dict]:
    """Real PDF → ordered span dicts (engine span-struct shape).

    Scope: classic uncompressed-xref PDFs whose page/content objects
    are top-level ``N 0 obj`` bodies (what ``build_pdf`` writes and
    what most pre-1.5-style generators emit). Documents that hide
    their objects in object streams (``/ObjStm``, PDF 1.5 compressed
    xref) raise ``PdfError`` — the explicit unsupported-shape signal —
    rather than silently returning zero spans."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (bad magic)")
    objs = _objects(data)
    page_ids = _page_ids(objs)
    if not page_ids:
        reason = (
            "object-stream (/ObjStm) PDFs unsupported"
            if b"/ObjStm" in data
            else "no page objects found"
        )
        raise PdfError(reason)
    spans: list[dict] = []
    for page_no, pid in enumerate(page_ids):
        body = objs[pid]
        cid = _ref(body, b"Contents")
        if cid is None or cid not in objs:
            continue
        content = _stream(objs[cid])
        x = y = 0.0
        line_x = line_y = 0.0
        size = 12.0
        leading = 0.0
        span_idx = 0
        stack: list[bytes] = []
        for m in _TOKEN_RE.finditer(content):
            tok = m.group(0)
            if tok[:1] in (b"(", b"["):
                stack.append(tok)
                continue
            if tok[:1] == b"/" or re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
                stack.append(tok)
                continue
            op = tok

            def num(idx_from_end: int) -> float:
                try:
                    return float(stack[idx_from_end])
                except (IndexError, ValueError):
                    raise PdfError(f"malformed operands for {op!r}") from None

            if op == b"Tf":
                size = num(-1)
            elif op in (b"Td", b"TD"):
                tx, ty = num(-2), num(-1)
                line_x, line_y = line_x + tx, line_y + ty
                x, y = line_x, line_y
                if op == b"TD":
                    leading = -ty
            elif op == b"Tm":
                line_x, line_y = num(-2), num(-1)
                x, y = line_x, line_y
            elif op == b"TL":
                leading = num(-1)
            elif op == b"T*":
                line_y -= leading
                x, y = line_x, line_y
            elif op == b"BT":
                x = y = line_x = line_y = 0.0
            elif op in (b"Tj", b"'"):
                if op == b"'":
                    line_y -= leading
                    x, y = line_x, line_y
                if not stack or stack[-1][:1] != b"(":
                    raise PdfError("show operator without string")
                text = _pdf_string(stack[-1][1:-1])
                spans.append(_span(page_no, span_idx, text, x, y, size))
                span_idx += 1
                x += CHAR_WIDTH * size * len(text)
            elif op == b"TJ":
                if not stack or stack[-1][:1] != b"[":
                    raise PdfError("TJ without array")
                for sm in re.finditer(rb"\((?:[^()\\]|\\.)*\)", stack[-1]):
                    text = _pdf_string(sm.group(0)[1:-1])
                    spans.append(_span(page_no, span_idx, text, x, y, size))
                    span_idx += 1
                    x += CHAR_WIDTH * size * len(text)
            stack.clear()
    return spans


def _span(page: int, span_idx: int, text: str, x: float, y: float, size: float) -> dict:
    return {
        "page": page,
        "span_idx": span_idx,
        "text": text,
        "x0": round(x, 3),
        "y0": round(y, 3),
        "x1": round(x + CHAR_WIDTH * size * len(text), 3),
        "y1": round(y + size, 3),
        "kind": "pdf",
    }
