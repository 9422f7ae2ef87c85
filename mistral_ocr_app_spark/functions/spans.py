"""Layout-document span parsing — ordered text spans with page/bbox.

From-scratch analog of the reference's PDF layout fallback
(/root/reference/app.py:273-360, PyMuPDF-based): the reference loads each
PDF page, extracts embedded images with float bbox rects
(app.py:341-351), filters CMYK pixmaps via ``pix.n - pix.alpha < 4``
(app.py:327), and rasterizes pages at dpi=200 (app.py:273-300).

Our input is the serialized span-source document carried in the
``tool`` column (FIXTURES.md §2.4):

    {"pages":[{"index":0,
               "blocks":[{"text":..., "bbox":[x0,y0,x1,y1],
                          "kind":"text"|"image",
                          "width":W,"height":H,"channels":C,"alpha":A}]}]}

Blocks arrive deliberately out of reading order; the parser restores the
deterministic order (page asc, then y0 asc, then x0 asc — top-to-bottom,
left-to-right) and applies the CMYK keep-filter to image blocks.

Pure Python; called from a pandas UDF (operators/extract.py).
"""

from __future__ import annotations

import json
from operator import itemgetter
from typing import Any

DPI_DEFAULT = 200  # app.py:273
SCALE = DPI_DEFAULT / 72.0  # app.py:286 fitz.Matrix(dpi/72, dpi/72)


def parse_span_source(payload: str) -> list[dict[str, Any]]:
    """Serialized paged document → ordered spans.

    Returns a list of dicts
    ``{page, span_idx, text, x0, y0, x1, y1, kind}`` in reading order;
    image blocks failing the CMYK filter (``channels - alpha >= 4``,
    app.py:327) are dropped. ``span_idx`` is the 0-based rank within the
    page after ordering. Invalid/empty payloads → [].
    """
    if not payload:
        return []
    try:
        doc = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return []
    if not isinstance(doc, dict):
        return []
    # pages sharing an index merge into one page before ordering (spec:
    # ordering is a function of (page, y0, x0) over ALL blocks)
    by_page: dict[int, list] = {}
    for page in doc.get("pages", []) or []:
        page_idx = int(page.get("index", 0))
        blocks = by_page.setdefault(page_idx, [])
        for blk in page.get("blocks", []) or []:
            bbox = blk.get("bbox") or [0.0, 0.0, 0.0, 0.0]
            if len(bbox) != 4:
                bbox = [0.0, 0.0, 0.0, 0.0]
            kind = blk.get("kind", "text")
            if kind == "image":
                channels = int(blk.get("channels", 3))
                alpha = int(blk.get("alpha", 0))
                if channels - alpha >= 4:  # CMYK — reference drops these
                    continue
            blocks.append(
                {
                    "text": blk.get("text", "") or "",
                    "x0": float(bbox[0]),
                    "y0": float(bbox[1]),
                    "x1": float(bbox[2]),
                    "y1": float(bbox[3]),
                    "kind": kind,
                }
            )
    spans: list[dict[str, Any]] = []
    for page_idx in sorted(by_page):
        blocks = by_page[page_idx]
        blocks.sort(key=lambda b: (b["y0"], b["x0"]))
        for rank, blk in enumerate(blocks):
            spans.append(
                {
                    "page": page_idx,
                    "span_idx": rank,
                    "text": blk["text"],
                    "x0": blk["x0"],
                    "y0": blk["y0"],
                    "x1": blk["x1"],
                    "y1": blk["y1"],
                    "kind": blk["kind"],
                }
            )
    return spans


def spans_to_text(spans: list[dict[str, Any]]) -> str:
    """Ordered text-span concatenation (text-kind spans, ``"\\n"``-joined)."""
    return "\n".join(s["text"] for s in spans if s["kind"] == "text" and s["text"])


def span_text_stats(payload: str) -> tuple[str, int, int]:
    """(ordered_text, n_spans, n_image_spans) for the extract_turns hot
    path: same parse/filter/order semantics as ``parse_span_source`` +
    ``spans_to_text`` (pinned by test + golden gate) but skips building
    the span structs — tuples, one stable sort, one join."""
    if not payload:
        return "", 0, 0
    try:
        doc = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return "", 0, 0
    if not isinstance(doc, dict):
        return "", 0, 0
    by_page: dict[int, list] = {}
    for page in doc.get("pages", []) or []:
        page_idx = int(page.get("index", 0))
        blocks = by_page.setdefault(page_idx, [])
        for blk in page.get("blocks", []) or []:
            bbox = blk.get("bbox") or None
            if not bbox or len(bbox) != 4:
                y0 = x0 = 0.0
            else:
                x0, y0 = float(bbox[0]), float(bbox[1])
            kind = blk.get("kind", "text")
            if kind == "image" and int(blk.get("channels", 3)) - int(
                blk.get("alpha", 0)
            ) >= 4:
                continue
            blocks.append((y0, x0, kind, blk.get("text", "") or ""))
    parts: list[str] = []
    n_spans = n_images = 0
    sort_key = itemgetter(0, 1)
    for page_idx in sorted(by_page):
        blocks = by_page[page_idx]
        # key on (y0, x0) ONLY — ties must keep insertion order exactly
        # like parse_span_source's dict sort (Python sort stability)
        blocks.sort(key=sort_key)
        for _y0, _x0, kind, text in blocks:
            n_spans += 1
            if kind == "image":
                n_images += 1
            elif kind == "text" and text:
                parts.append(text)
    return "\n".join(parts), n_spans, n_images



def page_raster_meta(payload: str, dpi: int = DPI_DEFAULT) -> list[dict[str, Any]]:
    """Per-page raster metadata analog of extract_pdf_pages_as_images
    (app.py:283-300): page pixel size at the given dpi, derived from the
    max block extent (72 dpi points → pixels via dpi/72)."""
    if not payload:
        return []
    try:
        doc = json.loads(payload)
    except (json.JSONDecodeError, TypeError):
        return []
    scale = dpi / 72.0
    out = []
    for page in (doc.get("pages", []) or []) if isinstance(doc, dict) else []:
        page_idx = int(page.get("index", 0))
        x1 = max((float((b.get("bbox") or [0, 0, 0, 0])[2]) for b in page.get("blocks", []) or []), default=612.0)
        y1 = max((float((b.get("bbox") or [0, 0, 0, 0])[3]) for b in page.get("blocks", []) or []), default=792.0)
        out.append(
            {
                "page_num": page_idx,
                "width": int(round(x1 * scale)),
                "height": int(round(y1 * scale)),
            }
        )
    return out
