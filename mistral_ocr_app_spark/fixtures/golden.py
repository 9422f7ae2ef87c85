"""Golden extractor — single-process transcription of the reference semantics.

This module is the *oracle* for the pytest equality gate (SURVEY.md §5
step 1): a direct, loop-based transcription of the reference app's
per-document computation, kept intentionally naive and separate from the
engine's vectorized implementation in ``functions/`` + ``operators/``.
Differential testing engine-vs-golden is only meaningful because the two
are written independently (golden: ``re.findall`` + list loops, the
reference's literal shape; engine: ``finditer`` streaming + pandas
batches).

Transcribed semantics and their reference locations:
  * extract_images_from_markdown   app.py:117-140
  * update_markdown_image_links    app.py:64-115  (first-occurrence replace)
  * combined markdown, app variant app.py:816-822
  * combined markdown, cli variant main.py:42-50
  * replace_images_in_markdown     main.py:37-40  (replace-all)
  * enhanced_base64_processing     app.py:179-216
  * fallback census                app.py:610-630
  * span ordering / CMYK filter    app.py:308-360 (ours: reading-order spec)

HTML boilerplate golden text is NOT computed here: it is recorded by the
fixture generator at generation time (the article text is known when the
page is synthesized) — see fixtures/transcripts.py.
"""

from __future__ import annotations

import base64
import binascii
import json
import re

from ..functions.classify import (
    KIND_BASE64,
    KIND_DOC,
    KIND_EMPTY,
    KIND_HTML,
    KIND_MARKDOWN,
    classify_payload,
)

try:
    # the reference imports werkzeug.utils.secure_filename (app.py:14);
    # using the real thing here makes the golden a true differential
    # oracle for the engine's stdlib-only reimplementation
    from werkzeug.utils import secure_filename as _secure_filename
except ImportError:  # pragma: no cover — fallback transcription
    _SECURE_RE = re.compile(r"[^A-Za-z0-9_.-]")

    def _secure_filename(name):
        import unicodedata

        name = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode()
        name = _SECURE_RE.sub("", "_".join(name.replace("/", " ").split()))
        return name.strip("._")


def golden_extract_images_from_markdown(markdown_text, page_index):
    """Transcription of app.py:117-140 (re.findall + loop)."""
    image_pattern = r"!\[([^\]]*)\]\(([^)]+\.(jpeg|jpg|png|gif|webp))\)"
    matches = re.findall(image_pattern, markdown_text, re.IGNORECASE)
    extracted_images = []
    for alt_text, image_ref, ext in matches:
        img_id = image_ref.replace(".", "_").replace("/", "_")
        img_filename = f"page_{page_index}_extracted_{img_id}.{ext}"
        extracted_images.append(
            {
                "id": img_id,
                "alt_text": alt_text,
                "original_ref": image_ref,
                "filename": img_filename,
                "markdown_pattern": f"![{alt_text}]({image_ref})",
            }
        )
    return extracted_images


def golden_saved_api_images(markdown_text, page_index):
    """Deterministic saved-image model (shared pipeline spec): every ref
    whose target matches the strict API naming (app.py:164) yields one
    saved image with the deterministic filename of app.py:128."""
    strict = re.compile(r"img-\d+\.jpe?g$", re.IGNORECASE)
    saved = []
    for img in golden_extract_images_from_markdown(markdown_text, page_index):
        if strict.search(img["original_ref"]):
            fname = _secure_filename(img["filename"])
            saved.append({"id": img["id"], "path": "/tmp/uploads/" + fname})
    return saved


def golden_update_markdown_links(markdown_text, page_index):
    """Transcription of update_markdown_image_links (app.py:64-115)."""
    markdown_images = golden_extract_images_from_markdown(markdown_text, page_index)
    if not markdown_images:
        return markdown_text, 0, 0, 0
    saved_api_images_for_page = golden_saved_api_images(markdown_text, page_index)
    temp_updated_markdown = markdown_text
    updates_made = 0
    for k, md_img in enumerate(markdown_images):
        if k < len(saved_api_images_for_page):
            api_image_data = saved_api_images_for_page[k]
            img_filename_on_disk = api_image_data["path"].split("/")[-1]
            new_url = f"/image/{img_filename_on_disk}"
            old_pattern = md_img["markdown_pattern"]
            new_pattern = f"![{md_img['alt_text']}]({new_url})"
            if old_pattern in temp_updated_markdown:
                temp_updated_markdown = temp_updated_markdown.replace(
                    old_pattern, new_pattern, 1
                )
                updates_made += 1
    return (
        temp_updated_markdown,
        len(markdown_images),
        len(saved_api_images_for_page),
        updates_made,
    )


def golden_combine_pages_app(pages):
    """Transcription of app.py:816-822."""
    markdown_content_pages = []
    for index, md in pages:
        page_markdown = f"# Страница {index + 1}\n\n{md or ''}"
        markdown_content_pages.append(page_markdown)
    return "\n\n---\n\n".join(markdown_content_pages)


def golden_replace_images_in_markdown(markdown_str, images_dict):
    """Transcription of main.py:37-40."""
    for img_name, base64_str in images_dict.items():
        markdown_str = markdown_str.replace(
            f"![{img_name}]({img_name})", f"![{img_name}]({base64_str})"
        )
    return markdown_str


def golden_combined_markdown_cli(pages_json):
    """Transcription of get_combined_markdown (main.py:42-50)."""
    markdowns = []
    for page in pages_json:
        image_data = {}
        for img in page.get("images") or []:
            if img.get("id") and img.get("image_base64"):
                image_data[img["id"]] = img["image_base64"]
        markdowns.append(
            golden_replace_images_in_markdown(page.get("markdown", "") or "", image_data)
        )
    return "\n\n".join(markdowns)


def golden_base64(payload):
    """Transcription of enhanced_base64_processing (app.py:179-216)."""
    if not payload:
        return None
    if "base64," in payload:
        clean_data = payload.split("base64,", 1)[1]
    else:
        clean_data = payload
    img_format = "png"
    if "image/png" in payload:
        img_format = "png"
    elif "image/jpeg" in payload or "image/jpg" in payload:
        img_format = "jpg"
    elif "image/webp" in payload:
        img_format = "webp"
    try:
        # lenient like app.py:201 (no validate=True): whitespace/newlines
        # inside the payload are discarded, not rejected
        img_data = base64.b64decode(clean_data)
    except (binascii.Error, ValueError):
        return None
    if len(img_data) < 50:
        return None
    return {"format": img_format, "size": len(img_data)}


def golden_spans(tool_payload):
    """Reading-order span list (our spec; bbox/CMYK semantics per
    app.py:308-360). Naive two-level loop + sort."""
    if not tool_payload:
        return []
    try:
        doc = json.loads(tool_payload)
    except (json.JSONDecodeError, TypeError):
        return []
    # pages sharing an index merge before ordering (same spec as engine)
    pages_merged = {}
    for page in doc.get("pages", []):
        page_num = int(page.get("index", 0))
        keep = pages_merged.setdefault(page_num, [])
        for blk in page.get("blocks", []):
            if blk.get("kind", "text") == "image":
                n = int(blk.get("channels", 3))
                alpha = int(blk.get("alpha", 0))
                if n - alpha >= 4:  # CMYK check, app.py:327
                    continue
            bbox = blk.get("bbox") or [0.0, 0.0, 0.0, 0.0]
            if len(bbox) != 4:
                bbox = [0.0, 0.0, 0.0, 0.0]
            keep.append((float(bbox[1]), float(bbox[0]), blk, bbox))
    all_spans = []
    for page_num in sorted(pages_merged):
        keep = pages_merged[page_num]
        keep.sort(key=lambda t: (t[0], t[1]))
        for rank, (_y, _x, blk, bbox) in enumerate(keep):
            all_spans.append(
                {
                    "page": page_num,
                    "span_idx": rank,
                    "text": blk.get("text", "") or "",
                    "x0": float(bbox[0]),
                    "y0": float(bbox[1]),
                    "x1": float(bbox[2]),
                    "y1": float(bbox[3]),
                    "kind": blk.get("kind", "text"),
                }
            )
    return all_spans


def golden_extract_turn(text, tool, turn_idx, html_golden=None):
    """Per-turn golden extraction. Returns a dict matching the engine's
    per-turn output schema (operators/extract.py EXTRACT_SCHEMA).

    ``html_golden``: generation-time article text for HTML payloads
    (classifier-independent ground truth).
    """
    if tool:
        spans = golden_spans(tool)
        text_out = "\n".join(
            s["text"] for s in spans if s["kind"] == "text" and s["text"]
        )
        return {
            "kind": "spans",
            "extracted_text": text_out,
            "n_refs": 0,
            "n_images": sum(1 for s in spans if s["kind"] == "image"),
            "n_rewritten": 0,
            "n_spans": len(spans),
            "valid": True,
        }
    kind = classify_payload(text)
    if kind == KIND_EMPTY:
        return {
            "kind": kind,
            "extracted_text": "",
            "n_refs": 0,
            "n_images": 0,
            "n_rewritten": 0,
            "n_spans": 0,
            "valid": True,
        }
    if kind == KIND_MARKDOWN:
        new_md, n_refs, n_imgs, n_upd = golden_update_markdown_links(text, turn_idx)
        return {
            "kind": kind,
            "extracted_text": new_md,
            "n_refs": n_refs,
            "n_images": n_imgs,
            "n_rewritten": n_upd,
            "n_spans": 0,
            "valid": True,
        }
    if kind == KIND_DOC:
        doc = json.loads(text)
        pages = [(p.get("index", 0), p.get("markdown", "") or "") for p in doc["pages"]]
        combined = golden_combine_pages_app(pages)
        total_images = sum(len(p.get("images") or []) for p in doc["pages"])
        empty_b64 = sum(
            1
            for p in doc["pages"]
            for img in (p.get("images") or [])
            if not img.get("image_base64")
        )
        return {
            "kind": kind,
            "extracted_text": combined,
            "n_refs": 0,
            "n_images": total_images,
            "n_rewritten": empty_b64,
            "n_spans": 0,
            "valid": True,
        }
    if kind == KIND_HTML:
        return {
            "kind": kind,
            "extracted_text": html_golden if html_golden is not None else "",
            "n_refs": 0,
            "n_images": 0,
            "n_rewritten": 0,
            "n_spans": 0,
            "valid": True,
        }
    if kind == KIND_BASE64:
        parsed = golden_base64(text)
        if parsed is None:
            return {
                "kind": kind,
                "extracted_text": "[invalid image]",
                "n_refs": 0,
                "n_images": 0,
                "n_rewritten": 0,
                "n_spans": 0,
                "valid": False,
            }
        return {
            "kind": kind,
            "extracted_text": f"[image {parsed['format']} {parsed['size']}B]",
            "n_refs": 0,
            "n_images": 1,
            "n_rewritten": 0,
            "n_spans": 0,
            "valid": True,
        }
    raise AssertionError(f"unreachable kind {kind}")


def golden_assemble_conversation(turns):
    """Per-conversation document assembly goldens, both joiner variants.

    ``turns``: list of (turn_idx, extracted_text) — caller sorts.
    app variant: app.py:816-822; cli variant: main.py:50.
    """
    ordered = sorted(turns, key=lambda t: t[0])
    return {
        "combined_app": golden_combine_pages_app(ordered),
        "combined_cli": "\n\n".join(t[1] or "" for t in ordered),
    }
