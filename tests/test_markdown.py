"""Differential tests: engine (functions/markdown) vs golden transcription
(fixtures/golden) on the reference's markdown/link/base64 semantics."""

import base64

import numpy as np
import pytest

from mistral_ocr_app_spark.fixtures import golden as g
from mistral_ocr_app_spark.fixtures.transcripts import (
    _base64_payload,
    _doc_payload,
    _markdown_payload,
)
from mistral_ocr_app_spark.functions import markdown as md

EDGE_MARKDOWN = [
    "",
    "no images here",
    "![](img-0.jpeg)",
    "![alt](img-1.jpg) text ![alt](img-1.jpg)",  # duplicate → first-occurrence
    "![a](fig.png) ![b](img-0.jpeg)",  # non-strict first, strict second
    "![x](IMG-3.JPEG)",  # case-insensitive match
    "![n](photo.webp)![m](photo.gif)",
    "text ![a](dir/img-2.jpeg) more",  # path separator in ref → id normalize
    "![brackets [not] closed](img-0.jpeg)",  # alt can't contain ], pattern shifts
    "![a](img-9.jpeg)" * 3,  # three identical refs
    "![a](noext)",  # no image extension → not a ref
]


@pytest.mark.parametrize("text", EDGE_MARKDOWN)
def test_rewrite_matches_golden_edges(text):
    for idx in (0, 1, 7):
        eng = md.rewrite_markdown_links(text, idx)
        gold = g.golden_update_markdown_links(text, idx)
        assert eng == gold


def test_rewrite_matches_golden_random_corpus():
    rng = np.random.RandomState(7)
    for i in range(300):
        text = _markdown_payload(rng)
        assert md.rewrite_markdown_links(text, i % 11) == g.golden_update_markdown_links(
            text, i % 11
        )


def test_extract_refs_shape():
    refs = md.extract_images_from_markdown("![a](img-0.jpeg) ![b](x/y.png)", 2)
    assert [r["id"] for r in refs] == ["img-0_jpeg", "x_y_png"]
    assert refs[0]["filename"] == "page_2_extracted_img-0_jpeg.jpeg"
    assert refs[1]["markdown_pattern"] == "![b](x/y.png)"


def test_first_occurrence_only_semantics():
    text = "![a](img-0.jpeg) mid ![a](img-0.jpeg)"
    out, n_refs, n_imgs, n_upd = md.rewrite_markdown_links(text, 0)
    # both refs found, both have api images, rewrites proceed left-to-right
    assert n_refs == 2 and n_upd == 2
    assert out.count("/image/") == 2
    assert "![a](img-0.jpeg)" not in out


def test_mock_document_extraction_matches_golden():
    rng = np.random.RandomState(11)
    for _ in range(50):
        payload = _doc_payload(rng)
        eng_text, eng_imgs, eng_empty = md.extract_mock_document(payload)
        gold = g.golden_extract_turn(payload, "", 0)
        assert eng_text == gold["extracted_text"]
        assert eng_imgs == gold["n_images"]
        assert eng_empty == gold["n_rewritten"]


def test_cli_variant_replace_all():
    pages = [
        {"markdown": "![img-0.jpeg](img-0.jpeg) and ![img-0.jpeg](img-0.jpeg)",
         "images": [{"id": "img-0.jpeg", "image_base64": "B64"}]},
        {"markdown": "plain", "images": []},
    ]
    import json

    payload = json.dumps({"pages": pages})
    out = md.extract_mock_document_cli(payload)
    assert out == g.golden_combined_markdown_cli(pages)
    assert out.count("![img-0.jpeg](B64)") == 2  # replace-ALL (main.py:37-40)
    assert out.endswith("\n\nplain")


@pytest.mark.parametrize(
    "payload",
    [
        "",
        "data:image/png;base64," + base64.b64encode(b"x" * 100).decode(),
        base64.b64encode(b"y" * 49).decode(),  # decoded < 50 → invalid
        base64.b64encode(b"y" * 50).decode(),  # boundary: exactly 50 → valid
        "data:image/jpeg;base64,%%%bad%%%",
        base64.b64encode(b"z" * 30).decode() + "=",  # broken padding
    ],
)
def test_base64_matches_golden(payload):
    eng = md.parse_base64_payload(payload)
    gold = g.golden_base64(payload)
    if gold is None:
        assert not eng["valid"]
    else:
        assert eng["valid"]
        assert eng["format"] == gold["format"]
        assert eng["size"] == gold["size"]


def test_base64_random_corpus():
    rng = np.random.RandomState(13)
    for _ in range(100):
        payload = _base64_payload(rng)
        eng = md.parse_base64_payload(payload)
        gold = g.golden_base64(payload)
        assert eng["valid"] == (gold is not None)


def test_combine_pages_variants():
    pages = [(0, "alpha"), (1, "beta")]
    assert md.combine_pages_app(pages) == (
        "# Страница 1\n\nalpha\n\n---\n\n# Страница 2\n\nbeta"
    )
    assert md.combine_pages_cli(["alpha", "beta"]) == "alpha\n\nbeta"
    assert md.combine_pages_app(pages) == g.golden_combine_pages_app(pages)


# --------------------------------------------------- X7 secure_filename ---

UNICODE_FILENAMES = [
    "русский файл.pdf",          # Cyrillic (reference app is RU-localized)
    "отчёт_2024.PDF",
    "中文 文件.png",              # CJK
    "my résumé.pdf",             # NFKD-decomposable accents
    "naïve café.jpeg",
    "a+b=c.pdf",                 # chars werkzeug REMOVES (not underscores)
    "  spaced   name .txt",
    "../../etc/passwd",
    "page_0_extracted_img-0_jpeg.jpeg",  # the engine's own synthesis shape
    "...",
    "",
]


@pytest.mark.parametrize("name", UNICODE_FILENAMES)
def test_secure_filename_matches_werkzeug(name):
    """Engine reimplementation must agree with the real werkzeug the
    reference uses (app.py:14), incl. dropping non-ASCII entirely."""
    werkzeug = pytest.importorskip("werkzeug.utils")
    assert md.secure_filename(name) == werkzeug.secure_filename(name)


def test_secure_filename_pinned_unicode_behavior():
    """Pin the documented behavior even without werkzeug installed:
    non-ASCII is DROPPED (not underscored), NFKD transliterates accents."""
    assert md.secure_filename("русский файл.pdf") == "pdf"
    assert md.secure_filename("中文 文件.png") == "png"
    assert md.secure_filename("my résumé.pdf") == "my_resume.pdf"
    assert md.secure_filename("a+b=c.pdf") == "abc.pdf"


# ----------------------------------------------- lenient base64 (F3) ---


def test_base64_lenient_decode_matches_reference():
    """app.py:201 decodes WITHOUT validate=True: payloads containing
    newlines/whitespace (MIME-wrapped base64) must be accepted."""
    raw = base64.b64encode(b"x" * 80).decode()
    wrapped = raw[:20] + "\n" + raw[20:40] + " \t" + raw[40:]
    res = md.parse_base64_payload(wrapped)
    assert res["valid"] and res["size"] == 80
    assert g.golden_base64(wrapped) is not None  # golden agrees
    # genuinely broken payloads are still rejected
    assert not md.parse_base64_payload("!!!not base64!!!")["valid"]


# ------------------------------------------- X15 markdown→HTML render ---


def test_markdown_to_html_subset():
    """X15: server-side analog of the reference's client-side
    marked.parse (templates/index.html:25) over exactly the markdown
    subset the extraction pipeline emits."""
    html = md.markdown_to_html(
        "# Страница 1\n\nFirst *para* with **bold** and `code`.\n"
        "Second line.\n\n![figure 0](/image/img-0.png)\n\n---\n\n"
        "[link](https://example.com/doc)"
    )
    assert "<h1>Страница 1</h1>" in html
    assert "<em>para</em>" in html and "<strong>bold</strong>" in html
    assert "<code>code</code>" in html
    assert "Second line" in html and "<br/>" in html
    assert '<img src="/image/img-0.png" alt="figure 0"/>' in html
    assert "<hr/>" in html
    assert '<a href="https://example.com/doc">link</a>' in html


def test_markdown_to_html_injection_safe():
    """Escape-first: corpus text can never inject markup; unsafe URL
    schemes render as plain text, not as href/src."""
    html = md.markdown_to_html(
        "<script>alert(1)</script>\n\n"
        "[x](javascript:alert(1))\n\n![y](data:text/html,evil)"
    )
    assert "<script" not in html
    assert "&lt;script&gt;" in html
    assert "javascript:" in html and "<a " not in html  # stays plain text
    assert "<img" not in html
    # empty / None-ish input degrades to empty output
    assert md.markdown_to_html("") == ""
