"""Span parser (PDF-layout analog, app.py:273-360 semantics) tests."""

import json

import numpy as np

from mistral_ocr_app_spark.fixtures import golden as g
from mistral_ocr_app_spark.fixtures.transcripts import _span_payload
from mistral_ocr_app_spark.functions.spans import (
    page_raster_meta,
    parse_span_source,
    spans_to_text,
)


def _doc(pages):
    return json.dumps({"pages": pages})


def test_reading_order_restored():
    payload = _doc(
        [
            {
                "index": 0,
                "blocks": [
                    {"text": "third", "bbox": [10.0, 300.0, 200.0, 312.0], "kind": "text"},
                    {"text": "first", "bbox": [10.0, 10.0, 200.0, 22.0], "kind": "text"},
                    {"text": "second-right", "bbox": [220.0, 100.0, 400.0, 112.0], "kind": "text"},
                    {"text": "second-left", "bbox": [10.0, 100.0, 200.0, 112.0], "kind": "text"},
                ],
            }
        ]
    )
    spans = parse_span_source(payload)
    assert [s["text"] for s in spans] == ["first", "second-left", "second-right", "third"]
    assert [s["span_idx"] for s in spans] == [0, 1, 2, 3]
    assert spans_to_text(spans) == "first\nsecond-left\nsecond-right\nthird"


def test_cmyk_filter():
    payload = _doc(
        [
            {
                "index": 0,
                "blocks": [
                    {"text": "", "bbox": [0, 0, 10, 10], "kind": "image", "channels": 4, "alpha": 0},
                    {"text": "", "bbox": [0, 20, 10, 30], "kind": "image", "channels": 4, "alpha": 1},
                    {"text": "", "bbox": [0, 40, 10, 50], "kind": "image", "channels": 3, "alpha": 0},
                ],
            }
        ]
    )
    spans = parse_span_source(payload)
    # channels-alpha<4 keeps RGBA (4-1=3) and RGB (3-0=3); drops CMYK (4-0=4)
    assert len(spans) == 2
    assert [s["y0"] for s in spans] == [20.0, 40.0]


def test_multi_page_order_and_golden_parity():
    rng = np.random.RandomState(3)
    for _ in range(200):
        payload = _span_payload(rng)
        eng = parse_span_source(payload)
        gold = g.golden_spans(payload)
        assert eng == gold
        pages = [s["page"] for s in eng]
        assert pages == sorted(pages)


def test_invalid_payloads():
    assert parse_span_source("") == []
    assert parse_span_source("not json") == []
    assert parse_span_source("[1,2]") == []
    assert parse_span_source('{"pages": []}') == []


def test_raster_meta_scale():
    payload = _doc(
        [{"index": 0, "blocks": [{"text": "t", "bbox": [0, 0, 612.0, 792.0], "kind": "text"}]}]
    )
    meta = page_raster_meta(payload, dpi=200)
    # 612pt * 200/72 = 1700px, 792pt * 200/72 = 2200px (app.py:286 matrix)
    assert meta == [{"page_num": 0, "width": 1700, "height": 2200}]


def test_span_text_stats_equals_struct_path():
    """The hot-path shortcut must reproduce parse_span_source +
    spans_to_text exactly (ordering ties included) on every fixture
    span payload."""
    from mistral_ocr_app_spark.fixtures.transcripts import generate_transcripts
    from mistral_ocr_app_spark.functions import spans as sp

    tr, _, _ = generate_transcripts(n_convs=120, seed=77)
    payloads = [t for t in tr["tool"] if t]
    assert payloads
    for payload in payloads:
        full = sp.parse_span_source(payload)
        expected = (
            sp.spans_to_text(full),
            len(full),
            sum(1 for s in full if s["kind"] == "image"),
        )
        assert sp.span_text_stats(payload) == expected
