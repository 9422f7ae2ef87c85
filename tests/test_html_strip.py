"""HTML boilerplate stripper (north-rule capability) tests: generated
fixtures carry generation-time golden text; handcrafted cases pin the
classifier's decision boundaries."""

import numpy as np

from mistral_ocr_app_spark.fixtures.transcripts import _html_payload
from mistral_ocr_app_spark.functions.html_strip import (
    html_block_stats,
    segment_blocks,
    strip_boilerplate,
)

LONG = (
    "this paragraph carries plenty of running words so that the text "
    "density classifier confidently keeps it as main content today"
)


def test_generated_fixtures_roundtrip():
    rng = np.random.RandomState(5)
    for _ in range(200):
        html, golden = _html_payload(rng)
        assert strip_boilerplate(html) == golden


def test_drops_script_style_comments():
    html = (
        f"<html><body><script>var x='<p>{LONG}</p>'</script>"
        f"<style>p{{color:red}}</style><!-- {LONG} -->"
        f"<p>{LONG}</p></body></html>"
    )
    assert strip_boilerplate(html) == LONG


def test_drops_nav_footer_aside():
    html = (
        f"<body><nav><p>{LONG}</p></nav><p>{LONG}</p>"
        f"<footer><p>{LONG}</p></footer></body>"
    )
    assert strip_boilerplate(html) == LONG


def test_link_density_rejects_link_lists():
    links = " ".join(f'<a href="/{i}">word word word</a>' for i in range(8))
    html = f"<body><div>{links}</div><p>{LONG}</p></body>"
    assert strip_boilerplate(html) == LONG


def test_short_blocks_rejected_heading_kept_adjacent():
    html = f"<body><h2>Title Here</h2><p>{LONG}</p><p>tiny</p></body>"
    assert strip_boilerplate(html) == f"Title Here\n\n{LONG}"


def test_isolated_heading_rejected():
    html = "<body><h2>Lonely Title</h2><p>tiny block</p></body>"
    assert strip_boilerplate(html) == ""


def test_malformed_html_no_crash():
    html = f"<body><p>{LONG}<div unclosed <span></p><p>{LONG}"
    out = strip_boilerplate(html)
    assert LONG in out


def test_inline_link_within_threshold_kept():
    html = f'<body><p>{LONG} <a href="/x">ref</a></p></body>'
    assert strip_boilerplate(html) == f"{LONG} ref"


def test_whitespace_normalized():
    html = f"<body><p>  {LONG.replace(' ', '   ')}  </p></body>"
    assert strip_boilerplate(html) == LONG


def test_segment_blocks_features():
    html = '<body><p>one two three</p><div><a href="x">all link text</a></div></body>'
    feats = segment_blocks(html)
    assert len(feats) == 2
    assert feats[0][1] == 3  # n_words
    assert feats[1][2] == 1.0  # link_density


def test_block_stats():
    html = f"<body><nav><p>a b</p></nav><p>{LONG}</p></body>"
    stats = html_block_stats(html)
    assert stats["n_blocks"] == 2
    assert stats["n_boiler_blocks"] == 1
    assert stats["n_words"] > 10
