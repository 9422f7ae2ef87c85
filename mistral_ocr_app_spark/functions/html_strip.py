"""HTML main-content extraction (boilerplate stripping) — north-rule capability.

From-scratch block segmentation + text-density / link-density
classification in the spirit of Kohlschütter et al., "Boilerplate Detection
using Shallow Text Features" (WSDM 2010, public knowledge). The reference
app has no server-side HTML path (its markdown is rendered client-side at
templates/index.html:534); this module is the new capability mandated by
BASELINE.json's north_rule.

Algorithm
---------
1. Tokenize HTML with a single compiled regex over tags / comments /
   declarations (measured ~2× the throughput of the stdlib
   ``html.parser`` state machine on this corpus — the tokenizer is the
   per-turn hot path at 10¹² scale).
2. Drop everything inside ``script``/``style``/``noscript``/``template``
   (skip straight to the closing tag) and comments/declarations.
3. Segment character data into *blocks* at block-level tag boundaries
   (``p div h1..h6 li td th blockquote pre article section header footer
   nav aside ul ol table tr br``).
4. Per block, compute shallow features: word count, link density
   (chars emitted inside ``<a>`` / total chars), boilerplate-container
   ancestry (nav/footer/header/aside/form), heading flag.
5. Classify: CONTENT iff not inside a boilerplate container,
   ``link_density < 0.33`` and ``n_words >= 10``; headings adjacent to
   content are kept.
6. Output = content blocks' normalized text joined by ``"\\n\\n"``.

Pure Python (stdlib only) so the engine ships via ``spark-submit
--py-files`` with no native deps.
"""

from __future__ import annotations

import re
from html import unescape

BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "blockquote", "pre", "article", "section", "header", "footer", "nav",
    "aside", "ul", "ol", "table", "tr", "br", "main", "figure",
    "figcaption", "dd", "dt",
}
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
BOILER_CONTAINERS = {"nav", "footer", "header", "aside", "form"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

MIN_CONTENT_WORDS = 10
MAX_LINK_DENSITY = 0.33

_WS_RE = re.compile(r"\s+")
# one token per: comment | declaration/CDATA/PI | tag
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"          # comment (tolerates unterminated)
    r"|<![^>]*>|<\?[^>]*\??>"    # <!DOCTYPE ...>, <![CDATA[...]]>, <?pi?>
    r"|<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)>",
    re.DOTALL,
)
_DROP_CLOSE = {t: re.compile(rf"</{t}\s*>", re.IGNORECASE) for t in DROP_TAGS}


def segment_blocks(html: str) -> list[tuple[str, int, float, bool, bool]]:
    """Tokenize + segment: list of
    (text, n_words, link_density, in_boiler, is_heading)."""
    blocks: list[tuple[str, int, float, bool, bool]] = []
    parts: list[str] = []
    total_chars = 0
    link_chars = 0
    boiler = heading = link = 0

    def flush(cur_boiler: bool, cur_heading: bool) -> None:
        nonlocal parts, total_chars, link_chars
        if parts:
            text = _WS_RE.sub(" ", "".join(parts)).strip()
            if text:
                ld = (link_chars / total_chars) if total_chars else 0.0
                blocks.append((text, len(text.split()), ld, cur_boiler, cur_heading))
        parts, total_chars, link_chars = [], 0, 0

    def emit(data: str) -> None:
        nonlocal total_chars, link_chars
        if "&" in data:
            data = unescape(data)
        parts.append(data)
        total_chars += len(data)
        if link:
            link_chars += len(data)

    html = html or ""
    pos, n = 0, len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if not m:
            emit(html[pos:])
            break
        if m.start() > pos:
            emit(html[pos : m.start()])
        pos = m.end()
        tag = m.group(2)
        if tag is None:  # comment / declaration / PI
            continue
        tag = tag.lower()
        closing = m.group(1) == "/"
        if tag in DROP_TAGS and not closing:
            mm = _DROP_CLOSE[tag].search(html, pos)
            pos = mm.end() if mm else n
            continue
        if tag in BLOCK_TAGS:
            flush(boiler > 0, heading > 0)
        if tag in BOILER_CONTAINERS:
            boiler = max(0, boiler + (-1 if closing else 1))
        if tag in HEADING_TAGS:
            heading = max(0, heading + (-1 if closing else 1))
        elif tag == "a":
            link = max(0, link + (-1 if closing else 1))
    flush(boiler > 0, heading > 0)
    return blocks


def strip_boilerplate(html: str) -> str:
    """Main-content text of an HTML document (``"\\n\\n"``-joined blocks)."""
    feats = segment_blocks(html)
    content = [
        not in_boiler and n_words >= MIN_CONTENT_WORDS and ld < MAX_LINK_DENSITY
        for (_text, n_words, ld, in_boiler, _h) in feats
    ]
    kept = list(content)
    # keep low-link headings adjacent to content (one pass, 1-block context)
    for i, (_text, _n_words, ld, in_boiler, is_heading) in enumerate(feats):
        if kept[i] or in_boiler or ld >= MAX_LINK_DENSITY or not is_heading:
            continue
        if (i > 0 and content[i - 1]) or (i + 1 < len(feats) and content[i + 1]):
            kept[i] = True
    return "\n\n".join(f[0] for i, f in enumerate(feats) if kept[i])


def html_block_stats(html: str) -> dict:
    """Aggregate features for quality scoring / metrics."""
    feats = segment_blocks(html)
    n_blocks = len(feats)
    n_words = sum(f[1] for f in feats)
    n_boiler = sum(1 for f in feats if f[3])
    mean_ld = (sum(f[2] for f in feats) / n_blocks) if n_blocks else 0.0
    return {
        "n_blocks": n_blocks,
        "n_words": n_words,
        "n_boiler_blocks": n_boiler,
        "mean_link_density": mean_ld,
    }
