"""HTML main-content extraction (boilerplate stripping) — north-rule capability.

From-scratch DOM-less block segmentation + text-density / link-density
classification in the spirit of Kohlschütter et al., "Boilerplate Detection
using Shallow Text Features" (WSDM 2010, public knowledge). The reference
app has no server-side HTML path (its markdown is rendered client-side at
templates/index.html:534); this module is the new capability mandated by
BASELINE.json's north_rule.

Algorithm
---------
1. Tokenize HTML with :class:`html.parser.HTMLParser` (stdlib; tolerant of
   unclosed/malformed tags).
2. Drop everything inside ``script``/``style``/``noscript``/``template``
   and comments.
3. Segment character data into *blocks* at block-level tag boundaries
   (``p div h1..h6 li td th blockquote pre article section header footer
   nav aside ul ol table tr br``).
4. Per block, compute shallow features:
   * ``n_words``       — whitespace-token count
   * ``link_density``  — chars emitted inside ``<a>`` / total chars
   * ``tag_density``   — enclosing boilerplate-ish ancestry (nav/footer/
     header/aside/form flag)
5. Classify: a block is CONTENT iff it is not inside a boilerplate
   container, ``link_density < 0.33`` and ``n_words >= 10``; short blocks
   (headings) are kept when sandwiched next to content blocks
   (quadratic-free single pass with one-block lookbehind/ahead).
6. Output = content blocks' normalized text joined by ``"\\n\\n"``.

Pure Python (stdlib only) so the engine ships via ``spark-submit
--py-files`` with no native deps.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "blockquote", "pre", "article", "section", "header", "footer", "nav",
    "aside", "ul", "ol", "table", "tr", "br", "main", "figure",
    "figcaption", "dd", "dt",
}
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
BOILER_CONTAINERS = {"nav", "footer", "header", "aside", "form"}

_WS_RE = re.compile(r"\s+")

MIN_CONTENT_WORDS = 10
MAX_LINK_DENSITY = 0.33
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


class _Block:
    __slots__ = ("chars", "link_chars", "in_boiler", "is_heading")

    def __init__(self, in_boiler: bool, is_heading: bool):
        self.chars: list[str] = []
        self.link_chars = 0
        self.in_boiler = in_boiler
        self.is_heading = is_heading

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.chars)).strip()

    def features(self) -> tuple[str, int, float, bool, bool]:
        text = self.text
        n_words = len(text.split()) if text else 0
        total = sum(len(c) for c in self.chars)
        link_density = (self.link_chars / total) if total else 0.0
        return text, n_words, link_density, self.in_boiler, self.is_heading


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._heading_depth = 0
        self._cur: _Block | None = None

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None and self._cur.text:
            self.blocks.append(self._cur)
        self._cur = None

    def _ensure(self) -> _Block:
        if self._cur is None:
            self._cur = _Block(self._boiler_depth > 0, self._heading_depth > 0)
        return self._cur

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in BOILER_CONTAINERS:
            self._boiler_depth += 1
        if tag in HEADING_TAGS:
            self._heading_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in BOILER_CONTAINERS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag in HEADING_TAGS:
            self._heading_depth = max(0, self._heading_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        blk = self._ensure()
        blk.chars.append(data)
        if self._link_depth:
            blk.link_chars += len(data)


def segment_blocks(html: str) -> list[tuple[str, int, float, bool, bool]]:
    """Parse HTML → list of (text, n_words, link_density, in_boiler, is_heading)."""
    parser = _BlockParser()
    try:
        parser.feed(unescape_safe(html))
        parser.close()
    except Exception:
        pass  # malformed input: keep whatever blocks were accumulated
    parser._flush()
    return [b.features() for b in parser.blocks]


def unescape_safe(html: str) -> str:
    # HTMLParser(convert_charrefs=True) already unescapes charrefs in data;
    # pre-unescaping would corrupt entity-encoded tags. Identity hook kept
    # for symmetry with the golden generator.
    return html or ""


def strip_boilerplate(html: str) -> str:
    """Main-content text of an HTML document (``"\\n\\n"``-joined blocks)."""
    feats = segment_blocks(html)
    content = [False] * len(feats)
    for i, (_text, n_words, link_density, in_boiler, _h) in enumerate(feats):
        content[i] = (
            not in_boiler
            and n_words >= MIN_CONTENT_WORDS
            and link_density < MAX_LINK_DENSITY
        )
    # keep low-link headings/short blocks adjacent to content (one pass)
    kept = list(content)
    for i, (_text, n_words, link_density, in_boiler, is_heading) in enumerate(feats):
        if kept[i] or in_boiler or link_density >= MAX_LINK_DENSITY:
            continue
        prev_c = i > 0 and content[i - 1]
        next_c = i + 1 < len(feats) and content[i + 1]
        if is_heading and (prev_c or next_c):
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
