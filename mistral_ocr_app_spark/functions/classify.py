"""Deterministic payload-kind detection — shared pipeline *spec*.

The reference routes by request type (file extension / URL / mock flag,
app.py:854-886); our per-turn analog routes by payload shape. This tiny
classifier is deliberately shared between the engine (operators/extract)
and the golden generator (fixtures/golden): the routing rule is part of
the pipeline's contract, while the per-kind extraction semantics are
implemented twice (engine: functions/*, golden: fixtures/golden) and
differentially tested.
"""

from __future__ import annotations

import re

KIND_MARKDOWN = "markdown"
KIND_DOC = "document"  # serialized multi-page document JSON
KIND_HTML = "html"
KIND_BASE64 = "base64"
KIND_SPANS = "spans"  # span-source payload in the `tool` column
KIND_EMPTY = "empty"

_BASE64_RE = re.compile(r"^[A-Za-z0-9+/=]{16,}$")


def classify_payload(text: str | None) -> str:
    """Payload kind of a transcript ``text`` value."""
    if not text:
        return KIND_EMPTY
    stripped = text.lstrip()
    if stripped.startswith('{"pages":'):
        return KIND_DOC
    if stripped.startswith("<"):
        return KIND_HTML
    if stripped.startswith("data:") or _BASE64_RE.match(stripped):
        return KIND_BASE64
    return KIND_MARKDOWN
