"""PII redaction — column expressions for the scrub stage of a
training-data pipeline.

The reference app ingests user uploads verbatim (app.py stores and
re-serves extracted markdown as-is); a corpus pipeline feeding model
training additionally scrubs personally identifiable spans before
export. This module provides the standard regex family (email, IPv4,
international-format phone) as pure JVM column expressions:
`regexp_replace` chains and `regexp_extract_all` counts — zero Python,
whole-stage-codegen friendly, embarrassingly parallel (no shuffle).

Pattern notes:
  * the dialect subset is deliberately portable between Java regex
    (Spark) and RE2 (the DuckDB oracle): no lookaround, no backrefs,
    `\\b` word boundaries only — so the catalog oracle (c3) verifies
    redaction output and counts value-exactly;
  * redaction ORDER is fixed (email → ipv4 → phone): an IPv4-shaped
    host inside an email address is consumed by the email rule first,
    and placeholders contain no digits so later rules never re-match
    earlier output;
  * counts are taken over the ORIGINAL text (QA surface: "how much PII
    did this doc carry", not "what survived earlier rules").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[-. ]\d{3}[-. ]\d{2,6}\b"

#: (kind, pattern, placeholder) in redaction order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its typed placeholder (global, in
    rule order). Spark's ``regexp_replace`` is replace-all by default;
    the DuckDB oracle needs the explicit ``'g'`` flag."""
    out = col
    for _, pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """``{'n_email': …, 'n_ipv4': …, 'n_phone': …}`` — occurrence
    counts per rule over the original text."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("int")
        for kind, pattern, _ in PII_RULES
    }
