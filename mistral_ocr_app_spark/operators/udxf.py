"""V6/V7 — Python UDAF (grouped-agg pandas UDF) and UDTF demonstrations.

SURVEY §2 scoped V6/V7 out of the production engine ("built-ins /
posexplode cover the semantics"), and that judgment stands for the hot
paths: a Python UDTF is row-at-a-time Python with pickle transport,
while ``parse_spans_udf`` (Arrow-batched pandas UDF) + ``posexplode``
keeps span extraction vectorized, and built-in aggregates keep the
whole-stage-codegen pipeline intact. This module closes the two rows
anyway with REAL implementations so the surface exists for users who
reach for it, each equality-tested against the production path it
mirrors (tests/test_udxf.py):

* ``ParseSpansUDTF`` (V7) — span-source payload → one row per span, a
  Python UDTF usable as a SQL ``LATERAL`` table function. Mirrors
  ``exploded_spans`` (extract.py:164) exactly.
* ``success_rate_agg`` (V6) — the W1 query's valid-rate as a
  grouped-agg pandas UDF (Arrow-batched UDAF). Mirrors the built-in
  ``avg(valid_int)`` exactly.

Keep the production paths for scale; reach for these only when the
semantics genuinely cannot be expressed relationally (reference parity:
the reference's per-document worker is itself row-at-a-time Python —
app.py:273-360 — so the UDTF is the closest structural analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from ..functions import spans as sp

_SPAN_ROW_SCHEMA = (
    "page int, span_idx int, text string, "
    "x0 double, y0 double, x1 double, y1 double, kind string"
)


@udtf(returnType=_SPAN_ROW_SCHEMA)
class ParseSpansUDTF:
    """V7: one input payload → N span rows (table function fan-out).

    Same parse as ``parse_spans_udf`` (both call
    ``spans.parse_span_source``), but surfaced as a UDTF so SQL users
    can ``LATERAL`` it. Row-at-a-time by construction — the pandas-UDF
    + posexplode path stays the scale path."""

    def eval(self, tool: str | None):  # noqa: D102 (spec'd by Spark)
        for s in sp.parse_span_source(tool or ""):
            yield (
                s["page"], s["span_idx"], s["text"],
                s["x0"], s["y0"], s["x1"], s["y1"], s["kind"],
            )


def register_span_udtf(spark: SparkSession, name: str = "parse_spans_udtf") -> None:
    spark.udtf.register(name, ParseSpansUDTF)


def exploded_spans_via_udtf(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """``exploded_spans`` re-expressed through the V7 UDTF + LATERAL
    join (equality-tested against the production posexplode path)."""
    register_span_udtf(spark)
    transcripts.filter(
        (F.col("tool").isNotNull()) & (F.col("tool") != "")
    ).createOrReplaceTempView("_udtf_span_src")
    return spark.sql(
        """
        SELECT t.conv_id, t.turn_idx,
               s.page, s.span_idx, s.text, s.x0, s.y0, s.x1, s.y1, s.kind
        FROM _udtf_span_src t, LATERAL parse_spans_udtf(t.tool) s
        """
    )


@F.pandas_udf(T.DoubleType())
def success_rate_agg(valid: pd.Series) -> float:
    """V6: grouped-agg pandas UDF (the PySpark UDAF surface) — the W1
    success-rate aggregate. Arrow ships the group's column, Python
    reduces it to one scalar. Equivalent to ``avg(cast(valid as
    double))``; the built-in stays the production choice (codegen +
    partial aggregation — a grouped-agg UDF materializes each full
    group instead of map-side combining)."""
    return float(valid.mean()) if len(valid) else float("nan")
