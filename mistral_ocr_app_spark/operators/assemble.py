"""Ordered per-conversation document assembly (SURVEY §2.5 W1 — flagship).

The reference joins OCR pages into one document in response order with a
per-page header (app.py:816-822 — ``# Страница {i+1}`` +
``\\n\\n---\\n\\n``) or plainly (main.py:50 / index.js:547 — ``\\n\\n``).
Our analog: per conversation, turns ordered by ``turn_idx``.

All JVM-side (no Python): ``collect_list(struct(turn_idx, text))`` →
``array_sort`` → ``transform``/``format_string`` → ``array_join``. The
single shuffle is the groupBy exchange on ``conv_id``; partial (map-side)
aggregation of collect_list keeps it one pass, and AQE skew-join/
coalesce handles long-conversation skew (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGE_JOINER_APP = "\n\n---\n\n"  # app.py:822
PAGE_JOINER_CLI = "\n\n"  # main.py:50


def _ordered_turns(extracted: DataFrame):
    """array<struct<turn_idx,extracted_text>> sorted by turn_idx.

    array_sort on structs orders by fields left-to-right, so turn_idx
    (first field) dominates — the stable-turn-ordering contract."""
    return F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("extracted_text")))
    )


def assemble_conversations_app(extracted: DataFrame) -> DataFrame:
    """App variant: per-turn ``# Страница {turn_idx+1}`` header, ``---``
    separator (app.py:816-822). Output: (conv_id, n_turns, combined_app)."""
    turns = _ordered_turns(extracted)
    return extracted.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.array_join(
            F.transform(
                turns,
                lambda x: F.format_string(
                    "# Страница %d\n\n%s",
                    x["turn_idx"] + F.lit(1),
                    F.coalesce(x["extracted_text"], F.lit("")),
                ),
            ),
            PAGE_JOINER_APP,
        ).alias("combined_app"),
    )


def assemble_conversations_cli(extracted: DataFrame) -> DataFrame:
    """CLI/JS variant: plain ``\\n\\n`` join, no headers (main.py:42-50)."""
    turns = _ordered_turns(extracted)
    return extracted.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.array_join(
            F.transform(turns, lambda x: F.coalesce(x["extracted_text"], F.lit(""))),
            PAGE_JOINER_CLI,
        ).alias("combined_cli"),
    )


def assemble_conversations(extracted: DataFrame) -> DataFrame:
    """Both joiner variants in ONE aggregation (single shuffle)."""
    turns = _ordered_turns(extracted)
    return extracted.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_turns"),
        F.array_join(
            F.transform(
                turns,
                lambda x: F.format_string(
                    "# Страница %d\n\n%s",
                    x["turn_idx"] + F.lit(1),
                    F.coalesce(x["extracted_text"], F.lit("")),
                ),
            ),
            PAGE_JOINER_APP,
        ).alias("combined_app"),
        F.array_join(
            F.transform(turns, lambda x: F.coalesce(x["extracted_text"], F.lit(""))),
            PAGE_JOINER_CLI,
        ).alias("combined_cli"),
    )


def with_turn_rank(extracted: DataFrame) -> DataFrame:
    """Row-preserving stable-ordering variant (W1/W2): row_number over
    (conv_id ORDER BY turn_idx)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return extracted.withColumn("turn_rank", F.row_number().over(w))
