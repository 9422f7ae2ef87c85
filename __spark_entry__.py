"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator catalog from
``mistral_ocr_app_spark.operators.catalog`` (SURVEY.md §2 coverage +
corpus-scale dedup/similarity/text-analysis ops), each Spark query paired
with an independent DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mistral_ocr_app_spark.operators import catalog  # noqa: E402
from mistral_ocr_app_spark.operators.assemble import assemble_conversations  # noqa: E402
from mistral_ocr_app_spark.operators.extract import extract_turns  # noqa: E402
from mistral_ocr_app_spark.operators.pipeline_queries import derive_transcripts  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → derived transcripts → vectorized per-turn
    extraction (HTML strip + markdown link rewrite) → ordered
    per-conversation assembly (both joiner variants)."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    transcripts = derive_transcripts(docs)
    return assemble_conversations(extract_turns(transcripts))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
