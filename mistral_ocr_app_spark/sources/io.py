"""Sources & sinks (SURVEY §2.1).

The reference's per-request file I/O becomes table I/O here:

  S1  multipart upload scan      → explicit-schema parquet/Iceberg scan
  S8  combined-markdown .md sink → columnar sink keyed by conv_id
      (app.py:823-826; urandom filename → deterministic table key)
  S9  metadata JSON sink          → ``to_json(struct(...))`` with the
      payload-dropping projection of app.py:831-838
  S10 image-file sink             → binary column in parquet (preferred
      over per-file writes at scale)

Explicit schema everywhere: the reference's implicit dict-with-defaults
schema (app.py:546-555) is replaced by fixed StructTypes so scans never
pay inference and Catalyst can prune columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """S1: schema-pinned scan — no inference job, pruning-friendly."""
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def write_turns(extracted: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """Primary per-turn output sink (zstd parquet; optionally partitioned)."""
    writer = extracted.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_turns_bucketed(
    extracted: DataFrame, table_name: str, n_buckets: int = 64
) -> None:
    """Bucketed sink (SURVEY §4.3 co-location): hash-bucket by conv_id,
    sort files by (conv_id, turn_idx). Any later join or groupBy on
    conv_id between tables bucketed with EQUAL bucket counts runs
    shuffle-free — the scan itself satisfies the required distribution
    (plan-asserted in tests/test_plans.py). At 100 TB this converts the
    per-analysis assembly/join exchange into a one-time write cost.
    Bucketing metadata lives in the table catalog, so this sink is
    ``saveAsTable`` (Iceberg/Hive at scale; local warehouse in tests),
    not a bare path."""
    sort_cols = [c for c in ("conv_id", "turn_idx") if c in extracted.columns]
    (
        extracted.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "conv_id")
        .sortBy(*sort_cols)
        .saveAsTable(table_name)
    )


def write_markdown_sink(assembled: DataFrame, path: str) -> None:
    """S8: combined per-conversation markdown. One row per conversation,
    keyed by conv_id (deterministic — replaces app.py:823's
    ``document_ocr_{urandom}.md`` filenames, banned per SURVEY X13)."""
    assembled.select("conv_id", "combined_app").write.mode("overwrite").parquet(path)


def write_json_sink(extracted: DataFrame, path: str) -> None:
    """S9: JSON metadata sink with the payload-dropping projection —
    keep ids/counters, drop the heavy text payload (app.py:831-838)."""
    meta = extracted.select(
        F.to_json(
            F.struct(
                "conv_id",
                "turn_idx",
                "kind",
                "n_refs",
                "n_images",
                "n_rewritten",
                "n_spans",
                "valid",
                F.length("extracted_text").alias("n_chars"),
            )
        ).alias("value")
    )
    meta.write.mode("overwrite").text(path)
