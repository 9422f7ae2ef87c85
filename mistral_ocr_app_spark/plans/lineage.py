"""Per-partition checkpoint / lineage — resumable extraction commits.

Modeled on the reference's append-only audit log (the only durable
"progress" record it keeps: settings_history, written on every change —
/root/reference/database/settings_manager.py:28-41) and the MERGE-style
upsert it uses for settings (J6/U2). At 10¹²-turn scale the job MUST be
resumable: a killed run re-extracts only uncommitted work.

Design (SURVEY §4.3):
  * work unit = conv bucket: ``pmod(xxhash64(conv_id), n_buckets)`` —
    deterministic, independent of file layout; conversations never span
    buckets so per-conv assembly stays intra-bucket.
  * data sink is partitioned by bucket with DYNAMIC partition overwrite:
    re-running a bucket atomically replaces its directory → idempotent
    under retry/speculation.
  * lineage row appended ONLY after a bucket's data write succeeded:
    (bucket, status, n_turns, n_convs, fingerprint, committed_at).
    fingerprint = bit_xor of row hashes — order-insensitive and
    overflow-free (ANSI mode), so identical output ⟺ identical
    fingerprint regardless of execution order.
  * resume = anti-join of all buckets against committed lineage: a
    fresh run computes the pending set and touches nothing committed.

On a real cluster the lineage table is an Iceberg table and the commit
is ``MERGE INTO``; locally both are parquet directories (append-only
lineage + dynamic-overwrite data), which preserves the same idempotence
contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_turns

DEFAULT_BUCKETS = 64


def bucket_expr(n_buckets: int = DEFAULT_BUCKETS):
    """Deterministic conv bucket; salting for long-conversation skew is a
    property of bucket count, not data order."""
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


def committed_buckets(spark: SparkSession, lineage_dir: str) -> list[int]:
    if not os.path.isdir(lineage_dir):
        return []
    try:
        lin = spark.read.parquet(lineage_dir)
    except Exception:
        return []
    return sorted(
        r["bucket"]
        for r in lin.filter(F.col("status") == "done").select("bucket").distinct().collect()
    )


def lineage_rows(extracted_with_bucket: DataFrame) -> DataFrame:
    """Per-bucket commit rows: counts + order-insensitive fingerprint +
    per-kind metrics (the reference's processing_info analog,
    app.py:720-726)."""
    row_hash = F.xxhash64("conv_id", "turn_idx", "extracted_text")
    return extracted_with_bucket.groupBy("bucket").agg(
        F.lit("done").alias("status"),
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, extracted_text))").alias(
            "fingerprint"
        ),
        F.sum(F.length("extracted_text")).alias("n_chars"),
        F.sum("n_images").alias("n_images"),
        F.sum("n_rewritten").alias("n_rewritten"),
        F.count_if(~F.col("valid")).alias("n_invalid"),
        F.current_timestamp().alias("committed_at"),
    )


def run_extraction_with_lineage(
    spark: SparkSession,
    transcripts_path: str,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    fail_after_buckets: int | None = None,
) -> dict:
    """Extract transcripts → per-turn output parquet, bucket-partitioned,
    with per-bucket lineage commits. Re-invocation after a kill resumes:
    committed buckets are skipped (anti-join on lineage).

    ``fail_after_buckets``: test hook — commit only the first k pending
    buckets then stop, simulating a mid-job kill *between* bucket commits
    (a kill *inside* a bucket write just leaves an uncommitted bucket,
    which dynamic overwrite makes safe to rerun).

    Returns {n_pending, n_committed_before, n_committed_now}.
    """
    data_dir = os.path.join(out_dir, "data")
    lineage_dir = os.path.join(out_dir, "_lineage")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = committed_buckets(spark, lineage_dir)
    transcripts = spark.read.parquet(transcripts_path).withColumn(
        "bucket", bucket_expr(n_buckets)
    )
    pending = transcripts.filter(~F.col("bucket").isin(done)) if done else transcripts

    pending_buckets = sorted(
        r["bucket"] for r in pending.select("bucket").distinct().collect()
    )
    if fail_after_buckets is not None:
        pending_buckets = pending_buckets[:fail_after_buckets]
        pending = pending.filter(F.col("bucket").isin(pending_buckets))

    n_now = 0
    if pending_buckets:
        extracted = extract_turns(pending.drop("bucket")).withColumn(
            "bucket", bucket_expr(n_buckets)
        )
        # data first (atomic per-partition dynamic overwrite) ...
        extracted.write.partitionBy("bucket").mode("overwrite").parquet(data_dir)
        # ... lineage only after the data write returned
        done_df = spark.read.parquet(data_dir).filter(
            F.col("bucket").isin(pending_buckets)
        )
        lineage_rows(done_df).write.mode("append").parquet(lineage_dir)
        n_now = len(pending_buckets)

    return {
        "n_pending": len(pending_buckets),
        "n_committed_before": len(done),
        "n_committed_now": n_now,
    }


def verify_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    """Audit committed buckets: recompute (n_turns, fingerprint) from the
    data actually on disk and compare with the lineage rows. Returns the
    mismatch set — empty ⟺ every committed bucket's bytes still produce
    the fingerprint recorded at commit time (detects partial writes,
    manual edits, bit-rot; the at-scale analog of the reference's
    validate_ocr_response production checks, app.py:142-177).

    The fingerprint is bit_xor of row hashes, so verification is
    order-insensitive and runs as one pass over the data."""
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    lineage = (
        spark.read.parquet(os.path.join(out_dir, "_lineage"))
        .filter(F.col("status") == "done")
        .select("bucket", "n_turns", "fingerprint")
    )
    actual = data.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("actual_n_turns"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, extracted_text))").alias(
            "actual_fingerprint"
        ),
    )
    return (
        lineage.join(actual, "bucket", "full_outer")
        .filter(
            (F.col("n_turns").isNull())
            | (F.col("actual_n_turns").isNull())
            | (F.col("n_turns") != F.col("actual_n_turns"))
            | (F.col("fingerprint") != F.col("actual_fingerprint"))
        )
        .orderBy("bucket")
    )
