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


def committed_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame | None:
    """Distinct committed bucket ids as a RELATION (None if no lineage
    yet). Resume filters anti-join against this — never an ``isin`` over
    a collected list, which at 4096+ mostly-committed buckets becomes a
    giant literal IN in the plan (SURVEY §4.3 prescribes the anti-join)."""
    if not os.path.isdir(lineage_dir):
        return None
    try:
        lin = spark.read.parquet(lineage_dir)
    except Exception:
        return None
    return lin.filter(F.col("status") == "done").select("bucket").distinct()


def committed_buckets(spark: SparkSession, lineage_dir: str) -> list[int]:
    """Driver-side bucket-id list (bounded by n_buckets) — for run stats
    and tests, NOT for plan filters."""
    lin = committed_lineage(spark, lineage_dir)
    if lin is None:
        return []
    return sorted(r["bucket"] for r in lin.collect())


def pending_transcripts(
    spark: SparkSession,
    transcripts_path: str,
    lineage_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Transcripts still to extract: LEFT ANTI against the committed
    lineage relation (plan-asserted in tests/test_lineage.py) — never an
    ``isin`` over a collected list, whose plan grows with every
    committed bucket."""
    transcripts = spark.read.parquet(transcripts_path).withColumn(
        "bucket", bucket_expr(n_buckets)
    )
    lin_done = committed_lineage(spark, lineage_dir)
    if lin_done is None:
        return transcripts
    return transcripts.join(F.broadcast(lin_done), "bucket", "left_anti")


def lineage_rows(
    extracted_with_bucket: DataFrame, keys: tuple[str, ...] = ("bucket",)
) -> DataFrame:
    """Per-commit-unit lineage rows: counts + order-insensitive
    fingerprint + per-kind metrics (the reference's processing_info
    analog, app.py:720-726). Batch commits key by bucket; the streaming
    sink keys by (bucket, epoch) — same row shape either way."""
    return extracted_with_bucket.groupBy(*keys).agg(
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

    lin_done = committed_lineage(spark, lineage_dir)
    n_done = lin_done.count() if lin_done is not None else 0
    pending = pending_transcripts(spark, transcripts_path, lineage_dir, n_buckets)

    # bounded by n_buckets — driver-side stats + the fail_after test hook
    pending_buckets = sorted(
        r["bucket"] for r in pending.select("bucket").distinct().collect()
    )
    if fail_after_buckets is not None:
        # test hook simulating a kill after k bucket commits: an isin
        # over k literals is fine here (k is small by construction)
        pending_buckets = pending_buckets[:fail_after_buckets]
        pending = pending.filter(F.col("bucket").isin(pending_buckets))

    n_now = 0
    if pending_buckets:
        extracted = extract_turns(pending.drop("bucket")).withColumn(
            "bucket", bucket_expr(n_buckets)
        )
        # data first (atomic per-partition dynamic overwrite) ...
        extracted.write.partitionBy("bucket").mode("overwrite").parquet(data_dir)
        # ... lineage only after the data write returned. The re-read is
        # what makes the fingerprint audit honest (hash bytes on disk,
        # not bytes in memory). Restricting it: a semi-join does NOT get
        # dynamic partition pruning for a local build relation (measured:
        # empty PartitionFilters, full scan), so use a STATIC isin on the
        # partition column — it prunes directories, and its literal count
        # equals THIS run's pending buckets (small on resume, which is
        # when most buckets are committed and pruning matters); a fresh
        # full run writes every bucket and needs no filter at all.
        done_df = spark.read.parquet(data_dir)
        if len(pending_buckets) < n_buckets:
            done_df = done_df.filter(F.col("bucket").isin(pending_buckets))
        lineage_rows(done_df).write.mode("append").parquet(lineage_dir)
        n_now = len(pending_buckets)

    return {
        "n_pending": len(pending_buckets),
        "n_committed_before": n_done,
        "n_committed_now": n_now,
    }


def verify_lineage(
    spark: SparkSession, out_dir: str, keys: tuple[str, ...] = ("bucket",)
) -> DataFrame:
    """Audit committed buckets: recompute (n_turns, fingerprint) from the
    data actually on disk and compare with the lineage rows. Returns the
    mismatch set — empty ⟺ every committed bucket's bytes still produce
    the fingerprint recorded at commit time (detects partial writes,
    manual edits, bit-rot; the at-scale analog of the reference's
    validate_ocr_response production checks, app.py:142-177).

    The fingerprint is bit_xor of row hashes, so verification is
    order-insensitive and runs as one pass over the data."""
    keys = list(keys)
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    lineage = (
        spark.read.parquet(os.path.join(out_dir, "_lineage"))
        .filter(F.col("status") == "done")
        .select(*keys, "n_turns", "fingerprint")
    )
    actual = data.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("actual_n_turns"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, extracted_text))").alias(
            "actual_fingerprint"
        ),
    )
    return (
        lineage.join(actual, keys, "full_outer")
        .filter(
            (F.col("n_turns").isNull())
            | (F.col("actual_n_turns").isNull())
            | (F.col("n_turns") != F.col("actual_n_turns"))
            | (F.col("fingerprint") != F.col("actual_fingerprint"))
        )
        .orderBy(*keys)
    )
