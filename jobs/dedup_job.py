#!/usr/bin/env python
"""Corpus dedup entrypoint — documents parquet → canonical mapping.

Chains the engine's dedup operators into the pipeline a training-data
corpus actually runs:

  1. exact dedup (d1 semantics): sha256(text) hash-groupBy
  2. MinHash+LSH candidate pairs (d4): banded signatures, bucket join,
     with a mega-bucket guard — buckets over --max-bucket-size are
     dropped (their band carries no selectivity for those docs) and the
     dropped counts are surfaced in the stats line (no silent caps)
  3. candidate VERIFICATION: true token-set Jaccard >= threshold,
     computed only on the candidate pairs (linear in candidates — the
     d3 expression without d3's quadratic self-join). Without this,
     transitive closure over raw LSH collisions merges unrelated docs
     that merely share banded-signature buckets.
  4. connected components over (exact ∪ verified-near-dup) pairs →
     (doc_id, canonical_id, is_canonical)

Usage:
    spark-submit --py-files engine.zip jobs/dedup_job.py \\
        --input /path/to/documents_parquet --output /path/to/dedup_out

Output: parquet (doc_id, canonical_id, is_canonical) + one JSON stats
line on stdout. Survivor rule everywhere: smallest doc_id (matches the
d1 catalog query's ``canonical_id`` and the reference's deterministic-
winner convention, SURVEY §2.8 X13 — no randomness).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def exact_pairs(docs):
    """d1-style exact-duplicate pairs: every doc joins its group's min."""
    groups = docs.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("doc_a"), F.collect_list("doc_id").alias("ids")
    )
    return (
        groups.select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


DEFAULT_MAX_BUCKET = 1000  # LSH bucket-membership ceiling (see below)


def near_dup_pairs(docs, jaccard_threshold: float = 0.8,
                   max_bucket_size: int | None = DEFAULT_MAX_BUCKET):
    """LSH candidates (guarded) → Jaccard-verified near-dup pairs.

    Production path: xxhash64 base hash (~4× cheaper than the
    oracle-portable md5 family; same banded-LSH construction), PLUS the
    mega-bucket guard — a stopword-like (band, bucket) with k members
    emits O(k²) candidate pairs that the verify step must process even
    though AQE spreads the join itself; buckets over ``max_bucket_size``
    are dropped and returned for the job stats (no silent caps).

    Verification: true token-set Jaccard computed on candidates only —
    the d3 expression, linear in |candidates|, no quadratic self-join.
    Returns (near_pairs, dropped_buckets | None).
    """
    from mistral_ocr_app_spark.operators.corpus import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    bands = lsh_bands(minhash_signatures(docs, portable=False))
    cand, dropped = lsh_candidate_pairs(bands, max_bucket_size)
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("tok")
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tok").alias("tok_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"))
    inter = F.size(F.array_intersect("tok_a", "tok_b")).cast("double")
    union = F.size(F.array_distinct(F.concat("tok_a", "tok_b")))
    near = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(inter / union >= jaccard_threshold)
        .select("doc_a", "doc_b")
    )
    return near, dropped


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--skip-near-dup", action="store_true",
                    help="exact dedup only (no MinHash/LSH pass)")
    ap.add_argument("--jaccard-threshold", type=float, default=0.8,
                    help="min token-set Jaccard for an LSH candidate pair "
                         "to count as a near-duplicate (verification step)")
    ap.add_argument("--max-bucket-size", type=int, default=DEFAULT_MAX_BUCKET,
                    help="LSH bucket-membership ceiling; oversized buckets "
                         "are dropped and counted in the stats line "
                         "(0 disables the guard)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("corpus_dedup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from mistral_ocr_app_spark.operators.dedup_cluster import canonicalize

    docs = spark.read.parquet(args.input)
    pairs = exact_pairs(docs)
    dropped = None
    if not args.skip_near_dup:
        near, dropped = near_dup_pairs(
            docs,
            jaccard_threshold=args.jaccard_threshold,
            max_bucket_size=args.max_bucket_size or None,
        )
        pairs = pairs.unionByName(near).distinct()

    mapping = canonicalize(docs, pairs)
    mapping.write.mode("overwrite").parquet(args.output)

    # one scan for both counts (count + count_if in a single agg job)
    row = (
        spark.read.parquet(args.output)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("is_canonical")).alias("n_canonical"),
        )
        .first()
    )
    stats = {"n_docs": row["n_docs"], "n_canonical": row["n_canonical"],
             "n_removed": row["n_docs"] - row["n_canonical"]}
    if dropped is not None:
        # no-silent-caps rule: surface what the mega-bucket guard dropped
        drow = dropped.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.coalesce(F.sum("k"), F.lit(0)).alias("n_rows"),
        ).first()
        stats["lsh_buckets_dropped"] = drow["n_buckets"]
        stats["lsh_band_rows_dropped"] = int(drow["n_rows"])
        stats["max_bucket_size"] = args.max_bucket_size
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
