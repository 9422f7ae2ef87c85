#!/usr/bin/env python
"""Corpus dedup entrypoint — documents parquet → canonical mapping.

Chains the engine's dedup operators into the pipeline a training-data
corpus actually runs:

  1. exact dedup (d1 semantics): sha256(text) hash-groupBy
  2. MinHash+LSH candidate pairs (d4): banded signatures, bucket join
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--skip-near-dup", action="store_true",
                    help="exact dedup only (no MinHash/LSH pass)")
    ap.add_argument("--jaccard-threshold", type=float, default=0.8,
                    help="min token-set Jaccard for an LSH candidate pair "
                         "to count as a near-duplicate (verification step)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("corpus_dedup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from mistral_ocr_app_spark.operators.corpus import (
        LSH_BANDS,
        N_MINHASH,
        minhash_signatures,
    )
    from mistral_ocr_app_spark.operators.dedup_cluster import canonicalize

    docs = spark.read.parquet(args.input)
    pairs = exact_pairs(docs)
    if not args.skip_near_dup:
        # same banded-LSH shape as the d4 catalog query, built directly
        # from the loaded table (the catalog entry re-reads an sf dir)
        # production path: xxhash64 base hash (~4x cheaper than the
        # oracle-portable md5 family; same banded-LSH construction)
        sigs = minhash_signatures(docs, portable=False)
        rows_per_band = N_MINHASH // LSH_BANDS
        bands = sigs.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at(
                                    "sig", b * rows_per_band + r + 1
                                ).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                        for b in range(LSH_BANDS)
                    ]
                )
            ).alias("band", "bucket"),
        )
        a, b = bands.alias("a"), bands.hint("merge").alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        # verification: true token-set Jaccard on candidates only (the
        # d3 expression, linear in |candidates| — no quadratic join)
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
            .filter(inter / union >= args.jaccard_threshold)
            .select("doc_a", "doc_b")
        )
        pairs = pairs.unionByName(near).distinct()

    mapping = canonicalize(docs, pairs)
    mapping.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = {
        "n_docs": out.count(),
        "n_canonical": out.filter("is_canonical").count(),
    }
    stats["n_removed"] = stats["n_docs"] - stats["n_canonical"]
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
