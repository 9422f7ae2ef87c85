#!/usr/bin/env python
"""Corpus quality-filter entrypoint — the C4-style gating stage.

Chains the engine's text-analysis operators (operators/corpus.py
c-family, all JVM-side column expressions) into the filter pass a
training-data pipeline runs between dedup and training:

  * exact-substring dedup     (optional --strip-dup-windows W: remove
                               non-canonical duplicated W-token windows
                               corpus-wide BEFORE gating, Lee-et-al-style
                               — operators/substring_dedup.py)
  * token/length gates        (c1 semantics: whitespace token count)
  * stopword-ratio band       (c2: boilerplate/gibberish both fail it)
  * mean-token-length band    (c2: code dumps / minified junk fail high)
  * language allow-list       (c3: bigram-hit heuristic)

Every row keeps its verdict and per-rule flags (nothing is silently
dropped — the reject table is written too, with reasons, because at
100 TB the rejects ARE the QA surface).

Usage:
    spark-submit --py-files engine.zip jobs/filter_job.py \\
        --input /path/to/documents_parquet --output /path/to/filter_out \\
        [--min-tokens 20] [--max-tokens 100000]
        [--stopword-band 0.05 0.6] [--langs latin-en latin-es]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def quality_flags(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    stopword_lo: float = 0.05,
    stopword_hi: float = 0.6,
    mean_len_hi: float = 12.0,
    langs: tuple[str, ...] = ("latin-en", "latin-es"),
) -> DataFrame:
    """documents(text, ...) → per-row rule flags + verdict. Pure column
    expressions (same building blocks as catalog queries c1-c3)."""
    from mistral_ocr_app_spark.operators.corpus import STOPWORDS

    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("int")
    stop_arr = F.array([F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop.cast("double") / n_tokens
    mean_len = F.length("text").cast("double") / n_tokens
    en = F.size(F.regexp_extract_all("text", F.lit("th|he|in|er"), 0))
    es = F.size(F.regexp_extract_all("text", F.lit("de|la|el|os"), 0))
    lang_guess = F.when(en >= es, "latin-en").otherwise("latin-es")

    flagged = docs.select(
        "*",
        n_tokens.alias("q_n_tokens"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        F.round(mean_len, 4).alias("q_mean_token_len"),
        lang_guess.alias("q_lang"),
        (n_tokens >= min_tokens).alias("pass_min_tokens"),
        (n_tokens <= max_tokens).alias("pass_max_tokens"),
        stop_ratio.between(stopword_lo, stopword_hi).alias("pass_stopwords"),
        (mean_len <= mean_len_hi).alias("pass_token_len"),
        lang_guess.isin(*langs).alias("pass_lang"),
    )
    return flagged.withColumn(
        "quality_pass",
        F.col("pass_min_tokens")
        & F.col("pass_max_tokens")
        & F.col("pass_stopwords")
        & F.col("pass_token_len")
        & F.col("pass_lang"),
    )


def apply_substring_dedup(docs: DataFrame, width: int) -> DataFrame:
    """Exact-substring dedup stage (Lee-et-al-style): strip every token
    covered by a non-canonical duplicated ``width``-token window, so the
    quality gates below score the *deduplicated* text. The original text
    survives as ``text_raw`` (rejects are a QA surface; reviewers need
    to see what was cut)."""
    from mistral_ocr_app_spark.operators.substring_dedup import (
        strip_duplicate_windows,
    )

    return (
        strip_duplicate_windows(docs, width=width, out_col="_text_dedup")
        .withColumnRenamed("text", "text_raw")
        .withColumnRenamed("_text_dedup", "text")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--stopword-band", type=float, nargs=2, default=(0.05, 0.6))
    ap.add_argument("--langs", nargs="+", default=["latin-en", "latin-es"])
    ap.add_argument(
        "--strip-dup-windows", type=int, default=0, metavar="W",
        help="exact-substring dedup before gating: remove non-canonical "
        "duplicated W-token windows corpus-wide (0 = off)",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("corpus_quality_filter")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    docs = spark.read.parquet(args.input)
    if args.strip_dup_windows:
        docs = apply_substring_dedup(docs, args.strip_dup_windows)
    flagged = quality_flags(
        docs,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        stopword_lo=args.stopword_band[0],
        stopword_hi=args.stopword_band[1],
        langs=tuple(args.langs),
    )
    flagged.filter("quality_pass").drop(
        *[c for c in flagged.columns if c.startswith("pass_")]
    ).write.mode("overwrite").parquet(os.path.join(args.output, "kept"))
    flagged.filter("NOT quality_pass").write.mode("overwrite").parquet(
        os.path.join(args.output, "rejected")
    )

    rule_counts = flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("quality_pass").alias("n_kept"),
        *[
            F.count_if(~F.col(c)).alias(f"fail_{c.removeprefix('pass_')}")
            for c in flagged.columns
            if c.startswith("pass_")
        ],
    ).first()
    print(json.dumps(rule_counts.asDict()))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
