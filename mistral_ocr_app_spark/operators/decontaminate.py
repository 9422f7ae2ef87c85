"""Benchmark decontamination — n-gram-overlap flagging of training
documents against a held-out evaluation set.

Standard practice for any corpus that feeds model training (GPT-3
appendix C, PaLM §C, Llama eval cards): a training document is
*contaminated* if it shares a ≥W-token verbatim window with any
benchmark item, and must be dropped (or at least flagged) before
export. The reference app has no training stage — this belongs to the
pipeline-beyond-reference family (d/c/e ops), and reuses their
machinery: windows are the hashed fixed-width token windows of
``operators/substring_dedup.py`` (lowered whitespace tokens, packed
62-bit double polynomial fold), so engine and DuckDB oracle agree
bit-for-bit on what "the same window" means.

Scale design (the asymmetry is the whole point):
  * the CORPUS side is 10^12 turns — its windows are computed
    streaming-fashion per row (transform/aggregate, no Python) and
    never collected;
  * the BENCHMARK side is tiny by nature (every public eval suite
    together is ≪ 1 GB of text) — its distinct window hashes are
    **broadcast**, so flagging is a map-side LEFT SEMI probe with ZERO
    shuffle of the corpus. The plan must show BroadcastHashJoin;
    a sort-merge here would shuffle the full corpus on window hash
    (~n_tokens rows per doc) for nothing.
  * per-doc aggregation of hits happens AFTER the semi-join, on the
    (tiny) surviving subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .substring_dedup import _window_occurrences

#: default window width — inside the 8–13-token band the published
#: decontamination setups use, and equal to substring_dedup's
#: SUBSTR_W so catalog oracles can share one window-hash computation.
CONTAM_W = 10


def benchmark_window_hashes(
    bench: DataFrame, width: int = CONTAM_W, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct window hashes of the benchmark set — the broadcast
    probe side. Cache/persist this when decontaminating many batches."""
    return _window_occurrences(bench, width, id_col, text_col).select("wh").distinct()


def contamination_counts(
    docs: DataFrame,
    bench_hashes: DataFrame,
    width: int = CONTAM_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination evidence: ``(doc_id,
    n_contam_windows, first_contam_pos)`` — only documents with at
    least one benchmark-overlapping window appear (join with the
    corpus and coalesce to 0 for the full picture)."""
    occ = _window_occurrences(docs, width, id_col, text_col)
    hits = occ.join(F.broadcast(bench_hashes), "wh", "leftsemi")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_contam_windows"),
        F.min("pos").alias("first_contam_pos"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    width: int = CONTAM_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` + ``(n_contam_windows, pass_decontam)`` columns —
    nothing dropped (the reject table is the QA surface; the caller
    partitions on the flag like filter_job's other gates)."""
    bh = benchmark_window_hashes(bench, width, id_col, text_col)
    contam = contamination_counts(docs, bh, width, id_col, text_col)
    out = docs.join(
        contam.withColumnRenamed("doc_id", "__contam_id"),
        F.col(id_col) == F.col("__contam_id"),
        "left",
    ).drop("__contam_id", "first_contam_pos")
    n = F.coalesce(F.col("n_contam_windows"), F.lit(0)).cast("int")
    return out.withColumn("n_contam_windows", n).withColumn(
        "pass_decontam", n == 0
    )
