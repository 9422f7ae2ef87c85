"""Exact-substring (token-window) deduplication — the passage-level
companion to the document-level d-family.

Document-level dedup (d1–d6) drops whole near-identical documents; at
training-data scale the remaining corpus still carries verbatim
*passages* repeated across otherwise-distinct documents (boilerplate
headers, licence blocks, templated paragraphs). The standard remedy
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") removes every repeated substring longer than a threshold,
keeping one canonical copy. The suffix-array construction used there is
single-machine; the distributed re-expression is hashed fixed-width
token windows:

  1. tokenize (lower, whitespace) and hash each token once
     (portable md5 family from ``corpus`` — the DuckDB oracle can
     reproduce every window hash bit-for-bit);
  2. every ``width``-token window becomes one row
     ``(doc_id, pos, window_hash)`` — the window hash is a polynomial
     fold of the token hashes, all JVM-side (``F.transform`` +
     ``F.aggregate``; O(n·width) per doc, no Python);
  3. per window hash: occurrence count and the lexicographically first
     ``(doc_id, pos)`` occurrence (the *canonical* copy);
  4. an occurrence is duplicated iff its hash occurs more than once and
     it is not the canonical copy.

Scale notes (100 TB):
  * the per-hash stats are a ``groupBy(window_hash)`` with map-side
    partial aggregation, then an equi-join back to occurrences on the
    hash — the JOIN shape, not a window function, deliberately: a
    window hash repeated 10M× (a ubiquitous boilerplate line) becomes
    one unsplittable window-function partition, while AQE's skew-join
    splits the same hot key across reducers;
  * occurrence rows are ``n_tokens`` per document — the same blow-up
    every hashed-window substring-dedup pays; filters/projections reach
    the parquet scan (only ``id_col``/``text_col`` are read);
  * ``doc_id·2^20 + pos`` packs the canonical ordering into one int64
    min-aggregate (positions are bounded by ``MAX_POS``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import P_HASH, _FP_BASE, md5_int

#: positions are packed as doc_id * MAX_POS + pos for the single-int64
#: canonical-occurrence min; documents must stay under MAX_POS tokens.
MAX_POS = 1 << 20


#: second polynomial base — the window hash packs two independent
#: 31-bit folds into one int64 (w1·2^31 + w2). A single 31-bit fold
#: collides with ~n²/2^32 probability (already ~15% at 25k windows,
#: certainty at corpus scale → false duplicate marks); the packed
#: 62-bit key pushes that to ~n²/2^63 while every intermediate stays
#: ANSI-int64-safe and DuckDB-reproducible.
_FP_BASE2 = 1000033


def _window_occurrences(docs: DataFrame, width: int, id_col: str, text_col: str):
    """One row per ``width``-token window: (doc_id, pos, wh)."""
    toks_h = F.transform(F.split(F.lower(F.col(text_col)), " "), md5_int)
    starts = F.sequence(F.lit(0), F.size("hs") - width)

    def fold(p, base):
        return F.aggregate(
            F.slice(F.col("hs"), p + 1, width),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * F.lit(base) + h) % F.lit(P_HASH),
        )

    win_hash = lambda p: (  # noqa: E731
        fold(p, _FP_BASE) * F.lit(2147483648) + fold(p, _FP_BASE2)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks_h.alias("hs"))
        .where(F.size("hs") >= width)
        .select(
            "doc_id",
            F.explode(
                F.transform(starts, lambda p: F.struct(p.alias("pos"), win_hash(p).alias("wh")))
            ).alias("w"),
        )
        .select("doc_id", F.col("w.pos").cast("int").alias("pos"), F.col("w.wh").alias("wh"))
    )


def duplicate_window_positions(
    docs: DataFrame,
    width: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-occurrence duplicate marking.

    Returns ``(doc_id, pos, is_dup)`` — one row per window occurrence,
    ``is_dup`` true iff the window's content occurs elsewhere in the
    corpus and this occurrence is not the canonical (first by
    ``(doc_id, pos)``) copy. Grouping happens on the window hash; hash
    equality stands in for content equality identically in the engine
    and the DuckDB oracle, so parity is exact by construction.
    """
    occ = _window_occurrences(docs, width, id_col, text_col)
    key = (F.col("doc_id") * MAX_POS + F.col("pos")).alias("k")
    occ = occ.select("doc_id", "pos", "wh", key)
    stats = occ.groupBy("wh").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("k").alias("mink")
    )
    # "merge" pins the sort-merge join: the per-hash stats relation grows
    # with the corpus, so the broadcast Catalyst picks under small local
    # stats is a plan that cannot exist at 10^12 windows (same trap, and
    # same fix, as d4's LSH band self-join); AQE skew-join then splits
    # ubiquitous-boilerplate hot hashes at runtime
    return occ.join(stats.hint("merge"), "wh").select(
        "doc_id",
        "pos",
        ((F.col("cnt") > 1) & (F.col("k") != F.col("mink"))).alias("is_dup"),
    )


def duplicate_window_stats(
    docs: DataFrame,
    width: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document rollup: (doc_id, n_windows, n_dup_windows,
    dup_positions) — dup_positions is the sorted token offsets of
    non-canonical duplicated windows. Documents shorter than ``width``
    tokens get (0, 0, []). One shuffle for the per-hash stats, one for
    the join, one for the per-doc rollup."""
    marked = duplicate_window_positions(docs, width, id_col, text_col)
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_windows"),
        F.sum(F.col("is_dup").cast("int")).cast("int").alias("n_dup_windows"),
        F.sort_array(
            F.collect_list(F.when(F.col("is_dup"), F.col("pos")))
        ).alias("dup_positions"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc.hint("merge"), "doc_id", "left")  # per-doc grain: corpus-sized, never broadcastable at scale
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce(
                "dup_positions", F.array().cast("array<int>")
            ).alias("dup_positions"),
        )
    )


def strip_duplicate_windows(
    docs: DataFrame,
    width: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Remove every token covered by a non-canonical duplicated window;
    canonical copies survive, so exactly one copy of each repeated
    passage remains corpus-wide (within-document repeats keep their
    first occurrence).

    All array surgery is JVM-side: the removed-index set is the union
    of ``[pos, pos+width)`` ranges; surviving tokens are selected by a
    ``zip_with`` over (token, index) emitting NULL for removed slots —
    ``array_join`` drops NULLs by default, so re-joining with a single
    space needs no extra filter pass.
    """
    stats = duplicate_window_stats(docs, width, id_col, text_col).select(
        F.col("doc_id").alias("_sd_doc_id"), "dup_positions"
    )
    out = docs.join(
        stats.hint("merge"), docs[id_col] == stats["_sd_doc_id"], "left"
    ).drop("_sd_doc_id")
    # removal indexes into the ORIGINAL-case token stream; matching was
    # case-folded but ' '-split token counts are case-invariant, so the
    # offsets line up and the surviving text keeps its original casing
    toks = F.split(F.col(text_col), " ")
    removed = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce("dup_positions", F.array().cast("array<int>")),
                lambda p: F.sequence(p, p + width - 1),
            )
        )
    )
    kept = F.zip_with(
        toks,
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda t, i: F.when(~F.array_contains(removed, i), t),
    )
    return out.withColumn(out_col, F.array_join(kept, " ")).drop("dup_positions")
