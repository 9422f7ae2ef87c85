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
     fold of the token hashes, computed as a vectorized ``mapInArrow``
     stage (numpy int64 mod arithmetic, bit-identical to the oracle's
     fold; see ``_window_occurrences`` for why this beat the earlier
     interpreted JVM higher-order expressions ~7×);
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

from .corpus import P_HASH, _FP_BASE

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
    """One row per ``width``-token window: (doc_id, pos, wh).

    Round 7 (guide §4.2): vectorized ``mapInArrow`` stage instead of the
    previous JVM higher-order-expression pipeline. The per-window
    polynomial fold through ``F.aggregate`` over ``F.slice`` is
    *interpreted* per element — O(n·width·2) lambda steps per document,
    measured ~3 core-ms/doc (4.9 s wall for 2.27M windows at sf1.0).
    Here the same fold is ``width`` vectorized numpy passes over the
    whole token-hash array per document (every intermediate < 2^51, so
    int64 mod arithmetic is exact), and the md5 token hashes are
    memoized per task — token vocabularies repeat heavily, so most
    tokens cost one dict probe instead of a digest. Hash values are
    bit-identical to the JVM/DuckDB formulation: the stepwise
    ``(acc·B + h) mod P`` equals the mod of the polynomial sum, and the
    per-step mod placement cannot change the residue.

    Tokenization parity: ``text.lower().split(" ")`` matches
    ``F.split(F.lower(text), " ")`` including empty tokens from
    consecutive spaces; null text and docs shorter than ``width``
    tokens emit nothing, as before (pinned by the pure-Python
    differential in tests/test_substring_dedup.py and the c1 oracle).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    p_mod, b1, b2 = P_HASH, _FP_BASE, _FP_BASE2

    def batches(it):
        memo: dict[str, int] = {}
        md5 = hashlib.md5

        def th(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = int(md5(tok.encode("utf-8")).hexdigest()[:15], 16) % p_mod
                memo[tok] = v
            return v

        for b in it:
            ids = b.column(0).to_pylist()
            texts = b.column(1).to_pylist()
            out_id, out_pos, out_wh = [], [], []
            for d, t in zip(ids, texts):
                if t is None:
                    continue
                toks = t.lower().split(" ")
                n = len(toks)
                if n < width:
                    continue
                if n > MAX_POS:
                    # the canonical-occurrence key packs doc_id*MAX_POS+pos
                    # into one int64; a longer document would silently
                    # collide keys ACROSS documents and corrupt canonical
                    # selection — fail loudly instead (ADVICE r6)
                    raise ValueError(
                        f"document {d} has {n} tokens > MAX_POS={MAX_POS}; "
                        "substring dedup's packed ordering key cannot "
                        "represent it — chunk the document first"
                    )
                hs = np.fromiter((th(x) for x in toks), dtype=np.int64, count=n)
                m = n - width + 1
                acc1 = np.zeros(m, dtype=np.int64)
                acc2 = np.zeros(m, dtype=np.int64)
                for j in range(width):
                    seg = hs[j:j + m]
                    acc1 = (acc1 * b1 + seg) % p_mod
                    acc2 = (acc2 * b2 + seg) % p_mod
                out_id.append(np.full(m, d, dtype=np.int64))
                out_pos.append(np.arange(m, dtype=np.int32))
                out_wh.append(acc1 * 2147483648 + acc2)
            if out_id:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_id)),
                        pa.array(np.concatenate(out_pos)),
                        pa.array(np.concatenate(out_wh)),
                    ],
                    names=["doc_id", "pos", "wh"],
                )

    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).mapInArrow(batches, "doc_id long, pos int, wh long")


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
