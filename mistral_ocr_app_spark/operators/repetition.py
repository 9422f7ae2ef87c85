"""Gopher-style repetition quality metrics — per-document, shuffle-free.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) gate
web documents on *repetition within the document*: the fraction of
content accounted for by the single most frequent n-gram, and the
fraction accounted for by n-grams that occur more than once. Documents
dominated by templated or looping text fail both. These are standard
training-data filters alongside the C4 gates `jobs/filter_job.py`
already applies (reference scope: the app extracts documents but has no
corpus-quality stage — this family is part of the pipeline-beyond-
reference surface, like d1-d6/c1-c5).

Scale design: every metric here is a **per-document array computation
with ZERO shuffle** — no explode, no groupBy. The naive distributed
shape (explode n-grams → groupBy(doc_id, gram) → count) hash-partitions
rows that are *already co-located by construction*, paying a full
exchange of ~n_tokens rows per document at 10^12-turn scale. Instead:

  1. hash every token once, as a MATERIALIZED column (higher-order
     lambdas embed referenced subtrees, so an inline hash array would
     be re-evaluated per gram — measured 6× slower);
  2. each n-gram becomes a packed 62-bit double polynomial fold of the
     token hashes plus its character length — numeric structs, no
     string concatenation (strings were another ~3×);
  3. `array_sort` makes equal grams adjacent runs (O(n log n));
  4. ONE `aggregate` scan with a struct accumulator computes the
     most-common-run char mass, duplicated-run char mass and total
     mass together; both fractions and the pass verdict derive from
     that single struct in a separate Project (`CollapseProject` keeps
     a non-cheap reference used twice un-inlined — the same
     single-evaluation pattern as the round-5 assembly refactor).

Hash equality stands in for gram equality (same convention as
``substring_dedup``): the 62-bit packed fold makes within-document
collisions ~n²/2^62 — irrelevant at any scale. The DuckDB oracle (c2)
groups by the gram *strings* (unnest + GROUP BY) — same numbers,
different plan, which is exactly what the oracle is for.

Fractions are char-weighted and self-normalized: the denominator is
the total character mass of all n-gram occurrences, so a value of 1.0
means "every n-gram occurrence is (part of) the repeated mass". Docs
shorter than n tokens have no n-grams and score 0.0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import P_HASH

_B1, _B2 = 1000003, 1000033  # the packed-fold bases substring_dedup uses
_PACK = 2147483648  # 2^31


def gram_array(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams of ``toks`` (empty if the
    document has fewer than ``n`` tokens — guarded because Spark's
    ``sequence(0, -k)`` counts *down*, it does not return empty).
    Reference implementation for tests/oracles; the fast path below
    never builds gram strings."""
    starts = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


_GRAM_T = "array<struct<h:bigint,len:bigint>>"


def _hashed_grams(hs: Column, ls: Column, n: int) -> Column:
    """(hash, char-length) structs for every n-gram, from materialized
    per-token hash/length arrays. All intermediates < 2^62 (ANSI-safe:
    acc·B + h < P·B ≈ 2^52)."""

    def fold(i, base):
        return F.aggregate(
            F.slice(hs, i + 1, n),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * base + h) % F.lit(P_HASH),
        )

    def glen(i):
        return F.aggregate(
            F.slice(ls, i + 1, n), F.lit(n - 1).cast("long"), lambda a, x: a + x
        )

    starts = F.sequence(F.lit(0), F.size(hs) - n)
    grams = F.transform(
        starts,
        lambda i: F.struct(
            (fold(i, F.lit(_B1)) * F.lit(_PACK) + fold(i, F.lit(_B2))).alias("h"),
            glen(i).alias("len"),
        ),
    )
    return F.when(F.size(hs) >= n, grams).otherwise(F.array().cast(_GRAM_T))


def _rep_stats(grams: Column) -> Column:
    """One sorted scan → struct(top_frac, dup_frac): char mass of the
    longest equal-gram run, char mass of all runs longer than 1, both
    over the total occurrence mass."""
    zero = F.struct(
        F.lit(-1).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("tot"),
    )

    def step(acc, g):
        newrun = F.when(g["h"] == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        add = (
            F.when(newrun == 2, 2 * g["len"])
            .when(newrun > 2, g["len"])
            .otherwise(F.lit(0))
            .cast("long")
        )
        return F.struct(
            g["h"].alias("prev"),
            newrun.alias("run"),
            F.greatest(acc["best"], newrun * g["len"]).alias("best"),
            (acc["dup"] + add).alias("dup"),
            (acc["tot"] + g["len"]).alias("tot"),
        )

    def finish(acc):
        tot = acc["tot"]
        frac = lambda m: F.when(  # noqa: E731
            tot > 0, F.round(m.cast("double") / tot, 4)
        ).otherwise(F.lit(0.0))
        return F.struct(
            frac(acc["best"]).alias("top_frac"), frac(acc["dup"]).alias("dup_frac")
        )

    return F.aggregate(F.array_sort(grams), zero, step, finish)


#: Gopher gates n-grams up to n=10; the synthetic corpus (10-100-token
#: docs over a tiny vocabulary) has zero duplicated grams above n=2, so
#: the standard bundle gates on 2-grams where the signal lives — both
#: metrics split the sf0.01 corpus at these thresholds (top2: max 0.19,
#: ~6% fail at 0.10; dup2: max 0.22, 30% exact-zero, ~15% fail at 0.12).
#: Production pipelines pass their own n/thresholds to the primitives.
TOP2_MAX = 0.10
DUP2_MAX = 0.12


def with_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_max: float = TOP2_MAX,
    dup_max: float = DUP2_MAX,
    cols: tuple[str, str, str] = ("top2gram_frac", "dup2gram_frac", "repetition_pass"),
) -> DataFrame:
    """The fast path: adds (top-frac, dup-frac, pass) computed ONCE.

    Staged as materialize-then-derive so nothing is re-evaluated: the
    token hash/length arrays are real columns (referenced non-cheaply
    twice each → `CollapseProject` leaves them), and all three outputs
    derive from one ``_rep`` struct column (referenced three times →
    likewise left un-inlined, single aggregate evaluation)."""
    toks = F.split(F.col(text_col), " ")
    top_c, dup_c, pass_c = cols
    staged = df.withColumns(
        {
            "_rep_hs": F.transform(
                toks, lambda t: F.pmod(F.xxhash64(t), F.lit(P_HASH))
            ),
            "_rep_ls": F.transform(toks, lambda t: F.length(t).cast("long")),
        }
    ).withColumn("_rep", _rep_stats(_hashed_grams(F.col("_rep_hs"), F.col("_rep_ls"), n)))
    return staged.withColumns(
        {
            top_c: F.col("_rep")["top_frac"],
            dup_c: F.col("_rep")["dup_frac"],
            pass_c: (F.col("_rep")["top_frac"] <= top_max)
            & (F.col("_rep")["dup_frac"] <= dup_max),
        }
    ).drop("_rep_hs", "_rep_ls", "_rep")


def _stats_inline(toks: Column, n: int) -> Column:
    """Standalone-column variant (recomputes the token arrays inline —
    fine for tests/small frames; production uses the staged fast
    path)."""
    hs = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(P_HASH)))
    ls = F.transform(toks, lambda t: F.length(t).cast("long"))
    return _rep_stats(_hashed_grams(hs, ls, n))


def top_gram_char_frac(toks: Column, n: int) -> Column:
    """Char-weighted share of the most frequent n-gram (Gopher's
    "fraction of characters in the most common n-gram")."""
    return _stats_inline(toks, n)["top_frac"]


def dup_gram_char_frac(toks: Column, n: int) -> Column:
    """Char-weighted share of n-gram occurrences whose gram occurs more
    than once in the document (Gopher's "fraction of characters in
    duplicated n-grams")."""
    return _stats_inline(toks, n)["dup_frac"]
