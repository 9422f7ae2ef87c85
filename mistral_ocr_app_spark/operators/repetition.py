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

  1. build the n-gram array with `transform` over `sequence` (JVM);
  2. `array_sort` it — equal grams become adjacent runs (O(n log n));
  3. one `aggregate` pass with a struct accumulator computes run
     statistics (longest char-weighted run, duplicated-run char mass)
     in a single scan.

The whole thing stays inside whole-stage codegen; the only cost is
per-row CPU, which partitions perfectly. The DuckDB oracle (c2) uses
the natural SQL shape (unnest + GROUP BY) — same numbers, different
plan, which is exactly what the oracle is for.

Fractions are char-weighted and self-normalized: the denominator is
the total character mass of all n-gram occurrences, so a value of 1.0
means "every n-gram occurrence is (part of) the repeated mass". Docs
shorter than n tokens have no n-grams and score 0.0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def gram_array(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams of ``toks`` (empty if the
    document has fewer than ``n`` tokens — guarded because Spark's
    ``sequence(0, -k)`` counts *down*, it does not return empty)."""
    starts = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def _gram_char_mass(grams: Column) -> Column:
    """Total character mass of all occurrences (the fraction denominator)."""
    return F.aggregate(
        grams, F.lit(0).cast("long"), lambda acc, g: acc + F.length(g)
    )


def top_gram_char_frac(toks: Column, n: int) -> Column:
    """Char-weighted share of the most frequent n-gram (Gopher's
    "fraction of characters in the most common n-gram").

    Single sorted-scan: track the current run length; the best mass is
    ``max(run · len(gram))`` over all runs.
    """
    grams = F.array_sort(gram_array(toks, n))
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, g):
        newrun = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            g.alias("prev"),
            newrun.alias("run"),
            F.greatest(acc["best"], newrun * F.length(g)).alias("best"),
        )

    best = F.aggregate(grams, zero, step, lambda acc: acc["best"])
    denom = _gram_char_mass(grams)
    return F.when(denom > 0, F.round(best.cast("double") / denom, 4)).otherwise(
        F.lit(0.0)
    )


def dup_gram_char_frac(toks: Column, n: int) -> Column:
    """Char-weighted share of n-gram occurrences whose gram occurs more
    than once in the document (Gopher's "fraction of characters in
    duplicated n-grams").

    Same sorted scan; a run contributes its full mass once its second
    member appears (``2·len`` on the second, ``len`` on each later).
    """
    grams = F.array_sort(gram_array(toks, n))
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("mass"),
    )

    def step(acc, g):
        newrun = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        add = (
            F.when(newrun == 2, 2 * F.length(g))
            .when(newrun > 2, F.length(g))
            .otherwise(F.lit(0))
            .cast("long")
        )
        return F.struct(
            g.alias("prev"), newrun.alias("run"), (acc["mass"] + add).alias("mass")
        )

    mass = F.aggregate(grams, zero, step, lambda acc: acc["mass"])
    denom = _gram_char_mass(grams)
    return F.when(denom > 0, F.round(mass.cast("double") / denom, 4)).otherwise(
        F.lit(0.0)
    )


#: Gopher gates n-grams up to n=10; the synthetic corpus (10-100-token
#: docs over a tiny vocabulary) has zero duplicated grams above n=2, so
#: the standard bundle gates on 2-grams where the signal lives — both
#: metrics split the sf0.01 corpus at these thresholds (top2: max 0.19,
#: ~6% fail at 0.10; dup2: max 0.22, 30% exact-zero, ~15% fail at 0.12).
#: Production pipelines pass their own n/thresholds to the primitives.
TOP2_MAX = 0.10
DUP2_MAX = 0.12


def repetition_flags(toks: Column) -> dict[str, Column]:
    """The standard filter bundle: top-2-gram share, duplicated-2-gram
    share, and the combined pass verdict."""
    top2 = top_gram_char_frac(toks, 2)
    dup2 = dup_gram_char_frac(toks, 2)
    return {
        "top2gram_frac": top2,
        "dup2gram_frac": dup2,
        "repetition_pass": (top2 <= TOP2_MAX) & (dup2 <= DUP2_MAX),
    }
