"""Deterministic sampling & global shuffle — the export-side corpus ops.

A training-data pipeline ends by (a) drawing reproducible samples
(ablations, held-out splits, per-language mixture weights) and (b)
writing the kept corpus in a globally shuffled order so sequential
training batches are i.i.d. Both must be *deterministic functions of
the row key* — NOT `df.sample()`/`rand()`, whose output depends on
partitioning, task retries, and Spark's per-partition RNG seeding, and
can silently change between a run and its recovery re-run. (The
reference app has no training stage; this belongs to the
pipeline-beyond-reference family like d/c/e.)

The primitive is the portable keyed hash (``corpus.md5_int`` — first 60
bits of md5, mod 2^31-1): every decision is ``hash(seed:key) <
fraction·P``, reproducible bit-for-bit in the DuckDB oracle (c5 carries
the value-verified columns), in Python differentials, and across
cluster sizes — membership never depends on how the data is
partitioned.

Scale notes:
  * sampling/bucketing are pure column predicates — no shuffle, no RNG
    state, filters push down to the scan;
  * ``global_shuffle`` is a distributed range-partitioned sort on the
    hash (the TeraSort shape): Spark samples hash boundaries, every
    executor sorts its range locally — no driver-side collection, and
    hash keys are uniform by construction so ranges balance even when
    the underlying keys are skewed;
  * stratified fractions are a literal CASE chain (strata sets are
    small by nature: languages, sources, quality tiers) — no join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import P_HASH, md5_int


def keyed_hash(key: Column, seed: str) -> Column:
    """Uniform int64 in [0, P) as a pure function of (seed, key)."""
    return md5_int(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def sample_flag(key: Column, fraction: float, seed: str = "0") -> Column:
    """True for a deterministic ``fraction`` of keys (exact integer
    threshold — no float comparison in the plan)."""
    return keyed_hash(key, seed) < int(fraction * P_HASH)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: str = "0"
) -> DataFrame:
    return df.filter(sample_flag(F.col(key_col), fraction, seed))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Per-stratum deterministic fractions (e.g. per-language mixture
    weights). Strata absent from ``fractions`` are dropped."""
    h = keyed_hash(F.col(key_col), seed)
    thresh = F.lit(-1)
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum, int(frac * P_HASH)).otherwise(
            thresh
        )
    return df.filter(h < thresh)


def shuffle_bucket(key: Column, n_buckets: int, seed: str = "s") -> Column:
    """Stable bucket id in [0, n_buckets) — for bucketed shuffled
    writes (each bucket is one shard of the global shuffle)."""
    return (keyed_hash(key, seed) % n_buckets).cast("int")


def global_shuffle(
    df: DataFrame, key_col: str = "doc_id", seed: str = "s",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle: total order by (hash, key) — the
    key tie-break makes the order a pure function of the data even if
    two hash values collide. Both shapes are Spark's range-partitioned
    distributed sort; pass ``partitions`` to pin the output shard count
    (shard i then holds the i-th contiguous slice of the shuffled
    order, which is what a sharded training-data reader expects)."""
    h = keyed_hash(F.col(key_col), seed)
    if partitions:
        return df.repartitionByRange(partitions, h, F.col(key_col)).sortWithinPartitions(
            h, F.col(key_col)
        )
    return df.orderBy(h, F.col(key_col))
