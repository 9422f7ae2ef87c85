"""Query-catalog registry: name → (spark_fn, oracle_sql).

Split out of ``relational.py`` so ``catalog.py`` controls registration
ORDER across operator modules: the driver's correctness gate records at
most ~50 entries per round, so the flagship pipeline and the
corpus-scale (dedup/ANN) families register first and the catalog is
kept at ≤ 50 entries total (merged same-table scalar queries keep every
SURVEY §2 op value-verified — see COVERAGE.md for the op → query map).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

MAX_CATALOG = 50


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scan_rows(df: DataFrame) -> int | None:
    """Total rows of the parquet files behind a (possibly filtered)
    single-relation DataFrame, from the file footers on the driver —
    no Spark job. None when the input is not locally readable parquet."""
    try:
        import pyarrow.parquet as pq

        files = df.inputFiles()
        if not files:
            return None
        total = 0
        for f in files:
            if f.startswith("file:"):
                f = "/" + f[5:].lstrip("/")
            total += pq.ParquetFile(f).metadata.num_rows
        return total
    except Exception:
        return None


def spread_scan(df: DataFrame, factor: int = 2, min_rows: int = 0) -> DataFrame:
    """Round-robin repartition after a narrow scan IF the source yields
    fewer splits than the cluster has task slots (guide §2.5 input
    skew). The driver testdata ships single-row-group parquet files —
    documents/events/embeddings at sf1.0 are ONE scan task no matter
    the split-size config, which serialized every heavy map stage
    (media synth+decode 726 core-seconds on one core, measured). A
    100 TB input has millions of splits, so this is a no-op there and
    the extra exchange exists only in the regime where the alternative
    is a serial stage. Round-robin repartition is retry-safe (Spark
    sorts before repartitioning, SPARK-23207) and the shuffled bytes
    are exactly the undersized input (MBs).

    ``min_rows``: skip the spread when the scan holds fewer rows (read
    from the parquet footers driver-side, no job). For operators whose
    per-row map work is LIGHT (d4's minhash, e1's cosine) the exchange
    + extra stage cost ~0.3-0.4 s, which only pays above ~10k rows —
    measured: d4 at sf0.1 (5k docs) lost 1.5 s to an unconditional
    spread while sf1.0 (50k) gained; heavy-map operators (codecs, docx
    roundtrip) keep ``min_rows=0`` because even a 5k-row serial stage
    costs multiple seconds. Unknown row counts are treated as large."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_rows > 0:
        n = _scan_rows(df)
        if n is not None and n < min_rows:
            return df
    return df.repartition(target)


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → non-SQL-expressible, driver does rows-only check
    doc: str = ""


CATALOG: dict[str, QueryDef] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        CATALOG[name] = QueryDef(fn=fn, sql=sql, doc=doc)
        assert len(CATALOG) <= MAX_CATALOG, (
            f"catalog exceeds {MAX_CATALOG} entries ({name}); merge queries "
            "instead — the driver gate truncates beyond this"
        )
        return fn

    return deco
