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
