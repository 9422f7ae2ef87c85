"""Unified query catalog: importing this module registers every operator
family into ``relational.CATALOG``."""

from __future__ import annotations

from . import corpus, pipeline_queries  # noqa: F401  (registration side effects)
from .relational import CATALOG, QueryDef


def queries():
    return {name: qd.fn for name, qd in CATALOG.items()}


def oracle_sql():
    return {name: qd.sql for name, qd in CATALOG.items() if qd.sql is not None}


def describe() -> dict[str, str]:
    return {name: qd.doc for name, qd in CATALOG.items()}
