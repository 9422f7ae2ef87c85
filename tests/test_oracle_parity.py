"""Every catalog query vs its DuckDB oracle at sf0.001 — local mirror of
the driver's CORRECTNESS gate. Rows-only entries just get executed."""

import pytest

from mistral_ocr_app_spark.operators import catalog
from mistral_ocr_app_spark.testing import compare_frames, duckdb_connection, run_oracle

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = catalog.queries()
_ORACLES = catalog.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, con, name):
    got = _QUERIES[name](spark, SF_DIR).toPandas()
    oracle = run_oracle(con, _ORACLES[name])
    compare_frames(got, oracle, name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
