"""Local mirror of the driver's DuckDB-oracle comparison (row count +
schema + order-insensitive value comparison with columns sorted by name).
Used by tests/test_oracle_parity.py so oracle drift is caught before the
driver runs CORRECTNESS_r{N}."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            pdf[c] = s.dt.tz_localize(None)
        elif s.dtype == object:
            # Decimal → float, bytes → str for cross-engine comparability
            pdf[c] = s.map(
                lambda v: float(v)
                if type(v).__name__ == "Decimal"
                else (v.decode() if isinstance(v, (bytes, bytearray)) else v)
            )
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def compare_frames(got: pd.DataFrame, oracle: pd.DataFrame, name: str = "") -> None:
    got_n, ora_n = _normalize(got), _normalize(oracle)
    assert list(got_n.columns) == list(ora_n.columns), (
        f"{name}: column mismatch {list(got_n.columns)} vs {list(ora_n.columns)}"
    )
    assert len(got_n) == len(ora_n), f"{name}: row count {len(got_n)} vs {len(ora_n)}"
    for c in got_n.columns:
        g, o = got_n[c], ora_n[c]
        if np.issubdtype(np.asarray(g).dtype, np.floating) or np.issubdtype(
            np.asarray(o).dtype, np.floating
        ):
            ga = pd.to_numeric(g, errors="coerce").to_numpy(dtype="float64")
            oa = pd.to_numeric(o, errors="coerce").to_numpy(dtype="float64")
            ok = np.isclose(ga, oa, rtol=1e-9, atol=1e-9, equal_nan=True)
            assert ok.all(), f"{name}.{c}: float mismatch at rows {np.where(~ok)[0][:5]}"
        else:
            eq = (g.astype(str).fillna("∅") == o.astype(str).fillna("∅"))
            assert eq.all(), (
                f"{name}.{c}: mismatch at rows {list(np.where(~eq)[0][:5])}; "
                f"got={g[~eq].head(3).tolist()} oracle={o[~eq].head(3).tolist()}"
            )


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetchdf()
