"""Local mirror of the driver's t2 correctness gate: run every catalog
query on Spark AND its DuckDB oracle at sf0.001, compare row sets.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from miso_spark.catalog import CATALOG, TABLES
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb float repr noise at the edge of rounding
        return round(v, 6)
    return v


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda row: tuple((v is None, str(v)) for v in row))


ORACLE_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_catalog_query_matches_oracle(name, spark, ddb):
    qdef = CATALOG[name]
    sdf = qdef(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(qdef.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _rows(srows, scols) == _rows(drows, dcols), f"{name}: value mismatch"


def test_driver_contract_alignment():
    """The driver window invariants: exactly 50 catalog entries, every
    one carrying a DuckDB oracle, and __spark_entry__ exposing them
    1:1 (queries()/oracle_sql() key sets equal)."""
    import importlib.util
    import os

    assert len(CATALOG) == 50
    assert all(q.oracle is not None for q in CATALOG.values())
    spec = importlib.util.spec_from_file_location(
        "spark_entry_check",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.queries()) == set(CATALOG)
    assert set(mod.oracle_sql()) == set(CATALOG)
