"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by ``miso_spark.catalog``
(one entry per operator from SURVEY.md §2) and the driver compares each
Spark result against the DuckDB oracle at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make miso_spark importable regardless of the caller's cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape via the KQL path) on sf0.001."""
    from miso_spark.catalog import CATALOG

    return CATALOG["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from miso_spark.catalog import CATALOG

    return dict(CATALOG)


def oracle_sql() -> dict[str, str]:
    from miso_spark.catalog import CATALOG

    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
