"""miso_spark — a PySpark-native analytics engine with the query surface
of tontinton/miso (KQL pipelines over semi-structured logs), rebuilt
Spark-first: KQL / fluent pipeline -> logical plan -> DataFrame ops ->
Catalyst/Tungsten execution.

Reference parity notes cite /root/reference file:line in docstrings.
"""

from miso_spark.session import get_spark
from miso_spark.plan import (
    Plan,
    Scan,
    Filter,
    Project,
    Extend,
    Rename,
    Expand,
    Limit,
    SortStep,
    Top,
    SummarizeStep,
    Distinct,
    Union,
    JoinStep,
    CountStep,
)
from miso_spark.compiler import Compiler
from miso_spark.sources import SourceRegistry
from miso_spark.kql import parse_kql

__all__ = [
    "get_spark",
    "Plan",
    "Scan",
    "Filter",
    "Project",
    "Extend",
    "Rename",
    "Expand",
    "Limit",
    "SortStep",
    "Top",
    "SummarizeStep",
    "Distinct",
    "Union",
    "JoinStep",
    "CountStep",
    "Compiler",
    "SourceRegistry",
    "parse_kql",
]
