"""User-facing facade: the miso server's query surface as a library.

Parity: miso-server exposes POST /query (KQL in, SSE stream of JSON
result rows out, incremental as the engine produces them) plus query
cancellation. The Spark-native analog:

- ``MisoSpark.query(kql)`` → DataFrame (lazy; compose further).
- ``MisoSpark.query_rows(kql)`` → iterator of dict rows, streamed
  partition-by-partition via ``toLocalIterator`` — results reach the
  caller as Spark finishes partitions, the SSE analog. Wrap rows in
  ``data: {json}\\n\\n`` framing and you have the reference's wire
  format.
- ``MisoSpark.query_json(kql)`` → iterator of JSON strings (rows
  serialized executor-side by Spark's JSON writer, not in Python).
- cancellation: every query runs in a Spark job group; ``cancel()``
  aborts in-flight jobs (miso's /cancel parity).
"""

from __future__ import annotations

import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from miso_spark.compiler import Compiler
from miso_spark.kql import parse_kql
from miso_spark.sources import MemorySource, SourceRegistry


try:
    from pyspark.sql.types import VariantVal as _VariantVal
except ImportError:  # pragma: no cover - older Spark
    _VariantVal = None


def _pyify(v):
    """Decode VariantVal cells (dynamic ingest) into native Python
    values, recursively through dicts/lists; everything else passes
    through untouched. (Import hoisted — this runs per cell in the
    CLI/SSE streaming hot path.)"""
    if _VariantVal is not None and isinstance(v, _VariantVal):
        return v.toPython()
    if isinstance(v, dict):
        return {k: _pyify(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_pyify(x) for x in v]
    return v


class MisoSpark:
    def __init__(self, spark: SparkSession, registry: SourceRegistry | None = None):
        self.spark = spark
        self.registry = registry or SourceRegistry(spark)
        # a writable in-session connector is always available ("mem"),
        # like the reference's memory connector
        if "mem" not in self.registry._sources:
            self.registry.register("mem", MemorySource())
        self.compiler = Compiler(self.registry)
        self._group = f"miso-{uuid.uuid4().hex[:8]}"

    def query(self, kql: str) -> DataFrame:
        return self.compiler.run(parse_kql(kql))

    def query_rows(self, kql: str, prefetch: bool = True) -> Iterator[dict]:
        """Stream result rows incrementally (SSE analog). Dynamic
        (VARIANT) values decode to native Python objects — without
        this a dynamic string cell would surface as its raw JSON text
        ('"5"' instead of '5')."""
        self.spark.sparkContext.setJobGroup(self._group, kql[:100], interruptOnCancel=True)
        df = self.query(kql)
        for row in df.toLocalIterator(prefetchPartitions=prefetch):
            yield _pyify(row.asDict(recursive=True))

    def query_json(self, kql: str) -> Iterator[str]:
        """Stream rows as JSON strings (serialized on executors)."""
        self.spark.sparkContext.setJobGroup(self._group, kql[:100], interruptOnCancel=True)
        df = self.query(kql)
        yield from df.toJSON().toLocalIterator(prefetchPartitions=True)

    def explain(self, kql: str, mode: str = "formatted") -> str:
        """The physical plan Spark will execute for a KQL query."""
        df = self.query(kql)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), mode
        )

    def cancel(self) -> None:
        """Abort this handle's in-flight queries (POST /cancel parity)."""
        self.spark.sparkContext.cancelJobGroup(self._group)
