"""Bucketed tables: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of fact-fact joins is the exchange. Writing
both tables bucketed by the join key (same bucket count) lets Spark
plan a SortMergeJoin with NO Exchange on either side — the pre-
shuffled layout is reused across every downstream query, which is the
batch analog of the reference's partitioned-join hint
(miso-workflow-types/src/join.rs `partitions`).

Bucketing requires the session catalog (saveAsTable); the table data
lives under spark.sql.warehouse.dir.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    if mode == "overwrite":
        # an orphaned warehouse dir (table dropped from the in-memory
        # catalog, data left on disk) blocks saveAsTable — clear both
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
