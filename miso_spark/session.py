"""SparkSession factory tuned for the target workload.

Defaults are chosen for scale: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for any pandas exchange, and a
shuffle-partition count sized for the local harness but overridable for
cluster runs via normal Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: session-level confs the engine depends on; applied at build time in
#: get_spark and re-applied at runtime by tune_session for externally
#: provided sessions (e.g. the driver's)
RUNTIME_CONFS = {
    # parquet timestamp[ns] (events.ts) reads as nano longs, converted
    # in the source layer — without this the read hard-fails
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # naive timestamp[us] parquet (the current testdata layout) would
    # otherwise infer as TIMESTAMP_NTZ under Spark 4's default, which
    # rejects cast-to-long / unix_micros / withWatermark; engine
    # semantics are session-TZ TIMESTAMP (= UTC here, matching the
    # DuckDB oracle), so read it as such — the source layer additionally
    # casts any NTZ column that slips through an untuned session
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # naive datetime literals and epoch conversions assume UTC, matching
    # the DuckDB oracle's naive timestamps
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's required session confs to an existing session
    (all of RUNTIME_CONFS is session-settable, no restart needed)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a locked-down conf is non-fatal; reads may still work
    try:
        # stock default (200) on a local harness wastes scheduler time,
        # and stateful streaming partitions don't AQE-coalesce; respect
        # any non-default value the caller chose
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
            )
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "miso_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune_session(builder.getOrCreate())
