"""Capability negotiation (miso-connectors/src/lib.rs apply_* surface):
each Source declares what it can absorb; the compiler enforces the
raw-scan and write subsets; external connectors register but fail at
connect time."""

from __future__ import annotations

import pytest

from miso_spark.api import MisoSpark
from miso_spark.sources import (
    CAP_FILTER,
    CAP_RAW,
    CAP_SUMMARIZE,
    CAP_WRITE,
    CsvDirSource,
    JsonDirSource,
    MemorySource,
    ParquetDirSource,
)
from miso_spark.sources.external import (
    ConnectorUnavailableError,
    ElasticsearchSource,
    QuickwitSource,
    SplunkSource,
)


def test_declared_capability_sets():
    assert CAP_RAW in ParquetDirSource("x").capabilities
    assert CAP_WRITE in ParquetDirSource("x").capabilities
    assert CAP_WRITE not in CsvDirSource("x").capabilities  # read-only
    assert CAP_WRITE in JsonDirSource("x").capabilities
    assert CAP_WRITE in MemorySource().capabilities
    # external sets mirror the reference's implemented apply_* methods
    qw = QuickwitSource("http://localhost:1")
    es = ElasticsearchSource("http://localhost:1")
    sp = SplunkSource("http://localhost:1")
    assert CAP_RAW in qw.capabilities  # quickwit.rs:1552 raw_query
    assert CAP_RAW not in es.capabilities
    assert CAP_RAW not in sp.capabilities
    for s in (qw, es, sp):
        assert CAP_FILTER in s.capabilities and CAP_SUMMARIZE in s.capabilities


def test_write_negotiation_rejects_readonly(spark, tmp_path):
    from tests.conftest import SF_DIR

    m = MisoSpark(spark)
    m.registry.register_parquet_dir("t", SF_DIR)
    m.registry.register("ro", CsvDirSource(str(tmp_path)))
    m.registry.register("pq", ParquetDirSource(str(tmp_path)))
    with pytest.raises(ValueError, match="does not support write/tee"):
        m.query("t.nation | write ro.out").collect()
    # a write-capable connector passes negotiation and lands the file
    m.query("t.nation | write pq.out_nation").collect()
    assert spark.read.parquet(str(tmp_path / "out_nation.parquet")).count() > 0


def test_raw_negotiation(spark):
    class NoRawSource(MemorySource):
        capabilities = MemorySource.capabilities - {CAP_RAW}

    m = MisoSpark(spark)
    src = NoRawSource()
    src.put("x", spark.range(3))
    m.registry.register("noraw", src)
    with pytest.raises(ValueError, match="does not support raw query"):
        m.query("noraw.x.raw('SELECT 1 AS one')").collect()


def test_external_sources_fail_at_connect_not_register(spark):
    m = MisoSpark(spark)
    # registration (config parity) succeeds for all three types
    m.registry.register("qw", QuickwitSource("http://127.0.0.1:9"))
    m.registry.register("es", ElasticsearchSource("http://127.0.0.1:9"))
    m.registry.register("sp", SplunkSource("http://127.0.0.1:9"))
    for name in ("qw", "es", "sp"):
        with pytest.raises(ConnectorUnavailableError, match="not reachable"):
            m.query(f"{name}.logs | count").collect()


def test_timestamp_columns_always_surface_as_timestamp(spark):
    """Environment-drift guard (round 4 broke on this): whatever
    physical form the testdata's timestamp columns take — timestamp[ns]
    (read as nano longs under nanosAsLong), naive timestamp[us] (NTZ
    under Spark 4's inferTimestampNTZ default), or tz-aware — the
    source layer must surface session-TZ TimestampType, or every
    cast-to-long / unix_micros / withWatermark downstream breaks."""
    import os

    from pyspark.sql.types import TimestampType

    from miso_spark.sources import ParquetDirSource

    for sf in ("sf0.001", "sf0.01"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        src = ParquetDirSource(d)
        for table, col in (("events", "ts"), ("lineitem", "l_shipdate"),
                           ("orders", "o_orderdate")):
            df = src.table(spark, table)
            dt = df.schema[col].dataType
            assert isinstance(dt, TimestampType), (sf, table, col, dt)
            # and the scale-critical operations actually resolve
            df.select(df[col].cast("long")).limit(1).collect()


def test_stats_fetch_interval_config(spark):
    """config.rs ConnectorConfig.stats_fetch_interval parity: the
    humantime string sets the per-connector StatsCache TTL (default
    3 h), and parse_duration speaks the crate's compound syntax."""
    import pytest as _pytest

    from miso_spark.server import MisoServer
    from miso_spark.sources.stats import DEFAULT_STATS_TTL_S, parse_duration

    assert parse_duration("3h") == 3 * 3600
    assert parse_duration("1h 30m") == 5400
    assert parse_duration("500ms") == 0.5
    assert parse_duration("2days") == 2 * 86400
    assert parse_duration(42) == 42.0
    with _pytest.raises(ValueError):
        parse_duration("soon")
    with _pytest.raises(ValueError):
        parse_duration("3 parsecs")

    srv = MisoServer(spark, port=0)
    srv.add_connector("q1", {
        "type": "quickwit", "url": "http://127.0.0.1:9",
        "stats_fetch_interval": "30m",
    })
    srv.add_connector("q2", {"type": "quickwit", "url": "http://127.0.0.1:9"})
    assert srv.miso.registry.source("q1").stats_fetch_interval_s == 1800
    assert not hasattr(srv.miso.registry.source("q2"), "stats_fetch_interval_s")

    # the interval reaches the lazy StatsCache when built
    src = srv.miso.registry.source("q1")
    src.stats_fields = {"logs": ["level"]}  # enables fetch_stats
    src.field_stats("logs", "level")  # fetch fails (no service) — fine
    assert src._stats_cache._ttl_s == 1800
    src2 = srv.miso.registry.source("q2")
    src2.stats_fields = {"logs": ["level"]}
    src2.field_stats("logs", "level")
    assert src2._stats_cache._ttl_s == DEFAULT_STATS_TTL_S
    srv.httpd.server_close()
