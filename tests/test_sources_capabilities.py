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
