"""Semi-structured JSON logs end-to-end — the reference's core domain:
schema-less ingestion, nested field paths, missing-field semantics,
array access, mv-expand over dynamic arrays."""

from __future__ import annotations

import json

import pytest

from miso_spark.api import MisoSpark
from miso_spark.sources import JsonDirSource

LOGS = [
    {"ts": "2024-01-01T00:00:00", "level": "error", "svc": {"name": "api", "region": "us"},
     "tags": ["prod", "canary"], "latency_ms": 120},
    {"ts": "2024-01-01T00:01:00", "level": "info", "svc": {"name": "api", "region": "eu"},
     "tags": ["prod"], "latency_ms": 15},
    {"ts": "2024-01-01T00:02:00", "level": "error", "svc": {"name": "worker"},
     "tags": [], "latency_ms": 250},
    # heterogeneous row: missing svc and latency entirely (dynamic schema)
    {"ts": "2024-01-01T00:03:00", "level": "warn", "tags": ["dev"]},
]


@pytest.fixture(scope="module")
def logs_miso(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonlogs")
    with open(d / "applogs.jsonl", "w") as f:
        for row in LOGS:
            f.write(json.dumps(row) + "\n")
    m = MisoSpark(spark)
    m.registry.register("logs", JsonDirSource(str(d)))
    return m


def test_nested_field_filter_and_project(logs_miso):
    rows = list(
        logs_miso.query_rows(
            "logs.applogs | where svc.name == 'api' | project svc.region, latency_ms"
        )
    )
    # a dotted project target re-creates the nested shape, like the
    # reference's insert_field_value (interpreter/tests.rs) — not a
    # flat "svc.region" column
    assert sorted(r["svc"]["region"] for r in rows) == ["eu", "us"]


def test_missing_field_exists_semantics(logs_miso):
    # svc missing on the warn row → exists() false; comparisons → null → dropped
    rows = list(logs_miso.query_rows("logs.applogs | where not(exists(svc.name)) | project level"))
    assert [r["level"] for r in rows] == ["warn"]
    rows = list(logs_miso.query_rows("logs.applogs | where latency_ms > 0 | count"))
    assert rows[0]["Count"] == 3  # the row without latency_ms never matches


def test_array_index_access(logs_miso):
    rows = list(
        logs_miso.query_rows(
            "logs.applogs | where exists(tags[0]) | project level, first_tag = tags[0]"
        )
    )
    assert {(r["level"], r["first_tag"]) for r in rows} == {
        ("error", "prod"),
        ("info", "prod"),
        ("warn", "dev"),
    }


def test_mv_expand_dynamic_array(logs_miso):
    rows = list(
        logs_miso.query_rows(
            "logs.applogs | mv-expand kind=array tags | summarize n = count() by tags"
        )
    )
    counts = {r["tags"]: r["n"] for r in rows}
    # reference semantics: the empty-tags row is dropped by mv-expand
    assert counts == {"prod": 2, "canary": 1, "dev": 1}


def test_mv_expand_nested_path(spark):
    # expand.rs insert_field_value: `mv-expand a.b` expands in place at
    # the nested path
    m = MisoSpark(spark)
    m.registry.source("mem").put(
        "nested",
        spark.createDataFrame(
            [(1, (["a", "b"],)), (2, ([],)), (3, (None,))],
            "id long, svc struct<eps: array<string>>",
        ),
    )
    rows = [
        r.asDict()
        for r in m.query("mem.nested | mv-expand svc.eps | project id, e = svc.eps").collect()
    ]
    got = sorted(((r["id"], r["e"]) for r in rows), key=lambda t: (t[0], t[1] or ""))
    # empty array drops the row; null array passes through as null
    assert got == [(1, "a"), (1, "b"), (3, None)]


def test_summarize_over_nested_by(logs_miso):
    rows = list(
        logs_miso.query_rows(
            "logs.applogs | summarize n = count(), max_lat = max(latency_ms) by svc.name"
        )
    )
    by = {r["svc.name"]: (r["n"], r["max_lat"]) for r in rows}
    assert by["api"] == (2, 120)
    assert by["worker"] == (1, 250)
    # rows whose group key is missing/null are dropped pre-grouping
    # (summarize.rs:151; tests.rs summarize_group_by_missing_field)
    assert None not in by


def test_field_path_multi_index_roundtrip():
    """field_tests.rs: multi-index access (foo[0][42]) and mixed
    object/array paths parse and print back exactly."""
    from miso_spark.fields import FieldPath

    for s in ["foo", "foo[0][42]", "foo.bar", "foo[1].bar[2][3].baz"]:
        p = FieldPath.parse(s)
        assert str(p) == s
    assert not FieldPath.parse("foo.bar").has_array_access()
    assert FieldPath.parse("foo[1].bar").has_array_access()
