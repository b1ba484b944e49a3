"""Facade tests: KQL-in/rows-out streaming, memory connector round
trips (tee/write + scan), and bag expansion."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from miso_spark.api import MisoSpark
from miso_spark.sources import ParquetDirSource
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def miso(spark):
    m = MisoSpark(spark)
    m.registry.register("t", ParquetDirSource(SF_DIR))
    return m


def test_query_rows_streams_dicts(miso):
    rows = list(miso.query_rows("t.region | sort by r_regionkey"))
    assert [r["r_regionkey"] for r in rows] == [0, 1, 2, 3, 4]
    assert set(rows[0]) == {"r_regionkey", "r_name"}


def test_query_json_is_valid_json(miso):
    out = [json.loads(s) for s in miso.query_json("t.nation | top 3 by n_nationkey asc")]
    assert len(out) == 3
    assert out[0]["n_nationkey"] == 0


def test_write_then_scan_memory_connector(miso):
    list(
        miso.query_rows(
            "t.orders | where o_totalprice > 300000 | project o_orderkey, o_totalprice"
            " | write mem.big_orders"
        )
    )
    back = miso.query("mem.big_orders | count").collect()
    direct = miso.query("t.orders | where o_totalprice > 300000 | count").collect()
    assert back[0]["Count"] == direct[0]["Count"] > 0


def test_tee_keeps_flowing(miso):
    rows = list(
        miso.query_rows(
            "t.nation | tee mem.nations_copy | where n_regionkey == 0 | count"
        )
    )
    assert rows[0]["Count"] > 0
    copied = miso.query("mem.nations_copy | count").collect()
    assert copied[0]["Count"] == 25 or copied[0]["Count"] == 5  # sf-dependent


def test_mv_expand_mixed_array_and_map_zip(miso, spark):
    """expand_mixed_array_and_object + expand_object_zip_unequal_lengths
    (tests.rs): an array and a map expand together, zipped element-wise
    with null padding for the shorter collection."""
    miso.registry.source("mem").put(
        "mx",
        spark.createDataFrame(
            [(1, ["x", "y", "z"], {"a": 1, "b": 2})],
            "id long, arr array<string>, mp map<string,long>",
        ),
    )
    rows = [r.asDict() for r in miso.query("mem.mx | mv-expand kind=bag arr, mp").collect()]
    assert [r["arr"] for r in rows] == ["x", "y", "z"]
    assert [r["mp"] for r in rows] == [{"a": 1}, {"b": 2}, None]


def test_mv_expand_bag_on_map(miso):
    df = miso.query(
        "t.region.raw('SELECT r_regionkey, map(\\'a\\', r_regionkey, \\'b\\', r_regionkey * 10) AS m FROM region')"
        " | mv-expand kind=bag m"
    )
    rows = df.collect()
    # 5 regions × 2 map entries, each a single-entry map (expand.rs bag)
    assert len(rows) == 10
    sample = [r for r in rows if r["r_regionkey"] == 2]
    vals = {next(iter(r["m"].items())) for r in sample}
    assert vals == {("a", 2), ("b", 20)}


def test_mv_expand_zip_semantics(miso, spark):
    """Reference expand.rs: multiple fields zip with null padding;
    empty collections drop the row; missing collections pass through."""
    df = spark.createDataFrame(
        [
            (1, ["x", "y"], [5, 4, 3]),
            (2, [], []),          # all empty → dropped
            (3, None, None),      # all missing → passthrough
            (4, ["only"], None),  # one present → null-padded
        ],
        ["id", "b", "c"],
    )
    miso.registry.source("mem").put("zipin", df)
    rows = {(r["id"], r["b"], r["c"]) for r in miso.query("mem.zipin | mv-expand b, c").collect()}
    assert rows == {
        (1, "x", 5),
        (1, "y", 4),
        (1, None, 3),
        (3, None, None),
        (4, "only", None),
    }


def test_mv_expand_array_kind_on_map_flattens(miso):
    df = miso.query(
        "t.region.raw('SELECT r_regionkey AS k, map(\\'env\\', \\'prod\\') AS meta FROM region WHERE r_regionkey = 0')"
        " | mv-expand kind=array meta"
    )
    assert [r["meta"] for r in df.collect()] == ["env", "prod"]


def test_let_scoping_inside_subquery(miso):
    df = miso.query(
        "let small = t.nation | where n_regionkey == 1;"
        " t.region | join (let x = small | count; x) on $left.r_regionkey == $right.Count"
    )
    assert df.count() >= 0  # scoping resolves; no unbound-var error


def test_explain_returns_plan(miso):
    plan = miso.explain("t.orders | where o_totalprice > 100000 | top 3 by o_totalprice desc")
    assert "TakeOrderedAndProject" in plan and "PushedFilters" in plan


def test_dcount_approx_close_to_exact(miso, spark):
    # the catalog entry self-checks: approx_ok is the HLL-estimate-
    # within-10%-of-exact assertion, and custs must equal exact dcount
    from miso_spark.catalog import CATALOG
    from tests.conftest import SF_DIR

    rows = CATALOG["dcount_approx"](spark, SF_DIR).collect()
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in miso.query(
            "t.orders | summarize n = dcount(o_custkey) by o_orderpriority"
        ).collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        assert r["custs"] == exact[r["o_orderpriority"]]
        assert r["approx_ok"], (r["o_orderpriority"], r["custs"])


def test_join_column_suffix_increments(miso, spark):
    """join.rs:57 — colliding right columns get KQL-style suffixes:
    x → x2 (x1 taken by the left side), x1 → x11."""
    left = spark.createDataFrame([(1, "a", "b")], ["id", "x", "x1"])
    right = spark.createDataFrame([(1, "A", "B")], ["id", "x", "x1"])
    miso.registry.source("mem").put("jl", left)
    miso.registry.source("mem").put("jr", right)
    rows = miso.query("mem.jl | join (mem.jr) on id").collect()
    assert len(rows) == 1
    assert rows[0].asDict() == {"id": 1, "x": "a", "x1": "b", "x2": "A", "x11": "B"}


def test_join_empty_and_no_match(miso, spark):
    left = spark.createDataFrame([(1, "a")], ["id", "v"])
    miso.registry.source("mem").put("el", left)
    miso.registry.source("mem").put("er", spark.createDataFrame([], "id long, w string"))
    assert miso.query("mem.el | join (mem.er) on id").count() == 0
    miso.registry.source("mem").put("nr", spark.createDataFrame([(99, "b")], ["id", "w"]))
    assert miso.query("mem.el | join (mem.nr) on id").count() == 0


def test_csv_source_roundtrip(miso, spark, tmp_path_factory):
    from miso_spark.sources import CsvDirSource

    d = tmp_path_factory.mktemp("csvsrc")
    with open(d / "people.csv", "w") as f:
        f.write("pid,name,age\n1,ann,30\n2,bo,45\n3,cy,22\n")
    miso.registry.register("csv", CsvDirSource(str(d)))
    rows = list(miso.query_rows("csv.people | where age > 25 | sort by pid | project name"))
    assert [r["name"] for r in rows] == ["ann", "bo"]
