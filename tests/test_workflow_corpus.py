"""Port of the reference's workflow e2e edge-case corpus
(miso-workflow/src/tests.rs) not already covered by
test_semantics_edges / test_api / test_semistructured: null-equality
rules, null group keys, null join keys, between/in with nulls, topn
ties, summarize by-field naming edge cases, union chains, chained lets,
and short-circuit joins. Each test cites the reference test name.
"""

from __future__ import annotations

import pytest

from miso_spark.compiler import Compiler
from miso_spark.kql import parse_kql
from miso_spark.sources import MemorySource, SourceRegistry


@pytest.fixture(scope="module")
def mem(spark):
    return MemorySource()


@pytest.fixture(scope="module")
def run(spark, mem):
    comp = Compiler(SourceRegistry(spark).register("test", mem))

    def _run(q, **tables):
        for name, (schema, rows) in tables.items():
            mem.put(name, spark.createDataFrame(rows, schema))
        return [r.asDict() for r in comp.run(parse_kql(q)).collect()]

    return _run


def test_filter_eq_null_matches_null_rows(run):
    # tests.rs filter_eq_null: `== null` is a null test
    out = run("test.a | where w == null", a=("w int", [(1,), (None,)]))
    assert out == [{"w": None}]


def test_filter_ne_null_literal_is_not_null(run):
    out = run("test.a | where w != null", a=("w int", [(1,), (None,)]))
    assert out == [{"w": 1}]


def test_filter_eq_fields_null_matches_null(run):
    # interpreter/mod.rs impl_cmp + value/mod.rs:151: PRESENT values
    # compare through Value's total order, where Null == Null — so
    # field-vs-field equality is null-safe, consistent with the
    # engine's null-safe join keys. (A MISSING operand makes the
    # reference comparison None → row filtered; Spark's typed rows
    # conflate missing with null, and the engine resolves the
    # conflation as present-null. r7 change — was SQL-style before.)
    out = run(
        "test.b | where w == w2",
        b=("w int, w2 int", [(1, 1), (None, None), (2, 3)]),
    )
    assert sorted(out, key=str) == [{"w": 1, "w2": 1}, {"w": None, "w2": None}]


def test_filter_ne_field_keeps_null_side(run):
    # Null != Int(5) is Ordering::Less != Equal → true: a null w
    # SURVIVES `w != w2` when w2 is non-null (total order, not SQL)
    out = run(
        "test.b2 | where w != w2",
        b2=("w int, w2 int", [(1, 1), (None, 5), (2, 3)]),
    )
    assert sorted(out, key=str) == [{"w": 2, "w2": 3}, {"w": None, "w2": 5}]


def test_in_operator_with_null_in_list(run):
    # tests.rs in_operator_with_null_in_list: null item matches nulls
    out = run(
        "test.c | where x in (1, null, 3) | sort by x asc nulls first",
        c=("x int", [(1,), (2,), (None,), (3,)]),
    )
    assert [r["x"] for r in out] == [None, 1, 3]


def test_between_null_endpoints(run):
    # tests.rs between_null_endpoints pins (null .. 10) → x <= 10: the
    # parser desugars between to Gte AND Lte (parser.rs:755), and
    # everything is >= Null under the total order, so a null LOW bound
    # is unbounded. A null HIGH bound is NOT: only Null <= Null, so
    # (10 .. null) matches nothing non-null — r10 fixed an earlier
    # "unbounded high" extrapolation the reference never had
    out = run("test.d | where x between (null .. 10)", d=("x int", [(5,), (15,)]))
    assert out == [{"x": 5}]
    out = run("test.d | where x between (10 .. null)", d=("x int", [(5,), (15,)]))
    assert out == []
    # and the proper-boolean form means !between KEEPS a null base
    # (null < any bound — the reference's desugared Lt-OR-Gt form)
    out = run(
        "test.e | where x !between (1 .. 10)",
        e=("x int", [(5,), (15,), (None,)]),
    )
    assert sorted(out, key=str) == [{"x": 15}, {"x": None}]


def test_null_ordering_comparisons_total_order(run):
    # tests.rs null_in_gte_operator / null_in_lte_operator: ordering
    # comparisons use Value's TOTAL order with null smallest
    # (value/mod.rs:151-153) — `x >= 5` drops null, `x <= 5` KEEPS it
    out = run("test.e | where x >= 5", e=("x int", [(10,), (5,), (None,), (3,)]))
    assert sorted(r["x"] for r in out) == [5, 10]
    out = run("test.e | where x <= 5", e=("x int", [(10,), (5,), (None,), (3,)]))
    assert sorted((r["x"] is not None, r["x"]) for r in out) == [
        (False, None), (True, 3), (True, 5)]
    out = run("test.e | where x < 5", e=("x int", [(10,), (5,), (None,), (3,)]))
    assert sorted((r["x"] is not None, r["x"]) for r in out) == [
        (False, None), (True, 3)]
    # field-vs-field: the when-chain path, same order
    out = run(
        "test.e2 | where a < b",
        e2=("a int, b int", [(1, 2), (None, 2), (2, None), (None, None), (3, 1)]),
    )
    assert sorted(str(r) for r in out) == sorted(
        [str({"a": 1, "b": 2}), str({"a": None, "b": 2})])


def test_summarize_group_by_null_key_dropped(run):
    # tests.rs summarize_group_by_with_null_key / _missing_field
    out = run(
        "test.f | summarize cnt = count() by y",
        f=("x int, y string", [(1, "a"), (2, None), (3, "a"), (4, None)]),
    )
    assert out == [{"y": "a", "cnt": 2}]


def test_summarize_group_by_all_nulls_empty(run):
    # tests.rs summarize_group_by_all_nulls
    out = run(
        "test.g | summarize cnt = count() by y",
        g=("x int, y string", [(1, None), (2, None)]),
    )
    assert out == []


def test_summarize_by_only_drops_null_keys(run):
    # agg-less summarize shares extract_group_keys' null-drop
    out = run("test.h | summarize by y", h=("y string", [("a",), (None,), ("a",)]))
    assert out == [{"y": "a"}]


def test_summarize_min_max_all_nulls_stay_null(run):
    # tests.rs summarize_min_max_all_nulls (keys non-null, values null)
    out = run(
        "test.i | summarize min_x = min(x), max_x = max(x) by y",
        i=("x int, y string", [(None, "a"), (None, "a"), (None, "b")]),
    )
    assert sorted(out, key=lambda r: r["y"]) == [
        {"y": "a", "min_x": None, "max_x": None},
        {"y": "b", "min_x": None, "max_x": None},
    ]


def test_summarize_by_duplicate_field_suffixes(run):
    # tests.rs summarize_by_duplicate_field: by x, x → columns x, x1
    out = run("test.j | summarize by x, x", j=("x int", [(1,), (2,)]))
    assert sorted(out, key=lambda r: r["x"]) == [
        {"x": 1, "x1": 1},
        {"x": 2, "x1": 2},
    ]


def test_summarize_by_cast_names_underlying_field(run):
    # tests.rs summarize_by_cast: by tostring(x) → column named x
    out = run(
        "test.k | summarize count() by tostring(x)",
        k=("x int", [(1,), (2,), (1,)]),
    )
    assert sorted(out, key=lambda r: r["x"]) == [
        {"x": "1", "count_": 2},
        {"x": "2", "count_": 1},
    ]


def test_join_with_null_keys_match(run, spark, mem):
    # tests.rs join_with_null_keys: Value::Null hashes like any value
    mem.put("right7", spark.createDataFrame([(1, "A"), (None, "B")], "id int, value string"))
    out = run(
        "test.left7 | join (test.right7) on id",
        left7=("id int, value string", [(1, "a"), (None, "b")]),
    )
    got = {(r["id"], r["value"], r["value1"]) for r in out}
    assert got == {(1, "a", "A"), (None, "b", "B")}


def test_join_null_keys_with_partitions_hint(run, spark, mem):
    mem.put("right8", spark.createDataFrame([(None, "B")], "id int, value string"))
    out = run(
        "test.left8 | join hint.partitions=4 (test.right8) on id",
        left8=("id int, value string", [(None, "b")]),
    )
    assert [(r["id"], r["value"], r["value1"]) for r in out] == [(None, "b", "B")]


@pytest.mark.parametrize("kind,expect_left", [("inner", False), ("right", False),
                                              ("left", True), ("outer", True)])
def test_short_circuit_join_empty_right(run, spark, mem, kind, expect_left):
    # tests.rs short_circuit_join_returns_empty / _returns_left_side
    mem.put("right9", spark.createDataFrame([(1, "A")], "id int, value string"))
    out = run(
        f"test.left9 | join kind={kind} (test.right9 | where false) on id",
        left9=("id int, value string", [(1, "a"), (2, "b")]),
    )
    if expect_left:
        assert {(r["id"], r["value"]) for r in out} == {(1, "a"), (2, "b")}
        assert all(r["value1"] is None for r in out)
    else:
        assert out == []


def test_topn_with_ties_at_boundary(run):
    # tests.rs topn_with_ties_at_boundary: exactly N rows, ties cut
    out = run(
        "test.m | top 2 by value desc",
        m=("id int, value int", [(1, 10), (2, 10), (3, 5)]),
    )
    assert len(out) == 2 and all(r["value"] == 10 for r in out)


def test_union_chain_count(run, spark, mem):
    # tests.rs union_count: 3 + 10×4 = 43
    mem.put("y10", spark.createDataFrame([(3,), (4,), (5,), (6,)], "x int"))
    q = "test.x10 " + "| union (test.y10) " * 10 + "| count"
    out = run(q, x10=("x int", [(0,), (1,), (2,)]))
    assert out == [{"Count": 43}]


def test_let_chained_variables(run):
    # tests.rs let_chained_variables
    out = run(
        """
        let filtered = test.n | where age > 20;
        let sorted = filtered | sort by age;
        sorted
        """,
        n=("name string, age int", [("alice", 25), ("bob", 35), ("charlie", 15)]),
    )
    assert [r["name"] for r in out] == ["alice", "bob"]


def test_let_variable_in_union(run, spark, mem):
    # tests.rs let_variable_in_union
    out = run(
        """
        let extra = test.p2 | where x > 10;
        test.p1 | union (extra) | count
        """,
        p1=("x int", [(1,), (2,)]),
        p2=("x int", [(5,), (20,), (30,)]),
    )
    assert out == [{"Count": 4}]


def test_negative_number_operations(run):
    # tests.rs negative_number_operations
    out = run("test.q1 | where result == -5 * 2", q1=("result double", [(-10.0,), (10.0,)]))
    assert out == [{"result": -10.0}]


def test_filter_gt_now_constant_true(run):
    # tests.rs filter_gt_now: now() comparison as a constant predicate
    out = run(
        "test.r | where now() > datetime(1980-01-01)",
        r=("x int", [(1,), (2,), (3,)]),
    )
    assert len(out) == 3


def test_case_nested(run):
    # tests.rs case_nested
    out = run(
        'test.s | project r = case(x == 1, case(x == 1, "inner", "no"), "outer")',
        s=("x int", [(1,), (2,)]),
    )
    assert [r["r"] for r in out] == ["inner", "outer"]


def test_expand_array_with_nulls(run):
    # tests.rs expand_array_with_nulls / expand_null_value: null
    # elements survive, null arrays pass through as one null row
    out = run(
        "test.t | mv-expand kind=array items",
        t=("id int, items array<int>", [(1, [1, None, 3]), (2, None)]),
    )
    got = sorted(((r["id"], r["items"]) for r in out), key=lambda p: (p[0], p[1] is None, p[1]))
    assert got == [(1, 1), (1, 3), (1, None), (2, None)]


def test_mixed_int_arithmetic_in_filter(run):
    # tests.rs mixed_int_uint_arithmetic
    out = run("test.u | where result == toint(5) + toint(-3)", u=("result int", [(2,), (3,)]))
    assert out == [{"result": 2}]


def test_extend_nested_target_creates_path(run):
    # interpreter/tests.rs insert_field_value_creates_path: a dotted
    # assignment target builds the nested object
    out = run(
        "test.w1 | extend outer.inner = 99 | project v = outer.inner",
        w1=("id int", [(1,)]),
    )
    assert out == [{"v": 99}]


def test_extend_nested_target_into_existing_struct(run, spark, mem):
    # insert into an existing object keeps sibling keys and overwrites
    # the targeted one (insert_field_value_overwrites_existing)
    mem.put(
        "w2",
        spark.createDataFrame(
            [(1, {"a": 10, "b": 20})],
            "id int, o struct<a:int, b:int>",
        ),
    )
    out = run("test.w2 | extend o.b = 99 | project a = o.a, b = o.b", )
    assert out == [{"a": 10, "b": 99}]


def test_project_nested_targets_merge_one_struct(run):
    # two targets under one top-level name build one object
    out = run(
        "test.w3 | project o.x = id + 1, o.y = 'z'"
        " | project x = o.x, y = o.y",
        w3=("id int", [(41,)]),
    )
    assert out == [{"x": 42, "y": "z"}]


def test_deep_nested_extend_roundtrip(run):
    # interpreter/tests.rs roundtrip_insert_and_get (object path)
    out = run(
        "test.w4 | extend alpha.beta.gamma = true | project g = alpha.beta.gamma",
        w4=("id int", [(1,)]),
    )
    assert out == [{"g": True}]


def test_project_array_access_path(run, spark, mem):
    # tests.rs:865 project world=world[0].x[1]
    mem.put(
        "w5",
        spark.createDataFrame([([{"x": [1, 2]}],)], "world array<struct<x:array<int>>>"),
    )
    out = run("test.w5 | project world=world[0].x[1]")
    assert out == [{"world": 2}]


def test_expand_object_struct_per_present_key(run, spark):
    # tests.rs expand_object / expand_object_multiple_records /
    # expand_object_zip_unequal_lengths: a typed-JSON object (struct)
    # expands one row per PRESENT key, each a single-key object; zip
    # with other expands pads with null
    import json as _json

    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    m.registry.register("tob", mem)

    def js(q, rows):
        rdd = spark.sparkContext.parallelize([_json.dumps(r) for r in rows])
        mem.put("c", spark.read.json(rdd))
        return sorted(
            (_json.loads(s) for s in m.query(q).toJSON().collect()),
            key=_json.dumps,
        )

    assert js("tob.c | mv-expand tags", [
        {"name": "item1", "tags": {"color": "red", "size": "large"}},
        {"name": "item2", "tags": {"priority": "high"}},
    ]) == sorted([
        {"name": "item1", "tags": {"color": "red"}},
        {"name": "item1", "tags": {"size": "large"}},
        {"name": "item2", "tags": {"priority": "high"}},
    ], key=_json.dumps)

    # zip: object keys pair up with array elements positionally
    assert js("tob.c | mv-expand items, metadata", [
        {"id": 1, "items": ["a", "b"],
         "metadata": {"env": "prod", "version": "2.0"}},
    ]) == sorted([
        {"id": 1, "items": "a", "metadata": {"env": "prod"}},
        {"id": 1, "items": "b", "metadata": {"version": "2.0"}},
    ], key=_json.dumps)

    # kind=array flattens to alternating key/value VARIANTs — values
    # stay typed (30 is a number, nested objects stay objects)
    assert js("tob.c | mv-expand kind=array config", [
        {"id": 1, "config": {"timeout": 30, "options": {"retry": True}}},
    ]) == sorted([
        {"id": 1, "config": "options"},
        {"id": 1, "config": {"retry": True}},
        {"id": 1, "config": "timeout"},
        {"id": 1, "config": 30},
    ], key=_json.dumps)


def test_join_against_keyless_side_matches_nothing(run, spark):
    # tests.rs join_empty_right_side: a side without the join key (an
    # empty dynamic collection, or rows that never carry it) joins as
    # a null key under PLAIN equality — inner drops everything, left
    # keeps left rows; crucially a null left key must NOT match the
    # synthesized null (the reference's build side skips missing keys)
    from pyspark.sql.types import StructType

    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("a", spark.createDataFrame(
        [(1, "x"), (None, "y")], "id int, v string"))
    mem.put("empty", spark.createDataFrame([], StructType([])))
    m.registry.register("tkl", mem)
    assert m.query("tkl.a | join (tkl.empty) on id").count() == 0
    out = m.query("tkl.a | join kind=left (tkl.empty) on id").collect()
    assert sorted(str(r["v"]) for r in out) == ["x", "y"]


def test_missing_operand_drops_under_every_comparison(run):
    # impl_cmp (None, _) → Ok(None): a provably-missing operand makes
    # EVERY comparison unknown — the row drops under the bare filter
    # AND under not(...) (Not of unknown stays unknown), unlike a
    # PRESENT null which totally-orders (smallest)
    data = {"mc": ("x int", [(1,), (2,)])}
    for q in ("nosuch <= 5", "nosuch < 5", "nosuch != 5", "nosuch == 5",
              "nosuch >= 5", "not(nosuch <= 5)", "nosuch == null",
              "nosuch == x"):
        assert run(f"test.mc | where {q}", **data) == [], q


def test_not_of_null_comparison_follows_total_order(run):
    # Not of Some(false) is Some(true): `not(x > 5)` KEEPS a present
    # null x (x > 5 is false — null is smallest), and `not(x <= 5)`
    # drops it; literal == forms give proper booleans too
    data = {"nn": ("x int", [(10,), (None,), (3,)])}
    out = run("test.nn | where not(x > 5)", **data)
    assert sorted((r["x"] is not None, r["x"]) for r in out) == [
        (False, None), (True, 3)]
    out = run("test.nn | where not(x <= 5)", **data)
    assert [r["x"] for r in out] == [10]
    out = run("test.nn | where not(x == 10)", **data)
    assert sorted((r["x"] is not None, r["x"]) for r in out) == [
        (False, None), (True, 3)]
