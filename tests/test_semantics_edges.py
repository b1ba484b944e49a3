"""Null/edge semantics mirrored from miso-workflow/src/tests.rs
(null_in_* / summarize_* / case_* / short_circuit_* groups)."""

from __future__ import annotations

import pytest

from miso_spark.api import MisoSpark


@pytest.fixture(scope="module")
def m(spark):
    mi = MisoSpark(spark)
    mem = mi.registry.source("mem")
    mem.put(
        "vals",
        spark.createDataFrame(
            [(1, 10, "x"), (2, None, "y"), (3, 5, None)], "id long, v long, s string"
        ),
    )
    return mi


def rows(m, q):
    return [r.asDict() for r in m.query(q).collect()]


def test_null_comparisons_follow_value_total_order(m):
    # Value's total order, null smallest (value/mod.rs:151; tests.rs
    # null_in_gte_operator / null_in_lte_operator): null drops under
    # >=, SURVIVES <= and != (r7 change — was SQL-drop-everywhere)
    assert {r["id"] for r in rows(m, "mem.vals | where v >= 5")} == {1, 3}
    assert {r["id"] for r in rows(m, "mem.vals | where v <= 100")} == {1, 2, 3}
    assert {r["id"] for r in rows(m, "mem.vals | where v != 10")} == {2, 3}


def test_null_in_bool_ops(m):
    # null OR true = true; null AND true = unknown → dropped
    assert {r["id"] for r in rows(m, "mem.vals | where v > 0 or true")} == {1, 2, 3}
    assert {r["id"] for r in rows(m, "mem.vals | where v > 0 and true")} == {1, 3}


def test_short_circuit_where_false(m):
    assert rows(m, "mem.vals | where false | count")[0]["Count"] == 0
    assert rows(m, "mem.vals | where true and false") == []


def test_countif_all_false_and_agg_nulls(m):
    r = rows(
        m,
        "mem.vals | summarize z = countif(v > 1000), mn = min(v), mx = max(v),"
        " d = dcount(v), n = count()",
    )[0]
    # dcount counts the null as a distinct value (tests.rs dcount_with_nulls)
    assert r == {"z": 0, "mn": 5, "mx": 10, "d": 3, "n": 3}


def test_agg_no_values_emits_zero_not_null(m):
    # tests.rs summarize_without_by_empty_data: sum/avg → 0, min/max →
    # null, count/dcount → 0 on empty input
    r = rows(
        m,
        "mem.vals | where false | summarize s = sum(v), a = avg(v),"
        " mn = min(v), d = dcount(v), n = count()",
    )[0]
    assert r == {"s": 0, "a": 0.0, "mn": None, "d": 0, "n": 0}
    # all-null group: the group row exists, sum accumulates nothing → 0
    r2 = {
        row["s"]: row["total"]
        for row in rows(m, "mem.vals | where id == 2 | summarize total = sum(v) by s")
    }
    assert r2 == {"y": 0}


def test_summarize_group_by_null_key(m):
    # null group keys drop pre-grouping (summarize.rs:151; tests.rs
    # summarize_group_by_with_null_key)
    r = {row["s"]: row["n"] for row in rows(m, "mem.vals | summarize n = count() by s")}
    assert r == {"x": 1, "y": 1}


def test_summarize_by_literal(m):
    # tests.rs summarize_by_literal: grouping by a constant collapses all
    r = rows(m, "mem.vals | summarize n = count() by g = 1")
    assert r == [{"g": 1, "n": 3}]


def test_extract_with_field_arguments(m, spark):
    # parser_tests.rs:1276: extract's regex/group/source may all be
    # fields, evaluated per row
    m.registry.source("mem").put(
        "rex",
        spark.createDataFrame(
            [(1, "k=10", r"k=(\d+)", 1), (2, "v:7", r"v:(\d+)", 1), (3, "none", r"x(\d+)", 1)],
            "id long, s string, p string, g int",
        ),
    )
    got = {
        r["id"]: r["r"]
        for r in m.query("mem.rex | project id, r = extract(p, g, s)").collect()
    }
    assert got == {1: "10", 2: "7", 3: None}  # no-match → null


def test_summarize_by_only_is_distinct(m):
    # parser.rs:1033 admits zero aggregations: `summarize by x` ≡ distinct
    got = {r["s"] for r in rows(m, "mem.vals | summarize by s")}
    assert got == {"x", "y"}  # null keys drop like any summarize


def test_case_no_conditions_match_uses_default(m):
    r = rows(m, "mem.vals | where id == 1 | project o = case(v > 100, 'big', v > 50, 'mid', 'small')")
    assert r == [{"o": "small"}]


def test_count_on_count(m):
    assert rows(m, "mem.vals | count | count")[0]["Count"] == 1


def test_limit_zero(m):
    assert rows(m, "mem.vals | take 0") == []


def test_divide_by_zero_errors_like_reference(m):
    # miso bails on division by zero (interpreter/mod.rs:313); Spark's
    # ANSI mode (our default) matches. DuckDB would return NULL — the
    # catalog never divides by a zeroable expression.
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|divide"):
        m.query("mem.vals | project v = id / 0").collect()


def test_empty_string_string_ops(m):
    # ''-contains: every string contains the empty string
    assert len(rows(m, "mem.vals | where s contains ''")) == 2  # null s drops
    assert len(rows(m, "mem.vals | where s startswith ''")) == 2
    assert len(rows(m, "mem.vals | where s endswith ''")) == 2


def test_string_column_plus_concat(m):
    # string + string on COLUMNS concats (schema-directed; mod.rs:234)
    r = rows(m, "mem.vals | where id == 1 | project c = s + s, lc = 'v' + s")
    assert r == [{"c": "xx", "lc": "vx"}]


def test_extend_simultaneous_input_binding(m):
    """ProjectIter.eval binds every field expression to the INPUT log
    (project.rs:42-63: one LogInterpreter over the original `log`,
    writes land in a fresh output merged at the end) — so in
    `extend v = v * 2, w = v` the `w` reads the ORIGINAL v, not the
    doubled one. project_propagation's substitution (rewrite.py)
    assumes exactly this; engine-side execution must match or
    negotiated external plans diverge from engine plans (ADVICE r9)."""
    r = rows(m, "mem.vals | where id == 1 | extend v = v * 2, w = v"
                " | project v, w")
    assert r == [{"v": 20, "w": 10}]


def test_extend_self_chain_then_filter_matches_propagated_form(m):
    """The exact hazard shape from ADVICE r9: `extend a = v*2, c = a |
    where c > 5`. Under input binding `c` copies the INPUT `a`, which
    is missing on mem.vals — so the filter drops every row, and the
    engine path agrees with the propagated (substituted) form instead
    of diverging to the sequential reading (c = v*2)."""
    r = rows(m, "mem.vals | extend a = v * 2, c = a | where c > 5 | count")
    assert r == [{"Count": 0}]


def test_extend_nested_targets_same_top_merge(m):
    """Two nested targets under one new top-level name merge into the
    same struct (insert_field_value writes sequentially into the
    output log, interpreter/mod.rs:514)."""
    r = rows(
        m,
        "mem.vals | where id == 1 | extend o.a = v, o.b = id"
        " | project x = o.a, y = o.b",
    )
    assert r == [{"x": 10, "y": 1}]


def test_missing_field_evaluates_as_null(spark):
    """Dynamic-log missing-field semantics (tests.rs
    project_nonexistent_field_arithmetic / filter_null_field_comparison):
    a provably-absent field evaluates as null — projection emits rows
    without the key (JSON), filters drop, exists() is false — instead
    of Spark's UNRESOLVED_COLUMN error. Case-insensitive resolution is
    preserved, and map/JSON segments still defer to Spark."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("c", spark.createDataFrame([(1,), (2,)], "id long"))
    m.registry.register("t_missing", mem)

    df = m.query("t_missing.c | project result = missing + 5")
    assert df.toJSON().collect() == ["{}", "{}"]  # key omitted, like the reference
    assert m.query("t_missing.c | where missing > 5").count() == 0
    assert m.query("t_missing.c | where exists(missing)").count() == 0
    assert m.query("t_missing.c | where not(exists(missing))").count() == 2
    # existing columns still resolve case-insensitively
    assert m.query("t_missing.c | where ID == 1").count() == 1


def test_missing_operand_poisons_and_or_typed(spark):
    """eval_to_bool! semantics on the TYPED path (expr_eval.rs:13-19,
    63-69): a provably-missing field inside and/or makes the whole
    boolean unknown once evaluation reaches it — `missing or true`
    drops the row (left evaluates first), while `true or missing`
    keeps it (Rust || short-circuits before the right can poison).
    SQL Kleene logic (NULL|true=true) would keep both."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("c", spark.createDataFrame([(1,), (2,)], "id long"))
    m.registry.register("t_poison", mem)

    assert m.query("t_poison.c | where zzz == 1 or id >= 1").count() == 0
    assert m.query("t_poison.c | where id >= 1 or zzz == 1").count() == 2
    assert m.query("t_poison.c | where id == 99 and zzz == 1").count() == 0
    assert m.query("t_poison.c | where id >= 1 and zzz == 1").count() == 0
    # iff over a missing condition: whole case unknown → key omitted
    df = m.query("t_poison.c | project r = iff(zzz == 1, 'a', 'b')")
    assert df.toJSON().collect() == ["{}", "{}"]


@pytest.fixture(scope="module")
def strops(m, spark):
    """string_ops.rs test corpus rows (test_has_* / test_extract_*)."""
    m.registry.source("mem").put(
        "strops",
        spark.createDataFrame(
            [("Hello World",), ("test-case",), ("exact",), ("short",),
             ("test",), ("",)],
            "s string",
        ),
    )
    m.registry.source("mem").put(
        "rexsrc", spark.createDataFrame([("abc 123 def",)], "s string")
    )
    return m


def _hits(strops, pred):
    return sorted(r["s"] for r in strops.query(f"mem.strops | where {pred}").collect())


def test_has_case_insensitive(strops):
    # string_ops.rs test_has_case_insensitive
    assert _hits(strops, 's has "hello"') == ["Hello World"]
    assert _hits(strops, 's has "WORLD"') == ["Hello World"]
    assert _hits(strops, 's has "ell"') == []
    assert _hits(strops, 's has "wor"') == []
    assert _hits(strops, 's has "test"') == ["test", "test-case"]
    assert _hits(strops, 's has "case"') == ["test-case"]


def test_has_case_sensitive(strops):
    # string_ops.rs test_has_case_sensitive
    assert _hits(strops, 's has_cs "Hello"') == ["Hello World"]
    assert _hits(strops, 's has_cs "hello"') == []
    assert _hits(strops, 's has_cs "World"') == ["Hello World"]
    assert _hits(strops, 's has_cs "world"') == []
    assert _hits(strops, 's has_cs "ell"') == []


def test_has_edge_cases(strops):
    # string_ops.rs test_has_edge_cases: empty phrase matches NOTHING
    # (even the empty string), longer-than-text can't match, exact hits
    assert _hits(strops, 's has ""') == []
    assert _hits(strops, 's has_cs ""') == []
    assert _hits(strops, 's has "longer"') == []
    assert _hits(strops, 's has "exact"') == ["exact"]
    assert _hits(strops, 's has_cs "exact"') == ["exact"]


def _x(strops, expr):
    rows = strops.query(f"mem.rexsrc | project v = {expr}").collect()
    return rows[0]["v"]


def test_extract_groups(strops):
    # string_ops.rs test_extract_basic/_no_match/_group_zero/_multiple
    assert _x(strops, r"extract('(\d+)', 1, s)") == "123"
    assert _x(strops, r"extract('(zzz)', 1, s)") is None
    assert _x(strops, r"extract('\d+', 0, s)") == "123"
    assert _x(strops, r"extract('(\w+) (\d+)', 2, s)") == "123"


def test_extract_invalid_group_is_null(strops):
    # string_ops.rs test_extract_invalid_group: caps.get(5) → None →
    # NULL (Spark's regexp_extract would raise REGEX_GROUP_INDEX)
    assert _x(strops, r"extract('(\d+)', 5, s)") is None


def test_extract_negative_group_errors(strops):
    # string_ops.rs:15-17 bail — a query error, not a per-row crash
    with pytest.raises(Exception, match="non-negative"):
        strops.query(r"mem.rexsrc | project v = extract('(\d+)', -1, s)").collect()


@pytest.fixture(scope="module")
def xclass(m, spark):
    """Cross-class comparison rows: s is a STRING column (some rows
    numeric-looking), n is a long column."""
    m.registry.source("mem").put(
        "xclass",
        spark.createDataFrame(
            [(1, "5", 10), (2, "abc", None), (3, None, 3)],
            "id long, s string, n long",
        ),
    )
    return m


def _ids(xclass, pred):
    return sorted(
        r["id"] for r in xclass.query(f"mem.xclass | where {pred}").collect()
    )


def test_cross_class_comparisons_use_total_order(xclass):
    """A typed column compared against a literal of a DIFFERENT
    total-order class decides by class rank (value/mod.rs:147: Null <
    Bool < numbers < Timestamp < Timespan < String < Array < Object) —
    Spark's coercion would instead CRASH under ANSI on 'abc' > 3, and
    silently call "5" == 5 true where the reference says String never
    equals Int."""
    # string column vs int literal: strings outrank all numbers
    assert _ids(xclass, "s > 3") == [1, 2]     # non-null strings win
    assert _ids(xclass, "s == 5") == []        # classes never tie
    assert _ids(xclass, "s != 5") == [1, 2, 3]
    assert _ids(xclass, "s < 3") == [3]        # only null sits below
    assert _ids(xclass, "s <= 3") == [3]
    assert _ids(xclass, "s >= 3") == [1, 2]
    # int column vs string literal: mirrored
    assert _ids(xclass, 'n < "x"') == [1, 2, 3]  # numbers (and null) below strings
    assert _ids(xclass, 'n > "x"') == []
    # in: cross-class items can never match and drop from the chain
    assert _ids(xclass, "s in (5, 10)") == []
    assert _ids(xclass, 's in (5, "5")') == [1]
    # between with a cross-class endpoint decomposes per total order
    assert _ids(xclass, 'n between (1 .. "z")') == [1, 3]  # num <= string
    assert _ids(xclass, 's between (1 .. 9)') == []        # string > num hi
    # field-vs-field cross-class: s(string) vs n(long)
    assert _ids(xclass, "s > n") == [1, 2]  # any non-null s beats n (incl. null n)
    assert _ids(xclass, "s == n") == []   # never equal (no null==null row)


def test_in_and_between_are_proper_booleans(m):
    """property-miner find (r10): `in` is a chain of the total-order
    equality (Value::Null == Int(0) is FALSE, a proper boolean), so
    `not(x in (...))` must KEEP a null x exactly like `not(x == ...)`
    does — a bare Column.isin would yield SQL-unknown and flip under
    not(). Same for between via the parser-desugar pair."""
    # mem.vals: v = [10, None, 5]
    assert {r["id"] for r in rows(m, "mem.vals | where not(v in (10))")} == {2, 3}
    assert {r["id"] for r in rows(m, "mem.vals | where v in (10, 5)")} == {1, 3}
    # !between keeps the null base: null < any bound (Lt-OR-Gt form)
    assert {r["id"] for r in rows(m, "mem.vals | where v !between (4 .. 11)")} == {2}
    assert {r["id"] for r in rows(m, "mem.vals | where v between (4 .. 11)")} == {1, 3}
