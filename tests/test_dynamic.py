"""Unit tests for the per-row dynamic (VARIANT) value model —
miso_spark/dynamic.py — pinning the reference's interpreter semantics
(miso-workflow-types/src/value/mod.rs total order + to_bool;
miso-workflow/src/interpreter/mod.rs impl_cmp missing-propagation)
independently of the reference-test harness."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from miso_spark import dynamic as dyn


def _vals(df, col):
    return [r[col] for r in df.collect()]


@pytest.fixture(scope="module")
def mixed(spark):
    """One dynamic column `w` spanning every type class + a missing
    row; row order preserved via idx."""
    rows = [
        {"idx": 0, "w": 5},
        {"idx": 1, "w": "5"},
        {"idx": 2, "w": 5.5},
        {"idx": 3, "w": True},
        {"idx": 4, "w": False},
        {"idx": 5, "w": None},
        {"idx": 6},  # w missing
        {"idx": 7, "w": [10, 20]},
        {"idx": 8, "w": {"a": 1}},
        {"idx": 9, "w": {}},
        {"idx": 10, "w": ""},
    ]
    return dyn.ingest_json_dynamic(spark, rows).orderBy(
        F.variant_get("idx", "$", "int")
    )


def test_ingest_missing_vs_present_null(mixed):
    out = mixed.select(
        F.col("w").isNull().alias("missing"),
        F.when(F.col("w").isNotNull(), F.is_variant_null("w")).alias("vnull"),
    ).collect()
    assert [r["missing"] for r in out] == [
        False, False, False, False, False, False, True, False, False, False, False,
    ]
    assert out[5]["vnull"] is True  # explicit JSON null
    assert out[0]["vnull"] is False


def test_vclass_ranks(mixed):
    got = _vals(mixed.select(dyn.vclass(F.col("w")).alias("c")), "c")
    assert got == [2, 5, 2, 1, 1, 0, None, 6, 7, 7, 5]


def test_vbool_reference_to_bool(mixed):
    got = _vals(mixed.select(dyn.vbool(F.col("w")).alias("b")), "b")
    #      5     "5"   5.5   T     F      null   miss  arr   obj    {}     ""
    assert got == [
        True, True, True, True, False, False, None, True, True, False, False,
    ]


@pytest.mark.parametrize(
    "op,lit,expect",
    [
        # cross-type equality is FALSE, not unknown (tests.rs
        # comparison_cross_type)
        ("eq", "5", [False, True, False, False, False, False, None,
                     False, False, False, False]),
        ("eq", 5, [True, False, False, False, False, False, None,
                   False, False, False, False]),
        # Null is a comparable smallest value; bools sit below numbers
        ("lt", 5, [False, False, False, True, True, True, None,
                   False, False, False, False]),
        # strings rank ABOVE numbers, so "5" >= 5 is true cross-class
        ("gte", 5, [True, True, True, False, False, False, None,
                    True, True, True, True]),
        ("ne", 5, [False, True, True, True, True, True, None,
                   True, True, True, True]),
        # == null matches ONLY the present null (tests.rs filter_eq_null)
        ("eq", None, [False, False, False, False, False, True, None,
                      False, False, False, False]),
    ],
)
def test_vcompare_against_literal(mixed, op, lit, expect):
    got = _vals(
        mixed.select(
            dyn.vcompare(
                op, dyn.sort_key(F.col("w")), dyn.literal_sort_key(lit)
            ).alias("r")
        ),
        "r",
    )
    assert got == expect


def test_numeric_cross_class_eq(spark):
    # Int(5) == Float(5.0) under the reference order (value/mod.rs:178)
    df = dyn.ingest_json_dynamic(spark, [{"a": 5, "b": 5.0}, {"a": 5, "b": 5.25}])
    got = _vals(
        df.select(
            dyn.vcompare(
                "eq", dyn.sort_key(F.col("a")), dyn.sort_key(F.col("b"))
            ).alias("r")
        ),
        "r",
    )
    assert sorted(got) == [False, True]


def test_array_equality_canonicalizes(spark):
    # [1.0, 2] and [1, 2.0] canonicalize to the same JSON → equal
    df = dyn.ingest_json_dynamic(
        spark, [{"a": [1.0, 2], "b": [1, 2.0], "c": [1, 3]}]
    )
    row = df.select(
        dyn.vcompare("eq", dyn.sort_key(F.col("a")), dyn.sort_key(F.col("b"))).alias("ab"),
        dyn.vcompare("eq", dyn.sort_key(F.col("a")), dyn.sort_key(F.col("c"))).alias("ac"),
    ).first()
    assert row["ab"] is True and row["ac"] is False


def test_wrap_variant_propagates_missing(spark):
    df = spark.createDataFrame([(True,), (None,)], "b boolean")
    got = _vals(df.select(dyn.wrap_variant(F.col("b")).isNull().alias("m")), "m")
    assert got == [False, True]


def test_ingest_empty_rows(spark):
    df = dyn.ingest_json_dynamic(spark, [])
    assert df.count() == 0 and df.columns == []


def test_ingest_key_discovery_is_capped(spark, monkeypatch):
    """Adversarial key space: per-row synthetic keys (request-id-as-key
    logs) must raise, pointing at keys=, instead of collecting an
    unbounded distinct key set into the driver (the
    _collect_join_keys degrade-don't-collect posture)."""
    monkeypatch.setattr(dyn, "MAX_DISCOVERED_KEYS", 8)
    rows = [{f"req_{i}": i} for i in range(20)]
    with pytest.raises(ValueError, match="keys="):
        dyn.ingest_json_dynamic(spark, rows)
    # explicit keys skip discovery entirely and stay bounded
    df = dyn.ingest_json_dynamic(spark, rows, keys=["req_3"])
    assert df.columns == ["req_3"]
    assert df.count() == 20


def test_ingest_explicit_keys_skips_discovery(spark):
    df = dyn.ingest_json_dynamic(spark, [{"a": 1, "b": 2}], keys=["a"])
    assert df.columns == ["a"]


def test_dynamic_filter_end_to_end(spark):
    """Full engine path: dynamic ingest → KQL where over mixed types."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put(
        "c",
        dyn.ingest_json_dynamic(
            spark, [{"x": 5}, {"x": "5"}, {"x": 5.0}, {"x": True}, {"y": 1}]
        ),
    )
    m.registry.register("dyn", mem)
    got = [json.loads(s) for s in m.query('dyn.c | where x == "5"').toJSON().collect()]
    assert got == [{"x": "5"}]
    # total-order lt: bool < number, missing filtered
    got = sorted(
        json.dumps(json.loads(s))
        for s in m.query("dyn.c | where x < 99").toJSON().collect()
    )
    assert len(got) == 3  # 5, 5.0, true — not "5" (string above numbers)


def _dyn_engine(spark, rows):
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("c", dyn.ingest_json_dynamic(spark, rows))
    m.registry.register("dyn", mem)
    return m


def test_read_json_dynamic_from_files(spark, tmp_path):
    """File-based dynamic ingest: distributed text scan, no driver
    round-trip; explicit keys skip the discovery pass; unaddressable
    keys are rejected loudly."""
    p = tmp_path / "docs.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": "1"}\n{"b": null}\n')
    df = dyn.read_json_dynamic(spark, str(p))
    assert df.columns == ["a", "b"]
    assert df.count() == 3
    only_a = dyn.read_json_dynamic(spark, str(p), keys=["a"])
    assert only_a.columns == ["a"]
    # mixed 1 / "1" survive per-row
    classes = sorted(
        r["c"] for r in only_a.select(dyn.vclass(F.col("a")).alias("c")).collect()
        if r["c"] is not None
    )
    assert classes == [dyn.RANK_NUM, dyn.RANK_STRING]
    with pytest.raises(ValueError, match="not addressable"):
        dyn.read_json_dynamic(spark, str(p), keys=["bad key"])


def test_dynamic_iff_and_countif_boolean_context(spark):
    """Bare dynamic fields in predicate positions (iff / countif)
    convert through Value::to_bool."""
    m = _dyn_engine(spark, [
        {"i": 1, "x": 1}, {"i": 2, "x": 0}, {"i": 3, "x": "s"},
        {"i": 4, "x": ""}, {"i": 5, "x": None},
    ])
    got = {
        json.loads(s)["i"]: json.loads(s).get("r")
        for s in m.query('dyn.c | project i, r = iff(x, "t", "f")').toJSON().collect()
    }
    assert got == {1: "t", 2: "f", 3: "t", 4: "f", 5: "f"}
    n = [json.loads(s) for s in m.query(
        "dyn.c | summarize n = countif(x)"
    ).toJSON().collect()]
    assert n[0]["n"] == 2  # 1 and "s" truthy


def test_dynamic_sort_total_order(spark):
    """sort by over a mixed-type column follows the reference total
    order (Bool < numbers < String < Array < Object) for PRESENT
    non-null values, while BOTH a present JSON null and a missing key
    follow the nulls first/last directive — the reference's sort
    operator places Value::Null as an arrow null (tests.rs
    sort_nulls_order), unlike comparisons where it is the smallest
    value."""
    m = _dyn_engine(spark, [
        {"i": 0, "x": "b"}, {"i": 1, "x": 2}, {"i": 2, "x": True},
        {"i": 3, "x": None}, {"i": 4}, {"i": 5, "x": [1]},
        {"i": 6, "x": 1.5}, {"i": 7, "x": {"a": 1}},
    ])
    got = [int(str(r["i"])) for r in m.query(
        "dyn.c | sort by x asc nulls last | project i"
    ).collect()]
    # true(2) < 1.5(6) < 2(1) < "b"(0) < [1](5) < {a:1}(7); null(3) and
    # missing(4) both land at the end (their mutual order is untied)
    assert got[:6] == [2, 6, 1, 0, 5, 7]
    assert set(got[6:]) == {3, 4}
    first = [int(str(r["i"])) for r in m.query(
        "dyn.c | sort by x asc nulls first | project i"
    ).collect()]
    assert set(first[:2]) == {3, 4} and first[2:] == [2, 6, 1, 0, 5, 7]


def test_dynamic_summarize_group_and_aggs(spark):
    """summarize over dynamic columns: group keys distinct by value
    (null keys dropped — both missing and present null), min/max by
    total order, sum/avg over numeric payloads, dcount counting a
    present null as its own value."""
    m = _dyn_engine(spark, [
        {"g": "a", "v": 1}, {"g": "a", "v": 2.5}, {"g": "a", "v": "s"},
        {"g": 5, "v": None}, {"g": 5, "v": 7}, {"g": None, "v": 1}, {"v": 9},
    ])
    rows = {}
    out = m.query(
        "dyn.c | summarize n=count(), s=sum(v), mn=min(v), mx=max(v), d=dcount(v) by g"
    )
    for r in [json.loads(x) for x in out.toJSON().collect()]:
        rows[json.dumps(r["g"])] = r
    # null/missing group keys dropped → groups "a" and 5 only
    assert set(rows) == {'"a"', "5"}
    a, five = rows['"a"'], rows["5"]
    assert a["n"] == 3 and a["s"] == 3.5 and a["d"] == 3
    assert a["mn"] == 1 and a["mx"] == "s"  # number < string in the order
    # present null is the smallest value and counts in dcount
    assert five["n"] == 2 and five["s"] == 7 and five["d"] == 2
    assert five["mn"] is None or "mn" not in five  # Value::Null wins min
    assert five["mx"] == 7


def test_dynamic_distinct(spark):
    """distinct over dynamic columns: 5 and 5.0 canonicalize equal, 5
    and "5" stay distinct. `distinct x` IS `summarize by x` in the
    reference (query_to_workflow.rs:146) and summarize drops null
    group keys (summarize.rs:151) — so both the present null and the
    missing row drop, on every execution path."""
    m = _dyn_engine(spark, [
        {"x": 5}, {"x": 5.0}, {"x": "5"}, {"x": None}, {}, {"x": 5},
    ])
    got = sorted(
        json.dumps(json.loads(s), sort_keys=True)
        for s in m.query("dyn.c | distinct x").toJSON().collect()
    )
    assert got == sorted(['{"x": 5}', '{"x": "5"}'])
    # field-less `distinct *` keeps the Distinct step: whole-row dedup,
    # null/missing rows are rows like any other
    star = sorted(
        json.dumps(json.loads(s), sort_keys=True)
        for s in m.query("dyn.c | distinct *").toJSON().collect()
    )
    assert star == sorted(['{"x": 5}', '{"x": "5"}', '{"x": null}', "{}"])


def test_json_dynamic_dir_connector_via_http(spark, tmp_path):
    """The json_dynamic_dir connector registers over the HTTP API and
    serves mixed-type collections with dynamic semantics end-to-end."""
    import urllib.request

    from miso_spark.server import MisoServer

    (tmp_path / "logs.jsonl").write_text(
        '{"x": 5, "tag": "n"}\n{"x": "5", "tag": "s"}\n{"x": true}\n'
    )
    srv = MisoServer(spark, port=0)
    srv.start_background()
    u = f"http://127.0.0.1:{srv.port}"
    body = json.dumps({"type": "json_dynamic_dir", "path": str(tmp_path)}).encode()
    req = urllib.request.Request(
        u + "/connectors/crawl", data=body,
        headers={"Content-Type": "application/json"},
    )
    assert urllib.request.urlopen(req).status == 200
    q = json.dumps({"query": 'crawl.logs | where x == "5" | project tag'}).encode()
    req = urllib.request.Request(
        u + "/query", data=q, headers={"Content-Type": "application/json"}
    )
    frames = urllib.request.urlopen(req).read().decode()
    rows = [
        json.loads(ln[len("data: "):])
        for ln in frames.splitlines()
        if ln.startswith("data: ") and ln != "data: {}"
    ]
    assert rows == [{"tag": "s"}]


def test_dynamic_and_or_missing_poisons_like_reference(spark):
    """The reference's eval_to_bool! short-circuit: the LEFT operand
    evaluates first — missing poisons unless an earlier deciding value
    short-circuited. or(missing, true) → unknown (row dropped) but
    or(true, missing) → true; and(false, missing) → false but
    and(missing, false) → unknown. Spark's Kleene NULL|true=true /
    NULL&false=false would keep/keep both."""
    m = _dyn_engine(spark, [{"i": 1, "a": True}, {"i": 2}])
    def ids(q):
        return sorted(int(str(r["i"])) for r in m.query(q).collect())
    # row 2 has a missing: left-missing poisons even with a true right
    assert ids("dyn.c | where a or 1 == 1 | project i") == [1]
    # true left short-circuits before the missing right can poison
    assert ids("dyn.c | where 1 == 1 or a | project i") == [1, 2]
    assert ids("dyn.c | where 1 == 2 and a | project i") == []
    # not(missing) stays missing
    assert ids("dyn.c | where not(a and 1 == 2) | project i") == [1]


def test_dynamic_iff_missing_condition_poisons(spark):
    m = _dyn_engine(spark, [{"i": 1, "a": 1}, {"i": 2}])
    got = {
        int(str(json.loads(s)["i"])): json.loads(s).get("r")
        for s in m.query('dyn.c | project i, r = iff(a, "t", "f")').toJSON().collect()
    }
    # row 2: condition missing → whole case missing → key omitted
    assert got == {1: "t", 2: None}


def test_dynamic_in_missing_item_is_skipped(spark):
    """is_in skips items whose comparison is unknown — only the BASE
    being missing poisons the test (interpreter/mod.rs:196)."""
    m = _dyn_engine(spark, [
        {"i": 0, "x": 5}, {"i": 1, "x": 7, "y": 5}, {"i": 2, "x": 5},
    ])
    got = sorted(int(str(r["i"])) for r in m.query(
        "dyn.c | where not(x in (99, y)) | project i"
    ).collect())
    # rows 0/2: y missing is SKIPPED, x∉{99} → false → not → true
    assert got == [0, 1, 2]


def test_between_with_variant_endpoints(spark):
    m = _dyn_engine(spark, [{"i": 1, "x": 4}, {"i": 2, "x": 8}, {"i": 3}])
    got = sorted(int(str(r["i"])) for r in m.query(
        "dyn.c | where 6 between (x .. 10) | project i"
    ).collect())
    assert got == [1]  # 6 >= 4 and 6 <= 10; x=8 fails; missing x poisons


def test_dynamic_arithmetic_per_row_types(spark):
    m = _dyn_engine(spark, [
        {"i": 1, "a": "foo", "b": "bar"},
        {"i": 2, "a": 1, "b": 2},
        {"i": 3, "a": 1, "b": 2.5},
        {"i": 4, "a": True, "b": 2},
        {"i": 5, "b": 2},
    ])
    got = {
        int(str(json.loads(s)["i"])): json.loads(s).get("c")
        for s in m.query("dyn.c | project i, c = a + b").toJSON().collect()
    }
    # string+string concatenates; int+int stays integer; int+float is
    # float; bool+int and missing evaluate as missing (reference bails)
    assert got == {1: "foobar", 2: 3, 3: 3.5, 4: None, 5: None}
    div = {
        int(str(json.loads(s)["i"])): json.loads(s).get("c")
        for s in m.query("dyn.c | project i, c = a / b").toJSON().collect()
    }
    assert div[2] == 0.5  # integer division is float (impl_op "/" arm)


def test_read_json_dynamic_tolerates_malformed_lines(spark, tmp_path):
    p = tmp_path / "messy.jsonl"
    # blank, malformed, and valid-but-non-object (scalar/array) lines
    # all drop; the empty object {} is a legitimate all-missing row
    p.write_text('{"a": 1}\n\nnot json at all\n5\n[1,2]\n{}\n{"a": 2}\n')
    df = dyn.read_json_dynamic(spark, str(p))
    assert sorted(
        int(str(r["a"])) for r in df.collect() if r["a"] is not None
    ) == [1, 2]
    assert df.count() == 3  # two data rows + the {} row


def test_nested_dynamic_arithmetic_routes_dynamic(spark):
    """An arithmetic result over dynamic operands is itself dynamic:
    comparisons, aggregations and further arithmetic on it must route
    through the dynamic semantics (review-2 regression: they hit the
    typed path and failed analysis)."""
    m = _dyn_engine(spark, [
        {"i": 1, "a": 2, "b": 2}, {"i": 2, "a": 1, "b": 1}, {"i": 3, "a": "x", "b": 1},
    ])
    got = sorted(int(str(r["i"])) for r in m.query(
        "dyn.c | where a + b > 3 | project i"
    ).collect())
    assert got == [1]  # 4 > 3; 2 is not; "x"+1 is missing → filtered
    s = [json.loads(x) for x in m.query(
        "dyn.c | summarize s = sum(a + b)"
    ).toJSON().collect()]
    assert s[0]["s"] == 6  # 4 + 2; the missing row contributes nothing
    twice = {
        int(str(json.loads(x)["i"])): json.loads(x).get("c")
        for x in m.query("dyn.c | project i, c = (a + b) * 2").toJSON().collect()
    }
    assert twice == {1: 8, 2: 4, 3: None}


def test_dynamic_zip_scalar_reinsertion_and_null_padding(spark):
    """Zip semantics over dynamic fields (expand.rs): a scalar field
    re-emits its value on EVERY emitted row (never zipped), and a
    shorter collection pads its tail with a PRESENT Value::Null —
    visible to `== null` — not a missing key."""
    m = _dyn_engine(spark, [{"a": 5, "c": [1, 2]}, {"a": [9], "c": [1, 2]}])
    rows = sorted(
        (json.dumps(json.loads(s), sort_keys=True)
         for s in m.query("dyn.c | mv-expand a, c").toJSON().collect())
    )
    assert rows == sorted([
        '{"a": 5, "c": 1}', '{"a": 5, "c": 2}',      # scalar re-inserted
        '{"a": 9, "c": 1}', '{"a": null, "c": 2}',   # present-null pad
    ])
    # the padded null matches == null (present Value::Null semantics)
    padded = m.query("dyn.c | mv-expand a, c | where a == null").count()
    assert padded == 1


def test_dynamic_toint_rejects_padded_strings(spark):
    """i64::parse is strict: whitespace-padded or unicode-digit
    strings are missing, even though Spark's bare try_cast would trim
    and parse them."""
    m = _dyn_engine(spark, [
        {"i": 1, "x": " 5"}, {"i": 2, "x": "5 "}, {"i": 3, "x": "5"},
        {"i": 4, "x": "꯳"},  # MYANMAR SHAN DIGIT THREE
    ])
    got = {
        int(str(json.loads(s)["i"])): json.loads(s).get("v")
        for s in m.query("dyn.c | project i, v = toint(x)").toJSON().collect()
    }
    assert got == {1: None, 2: None, 3: 5, 4: None}


def test_dynamic_bin_with_timespan_errors_clearly(spark):
    m = _dyn_engine(spark, [{"x": 5}])
    with pytest.raises(ValueError, match="timespan size"):
        m.query("dyn.c | project v = bin(x, 1h)")


def test_dynamic_casts_and_bin(spark):
    """Casts over dynamic values follow Val::cast
    (interpreter/mod.rs:350): tobool is truthiness (tobool("7") true),
    toint maps null→0 / bool→0,1 / parses integer strings / truncates
    floats; tostring renders null as "null"; unsupported per-row
    combos are missing. bin() bins the numeric payload."""
    m = _dyn_engine(spark, [
        {"i": 1, "x": 5}, {"i": 2, "x": "7"}, {"i": 3, "x": 2.5},
        {"i": 4, "x": True}, {"i": 5, "x": None}, {"i": 6},
        {"i": 7, "x": "2.5"}, {"i": 8, "x": [1]},
    ])
    def col(q):
        return {
            int(str(json.loads(s)["i"])): json.loads(s).get("v")
            for s in m.query(q).toJSON().collect()
        }
    assert col("dyn.c | project i, v = toint(x)") == {
        1: 5, 2: 7, 3: 2, 4: 1, 5: 0, 6: None, 7: None, 8: None,
    }
    assert col("dyn.c | project i, v = toreal(x)") == {
        1: 5.0, 2: 7.0, 3: 2.5, 4: 1.0, 5: 0.0, 6: None, 7: 2.5, 8: None,
    }
    assert col("dyn.c | project i, v = tobool(x)") == {
        1: True, 2: True, 3: True, 4: True, 5: False, 6: None, 7: True, 8: True,
    }
    s = col("dyn.c | project i, v = tostring(x)")
    assert (s[1], s[2], s[4], s[5], s[8]) == ("5", "7", "true", "null", None)
    assert col("dyn.c | project i, v = bin(x, 2)") == {
        1: 4, 2: None, 3: 2, 4: None, 5: None, 6: None, 7: None, 8: None,
    }


def test_json_dynamic_dir_static_fields(spark, tmp_path):
    """static_fields rename-at-scan works on the dynamic connector like
    every other source type."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import JsonDynamicDirSource

    (tmp_path / "ev.jsonl").write_text('{"ts": 1, "v": "a"}\n{"ts": 2}\n')
    m = MisoSpark(spark)
    m.registry.register(
        "dyn2",
        JsonDynamicDirSource(
            str(tmp_path), static_fields={"ev": {"@time": "ts"}}
        ),
    )
    got = sorted(
        json.dumps(json.loads(s), sort_keys=True)
        for s in m.query("dyn2.ev | where @time == 2").toJSON().collect()
    )
    assert got == ['{"@time": 2}']


def test_read_json_dynamic_stream(spark, tmp_path):
    """Streaming dynamic ingest: dynamic comparisons run per
    micro-batch; explicit keys are required (no discovery action on a
    stream)."""
    from miso_spark.streaming import run_to_memory

    d = tmp_path / "stream_in"
    d.mkdir()
    (d / "a.jsonl").write_text('{"x": 5}\n{"x": "5"}\n\n{"x": 7}\n')
    stream = dyn.read_json_dynamic_stream(spark, str(d), keys=["x"])
    assert stream.isStreaming
    out = stream.filter(
        dyn.vcompare("gt", dyn.sort_key(F.col("x")), dyn.literal_sort_key(4))
    ).select(F.to_json("x").alias("x"))
    got = sorted(r["x"] for r in run_to_memory(out, "dyn_stream", "append").collect())
    # total order: 5 > 4 and 7 > 4 numerically, and the STRING "5"
    # ranks above all numbers — all three pass; the blank line drops
    assert got == ['"5"', "5", "7"]
    with pytest.raises(ValueError, match="explicit keys"):
        dyn.read_json_dynamic_stream(spark, str(d), keys=[])


def test_union_typed_with_dynamic(spark):
    """union across a typed and a dynamic collection lifts the typed
    side's conflicting columns to variant instead of failing."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("typed", spark.createDataFrame([(1, "a")], "x long, s string"))
    mem.put("dyn", dyn.ingest_json_dynamic(spark, [{"x": "mixed"}, {"x": 2}]))
    m.registry.register("u", mem)
    got = sorted(
        json.dumps(json.loads(r), sort_keys=True)
        for r in m.query("u.typed | union (u.dyn)").toJSON().collect()
    )
    assert got == sorted([
        '{"s": "a", "x": 1}', '{"x": "mixed"}', '{"x": 2}',
    ])
    # symmetric direction
    assert m.query("u.dyn | union (u.typed)").count() == 3


def test_union_typed_type_conflict_lifts_to_variant(spark):
    """union of two TYPED collections whose shared column has
    irreconcilable types (string vs long — the reference's
    union_different_timestamp_field shape, where its untyped rows
    just keep their own values) lifts both sides to variant instead
    of a lossy or ANSI-failing coercion."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("a", spark.createDataFrame([("2008-07-31T21:42:52Z",)], "t string"))
    mem.put("b", spark.createDataFrame([(1440670452,)], "t long"))
    m.registry.register("u", mem)
    got = sorted(
        json.dumps(json.loads(r), sort_keys=True)
        for r in m.query("u.a | union (u.b)").toJSON().collect()
    )
    assert got == sorted(['{"t": "2008-07-31T21:42:52Z"}', '{"t": 1440670452}'])
    # numeric widening is NOT a conflict: stays a plain double column
    mem.put("c", spark.createDataFrame([(1,)], "t long"))
    mem.put("d", spark.createDataFrame([(2.5,)], "t double"))
    out = m.query("u.c | union (u.d)")
    assert dict(out.dtypes)["t"] == "double" and out.count() == 2


def test_query_rows_decodes_variant_values(spark):
    """The incremental row API (CLI/SSE analog) surfaces dynamic cells
    as native Python values — a dynamic string is '5', not its raw
    JSON text '"5"'."""
    m = _dyn_engine(spark, [{"x": 5}, {"x": "5"}, {"x": [1, 2]}, {"x": None}])
    got = sorted(
        (str(type(r.get("x")).__name__), r.get("x"))
        for r in m.query_rows("dyn.c | project x")
    )
    assert got == [
        ("NoneType", None), ("int", 5), ("list", [1, 2]), ("str", "5"),
    ]


def test_dynamic_join_keys(spark):
    """Joins on dynamic keys: 1 and 1.0 canonicalize to the same key,
    "1" stays separate, present nulls match each other, rows MISSING
    the key match nothing (the reference skips them when building its
    hash table)."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("l", dyn.ingest_json_dynamic(spark, [
        {"k": 1, "lv": "a"}, {"k": "1", "lv": "b"},
        {"k": None, "lv": "c"}, {"lv": "d"},
    ]))
    mem.put("r", dyn.ingest_json_dynamic(spark, [
        {"k": 1.0, "rv": "x"}, {"k": None, "rv": "y"}, {"k": "1", "rv": "z"},
    ]))
    m.registry.register("dyn", mem)
    got = sorted(
        (json.loads(s).get("lv"), json.loads(s).get("rv"))
        for s in m.query("dyn.l | join (dyn.r) on k").toJSON().collect()
    )
    assert got == [("a", "x"), ("b", "z"), ("c", "y")]
    # DELIBERATE divergence (SURVEY §3): a LEFT/OUTER join KEEPS a
    # left row whose key is MISSING (unmatched, right side null) —
    # the reference's collect loop `continue`s past it (join.rs:183),
    # silently DELETING the row from a left join, a shape its own
    # suite never tests (join_outer_with_nulls uses present-nulls).
    # Left-join semantics say preserved rows survive; correct results
    # beat bug-parity.
    left = sorted(
        (json.loads(s).get("lv"), json.loads(s).get("rv"))
        for s in m.query("dyn.l | join kind=left (dyn.r) on k")
        .toJSON().collect()
    )
    assert left == [("a", "x"), ("b", "z"), ("c", "y"), ("d", None)]
    outer = sorted(
        (json.loads(s).get("lv"), json.loads(s).get("rv"))
        for s in m.query("dyn.l | join kind=outer (dyn.r) on k")
        .toJSON().collect()
    )
    assert outer == [("a", "x"), ("b", "z"), ("c", "y"), ("d", None)]


def test_dynamic_expand_mixed_arrays(spark):
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put(
        "c",
        dyn.ingest_json_dynamic(
            spark,
            [{"a": 1, "b": [10, 20]}, {"a": 2, "b": ["x"]}, {"a": 3, "b": {}},
             {"a": 4, "b": "scalar"}, {"a": 5}],
        ),
    )
    m.registry.register("dyn", mem)
    got = sorted(
        (json.loads(s) for s in m.query("dyn.c | mv-expand b").toJSON().collect()),
        key=lambda r: (r["a"], str(r.get("b"))),
    )
    # row 3 ({} object) drops; scalar + missing pass through
    assert got == [
        {"a": 1, "b": 10}, {"a": 1, "b": 20}, {"a": 2, "b": "x"},
        {"a": 4, "b": "scalar"}, {"a": 5},
    ]


def test_mixed_type_sort_and_group_keys_succeed(spark):
    """Deliberate TypeTracker divergence, pinned (SURVEY §3): the
    reference ERRORS on a sort/summarize key holding differing types
    across rows ("cannot operate over differing types",
    type_tracker.rs:27-33 via sort.rs:317 / summarize.rs:154); this
    engine instead succeeds with the reference's own cross-type total
    order (value/mod.rs:147). A stray string in one row of 100 TB
    should not kill the job when the engine already defines the order
    for comparisons."""
    rows = [{"k": 5, "v": 1}, {"k": "five", "v": 2}, {"k": True, "v": 3},
            {"k": 7, "v": 4}]
    df = dyn.ingest_json_dynamic(spark, rows)

    # sort: bool < numbers < strings (reference class ranks)
    ordered = [json.loads(r["k"]) if r["k"] is not None else None
               for r in df.orderBy(dyn.order_by_key(F.col("k")).asc())
               .select(F.to_json(F.col("k")).alias("k")).collect()]
    assert ordered == [True, 5, 7, "five"]

    # summarize by the mixed key: one group per distinct typed value
    grouped = df.groupBy(dyn.sort_key(F.col("k")).alias("g")).count()
    assert grouped.count() == 4


def test_dynamic_parquet_round_trip_operator_suite(spark, tmp_path_factory):
    """VARIANT at rest (r9): write a dynamic table to parquet
    (DynamicParquetDirSource) and re-run the dynamic operator surface
    over the round-trip — every query must return exactly what the
    direct (ingest) dynamic table returns, including missing-vs-null
    and cross-type semantics."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import DynamicParquetDirSource, MemorySource

    rows = [
        {"x": 5, "tag": "a", "arr": [1, 2]},
        {"x": "5", "tag": "b"},
        {"x": True, "tag": "a", "arr": ["s"]},
        {"x": None, "tag": "b"},
        {"tag": "a"},
        {"x": 7.5, "tag": None},
    ]
    live = dyn.ingest_json_dynamic(spark, rows)

    d = tmp_path_factory.mktemp("dynrt")
    pq = DynamicParquetDirSource(str(d))
    pq.write(live, "c")

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("c", live)
    m.registry.register("mem", mem)
    m.registry.register("pq", pq)

    queries = [
        "| where x == 5",                      # typed eq (fast path)
        '| where x == "5"',                    # string eq, not numeric 5
        "| where x > 2",                       # cross-type total order
        "| where exists(x)",                   # present null IS present
        "| where not(exists(x))",              # missing key only
        "| where x == 5 or x == 7.5",
        "| summarize c = count() by tag",      # null group key drops
        "| sort by x nulls first | project tag",
        "| mv-expand kind=array arr | project arr",
        "| extend y = x + 1 | where exists(y) | project y",
    ]
    for tail in queries:
        a = sorted(m.query("mem.c " + tail).toJSON().collect())
        b = sorted(m.query("pq.c " + tail).toJSON().collect())
        assert a == b, (tail, a, b)
        # every query must exercise at least one row to mean anything
    assert sorted(m.query("pq.c | where not(exists(x))").toJSON().collect()) == ['{"tag":"a"}']


def test_dynamic_cast_missing_poisons_predicates(spark):
    """r12 differential find: a cast over a MISSING dynamic value
    evaluates as missing, and every predicate over it poisons
    (expr_eval.rs eval! → eval_to_bool! drops the row) — including the
    forms that KEEP a present null under the total order (!=, <=,
    not-in, !between, == null). The cast's typed NULL must not be
    mistaken for a present null: present nulls can't reach these
    outputs (Val::cast maps Null to 0/"null"/false)."""
    m = _dyn_engine(spark, [
        {"i": 1, "x": 5},
        {"i": 2},            # x missing → every toint-predicate drops it
        {"i": 3, "x": None}, # PRESENT null → toint = 0: total order applies
    ])

    def ids(q):
        return sorted(
            int(str(json.loads(s)["i"])) for s in m.query(q).toJSON().collect()
        )

    assert ids("dyn.c | extend v = toint(x) | where not(v in (5))") == [3]
    assert ids("dyn.c | extend v = toint(x) | where v != 5") == [3]
    assert ids("dyn.c | extend v = toint(x) | where v <= 5") == [1, 3]
    assert ids("dyn.c | extend v = toint(x) | where v !between (6 .. 9)") == [1, 3]
    assert ids("dyn.c | extend v = toint(x) | where v == null") == []
    assert ids('dyn.c | extend s = tostring(toint(x)) | where not(s in ("5"))') == [3]
    # exists() stays a definite boolean: missing → false, so
    # not(exists) keeps exactly the missing row
    assert ids("dyn.c | extend v = toint(x) | where not(exists(v))") == [2]
    # the metadata tag survives rename and project — the predicate
    # still poisons on the missing row after either reshaping
    assert ids("dyn.c | extend v = toint(x) | project-rename w = v | where w != 5") == [3]
    assert ids("dyn.c | extend v = toint(x) | project i, v | where v != 5") == [3]
    # dcount over the cast: missing contributes NO bucket (summarize.rs
    # skips missing accumulator args); 5 and 0 are the two values
    got = json.loads(
        m.query("dyn.c | summarize dc = dcount(toint(x))").toJSON().collect()[0]
    )
    assert got["dc"] == 2


def test_dynamic_dcount_cast_arg_split_equals_unsplit(spark):
    """The union-split dcount partial (keep_null_keys) groups by the
    dcount arg and the merge re-runs dcount over the KEY COLUMN — for
    a cast arg (missing-as-null), the key's metadata tag must carry
    the missing semantics so the merge SKIPS the preserved null group
    exactly like the unsplit plan (r12: the unsplit plan stopped
    counting missing as a bucket). Values: 1, 2, 0 (present null casts
    to 0), missing ×2 skipped → dc = 3 on both plans."""
    from miso_spark import dynamic as dyn
    from miso_spark import plan as P
    from miso_spark.compiler import Compiler
    from miso_spark.kql import parse_kql
    from miso_spark.rewrite import optimize_steps
    from miso_spark.sources import MemorySource, SourceRegistry

    mem = MemorySource()
    mem.put("a", dyn.ingest_json_dynamic(spark, [{"x": 1}, {"x": 2}, {}, {"x": None}]))
    mem.put("b", dyn.ingest_json_dynamic(spark, [{"x": 1}, {}]))
    rig = Compiler(SourceRegistry(spark).register("m", mem))
    plan = parse_kql("m.a | union (m.b) | summarize dc = dcount(toint(x)), n = count()")
    unopt = [r.asDict() for r in rig.run(P.Plan(plan.steps)).collect()]
    opt = [r.asDict() for r in rig.run(P.Plan(optimize_steps(plan.steps))).collect()]
    assert unopt == opt == [{"dc": 3, "n": 6}]


def test_extract_over_dynamic_no_match_vs_missing(spark):
    """extract over a dynamic source keeps the reference's two NULL
    worlds apart (ADVICE r12→13): a no-match on a PRESENT string is a
    present Value::Null (string_ops.rs:30-32 returns
    Ok(Some(Value::Null))) — comparisons see the total-order smallest,
    so `not(f == "7")` KEEPS the row — while a missing source
    propagates missing (interpreter/mod.rs:406-409 Val::not_exist),
    poisoning the predicate and DROPPING the row."""
    m = _dyn_engine(
        spark,
        [
            {"id": 1, "s": "code: 7"},  # match → "7" → dropped by not(==)
            {"id": 2, "s": "no digits"},  # no-match → present Null → KEPT
            {"id": 3},  # s missing → f missing → DROPPED
            {"id": 4, "s": "code: 9"},  # match → "9" → kept
        ],
    )
    q = (
        'dyn.c | extend f = extract("code: (\\\\d+)", 1, s)'
        ' | where not(f == "7") | project id'
    )
    got = sorted(json.loads(x)["id"] for x in m.query(q).toJSON().collect())
    assert got == [2, 4]
    # f == null is a present-null test (tests.rs filter_eq_null): only
    # the no-match row matches; the missing row does not
    q2 = (
        'dyn.c | extend f = extract("code: (\\\\d+)", 1, s)'
        " | where f == null | project id"
    )
    got2 = [json.loads(x)["id"] for x in m.query(q2).toJSON().collect()]
    assert got2 == [2]


def test_extract_over_dynamic_in_and_cast(spark):
    """Composed consumers of the variant extract result: `in` with a
    null literal matches the no-match present Null (In is a chain of
    the reference's null-aware equality) but a missing base poisons the
    whole In; tostring renders the present Null as "null"
    (Val::cast, interpreter/mod.rs:350-404) while a missing source
    stays missing."""
    m = _dyn_engine(
        spark,
        [
            {"id": 1, "s": "code: 7"},
            {"id": 2, "s": "no digits"},
            {"id": 3},
        ],
    )
    q = (
        'dyn.c | extend f = extract("code: (\\\\d+)", 1, s)'
        ' | where f in ("7", null) | project id'
    )
    got = sorted(json.loads(x)["id"] for x in m.query(q).toJSON().collect())
    assert got == [1, 2]
    q2 = (
        'dyn.c | extend g = tostring(extract("code: (\\\\d+)", 1, s))'
        " | project id, g"
    )
    rows = {
        json.loads(x)["id"]: json.loads(x).get("g")
        for x in m.query(q2).toJSON().collect()
    }
    assert rows[1] == "7"
    assert rows[2] == "null"  # present Null renders as "null"
    assert 3 not in rows or rows[3] is None  # missing stays missing


def test_join_lift_preserves_matched_present_nulls(spark):
    """The fillable-side variant lift on dynamic-model joins must not
    flip MATCHED rows' genuine typed NULLs into missing (ADVICE
    r12→13): pre-join typed NULLs encode as present VOID variants, so
    `rv == null` still matches them and `not(rv == "x")` keeps them,
    while UNMATCHED rows' join null-fill stays SQL NULL (missing) and
    poisons predicates."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("l", dyn.ingest_json_dynamic(spark, [
        {"k": 1, "lv": "a"}, {"k": 2, "lv": "b"}, {"k": 3, "lv": "c"},
    ]))
    # typed right side: k=1 carries a genuine NULL rv (present null),
    # k=2 carries "x", k=3 has no row (unmatched → missing fill)
    mem.put("r", spark.createDataFrame([(1, None), (2, "x")], "k long, rv string"))
    m.registry.register("j", mem)
    # matched present-null row keeps `rv == null`; the unmatched row's
    # fill is missing and does NOT match the null literal
    got = sorted(
        json.loads(s)["lv"]
        for s in m.query("j.l | join kind=left (j.r) on k | where rv == null")
        .toJSON().collect()
    )
    assert got == ["a"]
    # not(rv == "x"): present-null a kept (Null == "x" is false),
    # matched x dropped, missing fill c poisoned → dropped
    got2 = sorted(
        json.loads(s)["lv"]
        for s in m.query('j.l | join kind=left (j.r) on k | where not(rv == "x")')
        .toJSON().collect()
    )
    assert got2 == ["a"]


def test_outer_join_typed_side_not_lifted_by_first_lift(spark):
    """Full outer join with a DYNAMIC left and a fully-TYPED right:
    only the right (fillable against dynamic-left) lifts; the left's
    dynamic test must be snapshotted BEFORE the right lift so the
    typed right doesn't misread as dynamic and lift the left too
    (ADVICE r12→13). Observable: the typed right's own columns keep
    present-null total-order semantics on its preserved unmatched
    rows ONLY via variant missing-fill of LEFT columns — i.e. right's
    unmatched row survives `not(lv == "a")` poisoning check."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("l", dyn.ingest_json_dynamic(spark, [{"k": 1, "lv": "a"}]))
    mem.put("r", spark.createDataFrame([(1, "x"), (9, "y")], "k long, rv string"))
    m.registry.register("j", mem)
    df = m.query("j.l | join kind=outer (j.r) on k")
    # the left frame was dynamic on input; right-unmatched rows fill
    # lv as MISSING → poisons not(lv == "a")
    got = sorted(
        json.loads(s).get("rv")
        for s in m.query('j.l | join kind=outer (j.r) on k | where not(lv == "a")')
        .toJSON().collect()
    )
    assert got == []  # "x" row: lv == "a" → dropped; "y" row: missing → poisoned
    assert df.count() == 2


def test_union_one_sided_lift_keeps_bearing_side_present_nulls(spark):
    """The one-sided union lift against a dynamic branch encodes the
    column-BEARING side's genuine typed NULLs as present VOID variants
    (kept by `not(s == "x")`, matched by `s == null`), while rows from
    the column-LACKING branch fill as MISSING (poisoning)."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("typed", spark.createDataFrame(
        [(1, "x"), (2, None)], "id long, s string"))
    mem.put("dyn", dyn.ingest_json_dynamic(spark, [{"id": 3}]))
    m.registry.register("u", mem)
    got = sorted(
        json.loads(r)["id"]
        for r in m.query('u.typed | union (u.dyn) | where not(s == "x")')
        .toJSON().collect()
    )
    # id=2's present null survives; id=3's missing fill poisons
    assert got == [2]
    got2 = sorted(
        json.loads(r)["id"]
        for r in m.query("u.typed | union (u.dyn) | where s == null")
        .toJSON().collect()
    )
    assert got2 == [2]


def test_extract_over_dynamic_summarize_and_sort(spark):
    """Composed consumers of the variant extract result beyond
    predicates: dcount counts the no-match PRESENT nulls as one
    distinct value and skips missing (tests.rs dcount_with_nulls);
    summarize-by drops BOTH null worlds pre-grouping
    (summarize.rs:151); sort places present-null and missing together
    under the nulls directive (sort.rs arrow nulls)."""
    m = _dyn_engine(
        spark,
        [
            {"id": 1, "s": "code: 7"},
            {"id": 2, "s": "no digits"},  # present null
            {"id": 3},  # missing
            {"id": 4, "s": "code: 9"},
            {"id": 5, "s": "words"},  # present null
        ],
    )
    q = 'd.c | extend f = extract("code: (\\\\d+)", 1, s)'.replace("d.c", "dyn.c")
    row = m.query(q + " | summarize dc = dcount(f), n = count()").collect()[0]
    assert (row["dc"], row["n"]) == (3, 5)  # "7", "9", one null bucket
    groups = sorted(
        (str(r["f"]), r["n"])
        for r in m.query(q + " | summarize n = count() by f").collect()
    )
    assert groups == [('"7"', 1), ('"9"', 1)]
    ids = [
        json.loads(x)["id"]
        for x in m.query(q + " | sort by f asc nulls first | project id")
        .toJSON().collect()
    ]
    assert ids[3:] == [1, 4] and sorted(ids[:3]) == [2, 3, 5]


def test_extract_over_dynamic_as_join_key(spark):
    """The variant extract result as a JOIN key: a captured group
    matches its value, a no-match PRESENT null matches the other
    side's present null (the reference's hash join hashes Value::Null
    like any value — tests.rs join_with_null_keys), and a missing
    source matches nothing."""
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    mem.put("l", dyn.ingest_json_dynamic(spark, [
        {"id": 1, "s": "k: a"}, {"id": 2, "s": "nope"}, {"id": 3},
    ]))
    mem.put("r", dyn.ingest_json_dynamic(spark, [
        {"f": "a", "rv": 10}, {"f": None, "rv": 20},
    ]))
    m.registry.register("dj", mem)
    out = sorted(
        (json.loads(x)["id"], json.loads(x).get("rv"))
        for x in m.query(
            'dj.l | extend f = extract("k: (.+)", 1, s)'
            " | join kind=inner (dj.r) on f | project id, rv"
        ).toJSON().collect()
    )
    assert out == [(1, 10), (2, 20)]
