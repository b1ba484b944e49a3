"""Property-based differential test for the dynamic (VARIANT) value
semantics: a ~40-line pure-Python model of the reference's Value rules
(total order: value/mod.rs:147-207; to_bool: value/mod.rs:479; missing
propagation: interpreter/mod.rs impl_cmp) is exercised against the
Spark implementation (miso_spark/dynamic.py) on randomized mixed-type
rows. Hypothesis shrinks any divergence to a minimal counterexample.

One Spark job per property (all examples evaluated in a single
DataFrame pass) keeps the suite fast.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from miso_spark import dynamic as dyn

# MISSING is a sentinel distinct from None (= present JSON null)
MISSING = object()

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                               whitelist_characters=" _-"),
        max_size=12,
    ),
)
values = st.one_of(
    scalars,
    st.lists(scalars, max_size=4),
    st.dictionaries(
        st.text(alphabet="abcxyz", min_size=1, max_size=4), scalars, max_size=3
    ),
)
maybe_missing = st.one_of(st.just(MISSING), values)


def model_rank(v) -> int:
    """Reference type-class rank (value/mod.rs:147)."""
    if v is None:
        return 0
    if isinstance(v, bool):
        return 1
    if isinstance(v, (int, float)):
        return 2
    if isinstance(v, str):
        return 5
    if isinstance(v, list):
        return 6
    return 7


def _canon(v):
    """Canonical JSON the variant machinery produces (floats that are
    integral print as integers — DECIMAL(p,0))."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return int(v)
    if isinstance(v, list):
        return [_canon(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in sorted(v.items())}
    return v


def model_cmp(a, b):
    """Three-way compare per the reference total order; None result =
    missing operand (SQL unknown)."""
    if a is MISSING or b is MISSING:
        return None
    ra, rb = model_rank(a), model_rank(b)
    if ra != rb:
        return -1 if ra < rb else 1
    if ra == 0:
        return 0
    if ra == 1:
        return (a > b) - (a < b)
    if ra == 2:
        fa, fb = float(a), float(b)
        return (fa > fb) - (fa < fb)
    if ra == 5:
        return (a > b) - (a < b)
    # arrays/objects: the implementation compares canonical JSON —
    # model the same (equality is exact; ordering is the documented
    # best-effort canonical-JSON order)
    # ensure_ascii=False: Spark's to_json emits raw UTF-8, and UTF-8
    # byte order equals code-point order — escaped \uXXXX forms would
    # sort differently
    ja = json.dumps(_canon(a), sort_keys=True, separators=(",", ":"),
                    ensure_ascii=False)
    jb = json.dumps(_canon(b), sort_keys=True, separators=(",", ":"),
                    ensure_ascii=False)
    return (ja > jb) - (ja < jb)


def model_bool(v):
    """Value::to_bool; None result = missing operand."""
    if v is MISSING:
        return None
    if v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    return len(v) > 0


def _rows_df(spark, pairs):
    """One DataFrame with variant columns a, b — one row per example."""
    lines = []
    for a, b in pairs:
        row = {}
        if a is not MISSING:
            row["a"] = a
        if b is not MISSING:
            row["b"] = b
        row["i"] = len(lines)
        lines.append(row)
    return dyn.ingest_json_dynamic(spark, lines, keys=["a", "b", "i"])


@pytest.fixture(scope="module")
def collected_pairs():
    """Hypothesis generates pairs here (fast, no Spark); the module
    fixtures below evaluate them in ONE Spark job each."""
    pairs = []

    @settings(max_examples=300, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(maybe_missing, maybe_missing)
    def gen(a, b):
        pairs.append((a, b))

    gen()
    return pairs


def test_vcompare_matches_reference_model(spark, collected_pairs):
    df = _rows_df(spark, collected_pairs)
    ka, kb = dyn.sort_key(F.col("a")), dyn.sort_key(F.col("b"))
    out = {
        int(str(r["i"])): r
        for r in df.select(
            F.try_variant_get("i", "$", "int").alias("i"),
            *[dyn.vcompare(op, ka, kb).alias(op)
              for op in ("eq", "ne", "lt", "lte", "gt", "gte")],
        ).collect()
    }
    preds = {
        "eq": lambda c: c == 0, "ne": lambda c: c != 0,
        "lt": lambda c: c < 0, "lte": lambda c: c <= 0,
        "gt": lambda c: c > 0, "gte": lambda c: c >= 0,
    }
    for i, (a, b) in enumerate(collected_pairs):
        c = model_cmp(a, b)
        for op, pred in preds.items():
            expect = None if c is None else pred(c)
            got = out[i][op]
            assert got == expect, (
                f"{op}({a!r}, {b!r}): spark={got} model={expect}"
            )


def test_vbool_matches_reference_model(spark, collected_pairs):
    df = _rows_df(spark, collected_pairs)
    out = {
        int(str(r["i"])): r["vb"]
        for r in df.select(
            F.try_variant_get("i", "$", "int").alias("i"),
            dyn.vbool(F.col("a")).alias("vb"),
        ).collect()
    }
    for i, (a, _) in enumerate(collected_pairs):
        expect = model_bool(a)
        assert out[i] == expect, f"to_bool({a!r}): spark={out[i]} model={expect}"


def model_add(a, b):
    """Val::add (interpreter/mod.rs:234 + impl_op): string+string
    concat, int+int stays int, numeric mixes go float; missing or
    unsupported → missing (the engine's stand-in for the reference's
    per-row abort)."""
    if a is MISSING or b is MISSING:
        return None
    if isinstance(a, str) and isinstance(b, str):
        return a + b
    for v in (a, b):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
    if isinstance(a, int) and isinstance(b, int):
        return a + b
    return float(a) + float(b)


def test_varithmetic_add_matches_reference_model(spark, collected_pairs):
    df = _rows_df(spark, collected_pairs)
    out = {
        int(str(r["i"])): (None if r["c"] is None else json.loads(r["c"]))
        for r in df.select(
            F.try_variant_get("i", "$", "int").alias("i"),
            F.to_json(
                dyn.varithmetic("add", F.col("a"), F.col("b"))
            ).alias("c"),
        ).collect()
    }
    for i, (a, b) in enumerate(collected_pairs):
        expect = model_add(a, b)
        got = out[i]
        if isinstance(expect, float) and isinstance(got, (int, float)):
            assert got == pytest.approx(expect, rel=1e-6, abs=1e-6), (a, b)
        else:
            assert _canon(got) == _canon(expect), f"add({a!r}, {b!r}): {got} vs {expect}"


def model_or(a, b):
    """expr_eval.rs:63-64 — Rust || over eval_to_bool! results:
    left missing → missing; left true short-circuits; else right
    missing → missing; else right."""
    la = model_bool(a)
    if la is None:
        return None
    if la:
        return True
    return model_bool(b)


def model_and(a, b):
    la = model_bool(a)
    if la is None:
        return None
    if not la:
        return False
    return model_bool(b)


def test_and_or_short_circuit_matches_reference_model(spark, collected_pairs):
    """The PRODUCTION-compiled and/or (exprs.compile_expr over BinOp
    with the frame's schema — the exact path `where a or b` takes)
    must follow the reference's short-circuit + poisoning, not SQL
    Kleene logic."""
    from miso_spark.exprs import BinOp, Field, compile_expr

    df = _rows_df(spark, collected_pairs)
    fa, fb = Field.of("a"), Field.of("b")
    out = {
        int(str(r["i"])): r
        for r in df.select(
            F.try_variant_get("i", "$", "int").alias("i"),
            compile_expr(BinOp("or", fa, fb), df.schema).alias("o"),
            compile_expr(BinOp("and", fa, fb), df.schema).alias("n"),
        ).collect()
    }
    for i, (a, b) in enumerate(collected_pairs):
        assert out[i]["o"] == model_or(a, b), f"or({a!r}, {b!r})"
        assert out[i]["n"] == model_and(a, b), f"and({a!r}, {b!r})"


def model_cast_int(v):
    """Val::cast Int arm (interpreter/mod.rs:374): null→0, bool→0/1,
    numbers truncate toward zero, strings parse as i64 (strict); other
    types / unparseable → missing (reference aborts)."""
    if v is MISSING:
        return None
    if v is None:
        return 0
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        if abs(v) >= 2.0**63:
            return None  # out of i64 range -> missing (no per-row abort)
        return int(v)  # trunc toward zero
    if isinstance(v, str):
        # Rust i64::parse accepts ASCII digits only — Python's int()
        # would also parse Unicode digits like '꯳'
        import re

        if re.fullmatch(r"[+-]?[0-9]+", v):
            return int(v)
        return None
    return None


def model_cast_bool(v):
    return model_bool(v)


def test_dynamic_casts_match_reference_model(spark, collected_pairs):
    """toint/tobool over randomized dynamic values vs the Val::cast
    model, compiled through the production expression path."""
    from miso_spark.exprs import Cast, Field, compile_expr

    df = _rows_df(spark, collected_pairs)
    out = {
        int(str(r["i"])): r
        for r in df.select(
            F.try_variant_get("i", "$", "int").alias("i"),
            compile_expr(Cast("int", Field.of("a")), df.schema).alias("ci"),
            compile_expr(Cast("bool", Field.of("a")), df.schema).alias("cb"),
        ).collect()
    }
    for i, (a, _) in enumerate(collected_pairs):
        assert out[i]["ci"] == model_cast_int(a), f"toint({a!r})"
        assert out[i]["cb"] == model_cast_bool(a), f"tobool({a!r})"


def test_sort_matches_model_total_order(spark, collected_pairs):
    """Sorting the generated LEFT values must equal the model's sorted
    order (present values only — a total order has no ties beyond
    model_cmp==0, which sorts adjacently either way)."""
    import functools

    vals = [a for a, _ in collected_pairs if a is not MISSING]
    df = dyn.ingest_json_dynamic(
        spark, [{"v": v, "i": i} for i, v in enumerate(vals)], keys=["i", "v"]
    )
    got = [
        json.loads(r["j"]) if r["j"] is not None else None
        for r in df.orderBy(dyn.sort_key(F.col("v")).asc())
        .select(F.to_json("v").alias("j")).collect()
    ]
    expect = [
        _canon(v)
        for v in sorted(vals, key=functools.cmp_to_key(model_cmp))
    ]
    assert [_canon(g) for g in got] == expect


def model_extract(v, pattern: str, grp: int):
    """extract over a dynamic value (r13): missing source → missing
    (interpreter/mod.rs:406-409); present NON-string → missing (the
    reference bails the query — dynamic.as_string's documented
    vectorized convention); no-match on a present string → PRESENT
    null (string_ops.rs:30-32); match → the group string."""
    import re

    if v is MISSING or not isinstance(v, str):
        return MISSING
    m = re.search(pattern, v)
    if m is None:
        return None
    return m.group(grp)


def test_extract_over_dynamic_matches_reference_model(spark, collected_pairs):
    """extract over randomized dynamic values, compiled through the
    production path (a VARIANT result: SQL NULL = missing, VOID =
    present null), vs the model — including the predicate composition
    `not(f == <s>)` where present-null KEEPS the row and missing
    poisons it."""
    from miso_spark.exprs import (
        BinOp, Extract, Field, Lit, Not, compile_expr,
    )

    pat, grp = "([0-9]+)", 1
    df = _rows_df(spark, collected_pairs)
    f = Extract(Lit(pat), Lit(grp), Field.of("a"))
    fc = compile_expr(f, df.schema)
    pred = compile_expr(Not(BinOp("eq", f, Lit("7"))), df.schema)
    out = {
        int(str(r["i"])): r
        for r in df.select(
            F.try_variant_get("i", "$", "int").alias("i"),
            fc.isNull().alias("missing"),
            F.when(fc.isNotNull(), F.is_variant_null(fc)).alias("vnull"),
            F.try_variant_get(fc, "$", "string").alias("s"),
            pred.alias("keep"),
        ).collect()
    }
    for i, (a, _) in enumerate(collected_pairs):
        want = model_extract(a, pat, grp)
        r = out[i]
        if want is MISSING:
            assert r["missing"], f"extract({a!r}) should be missing"
            # missing poisons not(f == "7") → SQL null (row dropped)
            assert r["keep"] is None, f"not(extract({a!r}) == '7')"
        elif want is None:
            assert r["vnull"] is True, f"extract({a!r}) should be present null"
            # present Null != "7" under the total order → row KEPT
            assert r["keep"] is True, f"not(extract({a!r}) == '7')"
        else:
            assert r["s"] == want, f"extract({a!r})"
            assert r["keep"] is (want != "7")
