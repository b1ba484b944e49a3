"""Property-based equivalence: random expression trees rendered to BOTH
KQL (through lexer → parser → compiler → Spark) and SQL (DuckDB),
results compared row-for-row. Integer-only arithmetic keeps results
exact; division is excluded (ANSI x/0 error vs null semantics differ).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from miso_spark.compiler import Compiler
from miso_spark.kql import parse_kql
from miso_spark.sources import SourceRegistry
from tests.conftest import SF_DIR

INT_COLS = ["n_nationkey", "n_regionkey"]


# ---- expression AST as tuples, rendered to KQL and SQL --------------------

ints = st.integers(min_value=-9, max_value=12)


def int_expr(depth: int):
    atom = st.one_of(
        st.sampled_from(INT_COLS).map(lambda c: ("col", c)),
        ints.map(lambda v: ("lit", v)),
    )
    if depth <= 0:
        return atom
    sub = int_expr(depth - 1)
    return st.one_of(
        atom,
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub).map(
            lambda t: ("arith", *t)
        ),
        st.tuples(bool_expr(depth - 1), sub, sub).map(lambda t: ("iff", *t)),
        st.tuples(sub, st.integers(min_value=1, max_value=5)).map(
            lambda t: ("bin", *t)
        ),
    )


def bool_expr(depth: int):
    cmp = st.tuples(
        st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
        int_expr(max(depth - 1, 0)),
        int_expr(max(depth - 1, 0)),
    ).map(lambda t: ("cmp", *t))
    if depth <= 0:
        return cmp
    sub = bool_expr(depth - 1)
    return st.one_of(
        cmp,
        st.tuples(st.sampled_from(["and", "or"]), sub, sub).map(lambda t: ("bool", *t)),
        sub.map(lambda b: ("not", b)),
        st.tuples(int_expr(depth - 1), ints, ints).map(
            lambda t: ("between", t[0], min(t[1], t[2]), max(t[1], t[2]))
        ),
        st.tuples(int_expr(depth - 1), st.lists(ints, min_size=1, max_size=4)).map(
            lambda t: ("in", *t)
        ),
    )


def render(node, sql: bool) -> str:
    kind = node[0]
    if kind == "col":
        return node[1]
    if kind == "lit":
        v = node[1]
        return f"({v})" if sql and v < 0 else str(v)
    if kind == "arith":
        _, op, a, b = node
        return f"({render(a, sql)} {op} {render(b, sql)})"
    if kind == "iff":
        _, c, a, b = node
        if sql:
            return f"(CASE WHEN {render(c, sql)} THEN {render(a, sql)} ELSE {render(b, sql)} END)"
        return f"iff({render(c, sql)}, {render(a, sql)}, {render(b, sql)})"
    if kind == "bin":
        _, a, size = node
        if sql:
            return f"(FLOOR({render(a, sql)} * 1.0 / {size}) * {size})"
        return f"bin({render(a, sql)}, {size})"
    if kind == "cmp":
        _, op, a, b = node
        sqlop = {"==": "=", "!=": "<>"}.get(op, op)
        return f"({render(a, sql)} {sqlop if sql else op} {render(b, sql)})"
    if kind == "bool":
        _, op, a, b = node
        return f"({render(a, sql)} {op.upper() if sql else op} {render(b, sql)})"
    if kind == "not":
        return f"(NOT {render(node[1], True)})" if sql else f"not({render(node[1], False)})"
    if kind == "between":
        _, a, lo, hi = node
        if sql:
            return f"({render(a, sql)} BETWEEN {lo} AND {hi})"
        return f"({render(a, sql)} between ({lo} .. {hi}))"
    if kind == "in":
        _, a, items = node
        vals = ", ".join(str(i) for i in items)
        return f"({render(a, sql)} {'IN' if sql else 'in'} ({vals}))"
    raise AssertionError(kind)


@pytest.fixture(scope="module")
def harness(spark):
    reg = SourceRegistry(spark).register_parquet_dir("t", SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW nation AS SELECT * FROM read_parquet('{SF_DIR}/nation.parquet')")
    return Compiler(reg), con


STR_COL = "n_name"
_words = st.sampled_from(["NATION", "_1", "N", "ATION_2", "X", "", "2"])


def str_pred():
    """contains/startswith/endswith/== over the string column — KQL and
    SQL renderings compared verbatim."""

    def rend(op, w):
        kql_op = {"contains": "contains", "startswith": "startswith",
                  "endswith": "endswith", "==": "=="}[op]
        # literal-semantics functions, not LIKE ('_'/'%' are wildcards)
        if op == "contains":
            sql = f"contains({STR_COL}, '{w}')"
        elif op == "startswith":
            sql = f"starts_with({STR_COL}, '{w}')"
        elif op == "endswith":
            sql = f"ends_with({STR_COL}, '{w}')"
        else:
            sql = f"({STR_COL} = '{w}')"
        return (f"({STR_COL} {kql_op} '{w}')", sql)

    return st.tuples(
        st.sampled_from(["contains", "startswith", "endswith", "=="]), _words
    ).map(lambda t: rend(*t))


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(sp=str_pred())
def test_random_string_op_equivalence(harness, sp):
    compiler, con = harness
    kql_pred, sql_pred = sp
    kql = f"t.nation | where {kql_pred} | project n_nationkey"
    sql = f"SELECT n_nationkey FROM nation WHERE {sql_pred}"
    srows = sorted(r[0] for r in compiler.run(parse_kql(kql)).collect())
    drows = sorted(r[0] for r in con.execute(sql).fetchall())
    assert srows == drows, f"\nKQL: {kql}\nSQL: {sql}"


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(pred=bool_expr(2), val=int_expr(2))
def test_random_expression_equivalence(harness, pred, val):
    compiler, con = harness
    kql = (
        f"t.nation | where {render(pred, False)}"
        f" | project n_nationkey, v = toreal({render(val, False)})"
    )
    sql = (
        f"SELECT n_nationkey, CAST({render(val, True)} AS DOUBLE) AS v "
        f"FROM nation WHERE {render(pred, True)}"
    )
    srows = sorted(tuple(r) for r in compiler.run(parse_kql(kql)).collect())
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows, f"\nKQL: {kql}\nSQL: {sql}"
