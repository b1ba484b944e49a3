"""invert_branch_filter.rs test corpus, ported semantically.

The reference's InvertBranchFilter rewrites `extend x = case(cond,
lit, ...) | where x == lit` back to the original conditions (and
deletes the inverted field). This repo reaches the same wire requests
through a different, sound chain: project_propagation substitutes the
definition into the filter, and sources/case_transform.py
(case_transformer.rs + partial_evaluator parity) turns the resulting
CASE comparison into first-match-wins NOT-guarded ORs at negotiation
time — without deleting the extend's output column.

Each reference test lands here as (a) a shape assertion where the
transform's output equals the reference's expected predicate, and
(b) a truth-table check: the transformed predicate must agree with
the original CASE comparison on every assignment over the referenced
fields' small domains — the rewrite is EXACT, not best-effort.
Reference: miso-optimizations/src/invert_branch_filter.rs:124-470.
"""

from __future__ import annotations

import itertools

import pytest

from miso_spark.exprs import BinOp, Case, Expr, Field, Lit, Not
from miso_spark.sources.case_transform import case_transform


def f(name: str) -> Field:
    return Field.of(name)


def eq(l: Expr, r: Expr) -> BinOp:
    return BinOp("eq", l, r)


def case(*args: Expr) -> Case:
    br = tuple(
        (args[i], args[i + 1]) for i in range(0, len(args) - 1, 2)
    )
    return Case(br, args[-1])


# ---------------------------------------------------------------------------
# truth-table evaluator: three-valued KQL semantics are irrelevant
# here (every reference case compares non-null literals), so a plain
# python eval over total assignments is the exact model


def _ev(e: Expr, row: dict):
    if isinstance(e, Lit):
        return e.value
    if isinstance(e, Field):
        return row[str(e.path)]
    if isinstance(e, Not):
        return not _ev(e.expr, row)
    if isinstance(e, Case):
        for p, v in e.branches:
            if _ev(p, row):
                return _ev(v, row)
        return _ev(e.default, row)
    if isinstance(e, BinOp):
        l, r = _ev(e.left, row), _ev(e.right, row)
        return {
            "eq": lambda: l == r, "ne": lambda: l != r,
            "gt": lambda: l > r, "gte": lambda: l >= r,
            "lt": lambda: l < r, "lte": lambda: l <= r,
            "and": lambda: bool(l) and bool(r),
            "or": lambda: bool(l) or bool(r),
            "add": lambda: l + r, "sub": lambda: l - r,
            "mul": lambda: l * r,
        }[e.op]()
    raise NotImplementedError(type(e))


def _assert_equivalent(original: Expr, transformed: Expr, domains: dict):
    names, vals = zip(*sorted(domains.items()))
    for combo in itertools.product(*vals):
        row = dict(zip(names, combo))
        assert bool(_ev(original, row)) == bool(_ev(transformed, row)), (
            f"divergence at {row}:\n  orig={original}\n  xform={transformed}"
        )


CASE_Q = case(eq(f("questionId"), Lit(7)), Lit("no"), Lit("yes"))
CASE_AB = case(
    eq(f("a"), Lit(1)), Lit("one"), eq(f("a"), Lit(2)), Lit("two"), Lit("other")
)
Q_DOM = {"questionId": [6, 7, 8]}
A_DOM = {"a": [0, 1, 2, 3]}


def test_simple_branch_true_match():
    # invert_branch_filter.rs:124 — where x == "no" → questionId == 7
    got = case_transform(eq(CASE_Q, Lit("no")))
    assert got == eq(f("questionId"), Lit(7))


def test_simple_branch_false_match():
    # :152 — where x == "yes" → not(questionId == 7); the partial
    # evaluator additionally inverts the comparison (partial_evaluator
    # .rs:146-156), exact under total-order null semantics
    got = case_transform(eq(CASE_Q, Lit("yes")))
    assert got == BinOp("ne", f("questionId"), Lit(7))


def test_no_match_gives_false():
    # :182 — where x == "maybe" → false
    got = case_transform(eq(CASE_Q, Lit("maybe")))
    assert got == Lit(False)


def test_multi_branch_middle_match():
    # :214 — where x == "two" → not(a == 1) and a == 2
    got = case_transform(eq(CASE_AB, Lit("two")))
    _assert_equivalent(eq(CASE_AB, Lit("two")), got, A_DOM)
    assert got == BinOp("and", BinOp("ne", f("a"), Lit(1)), eq(f("a"), Lit(2)))


def test_multi_branch_default_match():
    # :250 — where x == "other" → not(a == 1) and not(a == 2) (operand
    # order is ours; the truth table pins equality with the reference)
    got = case_transform(eq(CASE_AB, Lit("other")))
    _assert_equivalent(eq(CASE_AB, Lit("other")), got, A_DOM)
    assert {"and"} == {got.op}
    assert {got.left, got.right} == {
        BinOp("ne", f("a"), Lit(1)),
        BinOp("ne", f("a"), Lit(2)),
    }


def test_project_variant():
    # :286 — the transform is step-agnostic: project and extend
    # definitions substitute identically (project_propagation binds
    # both to the input row), so the same expression arrives here
    got = case_transform(eq(CASE_Q, Lit("no")))
    assert got == eq(f("questionId"), Lit(7))


def test_filter_with_and():
    # :355 — where x == "yes" and b > 5 → a == 1 and b > 5
    c = case(eq(f("a"), Lit(1)), Lit("yes"), Lit("no"))
    orig = BinOp("and", eq(c, Lit("yes")), BinOp("gt", f("b"), Lit(5)))
    got = case_transform(orig)
    assert got == BinOp(
        "and", eq(f("a"), Lit(1)), BinOp("gt", f("b"), Lit(5))
    )
    _assert_equivalent(orig, got, {"a": [0, 1], "b": [4, 5, 6]})


def test_non_literal_branch_values_still_exact():
    # :391 — the reference refuses non-literal branch values; the
    # transform here generalizes soundly: case(a == 1, b, "no") ==
    # "yes" becomes a == 1 and b == "yes" (still connector-pushable)
    c = case(eq(f("a"), Lit(1)), f("b"), Lit("no"))
    orig = eq(c, Lit("yes"))
    got = case_transform(orig)
    assert got == BinOp("and", eq(f("a"), Lit(1)), eq(f("b"), Lit("yes")))
    _assert_equivalent(orig, got, {"a": [0, 1], "b": ["yes", "no"]})


def test_non_case_expression_unchanged():
    # :411 — extend x = a + 1 | where x == 5: nothing to invert; the
    # substituted comparison passes through the transform untouched
    orig = eq(BinOp("add", f("a"), Lit(1)), Lit(5))
    assert case_transform(orig) == orig


def test_multiple_matches_gives_or():
    # :448 — case(a == 1, "yes", a == 2, "yes", "no") == "yes" →
    # (a == 1) or (not(a == 1) and a == 2)
    c = case(
        eq(f("a"), Lit(1)), Lit("yes"), eq(f("a"), Lit(2)), Lit("yes"), Lit("no")
    )
    orig = eq(c, Lit("yes"))
    got = case_transform(orig)
    assert got == BinOp(
        "or",
        eq(f("a"), Lit(1)),
        BinOp("and", BinOp("ne", f("a"), Lit(1)), eq(f("a"), Lit(2))),
    )
    _assert_equivalent(orig, got, A_DOM)


@pytest.mark.parametrize(
    "filt,lit",
    [("no", "no"), ("yes", "yes"), ("maybe", "maybe")],
    ids=["branch", "default", "nomatch"],
)
def test_truth_tables_exhaustive(filt, lit):
    # every shape above, re-checked against the model on the shared
    # domain (the reference asserts shapes only; exactness is the
    # property that makes the pushdown retry safe)
    orig = eq(CASE_Q, Lit(lit))
    _assert_equivalent(orig, case_transform(orig), Q_DOM)
