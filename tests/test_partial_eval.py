"""const_folding/partial_evaluator.rs test corpus over the shared
partial evaluator (miso_spark/sources/case_transform.py), which now
backs BOTH the case-transform pushdown retry and the rewrite layer's
fold_exprs pass (const_folding parity — filters fold before wire
negotiation, so these shapes are what connectors actually receive).

Deliberate divergences from the reference, each pinned below:
- ``x * 0 → 0`` and ``0 / x → 0.0`` are NOT folded: a missing/null x
  poisons arithmetic in the reference's own runtime (and null does in
  this engine), so the fold changes which rows a filter keeps.
- ``x / 1 → x`` is NOT folded: division always yields double here
  (interpreter parity), and the fold would change the value's type.
- an always-true CASE predicate truncates the chain instead of
  discarding earlier undetermined branches (partial_evaluator.rs:184
  returns then_eval even when a field-dependent branch precedes it —
  first-match-wins makes that result-changing).
"""

from __future__ import annotations

from miso_spark.exprs import BinOp, Case, Field, In, Lit, Not
from miso_spark.sources.case_transform import partial_eval

X = Field.of("x")
A = Field.of("a")
B = Field.of("b")


def test_const_folding():
    # partial_evaluator.rs:366 — 50 * 2 → 100
    assert partial_eval(BinOp("mul", Lit(50), Lit(2))) == Lit(100)


def test_with_field():
    # :381 — x > 50 * 2 → x > 100
    got = partial_eval(BinOp("gt", X, BinOp("mul", Lit(50), Lit(2))))
    assert got == BinOp("gt", X, Lit(100))


def test_case_with_constants_and_field():
    # :402 — case(1 + 1 == 2, "yes", x > 10, "maybe", "no") → "yes"
    e = Case(
        (
            (BinOp("eq", BinOp("add", Lit(1), Lit(1)), Lit(2)), Lit("yes")),
            (BinOp("gt", X, Lit(10)), Lit("maybe")),
        ),
        Lit("no"),
    )
    assert partial_eval(e) == Lit("yes")


def test_and_or_short_circuit():
    # :444
    assert partial_eval(BinOp("and", Lit(True), X)) == X
    assert partial_eval(BinOp("and", Lit(False), X)) == Lit(False)
    assert partial_eval(BinOp("or", Lit(True), X)) == Lit(True)
    assert partial_eval(BinOp("or", Lit(False), X)) == X


def test_arithmetic_identities_null_preserving_only():
    # :491 — the identity arms that return the field itself
    assert partial_eval(BinOp("add", X, Lit(0))) == X
    assert partial_eval(BinOp("add", Lit(0), X)) == X
    assert partial_eval(BinOp("sub", X, Lit(0))) == X
    assert partial_eval(BinOp("mul", X, Lit(1))) == X
    assert partial_eval(BinOp("mul", Lit(1), X)) == X
    # refused folds (see module docstring): null/type-unsound here
    assert partial_eval(BinOp("mul", X, Lit(0))) == BinOp("mul", X, Lit(0))
    assert partial_eval(BinOp("div", Lit(0), X)) == BinOp("div", Lit(0), X)
    assert partial_eval(BinOp("div", X, Lit(1))) == BinOp("div", X, Lit(1))


def test_simplify_stacked_not():
    # :571 — not(not(not(x))) → not(x)
    assert partial_eval(Not(Not(Not(X)))) == Not(X)


def test_remove_redundant_logical_terms():
    # :587 — x AND x → x; x OR x → x; (x>1) AND (x>1) → (x>1)
    assert partial_eval(BinOp("and", X, X)) == X
    assert partial_eval(BinOp("or", X, X)) == X
    c = BinOp("gt", X, Lit(1))
    assert partial_eval(BinOp("and", c, c)) == c


def test_remove_redundant_in_items():
    # :624 — IN dedup; single item → equality
    assert partial_eval(In(X, (Lit(1), Lit(1), Lit(2)))) == In(X, (Lit(1), Lit(2)))
    assert partial_eval(In(X, (Lit(1),))) == BinOp("eq", X, Lit(1))
    assert partial_eval(In(X, (Lit(1), Lit(1)))) == BinOp("eq", X, Lit(1))


def test_not_comparison_inversion():
    # :674 — exact under total-order null semantics (null is an
    # ordinary smallest value on both typed and dynamic paths)
    assert partial_eval(Not(BinOp("gt", X, Lit(1)))) == BinOp("lte", X, Lit(1))
    assert partial_eval(Not(BinOp("gte", X, Lit(1)))) == BinOp("lt", X, Lit(1))
    assert partial_eval(Not(BinOp("lt", X, Lit(1)))) == BinOp("gte", X, Lit(1))
    assert partial_eval(Not(BinOp("lte", X, Lit(1)))) == BinOp("gt", X, Lit(1))
    assert partial_eval(Not(BinOp("eq", X, Lit(1)))) == BinOp("ne", X, Lit(1))
    assert partial_eval(Not(BinOp("ne", X, Lit(1)))) == BinOp("eq", X, Lit(1))


def test_case_true_condition_returns_then():
    # :725 — a LEADING literal-true branch returns its value
    e = Case(
        ((Lit(True), Lit("yes")), (BinOp("gt", X, Lit(1)), Lit("maybe"))),
        Lit("no"),
    )
    assert partial_eval(e) == Lit("yes")
    # divergence pin: a mid-chain true branch only truncates the TAIL
    # — the reference returns its value outright, dropping the
    # earlier field-dependent branch (result-changing; see docstring)
    e2 = Case(
        ((BinOp("gt", X, Lit(1)), Lit("first")), (Lit(True), Lit("second"))),
        Lit("no"),
    )
    assert partial_eval(e2) == Case(
        ((BinOp("gt", X, Lit(1)), Lit("first")),), Lit("second")
    )


def test_case_false_condition_skipped():
    # :752
    e = Case(
        ((Lit(False), Lit("no")), (BinOp("gt", X, Lit(1)), Lit("yes"))),
        Lit("default"),
    )
    assert partial_eval(e) == Case(
        ((BinOp("gt", X, Lit(1)), Lit("yes")),), Lit("default")
    )


def test_case_empty_returns_default():
    # :781
    e = Case(((Lit(False), Lit("no")),), Lit("default"))
    assert partial_eval(e) == Lit("default")


def test_case_bool_true_false_to_predicate():
    # :799 — case(x > 1, true, false) → x > 1
    p = BinOp("gt", X, Lit(1))
    assert partial_eval(Case(((p, Lit(True)),), Lit(False))) == p


def test_case_bool_false_true_to_not_predicate():
    # :820 — case(x > 1, false, true) → not(x > 1) → x <= 1
    p = BinOp("gt", X, Lit(1))
    assert partial_eval(Case(((p, Lit(False)),), Lit(True))) == BinOp(
        "lte", X, Lit(1)
    )


def test_absorption_and_or():
    # :842 — a AND (a OR b) → a
    assert partial_eval(BinOp("and", A, BinOp("or", A, B))) == A


def test_absorption_or_and():
    # :859 — a OR (a AND b) → a
    assert partial_eval(BinOp("or", A, BinOp("and", A, B))) == A


def test_absorption_commutative():
    # :876 — (a OR b) AND a → a; (b OR a) AND a → a
    assert partial_eval(BinOp("and", BinOp("or", A, B), A)) == A
    assert partial_eval(BinOp("and", BinOp("or", B, A), A)) == A
    assert partial_eval(BinOp("or", BinOp("and", B, A), A)) == A


def test_or_equality_to_in():
    # :905 — x == 1 OR x == 2 → x IN (1, 2)
    e = BinOp("or", BinOp("eq", X, Lit(1)), BinOp("eq", X, Lit(2)))
    assert partial_eval(e) == In(X, (Lit(1), Lit(2)))


def test_or_equality_chain_to_in():
    # :930 — (x == 1 OR x == 2) OR x == 3 → x IN (1, 2, 3); chains
    # through an already-folded IN
    e = BinOp(
        "or",
        BinOp("or", BinOp("eq", X, Lit(1)), BinOp("eq", X, Lit(2))),
        BinOp("eq", X, Lit(3)),
    )
    assert partial_eval(e) == In(X, (Lit(1), Lit(2), Lit(3)))


def test_or_different_fields_unchanged():
    # :959
    e = BinOp("or", BinOp("eq", X, Lit(1)), BinOp("eq", A, Lit(2)))
    assert partial_eval(e) == e


def test_range_contradiction():
    # :980 — x > 5 AND x < 3 → false (never reaches the service)
    e = BinOp("and", BinOp("gt", X, Lit(5)), BinOp("lt", X, Lit(3)))
    assert partial_eval(e) == Lit(False)
    # boundary: x >= 5 AND x <= 5 is satisfiable → unchanged
    e2 = BinOp("and", BinOp("gte", X, Lit(5)), BinOp("lte", X, Lit(5)))
    assert partial_eval(e2) == e2


def test_range_subsumption_gt():
    # :1001 — x > 5 AND x > 3 → x > 5
    e = BinOp("and", BinOp("gt", X, Lit(5)), BinOp("gt", X, Lit(3)))
    assert partial_eval(e) == BinOp("gt", X, Lit(5))


def test_range_subsumption_lt():
    # :1027 — x < 3 AND x < 5 → x < 3
    e = BinOp("and", BinOp("lt", X, Lit(3)), BinOp("lt", X, Lit(5)))
    assert partial_eval(e) == BinOp("lt", X, Lit(3))


def test_range_valid_unchanged():
    # :1053 — x > 3 AND x < 10 is a real interval → unchanged
    e = BinOp("and", BinOp("gt", X, Lit(3)), BinOp("lt", X, Lit(10)))
    assert partial_eval(e) == e


def test_range_subsumption_mixed_gte_gt():
    # :1074 — x >= 5 AND x > 5 → x > 5 (gt is stricter)
    e = BinOp("and", BinOp("gte", X, Lit(5)), BinOp("gt", X, Lit(5)))
    assert partial_eval(e) == BinOp("gt", X, Lit(5))


def test_range_subsumption_mixed_lte_lt():
    # :1095 — x <= 5 AND x < 5 → x < 5
    e = BinOp("and", BinOp("lte", X, Lit(5)), BinOp("lt", X, Lit(5)))
    assert partial_eval(e) == BinOp("lt", X, Lit(5))


def test_reversed_literal_orientation():
    # extract_field_cmp normalizes `5 < x` to `x > 5` for the range
    # rules (partial_evaluator.rs:74-96) — the fold must see both
    e = BinOp("and", BinOp("lt", Lit(5), X), BinOp("gt", X, Lit(3)))
    assert partial_eval(e) == BinOp("lt", Lit(5), X)


def test_in_dedup_keeps_bool_and_int_distinct():
    # r10 advice (medium): Python's True == 1 makes Lit(True) ==
    # Lit(1) via dataclass eq, but Bool and Number are distinct
    # never-equal classes in the engine's total order — deduping them
    # dropped integer-1 rows from `x in (true, 1)`
    e = partial_eval(In(X, (Lit(True), Lit(1))))
    assert isinstance(e, In) and len(e.items) == 2
    e = partial_eval(In(X, (Lit(False), Lit(0))))
    assert isinstance(e, In) and len(e.items) == 2
    # genuine duplicates still dedup
    e = partial_eval(In(X, (Lit(1), Lit(1), Lit(2))))
    assert isinstance(e, In) and len(e.items) == 2


def test_or_fold_keeps_bool_and_int_distinct():
    # same class-awareness in the OR-of-equalities → IN value dedup
    e = partial_eval(
        BinOp("or", BinOp("eq", X, Lit(True)), BinOp("eq", X, Lit(1)))
    )
    assert isinstance(e, In) and len(e.items) == 2
    vals = {(isinstance(i.value, bool), i.value) for i in e.items}
    assert vals == {(True, True), (False, 1)}


def test_in_eq_folds_gated_under_not():
    # r10 advice (medium): `in` compiles to a PROPER false for a
    # missing base where `==` compiles to unknown — equivalent at
    # filter level, divergent under a negation (proper-FALSE flips to
    # keep, unknown still drops). Neither direction of the In↔eq /
    # OR↔IN rewrites may fire under a Not.
    e = partial_eval(Not(In(X, (Lit(1),))))
    assert isinstance(e, Not) and isinstance(e.expr, In)
    e = partial_eval(
        Not(BinOp("or", BinOp("eq", X, Lit(1)), BinOp("eq", X, Lit(2))))
    )
    assert isinstance(e, Not)
    assert isinstance(e.expr, BinOp) and e.expr.op == "or"
    # outside a negation both folds still fire
    e = partial_eval(In(X, (Lit(1),)))
    assert isinstance(e, BinOp) and e.op == "eq"
    e = partial_eval(
        BinOp("or", BinOp("eq", X, Lit(1)), BinOp("eq", X, Lit(2)))
    )
    assert isinstance(e, In) and len(e.items) == 2


def test_case_pred_in_fold_gated():
    # case preds evaluate as if under a Not: the false/true collapse
    # (case(p, false, true) → not(p)) and case_to_or's NOT-guards land
    # the pred under a negation after its folds ran — an In→eq fold
    # there would change missing-base rows
    e = partial_eval(
        Case(((In(X, (Lit(1),)), Lit(False)),), Lit(True))
    )
    assert isinstance(e, Not) and isinstance(e.expr, In)
