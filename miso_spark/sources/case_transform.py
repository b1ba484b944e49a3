"""CASE → OR rewriting + constant folding for filter pushdown.

Parity: miso-optimizations/src/push_into_scan/case_transformer.rs and
const_folding/partial_evaluator — when a connector refuses a filter
because it contains a ``case``/``iff`` (no query-DSL analog), the
reference rewrites it into an OR of AND-guarded branches, folds the
now-constant arithmetic, and retries the pushdown::

    case(id > 20, 100, id > 10, 50, 0) * 5 < 10
  =>  (id > 20 and (100 * 5 < 10))
   or (not(id > 20) and id > 10 and (50 * 5 < 10))
   or (not(id > 20) and not(id > 10) and (0 * 5 < 10))
  =>  (not(id > 20) and not(id > 10))        -- after folding

The rewrite is exact (KQL case is first-match-wins, mirrored by the
NOT-guards), so a pushdown through it never changes results.
"""

from __future__ import annotations

from miso_spark.exprs import Between, BinOp, Case, Exists, Expr, In, Lit, Not

_ARITH = {"add": lambda a, b: a + b, "sub": lambda a, b: a - b,
          "mul": lambda a, b: a * b, "div": lambda a, b: a / b}
_CMP = {"eq": lambda a, b: a == b, "ne": lambda a, b: a != b,
        "gt": lambda a, b: a > b, "gte": lambda a, b: a >= b,
        "lt": lambda a, b: a < b, "lte": lambda a, b: a <= b}


def lift_context_into_case(e: Expr) -> Expr:
    """Pass 1 (case_transformer.rs LiftContextIntoCaseTransformer):
    push a binop's other operand into each CASE branch value, so the
    branch values become self-contained predicates/constants."""
    if isinstance(e, BinOp):
        left = lift_context_into_case(e.left)
        right = lift_context_into_case(e.right)
        if isinstance(left, Case) and e.op not in ("and", "or"):
            return Case(
                tuple(
                    (p, lift_context_into_case(BinOp(e.op, v, right)))
                    for p, v in left.branches
                ),
                lift_context_into_case(BinOp(e.op, left.default, right)),
            )
        if isinstance(right, Case) and e.op not in ("and", "or"):
            return Case(
                tuple(
                    (p, lift_context_into_case(BinOp(e.op, left, v)))
                    for p, v in right.branches
                ),
                lift_context_into_case(BinOp(e.op, left, right.default)),
            )
        return BinOp(e.op, left, right)
    if isinstance(e, Not):
        return Not(lift_context_into_case(e.expr))
    if isinstance(e, Case):
        return Case(
            tuple((p, lift_context_into_case(v)) for p, v in e.branches),
            lift_context_into_case(e.default),
        )
    return e


def case_to_or(e: Expr) -> Expr:
    """Pass 2 (CaseToOrTransformer): a boolean-position CASE becomes
    first-match-wins OR-of-ANDs with NOT-guards on earlier branches."""
    if isinstance(e, Case):
        arms = []
        guards: list[Expr] = []
        for pred, val in e.branches:
            arm: Expr = BinOp("and", case_to_or(pred), case_to_or(val))
            for g in guards:
                arm = BinOp("and", Not(case_to_or(g)), arm)
            arms.append(arm)
            guards.append(pred)
        default_arm: Expr = case_to_or(e.default)
        for g in guards:
            default_arm = BinOp("and", Not(case_to_or(g)), default_arm)
        out = default_arm
        for arm in reversed(arms):
            out = BinOp("or", arm, out)
        return out
    if isinstance(e, BinOp):
        return BinOp(e.op, case_to_or(e.left), case_to_or(e.right))
    if isinstance(e, Not):
        return Not(case_to_or(e.expr))
    return e


def partial_eval(e: Expr) -> Expr:
    """Constant folding (const_folding/partial_evaluator parity):
    literal-only arithmetic/comparisons evaluate, boolean connectives
    short-circuit on literal true/false. Division by a literal zero is
    left untouched (the engine's ANSI semantics error there — folding
    would hide it)."""
    if isinstance(e, BinOp):
        left, right = partial_eval(e.left), partial_eval(e.right)
        if e.op in ("and", "or"):
            for a, b in ((left, right), (right, left)):
                if isinstance(a, Lit) and isinstance(a.value, bool):
                    if e.op == "and":
                        return b if a.value else Lit(False)
                    return Lit(True) if a.value else b
            return BinOp(e.op, left, right)
        if (
            isinstance(left, Lit) and isinstance(right, Lit)
            and isinstance(left.value, (int, float))
            and isinstance(right.value, (int, float))
            and not isinstance(left.value, bool)
            and not isinstance(right.value, bool)
        ):
            if e.op in _CMP:
                return Lit(bool(_CMP[e.op](left.value, right.value)))
            if e.op in _ARITH and not (e.op == "div" and right.value == 0):
                return Lit(_ARITH[e.op](left.value, right.value))
        if (
            e.op in ("eq", "ne")
            and isinstance(left, Lit) and isinstance(right, Lit)
            and isinstance(left.value, str) and isinstance(right.value, str)
        ):
            return Lit((left.value == right.value) == (e.op == "eq"))
        return BinOp(e.op, left, right)
    if isinstance(e, Not):
        inner = partial_eval(e.expr)
        if isinstance(inner, Lit) and isinstance(inner.value, bool):
            return Lit(not inner.value)
        if isinstance(inner, Not):
            return inner.expr
        return Not(inner)
    if isinstance(e, In):
        return In(partial_eval(e.expr), tuple(partial_eval(i) for i in e.items))
    if isinstance(e, Between):
        return Between(
            partial_eval(e.expr), partial_eval(e.low), partial_eval(e.high),
            e.negated,
        )
    if isinstance(e, Exists):
        return Exists(partial_eval(e.expr))
    return e


def case_transform(e: Expr) -> Expr:
    """The full fallback rewrite the reference applies when a plain
    apply_filter refuses (push_into_scan/mod.rs:54-59)."""
    return partial_eval(case_to_or(lift_context_into_case(e)))
