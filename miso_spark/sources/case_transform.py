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

from miso_spark.exprs import (
    Between,
    BinOp,
    Case,
    Exists,
    Expr,
    Field,
    In,
    Lit,
    Not,
)

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


def _dedup_key(e: Expr) -> str:
    """Structural dedup key that keeps Bool and numbers distinct:
    dataclass equality conflates Lit(True) with Lit(1) (Python's
    True == 1), but the engine's total order treats Bool and Number as
    never-equal classes (value/mod.rs class ranks) — deduping them
    would silently drop integer-1 rows from ``x in (true, 1)``.
    Dataclass repr spells True/1/1.0 differently at any nesting depth,
    so it is exactly the class-aware key needed (1 vs 1.0 staying
    distinct merely skips a dedup — sound)."""
    return repr(e)


def partial_eval(e: Expr, under_not: bool = False) -> Expr:
    """Constant folding (const_folding/partial_evaluator parity):
    literal-only arithmetic/comparisons evaluate, boolean connectives
    short-circuit on literal true/false. Division by a literal zero is
    left untouched (the engine's ANSI semantics error there — folding
    would hide it).

    r10 widened to the reference's full rule set (partial_evaluator.rs
    :130-350), minus its null-UNSOUND arithmetic identities: the
    reference folds ``x * 0 → 0`` and ``0 / x → 0.0``, but a missing
    ``x`` poisons arithmetic in its own runtime (and null does in
    this engine), so those rewrites change rows; only the identity
    arms that return the field expression itself (``x + 0``,
    ``x - 0``, ``x * 1``) are value- and null-preserving. Everything
    here feeds wire requests (es_dsl/spl build from this tree), so
    cleaner shapes are cheaper queries: ``x == 1 or x == 2`` ships a
    terms filter, ``not(x > 5)`` ships a plain range, and a
    contradictory range never reaches the service at all.

    ``under_not``: True when any ANCESTOR is a Not. The In↔eq and
    OR↔IN rewrites are gated off there: ``in`` compiles to a PROPER
    false for a missing base where ``==`` compiles to unknown — both
    drop the row at filter level, but under a negation proper-FALSE
    flips to keep where unknown still drops, so swapping the forms
    inside a Not changes which rows survive (r10 advice)."""
    if isinstance(e, BinOp):
        left = partial_eval(e.left, under_not)
        right = partial_eval(e.right, under_not)
        if e.op in ("and", "or"):
            return _fold_bool(e.op, left, right, under_not)
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
        # null-preserving identities only (partial_evaluator.rs:291-
        # 340 minus the x*0 / 0/x arms — see docstring)
        if e.op == "add":
            if _is_num(left, 0):
                return right
            if _is_num(right, 0):
                return left
        if e.op == "sub" and _is_num(right, 0):
            return left
        if e.op == "mul":
            if _is_num(left, 1):
                return right
            if _is_num(right, 1):
                return left
        return BinOp(e.op, left, right)
    if isinstance(e, Not):
        inner = partial_eval(e.expr, True)
        if isinstance(inner, Lit) and isinstance(inner.value, bool):
            return Lit(not inner.value)
        if isinstance(inner, Not):
            return inner.expr
        # comparison inversion (partial_evaluator.rs:146-156) — exact
        # under the engine's total-order comparison semantics (null is
        # an ordinary smallest value on BOTH the typed and dynamic
        # paths, so ¬(x > 5) ≡ x <= 5 row-for-row)
        if isinstance(inner, BinOp) and inner.op in _INVERT:
            return BinOp(_INVERT[inner.op], inner.left, inner.right)
        return Not(inner)
    if isinstance(e, In):
        left = partial_eval(e.expr, under_not)
        items: list[Expr] = []
        seen: set[str] = set()
        for i in e.items:
            i = partial_eval(i, under_not)
            k = _dedup_key(i)  # dedup (partial_evaluator.rs:162-168)
            if k not in seen:
                seen.add(k)
                items.append(i)
        if len(items) == 1 and not under_not:
            return partial_eval(BinOp("eq", left, items[0]), under_not)
        return In(left, tuple(items))
    if isinstance(e, Between):
        return Between(
            partial_eval(e.expr, under_not),
            partial_eval(e.low, under_not),
            partial_eval(e.high, under_not),
            e.negated,
        )
    if isinstance(e, Exists):
        return Exists(partial_eval(e.expr, under_not))
    if isinstance(e, Case):
        return _fold_case(e, under_not)
    return e


def _is_num(e: Expr, v) -> bool:
    return (
        isinstance(e, Lit)
        and isinstance(e.value, (int, float))
        and not isinstance(e.value, bool)
        and e.value == v
    )


_INVERT = {"eq": "ne", "ne": "eq", "gt": "lte", "gte": "lt",
           "lt": "gte", "lte": "gt"}

#: normalized (field OP literal) orientation for the range rules
_FLIP = {"gt": "lt", "gte": "lte", "lt": "gt", "lte": "gte"}


def _field_cmp(e: Expr):
    """(path, op, number) from ``field <cmp> numeric-literal`` in
    either orientation (partial_evaluator.rs extract_field_cmp)."""
    if not (isinstance(e, BinOp) and e.op in _FLIP):
        return None
    l, r = e.left, e.right
    if isinstance(l, Field) and _is_numlit(r):
        return (str(l.path), e.op, r.value)
    if _is_numlit(l) and isinstance(r, Field):
        return (str(r.path), _FLIP[e.op], l.value)
    return None


def _is_numlit(e: Expr) -> bool:
    return (
        isinstance(e, Lit)
        and isinstance(e.value, (int, float))
        and not isinstance(e.value, bool)
    )


def _eq_or_in_field(e: Expr):
    """Field of a ``field == literal`` / ``field in (literals)`` arm
    (partial_evaluator.rs extract_or_in_field)."""
    if isinstance(e, BinOp) and e.op == "eq":
        if isinstance(e.left, Field) and isinstance(e.right, Lit):
            return e.left
        if isinstance(e.right, Field) and isinstance(e.left, Lit):
            return e.right
    if isinstance(e, In) and isinstance(e.expr, Field):
        if all(isinstance(i, Lit) for i in e.items):
            return e.expr
    return None


def _collect_eq_values(e: Expr, fld: Field, out: list) -> bool:
    if isinstance(e, BinOp) and e.op == "or":
        return (
            _collect_eq_values(e.left, fld, out)
            and _collect_eq_values(e.right, fld, out)
        )
    if isinstance(e, In) and e.expr == fld:
        for i in e.items:
            if not isinstance(i, Lit):
                return False
            out.append(i.value)
        return True
    if isinstance(e, BinOp) and _eq_or_in_field(e) == fld:
        lit = e.right if isinstance(e.right, Lit) else e.left
        out.append(lit.value)
        return True
    return False


def _fold_bool(op: str, l: Expr, r: Expr, under_not: bool = False) -> Expr:
    """and/or folding: literal short-circuit, idempotence, absorption,
    range contradiction/subsumption (and), OR-of-equalities → IN (or)
    — partial_evaluator.rs:210-290. All arms are exact under Kleene
    logic (absorption and idempotence hold with unknowns) and under
    the engine's total-order comparisons (the range rules fire only
    when both literals are numbers, and every non-number class orders
    entirely on one side of all numbers, so both conjuncts agree on
    non-numeric rows)."""
    for a, b in ((l, r), (r, l)):
        if isinstance(a, Lit) and isinstance(a.value, bool):
            if op == "and":
                return b if a.value else Lit(False)
            return Lit(True) if a.value else b
    # idempotence / absorption compare via the class-aware key too
    # (dataclass eq conflates Lit(True) with Lit(1) at any depth)
    if _dedup_key(l) == _dedup_key(r):
        return l
    # absorption: a AND (a OR b) → a; a OR (a AND b) → a
    other = "or" if op == "and" else "and"
    for a, b in ((l, r), (r, l)):
        if isinstance(b, BinOp) and b.op == other and _dedup_key(a) in (
            _dedup_key(b.left), _dedup_key(b.right)
        ):
            return a
    if op == "and":
        fc_l, fc_r = _field_cmp(l), _field_cmp(r)
        if fc_l and fc_r and fc_l[0] == fc_r[0]:
            _, op1, n1 = fc_l
            _, op2, n2 = fc_r
            contradiction = {
                ("gt", "lt"): n1 >= n2, ("gt", "lte"): n1 >= n2,
                ("gte", "lt"): n1 >= n2, ("gte", "lte"): n1 > n2,
                ("lt", "gt"): n2 >= n1, ("lt", "gte"): n2 >= n1,
                ("lte", "gt"): n2 >= n1, ("lte", "gte"): n2 > n1,
            }.get((op1, op2), False)
            if contradiction:
                return Lit(False)
            if op1 in ("gt", "gte") and op2 in ("gt", "gte"):
                if n1 > n2 or (n1 == n2 and (op1 == "gt" or op2 == "gte")):
                    return l
                return r
            if op1 in ("lt", "lte") and op2 in ("lt", "lte"):
                if n1 < n2 or (n1 == n2 and (op1 == "lt" or op2 == "lte")):
                    return l
                return r
    elif not under_not:
        # OR-of-equalities → IN changes missing-base semantics under a
        # negation (see partial_eval docstring) — skipped there
        fl, fr = _eq_or_in_field(l), _eq_or_in_field(r)
        if fl is not None and fl == fr:
            vals: list = []
            if _collect_eq_values(BinOp("or", l, r), fl, vals) and len(vals) >= 2:
                deduped: list = []
                seen: set = set()
                for v in vals:
                    # class-aware key: True == 1 in Python, but Bool
                    # and Number are distinct never-equal classes in
                    # the engine's total order — deduping them would
                    # drop integer-1 rows (r10 advice)
                    k = (isinstance(v, bool), v)
                    if k not in seen:
                        seen.add(k)
                        deduped.append(v)
                if len(deduped) == 1:
                    return BinOp("eq", fl, Lit(deduped[0]))
                return In(fl, tuple(Lit(v) for v in deduped))
    return BinOp(op, l, r)


def _fold_case(e: Case, under_not: bool = False) -> Expr:
    """CASE folding (partial_evaluator.rs:176-208): literal-true
    predicate returns its branch, literal-false branches drop, no
    branches left returns the default, and a single boolean
    true/false branch collapses to the predicate (or its negation).
    The pred collapses are sound under missing fields: the engine's
    case compile poisons on a missing predicate (exprs.py:396-412),
    matching the bare predicate's unknown — unlike In vs eq, no
    proper-vs-poison asymmetry to preserve."""
    branches = []
    for pred, val in e.branches:
        # preds evaluate as if under a Not: the false/true collapse
        # below (and case_to_or's NOT-guards) can land a pred under a
        # negation AFTER its folds ran, so the In↔eq gate must already
        # have applied
        pred = partial_eval(pred, True)
        val = partial_eval(val, under_not)
        if isinstance(pred, Lit) and pred.value is True:
            if not branches:
                return val
            # an always-true branch ends the chain: later branches and
            # the default are unreachable
            return Case(tuple(branches), val)
        if isinstance(pred, Lit) and pred.value is False:
            continue
        branches.append((pred, val))
    default = partial_eval(e.default, under_not)
    if not branches:
        return default
    if len(branches) == 1:
        pred, val = branches[0]
        if (
            isinstance(val, Lit) and val.value is True
            and isinstance(default, Lit) and default.value is False
        ):
            return pred
        if (
            isinstance(val, Lit) and val.value is False
            and isinstance(default, Lit) and default.value is True
        ):
            return partial_eval(Not(pred))
    return Case(tuple(branches), default)


def case_transform(e: Expr) -> Expr:
    """The full fallback rewrite the reference applies when a plain
    apply_filter refuses (push_into_scan/mod.rs:54-59)."""
    return partial_eval(case_to_or(lift_context_into_case(e)))
