"""Expression AST + compilation to PySpark Columns.

Parity: miso-workflow-types/src/expr.rs (Expr enum) and
miso-workflow/src/interpreter (evaluation semantics):
- ``contains``/``startswith``/``endswith`` are case-SENSITIVE string ops
  (interpreter/mod.rs:209-224).
- ``has`` is a case-insensitive phrase match with non-alphanumeric
  boundaries; ``has_cs`` the case-sensitive variant
  (interpreter/string_ops.rs:43-117).
- comparisons follow the reference's TOTAL order over present values
  with Null smallest (value/mod.rs:151): ``x <= 5`` keeps a null x,
  ``x >= 5`` drops it, field-vs-field ==/!= are null-safe; a
  provably-MISSING operand makes any comparison unknown → row
  filtered, also under not(...) (impl_cmp's (None, _) arm). See
  _compile_binop and SURVEY.md for the present-null vs missing-key
  conflation discussion.

Everything compiles to built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs anywhere in the expression path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from miso_spark.fields import FieldPath


class Expr:
    """Base class for expression AST nodes."""

    __slots__ = ()


@dataclass(frozen=True)
class Field(Expr):
    path: FieldPath

    @staticmethod
    def of(text: str) -> "Field":
        return Field(FieldPath.parse(text))


@dataclass(frozen=True)
class Lit(Expr):
    value: object  # None | bool | int | float | str | datetime


@dataclass(frozen=True)
class Duration(Expr):
    """Timespan literal, stored as float seconds (supports sub-second)."""

    seconds: float


# op -> (spark column method or callable)
_CMP_OPS = {"eq", "ne", "gt", "gte", "lt", "lte"}
_ARITH_OPS = {"add", "sub", "mul", "div"}
_BOOL_OPS = {"and", "or"}
_STR_OPS = {"contains", "startswith", "endswith", "has", "has_cs"}


@dataclass(frozen=True)
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr

    def __post_init__(self) -> None:
        ok = _CMP_OPS | _ARITH_OPS | _BOOL_OPS | _STR_OPS
        if self.op not in ok:
            raise ValueError(f"unknown binop {self.op}")


@dataclass(frozen=True)
class Not(Expr):
    expr: Expr


@dataclass(frozen=True)
class Exists(Expr):
    expr: Expr


@dataclass(frozen=True)
class In(Expr):
    expr: Expr
    items: tuple[Expr, ...]


@dataclass(frozen=True)
class Between(Expr):
    expr: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass(frozen=True)
class Case(Expr):
    """case(c1, v1, c2, v2, ..., default); iff() is a 1-branch case."""

    branches: tuple[tuple[Expr, Expr], ...]
    default: Expr


@dataclass(frozen=True)
class Extract(Expr):
    """extract(regex, capture_group, source) — regexp_extract.

    Parity: interpreter/string_ops.rs:14 (no match → null).
    """

    pattern: Expr
    group: Expr
    source: Expr


@dataclass(frozen=True)
class Bin(Expr):
    """bin(x, size): floor x to a multiple of size.

    For timestamps with a Duration size, buckets epoch seconds.
    """

    expr: Expr
    size: Expr


@dataclass(frozen=True)
class Cast(Expr):
    type: str  # bool|int|long|float|decimal|string
    expr: Expr


@dataclass(frozen=True)
class Now(Expr):
    pass


def _phrase_regex(phrase: str, case_insensitive: bool) -> str:
    pre = "(?i)" if case_insensitive else ""
    esc = re.escape(phrase)
    return f"{pre}(^|[^A-Za-z0-9]){esc}([^A-Za-z0-9]|$)"


def _has_predicate(l: Column, phrase: str, case_insensitive: bool) -> Column:
    """has/has_cs: word-boundary phrase match. An empty phrase matches
    NOTHING (string_ops.rs:86-88 returns false before searching; the
    bare boundary regex would instead match any text with a non-alnum
    edge)."""
    if phrase == "":
        return F.lit(False)
    return l.rlike(_phrase_regex(phrase, case_insensitive))


_CAST_TYPES = {
    "bool": "boolean",
    "int": "int",
    "long": "long",
    "float": "double",
    "decimal": "decimal(38,9)",
    "string": "string",
}


def _is_string_typed(e: Expr, schema) -> bool:
    """Best-effort static check that an expression is string-valued —
    drives miso's string-Plus-concat semantics (interpreter/mod.rs:234).
    Works from literals, casts, and (when ``schema`` is provided by the
    compiler) column types."""
    from pyspark.sql.types import StringType

    if isinstance(e, Lit):
        return isinstance(e.value, str)
    if isinstance(e, Cast):
        return e.type == "string"
    if isinstance(e, Field) and schema is not None:
        return isinstance(e.path.resolve_type(schema), StringType)
    if isinstance(e, BinOp) and e.op == "add":
        return _is_string_typed(e.left, schema) or _is_string_typed(e.right, schema)
    if isinstance(e, Case):
        return any(_is_string_typed(v, schema) for _, v in e.branches) or _is_string_typed(
            e.default, schema
        )
    if isinstance(e, Extract):
        # over a dynamic-model source the result is a VARIANT
        # (present-null no-match vs missing source), not a string;
        # a provably-ABSENT source stays a typed NULL (always missing
        # — no no-match ambiguity, and a variant here would flip a
        # purely typed union branch into the dynamic model, r13 soak
        # find #2)
        return not _extract_dynamic_src(e, schema)
    return False


def _extract_dynamic_src(e: "Extract", schema) -> bool:
    """True when an Extract's source is VARIANT-typed — the one case
    where the result must be a VARIANT to keep no-match (present null)
    apart from missing. TYPED sources — including missing-as-null
    tagged columns (tostring over a variant, or a union-merged
    branch-absent materialization) — keep a TYPED string result under
    the documented typed-row conflation (SURVEY §3: one typed column
    cannot carry per-row missing-ness; the no-match present null wins
    the conflation, matching the r12→13 advice's headline example).
    r13 soak find #3 forced this narrowing: a union-pushed
    `project t` tags the merged column missing-as-null, and a variant
    extract over it sprouted variant output columns inside a purely
    typed pipeline (values right, representation diverged)."""
    return _variant_typed(e.source, schema)


def _variant_typed(e: Expr, schema) -> bool:
    """True when ``e`` evaluates to a per-row dynamic (VARIANT) value —
    the dynamic-ingest model (miso_spark/dynamic.py). Comparisons,
    string ops and truthiness on such values route through the
    reference's dynamic semantics instead of Spark's typed ones."""
    try:
        from pyspark.sql.types import VariantType
    except ImportError:  # pragma: no cover - older Spark
        return False
    if schema is None:
        return False
    if isinstance(e, Field):
        return isinstance(e.path.resolve_type(schema), VariantType)
    if isinstance(e, Case):
        return any(_variant_typed(v, schema) for _, v in e.branches) or _variant_typed(
            e.default, schema
        )
    if isinstance(e, BinOp) and e.op in _ARITH_OPS:
        # dynamic arithmetic compiles to a VARIANT result (per-row
        # output type — dynamic.varithmetic), so consumers of the
        # result must route through dynamic semantics too
        return _variant_typed(e.left, schema) or _variant_typed(e.right, schema)
    if isinstance(e, Extract):
        # extract over a dynamic-model source compiles to a VARIANT:
        # SQL NULL = missing source (interpreter/mod.rs:406-409), VOID
        # variant = present Value::Null on no-match (string_ops.rs:30-32).
        # A provably-absent source stays a typed NULL (see
        # _extract_dynamic_src).
        return _extract_dynamic_src(e, schema)
    return False


def _variant_key(e: Expr, schema) -> Column:
    """Compile ``e`` into a dynamic total-order sort key
    (miso_spark/dynamic.py). Literals fold to constant keys;
    boolean-producing sub-expressions (not/exists/comparisons) key as
    Value::Bool with missing propagated; anything else round-trips
    through a variant wrap."""
    from miso_spark import dynamic as dyn

    if isinstance(e, Lit):
        return dyn.literal_sort_key(e.value)
    if _variant_typed(e, schema):
        return dyn.sort_key(compile_expr(e, schema))
    if isinstance(e, (Not, Exists, In, Between)) or (
        isinstance(e, BinOp) and e.op in (_CMP_OPS | _STR_OPS | _BOOL_OPS)
    ):
        return dyn.bool_sort_key(compile_expr(e, schema))
    return dyn.sort_key(dyn.wrap_variant(compile_expr(e, schema)))


#: column-metadata key marking a TYPED column whose NULL encodes a
#: MISSING dynamic value (set by the compiler when an extend/project
#: materializes a missing-as-null expression into a named column, so
#: the semantics survive into later steps that only see the schema)
MISSING_AS_NULL_MD = "miso.missing_as_null"


def _missing_as_null(e: Expr, schema) -> bool:
    """True when ``e`` is a TYPED expression whose NULL output encodes
    a MISSING dynamic value: casts/bins/extracts whose input is
    variant-typed (dynamic casts return typed columns — long/string/
    boolean — and a missing input surfaces as NULL there), arithmetic
    over such results, and schema columns an earlier extend/project
    materialized from one (MISSING_AS_NULL_MD metadata). Predicates
    must treat that null as the reference's missing (eval! poisoning →
    unknown → row dropped), NOT as the present-null smallest value of
    the total order; dcount must skip it instead of counting a null
    bucket. Present nulls can't hide here: Val::cast maps a present
    Null to 0/"null"/false, so on these expressions NULL ⇔ missing
    exactly."""
    if isinstance(e, Field):
        if schema is None:
            return False
        if e.path.is_missing_in(schema):
            # a field provably absent from the schema is missing on
            # EVERY row — its compiled NULL literal trivially encodes
            # missing, so downstream consumers (union/join variant
            # lifts, summarize key tags, In/dcount guards) must not
            # read it as a present null
            return True
        if len(e.path.segments) != 1:
            return False
        name, idxs = e.path.segments[0]
        if idxs:
            return False
        try:
            return bool(schema[name].metadata.get(MISSING_AS_NULL_MD, False))
        except Exception:
            return False
    if isinstance(e, (Bin, Cast)):
        return _variant_typed(e.expr, schema) or _missing_as_null(e.expr, schema)
    # NO general Extract arm: NULL ⇔ missing holds for Cast/Bin
    # (Val::cast maps a present Null to 0/"null"/false so a NULL
    # result pins a missing input) but NOT for Extract — a no-match
    # over a present string is a present Value::Null
    # (string_ops.rs:30-32). Extract over a dynamic source therefore
    # compiles to a VARIANT that keeps the distinction (see
    # compile_expr / _variant_typed). The ONE Extract case where
    # NULL ⇔ missing does hold: a provably-absent source — every row
    # is missing, no no-match can occur, and the result stays a typed
    # NULL so purely typed pipelines don't sprout variants.
    if isinstance(e, Extract):
        return _provably_missing(e.source, schema)
    if isinstance(e, BinOp) and e.op in _ARITH_OPS:
        return _missing_as_null(e.left, schema) or _missing_as_null(e.right, schema)
    return False


def _compile_bool(e: Expr, schema) -> Column:
    """Boolean-context compilation (``not``/``and``/``or`` operands):
    a dynamic value converts through Value::to_bool with missing →
    unknown (expr_eval.rs eval_to_bool!); typed expressions are
    already boolean."""
    c = compile_expr(e, schema)
    if _variant_typed(e, schema):
        from miso_spark import dynamic as dyn

        return dyn.vbool(c)
    return c


def _may_be_missing(e: Expr, schema) -> bool:
    """True when ``e``'s evaluation can be a MISSING value (not merely
    false/null-payload): it references a provably-absent field or a
    per-row dynamic (variant) field anywhere in its tree. Drives the
    reference's eval_to_bool! poisoning (expr_eval.rs:13-19) — an
    and/or/case whose operand is missing becomes unknown — without
    touching plans for fully-typed expressions (where operands compile
    to proper booleans and the wrapper would only break conjunct
    pushdown)."""
    if isinstance(e, Field):
        return _provably_missing(e, schema) or _variant_typed(e, schema)
    if isinstance(e, BinOp):
        return _may_be_missing(e.left, schema) or _may_be_missing(e.right, schema)
    if isinstance(e, (Not, Exists)):
        # exists() of anything is a definite boolean; not(missing)
        # propagates
        return not isinstance(e, Exists) and _may_be_missing(e.expr, schema)
    if isinstance(e, In):
        return _may_be_missing(e.expr, schema)
    if isinstance(e, Between):
        return any(
            _may_be_missing(x, schema) for x in (e.expr, e.low, e.high)
        )
    if isinstance(e, Case):
        return any(
            _may_be_missing(x, schema)
            for c, v in e.branches
            for x in (c, v)
        ) or _may_be_missing(e.default, schema)
    if isinstance(e, Extract):
        return _may_be_missing(e.source, schema)
    if isinstance(e, (Bin, Cast)):
        return _may_be_missing(e.expr, schema)
    return False  # Lit / Duration / Now


def compile_expr(e: Expr, schema=None) -> Column:
    """Compile an Expr AST node into a PySpark Column.

    ``schema`` (the input DataFrame's StructType, when the caller has
    one) enables type-directed choices like string-Plus → concat."""
    if isinstance(e, Field):
        if schema is not None and e.path.is_missing_in(schema):
            # dynamic-log missing-field semantics (tests.rs
            # project_nonexistent_field_arithmetic / filter_missing):
            # a provably-absent field evaluates as null — comparisons
            # filter the row, arithmetic yields null, exists() is
            # false — instead of Spark's UNRESOLVED_COLUMN error
            return F.lit(None)
        return e.path.to_column(schema)
    if isinstance(e, Lit):
        return F.lit(e.value)
    if isinstance(e, Duration):
        # day-time interval keeps timestamp arithmetic exact
        return F.expr(f"INTERVAL '{e.seconds}' SECOND")
    if isinstance(e, BinOp):
        return _compile_binop(e, schema)
    if isinstance(e, Not):
        return ~_compile_bool(e.expr, schema)
    if isinstance(e, Exists):
        return compile_expr(e.expr, schema).isNotNull()
    if isinstance(e, In):
        if _variant_typed(e.expr, schema) or any(
            _variant_typed(i, schema) for i in e.items
        ):
            # dynamic `in` is a chain of total-order equalities
            # (interpreter/mod.rs is_in): a Null literal item equals a
            # PRESENT null; a missing base makes the whole test
            # unknown, but a missing ITEM is merely skipped (only
            # Some(true) matches count) — so each term coalesces its
            # unknown to false and only the base's missing survives
            from functools import reduce

            bk = _variant_key(e.expr, schema)
            hit = reduce(
                lambda a, b: a | b,
                [
                    F.coalesce(bk == _variant_key(i, schema), F.lit(False))
                    for i in e.items
                ],
            )
            return F.when(bk.isNotNull(), hit)
        # a null literal in the list matches null values (tests.rs
        # in_operator_with_null_in_list: In is a chain of the
        # reference's null-aware equality)
        base = compile_expr(e.expr, schema)
        items = [i for i in e.items if not (isinstance(i, Lit) and i.value is None)]
        # an item of a provably DIFFERENT total-order class can never
        # equal the base (value/mod.rs class ranks) — drop it instead
        # of letting Spark's isin coercion crash (string base, int item
        # → ANSI cast error on the first non-numeric row)
        bc = _static_class(e.expr, schema)
        if bc is not None:
            items = [
                i
                for i in items
                if _static_class(i, schema) in (None, bc)
            ]
        # PROPER boolean, not SQL-unknown: In is a chain of the
        # total-order equality, and Value::Null == Int(0) is FALSE —
        # so a null base must give false (and `not(x in (0))` must
        # KEEP it, exactly like `not(x == 0)` does). A bare isin would
        # yield SQL null for a null base, flipping under not().
        c = (
            base.isNotNull()
            & base.isin(*[compile_expr(i, schema) for i in items])
            if items
            else F.lit(False)
        )
        if any(isinstance(i, Lit) and i.value is None for i in e.items):
            c = c | base.isNull()
        if _missing_as_null(e.expr, schema):
            # a missing base poisons the whole In (eval! evaluates the
            # base first) — unknown, so the row drops and not(in)
            # drops it too, never the proper-FALSE present-null form
            c = F.when(base.isNotNull(), c)
        return c
    if isinstance(e, Between):
        if (
            _variant_typed(e.expr, schema)
            or _variant_typed(e.low, schema)
            or _variant_typed(e.high, schema)
        ):
            # dynamic between = total-order gte/lte chain; a Null
            # endpoint needs no special case — every present value is
            # >= Value::Null under the order, which IS "unbounded"
            from miso_spark import dynamic as dyn

            xk = _variant_key(e.expr, schema)
            c = dyn.vcompare("gte", xk, _variant_key(e.low, schema)) & dyn.vcompare(
                "lte", xk, _variant_key(e.high, schema)
            )
            return ~c if e.negated else c
        # typed between compiles as the reference parser's exact
        # desugaring (parser.rs:755-765: between → Gte AND Lte,
        # !between → the negation, identical under the total order)
        # through the total-order comparison forms. That makes it a
        # PROPER boolean — a bare Column.between would be SQL-unknown
        # for a null base, flipping under !between where the reference
        # (null < any bound) keeps the row — and it gives null
        # endpoints the order's own meaning: everything ≥ Null, so a
        # null low bound is unbounded (tests.rs between_null_endpoints)
        # and only Null ≤ Null. Cross-class endpoints resolve by class
        # rank instead of a crashing coercion.
        c = _compile_binop(BinOp("gte", e.expr, e.low), schema) & _compile_binop(
            BinOp("lte", e.expr, e.high), schema
        )
        return ~c if e.negated else c
    if isinstance(e, Case):
        # conditions compile in boolean context: a bare dynamic field
        # as a predicate (iff(x, ...)) converts through Value::to_bool.
        # A condition that can be MISSING gets an explicit unknown arm
        # right after its true-arm: the reference's eval_to_bool! makes
        # a missing predicate poison the whole case once evaluation
        # reaches it (earlier true branches still short-circuit) —
        # Spark's when() would silently treat it as false instead.
        col: Optional[Column] = None
        for cond, val in e.branches:
            c = _compile_bool(cond, schema)
            v = compile_expr(val, schema)
            col = F.when(c, v) if col is None else col.when(c, v)
            if _may_be_missing(cond, schema):
                col = col.when(c.isNull(), F.lit(None))
        assert col is not None, "case requires at least one branch"
        return col.otherwise(compile_expr(e.default, schema))
    if isinstance(e, Extract):
        # Over a DYNAMIC-model source the result is a VARIANT so both
        # reference outcomes survive: a missing source propagates as
        # SQL NULL (Val::not_exist, interpreter/mod.rs:406-409), while
        # a no-match on a PRESENT string is a present Value::Null
        # (string_ops.rs:30-32 returns Ok(Some(Value::Null))) —
        # encoded as a VOID variant so comparisons/In/dcount see the
        # total-order smallest value, not a poisoning missing.
        if _provably_missing(e.source, schema):
            # absent source: every row's extract is MISSING — a typed
            # NULL (tagged via _missing_as_null's Extract arm) keeps
            # typed pipelines typed (r13 soak find #2: a variant here
            # flipped a pushed-into-union count branch dynamic-model)
            return F.lit(None).cast("string")
        dyn_src = _extract_dynamic_src(e, schema)
        src = compile_expr(e.source, schema)
        if dyn_src:
            from miso_spark import dynamic as dyn

            # non-string present values evaluate as missing (the
            # reference bails the query, interpreter/mod.rs:421-423;
            # see dynamic.as_string)
            src = dyn.as_string(src)

        def _dyn_wrap(res: Column) -> Column:
            if not dyn_src:
                return res
            from miso_spark import dynamic as dyn

            return F.when(
                src.isNotNull(),
                F.coalesce(dyn.wrap_variant(res), dyn.variant_lit(None)),
            )

        # regexp_extract yields '' on no-match; miso yields null (string_ops.rs:14)
        if isinstance(e.pattern, Lit) and isinstance(e.group, Lit):
            pat_s, grp_i = str(e.pattern.value), int(e.group.value)
            # string_ops.rs:15-17 bails on a negative group at eval
            # time (a query error, not a per-row crash)…
            if grp_i < 0:
                raise ValueError(
                    "extract: capture group index must be non-negative"
                )
            # …and caps.get(out_of_range) yields NULL (string_ops.rs:37,
            # test_extract_invalid_group), where Spark's regexp_extract
            # raises REGEX_GROUP_INDEX at runtime. Count the pattern's
            # groups up front; Java-only syntax Python can't parse
            # falls through to Spark's own validation.
            try:
                n_groups = re.compile(pat_s).groups
            except re.error:
                n_groups = None
            if n_groups is not None and grp_i > n_groups:
                return _dyn_wrap(F.lit(None).cast("string"))
            extracted = F.regexp_extract(src, pat_s, grp_i)
            matched = src.rlike(pat_s)
        else:
            # dynamic pattern/group (field arguments — the reference
            # evaluates extract per-row, parser_tests.rs:1276); Spark's
            # RegExpExtract accepts non-foldable patterns
            pat = compile_expr(e.pattern, schema)
            grp = compile_expr(e.group, schema).cast("int")
            extracted = F.call_function("regexp_extract", src, pat, grp)
            matched = F.call_function("regexp_like", src, pat)
        return _dyn_wrap(F.when(matched, extracted))
    if isinstance(e, Bin):
        return _compile_bin(e, schema)
    if isinstance(e, Cast):
        if _variant_typed(e.expr, schema):
            return _compile_dyn_cast(e, schema)
        return compile_expr(e.expr, schema).cast(_CAST_TYPES[e.type])
    if isinstance(e, Now):
        return F.current_timestamp()
    raise TypeError(f"cannot compile {type(e).__name__}")


def _provably_missing(x: Expr, schema) -> bool:
    return (
        isinstance(x, Field)
        and schema is not None
        and x.path.is_missing_in(schema)
    )


#: total-order type classes (value/mod.rs:147-207):
#: Null < Bool < numbers < Timestamp < Timespan < String < Array < Object
(
    _CLASS_NULL,
    _CLASS_BOOL,
    _CLASS_NUM,
    _CLASS_TS,
    _CLASS_SPAN,
    _CLASS_STR,
    _CLASS_ARR,
    _CLASS_OBJ,
) = range(8)


def _static_class(e: Expr, schema) -> Optional[int]:
    """Total-order class of ``e``'s STATIC type — a non-null literal's
    value class, or a schema column's type class. None when
    undeterminable (variant columns, computed exprs, null literals)."""
    import datetime as _dt

    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DateType,
        DayTimeIntervalType,
        MapType,
        NumericType,
        StringType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    if isinstance(e, Lit):
        v = e.value
        if v is None:
            return None
        if isinstance(v, bool):
            return _CLASS_BOOL
        if isinstance(v, (int, float)):
            return _CLASS_NUM
        if isinstance(v, (_dt.datetime, _dt.date)):
            return _CLASS_TS
        if isinstance(v, str):
            return _CLASS_STR
        return None
    if isinstance(e, Duration):
        return _CLASS_SPAN
    if isinstance(e, Field) and schema is not None:
        t = e.path.resolve_type(schema)
        if t is None or FieldPath._is_variant(t):
            return None
        if isinstance(t, BooleanType):
            return _CLASS_BOOL
        if isinstance(t, NumericType):
            return _CLASS_NUM
        if isinstance(t, (TimestampType, TimestampNTZType, DateType)):
            return _CLASS_TS
        if isinstance(t, DayTimeIntervalType):
            return _CLASS_SPAN
        if isinstance(t, StringType):
            return _CLASS_STR
        if isinstance(t, ArrayType):
            return _CLASS_ARR
        if isinstance(t, (StructType, MapType)):
            return _CLASS_OBJ
    return None


def _cross_class_cmp(op: str, l: Column, r: Column, cl: int, cr: int) -> Column:
    """Comparison between operands of provably DIFFERENT total-order
    classes (value/mod.rs:147: class rank decides; classes never tie).
    Spark would instead coerce — `string_col > 3` casts the column and
    CRASHES under ANSI on the first non-numeric value, where the
    reference says every string outranks every number. A null operand
    takes the Null class (smallest). All forms are proper booleans
    built from isNull/isNotNull — parquet-pushable."""
    if op == "eq":
        return l.isNull() & r.isNull()
    if op == "ne":
        return ~(l.isNull() & r.isNull())
    if op == "gt":
        return l.isNotNull() if cl > cr else l.isNotNull() & r.isNull()
    if op == "gte":
        return (l.isNotNull() | r.isNull()) if cl > cr else r.isNull()
    if op == "lt":
        return r.isNotNull() if cl < cr else r.isNotNull() & l.isNull()
    if op == "lte":
        return (r.isNotNull() | l.isNull()) if cl < cr else l.isNull()
    raise ValueError(op)


def _compile_binop(e: BinOp, schema=None, _guard_missing: bool = True) -> Column:
    op = e.op
    # a MISSING operand makes every reference comparison/string-op
    # evaluate to None → the row is filtered, and not()/projection see
    # unknown (impl_cmp's (None, _) arm, interpreter/mod.rs:55). This
    # must precede the total-order forms below — they model PRESENT
    # nulls, which compare as the smallest value instead.
    if op in (_CMP_OPS | _STR_OPS) and (
        _provably_missing(e.left, schema) or _provably_missing(e.right, schema)
    ):
        return F.lit(None).cast("boolean")
    # missing-as-null operands (casts/bins over dynamic values — see
    # _missing_as_null): their typed NULL encodes a MISSING value, so
    # the comparison must evaluate to unknown (row dropped, not()
    # poisoned) when that operand is null — NOT the total-order
    # present-null forms below. Found by the r12 differential's
    # let+cast composition: `extend e1 = tostring(toint(x)) | where
    # not(e1 in (...))` kept missing-x rows where the reference's
    # eval_to_bool! drops them.
    if _guard_missing and op in (_CMP_OPS | _STR_OPS):
        guards = [
            x for x in (e.left, e.right) if _missing_as_null(x, schema)
        ]
        if guards:
            cond = None
            for x in guards:
                c = compile_expr(x, schema).isNotNull()
                cond = c if cond is None else (cond & c)
            return F.when(cond, _compile_binop(e, schema, _guard_missing=False))
    lv = _variant_typed(e.left, schema)
    rv = _variant_typed(e.right, schema)
    if lv or rv:
        return _compile_dyn_binop(e, schema, lv, rv)
    if op in _STR_OPS:
        l, r = compile_expr(e.left, schema), compile_expr(e.right, schema)
        if op == "contains":
            return l.contains(r)
        if op == "startswith":
            return l.startswith(r)
        if op == "endswith":
            return l.endswith(r)
        # has / has_cs need a literal phrase to build the boundary regex
        if not isinstance(e.right, Lit) or not isinstance(e.right.value, str):
            raise ValueError(f"{op} requires a string literal phrase")
        return _has_predicate(l, e.right.value, case_insensitive=(op == "has"))

    if op in _BOOL_OPS:
        return _compile_and_or(e, schema)
    # timestamp +/- duration stays exact via intervals
    l, r = compile_expr(e.left, schema), compile_expr(e.right, schema)
    if op in _CMP_OPS:
        cl, cr = _static_class(e.left, schema), _static_class(e.right, schema)
        if cl is not None and cr is not None and cl != cr:
            return _cross_class_cmp(op, l, r, cl, cr)
    if op == "eq":
        # `x == null` is a null test in the reference (tests.rs
        # filter_eq_null: matches rows whose value IS the present Null)
        if isinstance(e.right, Lit) and e.right.value is None:
            return l.isNull()
        if isinstance(e.left, Lit) and e.left.value is None:
            return r.isNull()
        if isinstance(e.right, Lit):
            # Null == Lit is FALSE (a boolean, not SQL-unknown) under
            # the total order — IsNotNull AND = keeps that exact truth
            # table and is the same conjunctive shape Catalyst's own
            # null-constraint rewrite produces, so pushdown/DPP plans
            # are unchanged
            return l.isNotNull() & (l == r)
        if isinstance(e.left, Lit):
            return r.isNotNull() & (l == r)
        # field-vs-field: the reference compares PRESENT values through
        # Value::cmp, where Null == Null (interpreter/mod.rs impl_cmp +
        # value/mod.rs:151) — null-safe equality, consistent with the
        # engine's null-safe join keys. EqualNullSafe still reaches
        # parquet PushedFilters.
        return l.eqNullSafe(r)
    if op == "ne":
        if isinstance(e.right, Lit) and e.right.value is None:
            return l.isNotNull()
        if isinstance(e.left, Lit) and e.left.value is None:
            return r.isNotNull()
        # Null != <non-null> is TRUE under the total order (Less/Greater
        # ≠ Equal), so != must be null-safe even against a literal
        return ~l.eqNullSafe(r)
    # Ordering comparisons follow the reference's TOTAL order with null
    # smallest (value/mod.rs:151-153: Null < Bool < numbers < ...), so
    # `x <= 5` KEEPS an explicitly-null x (tests.rs
    # null_in_lte_operator) while `x >= 5` drops it. When one side is a
    # non-null literal, half the order is static and the expression
    # stays a pushdown-friendly comparison (optionally OR'd with an
    # IsNull — both parquet-convertible); only field-vs-field falls
    # back to the full when-chain, which parquet couldn't push anyway.
    # (Spark conflates present-null with missing; the reference filters
    # MISSING operands on every comparison — that side of the
    # distinction is unrepresentable in a typed row and is documented
    # at tests/test_workflow_corpus.py.)
    # Literal forms produce PROPER booleans (IsNotNull-AND / IsNull-OR
    # wrappers, both still parquet-convertible), never SQL-unknown: a
    # present null must give false — not unknown — so that `not(x > 5)`
    # KEEPS a null x (Not of Some(false) is Some(true) in the
    # reference) and projected comparisons emit false instead of an
    # omitted key.
    lit_nonnull = lambda x: isinstance(x, Lit) and x.value is not None  # noqa: E731
    if op == "gt":
        if lit_nonnull(e.right):
            return l.isNotNull() & (l > r)  # null l → false: null is smallest
        if lit_nonnull(e.left):
            return r.isNull() | (l > r)  # non-null literal > null → true
        return (
            F.when(l.isNull(), F.lit(False))
            .when(r.isNull(), F.lit(True))
            .otherwise(l > r)
        )
    if op == "gte":
        if lit_nonnull(e.right):
            return l.isNotNull() & (l >= r)
        if lit_nonnull(e.left):
            return r.isNull() | (l >= r)
        return (
            F.when(l.isNull(), r.isNull())
            .when(r.isNull(), F.lit(True))
            .otherwise(l >= r)
        )
    if op == "lt":
        if lit_nonnull(e.left):
            return r.isNotNull() & (l < r)  # null r → false: only null is below it
        if lit_nonnull(e.right):
            return l.isNull() | (l < r)  # null < non-null literal → true
        return (
            F.when(r.isNull(), F.lit(False))
            .when(l.isNull(), F.lit(True))
            .otherwise(l < r)
        )
    if op == "lte":
        if lit_nonnull(e.left):
            return r.isNotNull() & (l <= r)
        if lit_nonnull(e.right):
            return l.isNull() | (l <= r)
        return (
            F.when(r.isNull(), l.isNull())
            .when(l.isNull(), F.lit(True))
            .otherwise(l <= r)
        )
    if op == "add":
        # miso's Plus concatenates strings (interpreter/mod.rs:234):
        # string literals, string-typed columns (schema-resolved), and
        # string-valued sub-expressions all take the concat path.
        if _is_string_typed(e.left, schema) or _is_string_typed(e.right, schema):
            return F.concat(l.cast("string"), r.cast("string"))
        return l + r
    if op == "sub":
        return l - r
    if op == "mul":
        return l * r
    if op == "div":
        return l / r
    raise AssertionError(op)


def _compile_and_or(e: BinOp, schema) -> Column:
    """``and``/``or`` with the reference's evaluation order
    (expr_eval.rs:63-69 + the eval_to_bool! macro): the left operand
    evaluates first — missing poisons the whole expression as unknown;
    a deciding left value (true for or, false for and) SHORT-CIRCUITS
    without the right being able to poison; otherwise the right's
    missing poisons, else the right decides. This differs from SQL's
    Kleene logic, where NULL|true=true and NULL&false=false.

    Fully-typed operand trees can't be missing (comparisons compile to
    proper booleans), so they keep the plain &/| — same semantics,
    and conjunct pushdown stays intact."""
    l = _compile_bool(e.left, schema)
    r = _compile_bool(e.right, schema)
    if not (_may_be_missing(e.left, schema) or _may_be_missing(e.right, schema)):
        return (l & r) if e.op == "and" else (l | r)
    unknown = F.lit(None).cast("boolean")
    if e.op == "or":
        return (
            F.when(l.isNull(), unknown)
            .when(l, F.lit(True))
            .when(r.isNull(), unknown)
            .otherwise(r)
        )
    return (
        F.when(l.isNull(), unknown)
        .when(~l, F.lit(False))
        .when(r.isNull(), unknown)
        .otherwise(r)
    )


def _compile_dyn_binop(e: BinOp, schema, lv: bool, rv: bool) -> Column:
    """Binary op with at least one per-row dynamic (VARIANT) operand —
    the reference's interpreter semantics (interpreter/mod.rs):

    - comparisons run the cross-type total order (sort keys — see
      miso_spark/dynamic.py); a missing operand → unknown → filtered;
    - string ops evaluate the string payload; a present NON-string
      makes the op unknown (the reference aborts the whole query there
      — impl_two_strs_fn bails — which a vectorized plan can't do
      per-row; no observable query distinguishes the two);
    - and/or/not convert through Value::to_bool;
    - arithmetic is numeric-payload based (+ concatenates when both
      sides are strings, interpreter/mod.rs:239).
    """
    from miso_spark import dynamic as dyn

    op = e.op
    if op in _CMP_OPS:
        # scalar-literal fast path: the literal fixes the class, so
        # the total order decomposes into rank test + typed payload
        # comparison — no 4-slot sort-key struct (dyn.vcompare_literal)
        swap = {"eq": "eq", "ne": "ne", "gt": "lt", "gte": "lte",
                "lt": "gt", "lte": "gte"}
        if lv and not rv and isinstance(e.right, Lit):
            fp = dyn.vcompare_literal(
                op, compile_expr(e.left, schema), e.right.value
            )
            if fp is not None:
                return fp
        if rv and not lv and isinstance(e.left, Lit):
            fp = dyn.vcompare_literal(
                swap[op], compile_expr(e.right, schema), e.left.value
            )
            if fp is not None:
                return fp
        return dyn.vcompare(
            op, _variant_key(e.left, schema), _variant_key(e.right, schema)
        )
    if op in _BOOL_OPS:
        return _compile_and_or(e, schema)

    def str_side(x: Expr, is_var: bool) -> Column:
        return dyn.as_string(compile_expr(x, schema)) if is_var else compile_expr(
            x, schema
        )

    if op in _STR_OPS:
        l, r = str_side(e.left, lv), str_side(e.right, rv)
        if op == "contains":
            return l.contains(r)
        if op == "startswith":
            return l.startswith(r)
        if op == "endswith":
            return l.endswith(r)
        if not isinstance(e.right, Lit) or not isinstance(e.right.value, str):
            raise ValueError(f"{op} requires a string literal phrase")
        return _has_predicate(l, e.right.value, case_insensitive=(op == "has"))

    # arithmetic: per-row typed (dynamic.varithmetic) — string+string
    # concatenates, int⊕int stays integer, floats/division go double,
    # missing/unsupported propagate as missing. Both sides lift to
    # variant (literals fold; typed columns wrap).
    def var_side(x: Expr, is_var: bool) -> Column:
        if is_var:
            return compile_expr(x, schema)
        if isinstance(x, Lit):
            return dyn.variant_lit(x.value)
        return dyn.wrap_variant(compile_expr(x, schema))

    return dyn.varithmetic(op, var_side(e.left, lv), var_side(e.right, rv))


def _compile_dyn_cast(e: Cast, schema) -> Column:
    """Casts over per-row dynamic values with the reference's rules
    (interpreter/mod.rs:350-404 Val::cast): tobool is Value::to_bool
    (so tobool("7") is true, not a parse); toint/toreal map null→0,
    bool→0/1, numbers convert (float truncates toward zero), strings
    parse; tostring renders null as "null" and scalars via their
    payload. A MISSING input stays missing; combinations the reference
    ERRORS on (casting arrays/objects, unparseable strings) evaluate
    as missing — a vectorized plan can't abort per-row."""
    from miso_spark import dynamic as dyn

    v = compile_expr(e.expr, schema)
    if e.type == "bool":
        return dyn.vbool(v)
    # single-schema gates (see dynamic.sort_key): routing through
    # vclass would duplicate the class when-chain per arm
    sch = F.schema_of_variant(v)
    is_void = sch == "VOID"
    is_bool = sch == "BOOLEAN"
    is_num = sch.isin(*dyn._NUM_TYPES) | sch.startswith("DECIMAL")
    is_str = sch == "STRING"
    payload_s = F.try_variant_get(v, "$", "string")
    if e.type == "string":
        return (
            F.when(is_void, F.lit("null"))
            .when(is_bool | is_num | is_str, payload_s)
        )
    num = (
        F.when(is_void, F.lit(0.0))
        .when(is_bool, F.try_variant_get(v, "$", "boolean").cast("double"))
        .when(is_num, F.try_variant_get(v, "$", "double"))
        .when(is_str, payload_s.try_cast("double"))
    )
    if e.type in ("int", "long"):
        # strings parse as INTEGERS in the reference, STRICTLY
        # (i64::parse — "2.5", " 5" and unicode digits all error;
        # Spark's try_cast would trim whitespace, so gate on an exact
        # ASCII-integer match first); numerics truncate toward zero
        # like `as i64`. The result stays LONG for both toint and
        # tolong: the reference's CastType::Int IS i64 (expr.rs). A
        # float beyond i64 range becomes missing via try_cast (Rust
        # would saturate; ANSI cast would abort the query).
        strict_int = F.when(
            payload_s.rlike(r"^[+-]?[0-9]+$"), payload_s.try_cast("long")
        )
        return (
            F.when(is_str, strict_int).otherwise(num.try_cast("long"))
        )
    return num.cast(_CAST_TYPES[e.type])


def _compile_bin(e: Bin, schema=None) -> Column:
    if _variant_typed(e.expr, schema):
        # numeric binning over a dynamic value: non-numeric rows are
        # missing (the reference bails per-row)
        from miso_spark import dynamic as dyn

        if isinstance(e.size, Duration):
            raise ValueError(
                "bin with a timespan size needs a timestamp column; "
                "dynamic (JSON-ingested) values bin numerically — "
                "pass a numeric bin size"
            )
        x = dyn.as_number(compile_expr(e.expr, schema))
        size = compile_expr(e.size, schema)
        return F.floor(x / size) * size
    x = compile_expr(e.expr, schema)
    if isinstance(e.size, Duration):
        secs = e.size.seconds
        bucket = F.floor(F.unix_timestamp(x) / F.lit(secs)) * F.lit(int(secs))
        return F.timestamp_seconds(bucket)
    size = compile_expr(e.size, schema)
    return F.floor(x / size) * size


# ---------------------------------------------------------------------------
# convenience constructors (fluent API)

def lit(v: object) -> Lit:
    return Lit(v)


def col(name: str) -> Field:
    return Field.of(name)


def days(n: float) -> Duration:
    return Duration(n * 86400.0)


def hours(n: float) -> Duration:
    return Duration(n * 3600.0)


def minutes(n: float) -> Duration:
    return Duration(n * 60.0)


def seconds(n: float) -> Duration:
    return Duration(float(n))


def rename_fields(e: Expr, mapping: dict) -> Expr:
    """Rewrite top-level field names per ``mapping`` ({visible:
    source}) — the expression arm of the reference's FieldReplacer
    (miso-optimizations/src/field_replacer.rs), which maps a scan's
    static_fields back to the connector's real column names before the
    connector sees a pushed-down step."""
    if not mapping:
        return e

    def r(x: Expr) -> Expr:
        return rename_fields(x, mapping)

    if isinstance(e, Field):
        (head, idxs), *rest = e.path.segments
        if head in mapping:
            from miso_spark.fields import FieldPath

            return Field(FieldPath(((mapping[head], idxs),) + tuple(rest)))
        return e
    if isinstance(e, BinOp):
        return BinOp(e.op, r(e.left), r(e.right))
    if isinstance(e, Not):
        return Not(r(e.expr))
    if isinstance(e, Exists):
        return Exists(r(e.expr))
    if isinstance(e, In):
        return In(r(e.expr), tuple(r(i) for i in e.items))
    if isinstance(e, Between):
        return Between(r(e.expr), r(e.low), r(e.high), e.negated)
    if isinstance(e, Case):
        return Case(tuple((r(c), r(v)) for c, v in e.branches), r(e.default))
    if isinstance(e, Extract):
        return Extract(r(e.pattern), r(e.group), r(e.source))
    if isinstance(e, Bin):
        return Bin(r(e.expr), r(e.size))
    if isinstance(e, Cast):
        return Cast(e.type, r(e.expr))
    return e  # Lit / Duration / Now
