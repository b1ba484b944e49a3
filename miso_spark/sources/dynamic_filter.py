"""Dynamic filtering for joins touching connector-backed scans.

Behavioral parity with the reference's ``DynamicFilter`` optimization
(miso-optimizations/src/dynamic_filter.rs:93-127): when one join side
provably has few distinct values on its join key — known from an
absorbed limit/count, a summarize's group keys, or connector field
stats (stats.rs ``distinct_count``) — the engine computes that side
first, observes its key values, and pushes ``key IN (values...)`` into
the other side's scan. For a connector-backed consumer that terms
filter lands in the wire request (scan.rs:102 apply_dynamic_filter →
``connector.apply_filter``); for a file-backed consumer it becomes a
plan filter Catalyst pushes into the parquet scan (PushedFilters with
row-group skipping). At 100 TB this is the difference between scanning
an index and scanning a slice of it.

Deliberate divergences from the reference, both on the side of
correctness (the driver's DuckDB oracle gate):

- **The negation branch is opt-in and off by default.** The reference's
  catch-all (dynamic_filter.rs:117-124) handles e.g. a left join whose
  only small side is the right by pushing ``NOT key IN (...)`` into the
  *preserved* side's scan — which drops the matched rows' joined
  output. ``decide(..., allow_negation=True)`` reproduces the
  reference's table (and ``build_in_filter`` the ``Not`` wrapping of
  join.rs:315) for parity testing, but the compiler never selects it.
- **Consumer-side steps must commute with a filter.** The reference's
  pattern admits Limit/TopN/Summarize between the consumer scan and the
  join while the dynamic filter applies at the scan — reordering the
  filter before those steps changes e.g. which rows a ``take 10``
  keeps. Here injection requires every step between the consumer scan
  and the join to be filter-commutable (filter/sort/project/extend/
  rename), so plan semantics are preserved exactly. Bounds on the
  *producer* side still use limits/summarize freely — the producer's
  output is observed, not rewritten.
"""

from __future__ import annotations

from miso_spark import plan as P
from miso_spark.exprs import Expr, Field, In, Lit, Not

#: miso-optimizations/src/lib.rs:96
DEFAULT_MAX_DISTINCT = 10_000

#: step kinds a filter commutes past (consumer-side injection guard)
_COMMUTE_SAFE = (P.Filter, P.SortStep, P.Project, P.Extend, P.Rename)

#: step kinds the bound walk understands (the reference's pattern set,
#: dynamic_filter.rs pattern!: Count Limit TopN Summarize Sort Filter
#: Project Extend Rename)
_WALKABLE = _COMMUTE_SAFE + (P.CountStep, P.Limit, P.Top, P.SummarizeStep)


def _resolve_fields(fields: list[str], project_fields, is_extend: bool) -> bool:
    """dynamic_filter.rs:140 resolve_fields: walk each tracked field
    back through a project/extend — a field produced by a non-field
    expression kills the walk; extend passes untouched fields through."""
    for i, f in enumerate(fields):
        pf = next((p for p in project_fields if p.name == f), None)
        if pf is not None:
            if not isinstance(pf.expr, Field) or any(
                idxs for _, idxs in pf.expr.path.segments
            ):
                return False
            fields[i] = str(pf.expr.path)
        elif not is_extend:
            return False
    return True


def max_distinct_count(
    join_field: str, steps_after_scan, stats_get
) -> int | None:
    """dynamic_filter.rs:158 calculate_max_distinct_count: an upper
    bound on the distinct values of ``join_field`` at the join, walking
    the steps between the scan and the join in reverse. ``stats_get``
    maps a scan-level field name to its connector ``distinct_count``
    (or None). Returns None when no bound is provable."""
    dcount: int | None = None
    prev_dcount: int | None = None
    fields = [join_field]

    for step in reversed(list(steps_after_scan)):
        if isinstance(step, P.CountStep):
            dcount = 1
        elif isinstance(step, P.Limit):
            dcount = step.n if dcount is None else min(dcount, step.n)
        elif isinstance(step, P.Top):
            dcount = step.n if dcount is None else min(dcount, step.n)
        elif isinstance(step, P.SummarizeStep):
            if prev_dcount is not None:
                # two summarizes deep — the reference punts (":178")
                return None
            prev_dcount, dcount = dcount, None
            fields = [bf.name for bf in step.by]
        elif isinstance(step, P.Project):
            if not _resolve_fields(fields, step.fields, False):
                return None
        elif isinstance(step, P.Extend):
            if not _resolve_fields(fields, step.fields, True):
                return None
        elif isinstance(step, P.Rename):
            renames = dict(step.pairs)  # from → to
            back = {to: frm for frm, to in renames.items()}
            fields = [back.get(f, f) for f in fields]
        elif isinstance(step, (P.SortStep, P.Filter)):
            pass
        else:
            return None

    # connector stats on the resolved scan-level fields: the product of
    # per-field distinct counts bounds the key count (":205-216")
    dcounts = [stats_get(f) for f in fields]
    if all(d is not None for d in dcounts):
        prod = 1
        for d in dcounts:
            prod *= d
        dcount = prod if dcount is None else min(prod, dcount)

    if prev_dcount is None:
        return dcount
    return prev_dcount if dcount is None else min(dcount, prev_dcount)


def decide(
    how: str,
    left_dcount: int | None,
    right_dcount: int | None,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
    allow_negation: bool = False,
) -> tuple[bool, bool] | None:
    """dynamic_filter.rs:93-127 producer selection. Returns
    ``(producer_is_left, negated)`` or None (no dynamic filter).
    Unprovable bounds count as ``max_distinct`` (the reference's
    ``unwrap_or``)."""
    ld = max_distinct if left_dcount is None else left_dcount
    rd = max_distinct if right_dcount is None else right_dcount
    if ld >= max_distinct and rd >= max_distinct:
        return None
    if how == "inner":
        if ld < max_distinct and rd < max_distinct:
            return (ld <= rd, False)
        return (True, False) if ld < max_distinct else (False, False)
    if how == "left" and ld < max_distinct:
        return (True, False)
    if how == "right" and rd < max_distinct:
        return (False, False)
    # the reference's catch-all: negated filter on the preserved side
    # (dynamic_filter.rs:117-124 add_not_to_dynamic_filter). Unsound
    # for execution (module docstring) — parity surface only.
    if allow_negation:
        return (ld <= rd, True)
    return None


def build_in_filter(field: str, values, negated: bool = False) -> Expr:
    """DynamicFilterTx::send parity (miso-workflow/src/join.rs:310-319):
    the observed key set as ``field IN (...)``, wrapped in ``Not`` for
    the negation case."""
    expr: Expr = In(Field.of(field), tuple(Lit(v) for v in values))
    if negated:
        expr = Not(expr)
    return expr


def resolve_field_to_scan(field: str, steps) -> str | None:
    """The scan-level name of ``field`` as observed after ``steps``
    (project/extend/rename walked in reverse, filter/sort transparent);
    None when the field is computed or a step blocks resolution."""
    fields = [field]
    for step in reversed(list(steps)):
        if isinstance(step, P.Project):
            if not _resolve_fields(fields, step.fields, False):
                return None
        elif isinstance(step, P.Extend):
            if not _resolve_fields(fields, step.fields, True):
                return None
        elif isinstance(step, P.Rename):
            back = {to: frm for frm, to in step.pairs}
            fields = [back.get(f, f) for f in fields]
        elif isinstance(step, (P.SortStep, P.Filter)):
            pass
        else:
            return None
    return fields[0]


def max_rows_bound(steps_after_scan, stats_get) -> int | None:
    """An upper bound on the ROW count a plan branch can produce —
    drives the broadcast-side choice for engine-vs-connector joins
    (lib.rs:295-301's stated purpose for connector stats). Limits and
    counts bound rows directly; a summarize bounds rows by the product
    of its group keys' connector distinct counts."""
    steps = list(steps_after_scan)
    bound: int | None = None

    def tighten(n: int) -> None:
        nonlocal bound
        bound = n if bound is None else min(bound, n)

    for idx, step in enumerate(steps):
        if isinstance(step, P.CountStep):
            tighten(1)
        elif isinstance(step, (P.Limit, P.Top)):
            tighten(step.n)
        elif isinstance(step, P.SummarizeStep):
            groups = 1
            for bf in step.by:
                if not isinstance(bf.expr, Field) or any(
                    idxs for _, idxs in bf.expr.path.segments
                ):
                    groups = None
                    break
                name = resolve_field_to_scan(str(bf.expr.path), steps[:idx])
                d = stats_get(name) if name is not None else None
                if d is None:
                    groups = None
                    break
                groups *= d
            if groups is not None:
                tighten(groups)
        elif isinstance(step, _COMMUTE_SAFE):
            pass
        else:
            # mv-expand / union / join can grow rows — no bound
            return None
    return bound


def consumer_steps_commute(steps) -> bool:
    """True when every step between the consumer's scan and the join
    commutes with a filter, so scan-level injection preserves plan
    semantics exactly (module docstring, divergence 2)."""
    return all(isinstance(s, _COMMUTE_SAFE) for s in steps)
