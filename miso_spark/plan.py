"""Logical plan: a pipeline of query steps.

Parity: miso-workflow-types/src/query.rs (QueryStep enum),
sort.rs, summarize.rs, join.rs, expand.rs, project.rs.

The plan is deliberately declarative — the compiler maps every step to
DataFrame operations so Catalyst performs the optimizations the
reference implements by hand (see SURVEY.md §6).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

from miso_spark.exprs import Expr
from miso_spark.fields import FieldPath


class Step:
    __slots__ = ()


@dataclass(frozen=True)
class Scan(Step):
    connector: str
    collection: str


@dataclass(frozen=True)
class ScanVar(Step):
    """Scan of a let-bound sub-plan (query.rs ScanKind::Var)."""

    name: str


@dataclass(frozen=True)
class ScanRaw(Step):
    """Connector-native query passthrough (query.rs ScanKind::Raw).

    For the Spark 'connector' this is a SQL string executed against the
    registered table views — the analog of sending the raw query string
    to Quickwit/ES.
    """

    connector: str
    collection: str
    query: str


@dataclass(frozen=True)
class Filter(Step):
    expr: Expr


@dataclass(frozen=True)
class ProjectField:
    expr: Expr
    name: str


@dataclass(frozen=True)
class Project(Step):
    fields: tuple[ProjectField, ...]


@dataclass(frozen=True)
class Extend(Step):
    fields: tuple[ProjectField, ...]


@dataclass(frozen=True)
class Rename(Step):
    pairs: tuple[tuple[str, str], ...]  # (from, to)


@dataclass(frozen=True)
class Expand(Step):
    """mv-expand. kind='array' explodes array elements; kind='bag'
    explodes map/object entries into {key, value} structs.
    (expand.rs ExpandKind)
    """

    fields: tuple[str, ...]
    kind: str = "bag"


@dataclass(frozen=True)
class Limit(Step):
    n: int


@dataclass(frozen=True)
class Sort:
    by: str
    order: str = "asc"  # asc|desc
    nulls: str = "last"  # first|last  (miso default: last — sort.rs)


@dataclass(frozen=True)
class SortStep(Step):
    sorts: tuple[Sort, ...]


@dataclass(frozen=True)
class Top(Step):
    sorts: tuple[Sort, ...]
    n: int


@dataclass(frozen=True)
class Agg:
    kind: str  # count|countif|dcount|dcount_approx|sum|avg|min|max
    arg: Optional[Expr] = None  # countif: predicate; others: field expr


@dataclass(frozen=True)
class ByField:
    expr: Expr
    name: str


@dataclass(frozen=True)
class SummarizeStep(Step):
    aggs: tuple[tuple[str, Agg], ...]  # (output name, agg)
    by: tuple[ByField, ...] = ()
    #: ENGINE-INTERNAL (never parsed from a frontend): keep rows whose
    #: group key is null/missing instead of the reference's pre-group
    #: drop (summarize.rs:151). Used by the union split of dcount
    #: (split_summarize_for_union): the dcount arg joins the partial's
    #: group keys, and its null bucket is a DISTINCT dcount value the
    #: merge must still see (tests.rs dcount_with_nulls) — the partial
    #: is never user-visible, so the null-key drop contract doesn't
    #: apply to it. Wire connectors refuse to absorb these (terms/
    #: stats-by aggregations drop missing keys service-side).
    keep_null_keys: bool = False
    #: ENGINE-INTERNAL: this summarize is the per-branch PARTIAL of a
    #: union split (split_summarize_for_union). Its min/max outputs
    #: encode the reference's MinMax STATE (summarize.rs:493
    #: Option<Value>, None when no value arrived), so their SQL NULL
    #: means "empty state" (missing) — the compiler tags them
    #: MISSING_AS_NULL_MD so the union's variant lift keeps them
    #: SQL-null and the merge's min/max SKIPS them, exactly like the
    #: reference's state merge. Only the FINAL (user-visible) render
    #: maps an empty state to a present Value::Null (summarize.rs:619
    #: unwrap_or) — r13 soak find: without this, a dynamic-model
    #: branch with the agg column absent lifted the empty partial to
    #: a present VOID null, which then WON the merged min.
    partial: bool = False


@dataclass(frozen=True)
class Distinct(Step):
    fields: tuple[str, ...] = ()  # empty → all columns


def distinct_to_summarize(fields) -> SummarizeStep:
    """THE fielded-distinct lowering: `distinct f1, f2` IS
    `summarize by f1, f2` (query_to_workflow.rs:146), so null group
    keys drop on every execution path. Single source of truth for the
    kql parser, the Plan builder, the compiler's direct-construction
    fallback and rewrite.lower_distinct."""
    from miso_spark.exprs import Field as _F

    return SummarizeStep((), tuple(ByField(_F.of(f), f) for f in fields))


@dataclass(frozen=True)
class Union(Step):
    sub: "Plan"
    #: ENGINE-INTERNAL (never parsed from a frontend): the kinds of
    #: result-shaping steps ("limit"/"topn"/"summarize"/"count") the
    #: OPTIMIZER copied into this union's branches, leaving a merge
    #: copy engine-side after the union run (push_steps_into_union).
    #: Connector negotiation may only merge a result-shaped handle
    #: into one multi-index search when the shaping is covered here —
    #: a USER-written per-branch aggregate/limit has no engine-side
    #: merge, so one merged request would collapse the union-all's
    #: per-branch rows (r11 review find).
    pushed: frozenset = frozenset()


@dataclass(frozen=True)
class JoinStep(Step):
    left_on: str
    right_on: str
    sub: "Plan"
    how: str = "inner"  # inner|left|right|outer
    partitions: int = 1  # parity with join.rs partitions hint
    broadcast: bool = False


@dataclass(frozen=True)
class CountStep(Step):
    pass


@dataclass(frozen=True)
class Tee(Step):
    connector: str
    collection: str


@dataclass(frozen=True)
class Write(Step):
    connector: str
    collection: str


@dataclass(frozen=True)
class Let(Step):
    name: str
    sub: "Plan"


@dataclass(frozen=True)
class Plan:
    steps: tuple[Step, ...] = ()

    # ---- fluent builder -------------------------------------------------
    def _with(self, step: Step) -> "Plan":
        return Plan(self.steps + (step,))

    @staticmethod
    def scan(connector: str, collection: str) -> "Plan":
        return Plan((Scan(connector, collection),))

    @staticmethod
    def scan_var(name: str) -> "Plan":
        return Plan((ScanVar(name),))

    def where(self, expr: Expr) -> "Plan":
        return self._with(Filter(expr))

    def project(self, *fields: ProjectField) -> "Plan":
        return self._with(Project(tuple(fields)))

    def extend(self, *fields: ProjectField) -> "Plan":
        return self._with(Extend(tuple(fields)))

    def rename(self, *pairs: tuple[str, str]) -> "Plan":
        return self._with(Rename(tuple(pairs)))

    def mv_expand(self, *fields: str, kind: str = "array") -> "Plan":
        return self._with(Expand(tuple(fields), kind))

    def take(self, n: int) -> "Plan":
        return self._with(Limit(n))

    def sort(self, *sorts: Sort) -> "Plan":
        return self._with(SortStep(tuple(sorts)))

    def top(self, n: int, *sorts: Sort) -> "Plan":
        return self._with(Top(tuple(sorts), n))

    def summarize(self, aggs: dict[str, Agg], by: Sequence[ByField] = ()) -> "Plan":
        return self._with(SummarizeStep(tuple(aggs.items()), tuple(by)))

    def distinct(self, *fields: str) -> "Plan":
        if fields:
            return self._with(distinct_to_summarize(fields))
        return self._with(Distinct(()))

    def union(self, sub: "Plan") -> "Plan":
        return self._with(Union(sub))

    def join(
        self,
        sub: "Plan",
        left_on: str,
        right_on: str,
        how: str = "inner",
        partitions: int = 1,
        broadcast: bool = False,
    ) -> "Plan":
        return self._with(JoinStep(left_on, right_on, sub, how, partitions, broadcast))

    def count(self) -> "Plan":
        return self._with(CountStep())

    def tee(self, connector: str, collection: str) -> "Plan":
        return self._with(Tee(connector, collection))

    def write(self, connector: str, collection: str) -> "Plan":
        return self._with(Write(connector, collection))
