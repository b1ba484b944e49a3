"""Expr → Splunk SPL filter compiler.

Behavioral parity with the reference's Splunk pushdown translation
(miso-connectors/src/splunk/mod.rs compile_filter_to_spl, :647-856):
indexed-lookup predicates become ``| search`` terms, evaluation
predicates become ``| where`` clauses, an AND may split into one of
each ("batched"), and anything else returns None so the engine keeps
the predicate — the Connector::apply_filter whole-or-nothing contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from miso_spark.exprs import Between, BinOp, Exists, Expr, Extract, Field, In, Lit, Not


@dataclass(frozen=True)
class SplFilter:
    """search: fast indexed `| search` term; where: `| where` clause.
    Both set = the reference's Batched result (one op of each).
    ``ops``: trailing complex op tuples (the RexThenWhere form,
    splunk/mod.rs:615: ``('rex', field, pattern)`` +
    ``('where', ...)`` + ``('fields_minus', tmp)``) — emitted after
    search/where, can't participate in OR/NOT."""

    search: str | None = None
    where: str | None = None
    ops: tuple = ()

    def single(self) -> tuple[str, str] | None:
        """(kind, text) when exactly one clause kind is present —
        OR/NOT can only wrap single-kind results (mod.rs as_str;
        Batched/RexThenWhere results have no single string form)."""
        if self.ops:
            return None
        if self.search is not None and self.where is None:
            return ("search", self.search)
        if self.where is not None and self.search is None:
            return ("where", self.where)
        return None


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _val(v: object) -> str:
    """format_spl_value (mod.rs:571)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f'"{_esc(v)}"'
    if isinstance(v, datetime):
        return v.isoformat() + ("" if v.tzinfo else "Z")
    return str(v)


def _val_search(v: object) -> str:
    """format_spl_value_for_search (mod.rs:583): strings wrapped in
    CASE() for case-sensitive `| search` matching."""
    if isinstance(v, str):
        return f'CASE("{_esc(v)}")'
    return _val(v)


def _field(e: Expr) -> str | None:
    if not isinstance(e, Field) or any(idxs for _, idxs in e.path.segments):
        return None
    return str(e.path)


def _field_lit(l: Expr, r: Expr, commute: bool = False) -> tuple[str, object] | None:
    f = _field(l)
    if f is not None and isinstance(r, Lit) and r.value is not None:
        return f, r.value
    if commute:
        f = _field(r)
        if f is not None and isinstance(l, Lit) and l.value is not None:
            return f, l.value
    return None


def _and_combine(parts: list[str]) -> str:
    return parts[0] if len(parts) == 1 else "(" + " AND ".join(parts) + ")"


def _flatten(e: Expr, op: str) -> list[Expr]:
    if isinstance(e, BinOp) and e.op == op:
        return _flatten(e.left, op) + _flatten(e.right, op)
    return [e]


_CMP = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}


def _extract_parts(e: Expr) -> tuple[str, int, str] | None:
    """(pattern, group, source_field) when ``e`` is a fully-literal
    extract over a plain field (compile_extract_filter's guards,
    splunk/mod.rs:594-609)."""
    if not isinstance(e, Extract):
        return None
    if not isinstance(e.pattern, Lit) or not isinstance(e.pattern.value, str):
        return None
    if not isinstance(e.group, Lit) or not isinstance(e.group.value, int):
        return None
    src = _field(e.source)
    if src is None:
        return None
    return e.pattern.value, e.group.value, src


def _rex_ops(ex: Extract, make_where) -> tuple | None:
    """The RexThenWhere op triple (splunk/mod.rs:615 into_spl_ops):
    rex into a temp field, a where over it (``make_where(tmp)`` builds
    the clause — a callable, not a format template, so user literals
    containing ``{``/``}`` can't break str.format), then the temp
    field dropped from the output."""
    parts = _extract_parts(ex)
    if parts is None:
        return None
    pattern, group, src = parts
    tmp = f"_extract_{src.replace('.', '_')}"
    spl_pat = convert_to_splunk_named_capture(pattern, group, tmp)
    if spl_pat is None:
        return None
    return (
        ("rex", src, spl_pat),
        ("where", make_where(tmp)),
        ("fields_minus", tmp),
    )


def compile_filter_spl(e: Expr) -> SplFilter | None:
    if isinstance(e, BinOp):
        if e.op == "or":
            results = [compile_filter_spl(c) for c in _flatten(e, "or")]
            singles = [r.single() if r else None for r in results]
            if any(s is None for s in singles):
                return None
            combined = "(" + " OR ".join(t for _, t in singles) + ")"
            kind = "where" if any(k == "where" for k, _ in singles) else "search"
            return SplFilter(**{kind: combined})
        if e.op == "and":
            results = [compile_filter_spl(c) for c in _flatten(e, "and")]
            if any(r is None for r in results):
                return None
            search_parts = [r.search for r in results if r.search is not None]
            where_parts = [r.where for r in results if r.where is not None]
            ops = tuple(op for r in results for op in r.ops)
            return SplFilter(
                search=_and_combine(search_parts) if search_parts else None,
                where=_and_combine(where_parts) if where_parts else None,
                ops=ops,
            )
        if e.op == "eq":
            # extract(p, g, src) == "lit" → rex + where + drop-temp
            # (splunk/mod.rs:735 compile_extract_filter)
            for ex, lit in ((e.left, e.right), (e.right, e.left)):
                if isinstance(ex, Extract) and isinstance(lit, Lit) and lit.value is not None:
                    val = _val(lit.value)
                    ops = _rex_ops(ex, lambda t: f"{t}={val}")
                    if ops is None:
                        return None
                    return SplFilter(ops=ops)
            fl = _field_lit(e.left, e.right, commute=True)
            if fl is None:
                return None
            return SplFilter(search=f"{fl[0]}={_val_search(fl[1])}")
        if e.op == "ne":
            fl = _field_lit(e.left, e.right)
            if fl is None:
                return None
            # Splunk's `f!=v` (like its range forms below) does NOT
            # match events missing the field, but the engine's
            # total-order ne/lt/lte KEEP them (null is the smallest
            # value — r11 pushdown-fuzzer find). `OR NOT f=*` adds the
            # absent-field events back; same engine-over-emission
            # precedent as the dc() companions.
            return SplFilter(
                search=f"({fl[0]}!={_val_search(fl[1])} OR NOT {fl[0]}=*)"
            )
        if e.op in _CMP:
            fl = _field_lit(e.left, e.right)
            if fl is None:
                return None
            if e.op in ("lt", "lte"):
                return SplFilter(
                    search=f"({fl[0]}{_CMP[e.op]}{_val(fl[1])}"
                    f" OR NOT {fl[0]}=*)"
                )
            return SplFilter(search=f"{fl[0]}{_CMP[e.op]}{_val(fl[1])}")
        if e.op == "startswith":
            fl = _field_lit(e.left, e.right)
            if fl is None or not isinstance(fl[1], str):
                return None
            return SplFilter(search=f"{fl[0]}={fl[1]}*")
        if e.op == "has":
            fl = _field_lit(e.left, e.right)
            # empty phrase = engine-side false (string_ops.rs:86-88);
            # like(x, "%%") would instead match every non-null value
            if fl is None or not isinstance(fl[1], str) or not fl[1]:
                return None
            v = _esc(fl[1].lower()).replace("%", "\\%")
            return SplFilter(where=f'like(lower({fl[0]}), "%{v}%")')
        if e.op == "has_cs":
            fl = _field_lit(e.left, e.right)
            if fl is None or not isinstance(fl[1], str) or not fl[1]:
                return None
            v = _esc(fl[1]).replace("%", "\\%")
            return SplFilter(where=f'like({fl[0]}, "%{v}%")')
        return None
    if isinstance(e, Not):
        inner = compile_filter_spl(e.expr)
        single = inner.single() if inner else None
        if single is None:
            return None
        kind, text = single
        return SplFilter(**{kind: f"NOT {text}"})
    if isinstance(e, Exists):
        f = _field(e.expr)
        if f is None:
            if isinstance(e.expr, Extract):
                # exists(extract(...)) → rex + isnotnull over the temp
                # field. The reference's as_pushable_exists_field only
                # takes plain fields, but its own connector corpus
                # (tests/common/test_cases.rs extract_first_word_from_
                # title) expects Splunk to fully absorb this shape once
                # the filter is reordered before the extend — rex then
                # isnotnull is the exact SPL realization.
                ops = _rex_ops(e.expr, lambda t: f"isnotnull({t})")
                if ops is not None:
                    return SplFilter(ops=ops)
            return None
        return SplFilter(where=f"isnotnull({f})")
    if isinstance(e, In):
        f = _field(e.expr)
        if f is None:
            return None
        parts = []
        for item in e.items:
            if not isinstance(item, Lit):
                return None
            parts.append(f"{f}={_val_search(item.value)}")
        return SplFilter(search="(" + " OR ".join(parts) + ")")
    if isinstance(e, Between):
        # reference KQL desugars between before the connector sees it
        # (parser.rs:754-766)
        fl, fh = _field_lit(e.expr, e.low), _field_lit(e.expr, e.high)
        if fl is None or fh is None:
            return None
        f, lo, hi = fl[0], _val(fl[1]), _val(fh[1])
        if e.negated:
            # !between keeps a null/missing base (negation of a proper
            # FALSE) — absent-field events ride the NOT f=* arm (r11)
            return SplFilter(search=f"({f}<{lo} OR {f}>{hi} OR NOT {f}=*)")
        return SplFilter(search=f"({f}>={lo} AND {f}<={hi})")
    return None


# ---------------------------------------------------------------------------
# SplunkHandle: the full SPL pipeline builder (splunk/mod.rs:141-330)


SPLUNK_TIME_FIELD = "_time"
COUNT_FIELD_NAME = "Count"


def _is_time_field(name: str) -> bool:
    # splunk/mod.rs:519 is_timestamp_field
    return name in (SPLUNK_TIME_FIELD, "@time")


def _epoch_seconds(v: object) -> int | None:
    if isinstance(v, datetime):
        if v.tzinfo is None:
            # naive datetimes are UTC engine-wide (session.py UTC conf)
            import calendar

            return calendar.timegm(v.timetuple())
        return int(v.timestamp())
    return None


def extract_timestamp_range(e: Expr):
    """(earliest, latest, remaining_expr) — expr.rs:144
    extract_timestamp_range: comparisons of the Splunk time field
    against datetime literals become the search clause's
    earliest/latest (inclusive/exclusive adjusted like the reference);
    ANDs recurse, everything else stays in the remaining expr."""
    if isinstance(e, BinOp) and e.op in ("gt", "gte", "lt", "lte"):
        f = _field(e.left)
        if (
            f is not None
            and _is_time_field(f)
            and isinstance(e.right, Lit)
            and (epoch := _epoch_seconds(e.right.value)) is not None
        ):
            if e.op == "gte":
                return epoch, None, None
            if e.op == "gt":  # exclusive → +1 makes earliest inclusive
                return epoch + 1, None, None
            if e.op == "lt":
                return None, epoch, None
            return None, epoch + 1, None  # lte: latest is exclusive
    if isinstance(e, BinOp) and e.op == "and":
        le, ll, lr = extract_timestamp_range(e.left)
        re_, rl, rr = extract_timestamp_range(e.right)
        earliest = max(x for x in (le, re_) if x is not None) if (le is not None or re_ is not None) else None
        latest = min(x for x in (ll, rl) if x is not None) if (ll is not None or rl is not None) else None
        if lr is not None and rr is not None:
            remaining: Expr | None = BinOp("and", lr, rr)
        else:
            remaining = lr if lr is not None else rr
        return earliest, latest, remaining
    return None, None, e


def convert_to_splunk_named_capture(pattern: str, group: int, output: str) -> str | None:
    """Rewrite capture group #``group`` of a regex into Splunk's named
    form ``(?<output>...)`` (splunk/mod.rs:865): escapes pass through,
    non-capturing/lookaround groups don't count, an existing
    ``?<name>``/``?P<name>`` on the target group is replaced."""
    if group <= 0:
        return None
    out: list[str] = []
    i, current, n = 0, 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "(":
            rest = pattern[i + 1 : i + 4]
            if rest.startswith(("?:", "?=", "?!", "?<!", "?<=")):
                out.append(c)
                i += 1
                continue
            current += 1
            if current == group:
                out.append(f"(?<{output}>")
                i += 1
                if i < n and pattern[i] == "?":
                    j = i + 1
                    if j < n and pattern[j] == "P":
                        j += 1
                    if j < n and pattern[j] == "<":
                        while j < n and pattern[j] != ">":
                            j += 1
                        i = j + 1
                continue
        out.append(c)
        i += 1
    return "".join(out) if current >= group else None


@dataclass(frozen=True)
class SplunkHandle:
    """Immutable SPL pipeline accumulator (splunk/mod.rs SplunkHandle):
    ``pipeline`` holds rendered ops in order; ``earliest``/``latest``
    ride in the base search clause (more efficient than filtering).
    Implements the same duck-typed ``apply_*`` surface as
    :class:`~miso_spark.sources.pushdown.PushHandle`, so
    ``negotiate()`` drives it unchanged."""

    indexes: tuple = ()  # extra union indexes
    pipeline: tuple = ()  # (op, *args) tuples, rendered by build_spl
    earliest: int | None = None
    latest: int | None = None

    def _push(self, *op) -> "SplunkHandle":
        from dataclasses import replace

        return replace(self, pipeline=self.pipeline + (op,))

    # ---- apply hooks (splunk/mod.rs:1182-1380) -----------------------

    def apply_filter(self, expr: Expr):
        earliest, latest, remaining = extract_timestamp_range(expr)
        from dataclasses import replace

        if (earliest is not None or latest is not None) and any(
            op[0] in ("head", "stats", "count") for op in self.pipeline
        ):
            # earliest/latest ride in the BASE search clause, which
            # would reorder this filter before an already-absorbed
            # head/stats ('take 10 | where _time > X' must filter the
            # 10, not pre-filter the index). Same strictness as
            # PushHandle.apply_filter's refuse-over-limit guard —
            # the filter stays engine-side.
            return None
        h = self
        if earliest is not None:
            h = replace(h, earliest=earliest if h.earliest is None else max(h.earliest, earliest))
        if latest is not None:
            h = replace(h, latest=latest if h.latest is None else min(h.latest, latest))
        if remaining is not None:
            flt = compile_filter_spl(remaining)
            if flt is None:
                return None
            if flt.search is not None:
                h = h._push("search", flt.search)
            if flt.where is not None:
                h = h._push("where", flt.where)
            for op in flt.ops:
                h = h._push(*op)
        return h

    def apply_project(self, fields):
        # splunk/mod.rs:1200: `| fields` doesn't restrict _raw, so
        # projections can't push down — engine-side
        return None

    def apply_limit(self, n: int):
        return self._push("head", n)

    def apply_topn(self, sorts, n: int):
        # skip `sort -_time` — Splunk's default order; forcing it would
        # process the entire dataset (splunk/mod.rs:1223)
        keep = [
            (s.by, s.order)
            for s in sorts
            if not (_is_time_field(s.by) and s.order == "desc")
        ]
        h = self._push("sort", tuple(keep)) if keep else self
        return h._push("head", n)

    def apply_count(self):
        return self._push("count")

    def apply_summarize(self, step):
        # `| stats by x` with no aggs returns default stats columns —
        # doesn't match distinct-on-keys; engine-side (mod.rs:1255)
        if not step.aggs:
            return None
        agg_parts = []
        timestamp_fields = set()
        numeric_fields = set()
        for name, agg in step.aggs:
            if agg.kind == "count":
                numeric_fields.add(name)
                agg_parts.append(f"count as {name}")
                continue
            if agg.kind == "countif":
                if not isinstance(agg.arg, Exists):
                    return None
                f = _field(agg.arg.expr)
                if f is None:
                    return None
                numeric_fields.add(name)
                agg_parts.append(f"count(eval(isnotnull({f}))) as {name}")
                continue
            op = {"min": "min", "max": "max", "sum": "sum", "avg": "avg", "dcount": "dc"}.get(agg.kind)
            if op is None:
                return None
            f = _field(agg.arg)
            if f is None:
                return None
            if agg.kind in ("min", "max") and _is_time_field(f):
                timestamp_fields.add(name)
            else:
                numeric_fields.add(name)
            agg_parts.append(f"{op}({f}) as {name}")
            # dc() skips events whose field is missing — and since r13
            # the engine-side dcount over wire frames ALSO skips
            # absent-key nulls (compiler._wire_field_null_missing,
            # summarize.rs:567-578 parity), so bare dc() absorbs with
            # no companion aggs (the r11 "+1 null-bucket" correction
            # is retired: it emulated the old typed conflation and
            # would now DIVERGE from the engine arm)
        by_fields = []
        renames = []
        for bf in step.by:
            f = _field(bf.expr)
            if f is None:
                # bins / computed keys: Splunk's binning syntax differs —
                # engine-side (mod.rs:1322)
                return None
            by_fields.append(f)
            if f != bf.name:
                renames.append((f, bf.name))
        h = self._push(
            "stats", ", ".join(agg_parts), tuple(by_fields),
            frozenset(timestamp_fields), frozenset(numeric_fields),
        )
        if renames:
            h = h._push("rename", tuple(renames))
        return h

    def apply_extend(self, fields):
        from miso_spark.exprs import Extract

        h = self
        for pf in fields:
            if not isinstance(pf.expr, Extract):
                return None
            if not isinstance(pf.expr.pattern, Lit) or not isinstance(pf.expr.pattern.value, str):
                return None
            if not isinstance(pf.expr.group, Lit) or not isinstance(pf.expr.group.value, int):
                return None
            src = _field(pf.expr.source)
            if src is None:
                return None
            pat = convert_to_splunk_named_capture(
                pf.expr.pattern.value, pf.expr.group.value, pf.name
            )
            if pat is None:
                return None
            h = h._push("rex", src, pat)
        return h

    def union_shaping(self) -> frozenset:
        """See PushHandle.union_shaping — SPL pipeline ops that shape
        the result set (vs per-event search/where/rex/fields)."""
        kinds = {
            "stats": "summarize",
            "count": "count",
            "sort": "topn",
            "head": "limit",
        }
        return frozenset(
            kinds[op[0]] for op in self.pipeline if op[0] in kinds
        )

    def apply_union(
        self, other: "SplunkHandle", scan_collection: str, collection: str
    ):
        if other.pipeline != self.pipeline:
            return None
        from dataclasses import replace

        # the index clause is an OR-filter (each event returned once),
        # so a duplicate index can't express the engine union-all's
        # doubled rows — refuse and leave the union engine-side
        # (fuzz-found r11; same guard as PushHandle.apply_union)
        merged = (
            (scan_collection,) + self.indexes + other.indexes + (collection,)
        )
        if len(set(merged)) != len(merged):
            return None
        return replace(
            self, indexes=self.indexes + other.indexes + (collection,)
        )

    def agg_zero_fill(self) -> tuple:
        """(name, fill) pairs for absorbed sum/avg outputs SURVIVING
        to the final result: Splunk omits the field when a group has
        no present values, where the engine's empty-input identities
        are sum → 0 / avg → 0.0 (summarize.rs:513,655) — the decode
        fills them back. Threaded through the pipeline like
        _stats_types (r11 review find: a composed second stats
        consumed the first's sum output, but the fill re-ADDED it as
        a constant column the engine result doesn't have)."""
        fills: dict[str, float] = {}
        for op in self.pipeline:
            if op[0] == "stats":
                by = set(op[2])
                # earlier fills survive only as group keys of this op
                fills = {n: f for n, f in fills.items() if n in by}
                for p in op[1].split(", "):
                    if " as " not in p:
                        continue
                    n = p.rsplit(" as ", 1)[1]
                    if p.startswith("sum(") or p.startswith("avg("):
                        fills[n] = 0.0
            elif op[0] == "rename":
                for frm, to in op[1]:
                    if frm in fills:
                        fills[to] = fills.pop(frm)
        return tuple(sorted(fills.items()))

    # ---- SPL rendering (splunk/mod.rs:213-310 build_spl) -------------

    def _can_use_tstats(self) -> bool:
        return len(self.pipeline) == 1 and self.pipeline[0][0] == "count"

    def _stats_types(self) -> tuple[frozenset, frozenset]:
        """(timestamp, numeric) typing of the FINAL result columns,
        threaded through the whole pipeline: each stats op's by-keys
        INHERIT their upstream type and its agg outputs take the op's
        own sets; renames remap. Seeded with `_time` so a `by _time`
        group key stays a timestamp across composed stats (the
        reference reads only timestamp AGG fields, mod.rs:1265,
        leaving its by-key a raw epoch string where its own
        engine-side run yields datetimes — deliberate divergence,
        r11 fuzz find)."""
        ts_known: set = {SPLUNK_TIME_FIELD}
        num_known: set = set()
        for op in self.pipeline:
            if op[0] == "stats":
                by = set(op[2])
                ts_known = (ts_known & by) | set(op[3])
                num_known = (num_known & by) | set(op[4])
            elif op[0] == "rename":
                for frm, to in op[1]:
                    if frm in ts_known:
                        ts_known.discard(frm)
                        ts_known.add(to)
                    if frm in num_known:
                        num_known.discard(frm)
                        num_known.add(to)
        return frozenset(ts_known), frozenset(num_known)

    def stats_numeric_fields(self) -> frozenset:
        return self._stats_types()[1]

    def stats_timestamp_fields(self) -> frozenset:
        if not any(op[0] == "stats" for op in self.pipeline):
            # hit rows: `_time` typing is the scan decode's job
            # (transform_log parity), not the stats replay's
            return frozenset()
        return self._stats_types()[0]

    def has_count(self) -> bool:
        return any(op[0] == "count" for op in self.pipeline)

    def build_spl(self, collection: str) -> str:
        indexes = sorted({collection, *self.indexes})
        index_clause = " OR ".join(f'index="{i}"' for i in indexes)
        if self._can_use_tstats():
            # tstats count is much faster for bare counts (mod.rs:227)
            spl = f"| tstats count as {COUNT_FIELD_NAME} where ({index_clause})"
            if self.earliest is not None:
                spl += f" earliest={self.earliest}"
            if self.latest is not None:
                spl += f" latest={self.latest}"
            return spl
        spl = f"search ({index_clause})"
        if self.earliest is not None:
            spl += f" earliest={self.earliest}"
        if self.latest is not None:
            spl += f" latest={self.latest}"
        for op in self.pipeline:
            kind = op[0]
            if kind == "search":
                spl += f" | search {op[1]}"
            elif kind == "where":
                spl += f" | where {op[1]}"
            elif kind == "sort":
                clause = ", ".join(
                    ("+" if order == "asc" else "-") + field for field, order in op[1]
                )
                spl += f" | sort {clause}"
            elif kind == "head":
                spl += f" | head {op[1]}"
            elif kind == "stats":
                spl += f" | stats {op[1]}"
                if op[2]:
                    spl += " by " + ", ".join(op[2])
            elif kind == "count":
                spl += f" | stats count as {COUNT_FIELD_NAME}"
            elif kind == "rename":
                clause = ", ".join(f"{a} as {b}" for a, b in op[1])
                spl += f" | rename {clause}"
            elif kind == "rex":
                spl += f' | rex field={op[1]} "{op[2]}"'
            elif kind == "fields_minus":
                # FieldsRemove (splunk/mod.rs:550): drop the rex temp
                spl += f" | fields - {op[1]}"
        return spl
