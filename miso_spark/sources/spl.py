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

from miso_spark.exprs import Between, BinOp, Exists, Expr, Field, In, Lit, Not


@dataclass(frozen=True)
class SplFilter:
    """search: fast indexed `| search` term; where: `| where` clause.
    Both set = the reference's Batched result (one op of each)."""

    search: str | None = None
    where: str | None = None

    def single(self) -> tuple[str, str] | None:
        """(kind, text) when exactly one clause kind is present —
        OR/NOT can only wrap single-kind results (mod.rs as_str)."""
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
            return SplFilter(
                search=_and_combine(search_parts) if search_parts else None,
                where=_and_combine(where_parts) if where_parts else None,
            )
        if e.op == "eq":
            fl = _field_lit(e.left, e.right, commute=True)
            if fl is None:
                return None
            return SplFilter(search=f"{fl[0]}={_val_search(fl[1])}")
        if e.op == "ne":
            fl = _field_lit(e.left, e.right)
            if fl is None:
                return None
            return SplFilter(search=f"{fl[0]}!={_val_search(fl[1])}")
        if e.op in _CMP:
            fl = _field_lit(e.left, e.right)
            if fl is None:
                return None
            return SplFilter(search=f"{fl[0]}{_CMP[e.op]}{_val(fl[1])}")
        if e.op == "startswith":
            fl = _field_lit(e.left, e.right)
            if fl is None or not isinstance(fl[1], str):
                return None
            return SplFilter(search=f"{fl[0]}={fl[1]}*")
        if e.op == "has":
            fl = _field_lit(e.left, e.right)
            if fl is None or not isinstance(fl[1], str):
                return None
            v = _esc(fl[1].lower()).replace("%", "\\%")
            return SplFilter(where=f'like(lower({fl[0]}), "%{v}%")')
        if e.op == "has_cs":
            fl = _field_lit(e.left, e.right)
            if fl is None or not isinstance(fl[1], str):
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
            return SplFilter(search=f"({f}<{lo} OR {f}>{hi})")
        return SplFilter(search=f"({f}>={lo} AND {f}<={hi})")
    return None
