"""Extract the reference's optimizer test corpus at test time.

Parses /root/reference/miso-optimizations/src/tests.rs — the
reference's own `check(optimizer, input, expected)` cases — into
(name, input_steps, expected_steps) triples over THIS repo's plan
model (miso_spark.plan / miso_spark.exprs). Nothing is copied into
the repo; the reference checkout is read at collection time, exactly
like tests/connector_corpus.py and test_reference_parity.py.

The evaluator understands the constrained Rust DSL the reference's
tests.rs + test_utils.rs use (S::* step constructors, the expr
helpers, struct literals, vec!/btreemap!, #[test_case] parameter
binding). The reference's Mux* merge-side steps map onto this
engine's plain equivalents (MuxLimit→Limit, MuxTopN→Top,
MuxSummarize→SummarizeStep): Spark's partial aggregation IS the mux
stage, so the merge step is the same logical operator here.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from miso_spark import plan as P
from miso_spark.exprs import Bin, BinOp, Case, Exists, Expr, Field, Lit, Not

REF = "/root/reference/miso-optimizations/src/tests.rs"


@dataclass
class RefCase:
    name: str
    input: tuple
    expected: tuple


class Unsupported(Exception):
    """Construct outside the evaluator's DSL (e.g. S::Join)."""


# ---------------------------------------------------------------------------
# tokenizer

_TOKEN = re.compile(
    r'"(?:[^"\\]|\\.)*"'     # string literal
    r"|=>|::|\.\.|&&|\|\|"   # multi-char punctuation
    r"|[A-Za-z_][A-Za-z0-9_]*!?"  # ident (incl. macro !)
    r"|\d+\.\d+|\d+"         # numbers
    r"|[(){}\[\],;:.&=<>!-]"  # single-char punctuation
)


def _tokens(src: str) -> list[str]:
    return _TOKEN.findall(src)


# ---------------------------------------------------------------------------
# value model helpers


class RefField:
    """field("name") — coerced to Field (expr position) or str (name
    position) at the use site."""

    def __init__(self, name: str):
        self.name = name


def _as_expr(v) -> Expr:
    if isinstance(v, RefField):
        return Field.of(v.name)
    if isinstance(v, Expr):
        return v
    return Lit(v)


def _as_name(v) -> str:
    if isinstance(v, RefField):
        return v.name
    if isinstance(v, Field):
        return str(v.path)
    if isinstance(v, str):
        return v
    raise Unsupported(f"not a name: {v!r}")


def _as_lit(v) -> Lit:
    if isinstance(v, Lit):
        return v
    if isinstance(v, (int, float, str, bool)) or v is None:
        return Lit(v)
    raise Unsupported(f"not a literal: {v!r}")


def _summarize_step(summ: dict) -> P.SummarizeStep:
    aggs = tuple(sorted(summ.get("aggs", {}).items()))
    return P.SummarizeStep(aggs, tuple(summ.get("by", ())))


def _binop(op):
    return lambda a, b: BinOp(op, _as_expr(a), _as_expr(b))


#: constructor name → callable(args) -> python value
_CTORS = {
    # test_utils.rs helpers
    "field": lambda n: RefField(n),
    "field_expr": lambda n: Field.of(n),
    "sort": lambda sorts: P.SortStep(tuple(sorts)),
    "sort_asc": lambda f: P.Sort(_as_name(f), "asc", "last"),
    "sort_desc": lambda f: P.Sort(_as_name(f), "desc", "last"),
    "project_field": lambda to, frm: P.ProjectField(_as_expr(frm), _as_name(RefField(to))),
    "literal_project": lambda to, v: P.ProjectField(_as_lit(v), to),
    "rename_project": lambda to, frm: P.ProjectField(Field.of(frm), to),
    "noop_project": lambda to: P.ProjectField(Field.of(to), to),
    "expand": lambda fields: ("EXPAND", tuple(_as_name(f) for f in fields)),
    "string_val": lambda s: s,
    "int_val": lambda n: n,
    "lit": lambda n: Lit(n),
    "eq": _binop("eq"),
    "gt": _binop("gt"),
    "lt": _binop("lt"),
    "mul": _binop("mul"),
    "and": _binop("and"),
    "or": _binop("or"),
    "not": lambda e: Not(_as_expr(e)),
    "exists": lambda e: Exists(_as_expr(e)),
    "case": lambda branches, default: Case(
        tuple((_as_expr(c), _as_expr(v)) for c, v in branches),
        _as_expr(default),
    ),
    "by_field": lambda e, n: P.ByField(_as_expr(e), n),
    "summarize": lambda agg_field, agg, by: _summarize_step(
        {"aggs": {agg_field: agg}, "by": tuple(by)}
    ),
    "summarize_by": lambda fields: _summarize_step(
        {"by": tuple(P.ByField(Field.of(f), f) for f in fields)}
    ),
    # step / expr enum constructors
    "S::Limit": lambda n: P.Limit(n),
    "S::MuxLimit": lambda n: P.Limit(n),
    "S::TopN": lambda sorts, n: P.Top(tuple(sorts), n),
    "S::MuxTopN": lambda sorts, n: P.Top(tuple(sorts), n),
    "S::Filter": lambda e: P.Filter(_as_expr(e)),
    "S::Project": lambda fields: P.Project(tuple(fields)),
    "S::Extend": lambda fields: P.Extend(tuple(fields)),
    "S::Rename": lambda pairs: P.Rename(
        tuple((_as_name(f), _as_name(t)) for f, t in pairs)
    ),
    "S::Union": lambda wf: P.Union(P.Plan(tuple(wf))),
    "S::Summarize": lambda s: _summarize_step(s),
    "S::MuxSummarize": lambda s: _summarize_step(s),
    "S::Expand": lambda e: P.Expand(e[1], "bag"),
    "Workflow::new": lambda steps: tuple(steps),
    "Box::new": lambda x: x,
    "Expr::Field": lambda f: Field.of(_as_name(f)),
    "Expr::Literal": lambda v: _as_lit(v),
    "Expr::Eq": _binop("eq"),
    "Expr::Ne": _binop("ne"),
    "Expr::Gt": _binop("gt"),
    "Expr::Lt": _binop("lt"),
    "Expr::Plus": _binop("add"),
    "Expr::Minus": _binop("sub"),
    "Expr::Mul": _binop("mul"),
    "Expr::Div": _binop("div"),
    "Expr::And": _binop("and"),
    "Expr::Or": _binop("or"),
    "Expr::Not": lambda e: Not(_as_expr(e)),
    "Expr::Exists": lambda e: Exists(_as_expr(e)),
    "Expr::Bin": lambda e, s: Bin(_as_expr(e), _as_expr(s)),
    "Expr::Case": lambda branches, default: Case(
        tuple((_as_expr(c), _as_expr(v)) for c, v in branches),
        _as_expr(default),
    ),
    "Value::String": lambda s: s,
    "Value::Int": lambda n: n,
    "Value::Bool": lambda b: b,
    "Value::from": lambda v: v,
    "Aggregation::Sum": lambda f: P.Agg("sum", Field.of(_as_name(f))),
    "Aggregation::Min": lambda f: P.Agg("min", Field.of(_as_name(f))),
    "Aggregation::Max": lambda f: P.Agg("max", Field.of(_as_name(f))),
    "Aggregation::DCount": lambda f: P.Agg("dcount", Field.of(_as_name(f))),
    "BTreeMap::from": lambda pairs: {_as_name(k): v for k, v in pairs},
    "BTreeMap::new": lambda: {},
    "Optimizer::default": lambda: "OPTIMIZER",
    "json!": lambda v: v,
    "S::Join": lambda join, wf: P.JoinStep(
        join["on"][0], join["on"][1], P.Plan(tuple(wf)),
        join.get("type_", "inner"), join.get("partitions"), None,
    ),
}

#: bare (argument-less) enum values
_BARE = {
    "S::Count": lambda: P.CountStep(),
    "Aggregation::Count": lambda: P.Agg("count"),
    "SortOrder::Asc": lambda: "asc",
    "SortOrder::Desc": lambda: "desc",
    "NullsOrder::First": lambda: "first",
    "NullsOrder::Last": lambda: "last",
    "true": lambda: True,
    "false": lambda: False,
    "JoinType::Inner": lambda: "inner",
    "JoinType::Left": lambda: "left",
    "JoinType::Right": lambda: "right",
    "JoinType::Outer": lambda: "outer",
}

#: struct literal name → builder(dict of field name → value)
_STRUCTS = {
    "Sort": lambda d: P.Sort(
        _as_name(d["by"]), d.get("order", "asc"), d.get("nulls", "last")
    ),
    "ProjectField": lambda d: P.ProjectField(
        _as_expr(d["from"]), _as_name(d["to"])
    ),
    "Summarize": lambda d: {
        "aggs": {_as_name(k): v for k, v in d.get("aggs", {}).items()}
        if isinstance(d.get("aggs"), dict)
        else d.get("aggs", {}),
        "by": tuple(d.get("by", ())),
    },
    "Expand": lambda d: (
        "EXPAND",
        tuple(_as_name(f) for f in d.get("fields", ())),
    ),
    "Join": lambda d: {
        "on": tuple(_as_name(f) for f in d["on"]),
        "type_": d.get("type_", "inner"),
        "partitions": d.get("partitions"),
    },
}


class _Ev:
    """Pratt-less recursive evaluator over the token stream."""

    def __init__(self, toks: list[str], env: dict):
        self.toks = toks
        self.i = 0
        self.env = env

    def peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise Unsupported(f"expected {t!r}, got {got!r} @{self.i}")
        return got

    # -- expressions -------------------------------------------------
    def expr(self):
        return self._postfix(self._atom())

    def _atom(self):
        t = self.peek()
        if t is None:
            raise Unsupported("eof")
        if t.startswith('"'):
            self.next()
            return t[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if t.isdigit() or re.fullmatch(r"\d+\.\d+", t):
            self.next()
            return float(t) if "." in t else int(t)
        if t == "-" and self.peek(1) and self.peek(1).isdigit():
            self.next()
            return -int(self.next())
        if t == "&":  # &[..] slice / &str borrow — transparent
            self.next()
            return self._atom()
        if t == "(":  # grouping OR tuple
            self.next()
            first = self.expr()
            if self.peek() == ",":
                items = [first]
                while self.peek() == ",":
                    self.next()
                    if self.peek() == ")":
                        break
                    items.append(self.expr())
                self.expect(")")
                return tuple(items)
            self.expect(")")
            return first
        if t in ("vec!", "["):
            if t == "vec!":
                self.next()
            return self._list()
        if t == "btreemap!":
            self.next()
            return self._btreemap()
        # identifier chain a::b::c
        name = self.next()
        while self.peek() == "::":
            self.next()
            name += "::" + self.next()
        return self._ident(name)

    def _list(self):
        self.expect("[")
        out = []
        while self.peek() != "]":
            out.append(self.expr())
            if self.peek() == ",":
                self.next()
        self.expect("]")
        return out

    def _btreemap(self):
        self.expect("{")
        out = {}
        while self.peek() != "}":
            k = self.expr()
            self.expect("=>")
            out[_as_name(k)] = self.expr()
            if self.peek() == ",":
                self.next()
        self.expect("}")
        return out

    def _ident(self, name):
        # struct literal?
        if self.peek() == "{" and name.split("::")[-1] in _STRUCTS:
            return self._struct(name.split("::")[-1])
        # call?
        if self.peek() == "(":
            args = self._args()
            fn = self.env.get(name) or _CTORS.get(name)
            if fn is None and name in _BARE:
                fn = _BARE[name]
            if fn is None:
                raise Unsupported(f"unknown constructor {name}")
            if callable(fn) and not isinstance(fn, (tuple, list)):
                return fn(*args)
            raise Unsupported(f"not callable: {name}")
        if name in _BARE:
            return _BARE[name]()
        if name in self.env:
            return self.env[name]
        if name in _CTORS:  # constructor passed as a value (ctor params)
            return _CTORS[name]
        raise Unsupported(f"unknown ident {name}")

    def _args(self):
        self.expect("(")
        out = []
        while self.peek() != ")":
            out.append(self.expr())
            if self.peek() == ",":
                self.next()
        self.expect(")")
        return out

    def _struct(self, sname):
        self.expect("{")
        d = {}
        while self.peek() != "}":
            if self.peek() == "..":  # ..Default::default()
                self.next()
                self.expr()
                continue
            key = self.next()
            if self.peek() == ":":
                self.next()
                d[key] = self.expr()
            else:
                # field init shorthand: `type_,` binds the env var
                if key not in self.env:
                    raise Unsupported(f"shorthand {key} unbound")
                d[key] = self.env[key]
            if self.peek() == ",":
                self.next()
        self.expect("}")
        return _STRUCTS[sname](d)

    def _postfix(self, v):
        while self.peek() == ".":
            method = self.peek(1)
            if method in ("clone", "to_string", "into"):
                self.next()
                self.next()
                self.expect("(")
                self.expect(")")
            else:
                break
        return v


# ---------------------------------------------------------------------------
# test extraction


def _body_of(src: str, start: int) -> tuple[str, int]:
    """The brace-balanced body starting at src[start] == '{'."""
    depth = 0
    i = start
    in_str = False
    while i < len(src):
        c = src[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return src[start + 1 : i], i
        i += 1
    raise Unsupported("unbalanced body")


def _split_test_case_attr(attr: str) -> tuple[list[str], str]:
    """One #[test_case(...)] payload → (arg token groups, case name)."""
    toks = _tokens(attr)
    # split on top-level ';' — tail is the "name" string
    depth = 0
    for k, t in enumerate(toks):
        if t in "([{":
            depth += 1
        elif t in ")]}":
            depth -= 1
        elif t == ";" and depth == 0:
            name_toks = toks[k + 1 :]
            name = name_toks[0][1:-1] if name_toks else ""
            return toks[:k], name
    return toks, ""


def _skip_as_cast(ev) -> None:
    """`expr as fn(Vec<T>) -> S` — consume the type ascription."""
    if ev.peek() != "as":
        return
    ev.next()
    depth = 0
    while ev.peek() is not None:
        t = ev.peek()
        if t in "([{":
            depth += 1
        elif t in ")]}":
            depth -= 1
        elif t == "," and depth == 0:
            return
        ev.next()


def _eval_args(toks: list[str], env: dict) -> list:
    ev = _Ev(toks, env)
    out = []
    while ev.peek() is not None:
        out.append(ev.expr())
        _skip_as_cast(ev)
        if ev.peek() == ",":
            ev.next()
    return out


def _run_body(body: str, env: dict, name: str, out: list, errors: list):
    """Evaluate let-bindings then every check/check_default call."""
    toks = _tokens(body)
    ev = _Ev(toks, dict(env))
    n_checks = 0
    try:
        while ev.peek() is not None:
            t = ev.next()
            if t == "let":
                if ev.peek() == "mut":
                    ev.next()
                var = ev.next()
                ev.expect("=")
                ev.env[var] = ev.expr()
                if ev.peek() == ";":
                    ev.next()
            elif t in ("check_default", "check"):
                args = ev._args()
                if ev.peek() == ";":
                    ev.next()
                if t == "check":
                    args = args[1:]  # drop the Optimizer
                inp, exp = args
                suffix = f"#{n_checks}" if n_checks else ""
                out.append(RefCase(name + suffix, tuple(inp), tuple(exp)))
                n_checks += 1
            elif t == "//":
                pass  # comments stripped earlier
            # any other token (stray ;, comments) — skip
    except Unsupported as e:
        errors.append((name, str(e)))


def load_cases() -> tuple[list[RefCase], list[tuple[str, str]]]:
    """All extractable cases + (name, reason) for unextractable ones."""
    with open(REF) as f:
        src = f.read()
    src = re.sub(r"//[^\n]*", "", src)  # strip comments

    cases: list[RefCase] = []
    errors: list[tuple[str, str]] = []

    # walk fn definitions with their preceding attributes
    for m in re.finditer(r"fn\s+([a-z_0-9]+)\s*\(", src):
        name = m.group(1)
        # balanced param list (types may contain parens: fn(..) -> S)
        depth, j = 1, m.end()
        while j < len(src) and depth:
            if src[j] == "(":
                depth += 1
            elif src[j] == ")":
                depth -= 1
            j += 1
        params_src = src[m.end() : j - 1]
        brace = src.find("{", j)
        if brace < 0:
            continue
        if name in ("check", "check_default"):
            continue
        # attributes between the previous fn end and this fn
        attr_start = src.rfind("\n}", 0, m.start())
        attrs_src = src[attr_start if attr_start > 0 else 0 : m.start()]
        test_cases = []
        for am in re.finditer(r"#\[test_case\(", attrs_src):
            depth, j, in_str = 1, am.end(), False
            while j < len(attrs_src) and depth:
                c = attrs_src[j]
                if in_str:
                    if c == "\\":
                        j += 1
                    elif c == '"':
                        in_str = False
                elif c == '"':
                    in_str = True
                elif c in "([{":
                    depth += 1
                elif c in ")]}":
                    depth -= 1
                j += 1
            test_cases.append(attrs_src[am.end() : j - 1])
        is_plain_test = "#[test]" in attrs_src
        if not test_cases and not is_plain_test:
            continue
        try:
            body, _ = _body_of(src, brace)
        except Unsupported as e:
            errors.append((name, str(e)))
            continue
        param_names = []
        depth = 0
        cur = ""
        for c in params_src + ",":
            if c in "(<[":
                depth += 1
            elif c in ")>]":
                depth = max(0, depth - 1)  # `->` has a bare `>`
            if c == "," and depth == 0:
                if cur.strip():
                    param_names.append(cur.split(":")[0].strip())
                cur = ""
            else:
                cur += c
        if test_cases:
            for tc in test_cases:
                arg_toks, case_name = _split_test_case_attr(tc)
                full = f"{name}::{case_name or 'case'}"
                try:
                    args = _eval_args(arg_toks, {})
                    env = dict(zip(param_names, args))
                except Unsupported as e:
                    errors.append((full, str(e)))
                    continue
                _run_body(body, env, full, cases, errors)
        else:
            _run_body(body, {}, name, cases, errors)
    return cases, errors
