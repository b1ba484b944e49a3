"""KQL lexer.

Token surface parity: miso-kql/src/lexer.rs — keywords, timespan
literals in short and long form (1d / 2hours / 3minutes / 4seconds /
5ms / 6microseconds / 7nanos / 8ticks — lexer.rs:247), datetime(...)
plus bare datetime literals (lexer.rs:208-227, priority-3 regexes),
strings (quoted, ``@``-raw with doubled-quote escapes, triple-backtick
and triple-tilde multiline — lexer.rs:224-236), numbers incl. hex ints,
``True/TRUE/False/FALSE`` variants (lexer.rs:199-204), ``@``-prefixed
identifiers, operators incl. ``..`` ``$`` ``|``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "where", "filter", "project", "extend", "limit", "take", "sort", "order",
    "by", "asc", "desc", "nulls", "first", "last", "top", "summarize",
    "count", "countif", "dcount", "sum", "avg", "min", "max", "distinct",
    "union", "join", "kind", "inner", "outer", "left", "right", "hint",
    "partitions", "on", "tee", "write", "let", "raw", "datetime", "now",
    "null", "true", "false", "and", "or", "not", "in", "between", "exists",
    "case", "iff", "bin", "extract", "contains", "startswith", "endswith",
    "has", "has_cs", "tobool", "toint", "tolong", "toreal", "todecimal",
    "tostring", "bag", "array",
}

#: logos lexes these case-variants to the same Bool token (lexer.rs:199)
_BOOL_VARIANTS = {"True": "true", "TRUE": "true", "False": "false", "FALSE": "false"}

# multi-word step keywords become single tokens
_SPECIAL = {
    "project-rename": "project-rename",
    "mv-expand": "mv-expand",
    "!between": "!between",
}


@dataclass(frozen=True)
class Token:
    kind: str  # keyword name, 'ident', 'int', 'float', 'string', 'timespan', or operator text
    value: object = None
    pos: int = 0


# long-form unit surface from lexer.rs:247 (prefix-mapped like
# parse_timespan at lexer.rs:452: nano*/micro*/milli*|ms/tick*/s*/m*/h*/d*)
_TIMESPAN_UNIT_RE = (
    r"(?:ms"
    r"|micros(?:ec(?:ond)?|econds)?|micro"
    r"|millis(?:ec(?:ond)?|econds)?|milli"
    r"|nanos(?:ec(?:ond)?|econds)?|nano"
    r"|ticks?"
    r"|min(?:ute)?s?|m"
    r"|sec(?:ond)?s?|s"
    r"|h(?:ours?|rs?)?"
    r"|d(?:ays?)?)"
)

# bare datetime literal shapes (lexer.rs:208-227): ISO date / date-time,
# ISO-8601 with T+offset, RFC-2822
_BARE_DT_RE = (
    r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})"
    r"|\d{4}-\d{2}-\d{2}(?:\s+\d{2}:\d{2}:\d{2}(?:\.\d+)?)?"
    r"|(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun),\s+\d{1,2}\s+"
    r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\s+"
    r"\d{2}:\d{2}:\d{2}\s+[A-Z]{3,4}"
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<special>project-rename|mv-expand|!between)
  | (?P<datetime>datetime\s*\(\s*[^)]*\))
  | (?P<baredt>""" + _BARE_DT_RE + r""")
  | (?P<timespan>\d+(?:\.\d+)?""" + _TIMESPAN_UNIT_RE + r"""\b)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<hexint>0[xX][0-9a-fA-F]+)
  | (?P<int>\d+)
  | (?P<mlstring>```[\s\S]*?(?:```|$)|~~~[\s\S]*?(?:~~~|$))
  | (?P<rawstring>@"(?:[^"]|"")*"|@'(?:[^']|'')*')
  | (?P<ident>[@_A-Za-z][\w@]*)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>==|!=|<=|>=|\.\.|[|.,()\[\]<>=+\-*/$;])
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            # unknown escapes (e.g. \d in a regex literal) keep the backslash
            out.append(_ESCAPES[nxt] if nxt in _ESCAPES else "\\" + nxt)
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _timespan_seconds(raw: str) -> float:
    m = re.match(r"([\d.]+)([a-z]+)", raw)
    assert m
    value, unit = float(m.group(1)), m.group(2)
    # prefix cascade mirrors lexer.rs parse_timespan (lexer.rs:452)
    if unit.startswith("nano"):
        return value * 1e-9
    if unit.startswith("micro"):
        return value * 1e-6
    if unit.startswith("milli") or unit == "ms":
        return value * 1e-3
    if unit.startswith("tick"):
        return value * 1e-7  # .NET tick = 100ns
    if unit[0] == "s":
        return value
    if unit[0] == "m":
        return value * 60.0
    if unit[0] == "h":
        return value * 3600.0
    if unit[0] == "d":
        return value * 86400.0
    raise AssertionError(unit)


class LexError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise LexError(f"unexpected character {text[pos]!r} at {pos}")
        kind = m.lastgroup
        raw = m.group()
        if kind in ("ws", "comment"):
            pass
        elif kind == "special":
            tokens.append(Token(raw, pos=pos))
        elif kind == "datetime":
            inner = raw[raw.index("(") + 1 : -1].strip()
            tokens.append(Token("datetime_lit", inner, pos))
        elif kind == "baredt":
            tokens.append(Token("datetime_lit", raw, pos))
        elif kind == "timespan":
            tokens.append(Token("timespan", _timespan_seconds(raw), pos))
        elif kind == "float":
            tokens.append(Token("float", float(raw), pos))
        elif kind == "hexint":
            tokens.append(Token("int", int(raw, 16), pos))
        elif kind == "int":
            tokens.append(Token("int", int(raw), pos))
        elif kind == "ident":
            # keywords are case-sensitive except the documented bool
            # variants (a field named `Count` stays an identifier,
            # matching the reference's logos lexer)
            if raw in _BOOL_VARIANTS:
                tokens.append(Token(_BOOL_VARIANTS[raw], pos=pos))
            elif raw in KEYWORDS:
                tokens.append(Token(raw, pos=pos))
            else:
                tokens.append(Token("ident", raw, pos))
        elif kind == "mlstring":
            delim = raw[:3]
            body = raw[3:]
            if body.endswith(delim):
                body = body[:-3]
            tokens.append(Token("string", body, pos))
        elif kind == "rawstring":
            quote = raw[1]
            body = raw[2:-1].replace(quote * 2, quote)
            tokens.append(Token("string", body, pos))
        elif kind == "string":
            tokens.append(Token("string", _unescape(raw[1:-1]), pos))
        elif kind == "op":
            tokens.append(Token(raw, pos=pos))
        pos = m.end()
    tokens.append(Token("eof", pos=pos))
    return tokens
