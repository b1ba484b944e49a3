"""KQL lexer.

Token surface parity: miso-kql/src/lexer.rs — keywords, timespan
literals (1d 2h 3m 4s 5ms 6micro 7nano 8tick), datetime(...), strings,
numbers, ``@``-prefixed identifiers, operators incl. ``..`` ``$`` ``|``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, Optional

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

# multi-word step keywords become single tokens
_SPECIAL = {
    "project-rename": "project-rename",
    "mv-expand": "mv-expand",
    "!between": "!between",
}

_TIMESPAN_UNITS = {
    "d": 86400.0,
    "h": 3600.0,
    "m": 60.0,
    "s": 1.0,
    "ms": 1e-3,
    "micro": 1e-6,
    "nano": 1e-9,
    "tick": 1e-7,
}


@dataclass(frozen=True)
class Token:
    kind: str  # keyword name, 'ident', 'int', 'float', 'string', 'timespan', or operator text
    value: object = None
    pos: int = 0


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<special>project-rename|mv-expand|!between)
  | (?P<datetime>datetime\s*\(\s*[^)]*\))
  | (?P<timespan>\d+(?:\.\d+)?(?:ms|micro|nano|tick|d|h|m|s)\b)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
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
        elif kind == "timespan":
            um = re.match(r"([\d.]+)([a-z]+)", raw)
            assert um
            secs = float(um.group(1)) * _TIMESPAN_UNITS[um.group(2)]
            tokens.append(Token("timespan", secs, pos))
        elif kind == "float":
            tokens.append(Token("float", float(raw), pos))
        elif kind == "int":
            tokens.append(Token("int", int(raw), pos))
        elif kind == "ident":
            # keywords are case-sensitive (a field named `Count` is an
            # identifier, matching the reference's logos lexer)
            if raw in KEYWORDS:
                tokens.append(Token(raw, pos=pos))
            else:
                tokens.append(Token("ident", raw, pos))
        elif kind == "string":
            tokens.append(Token("string", _unescape(raw[1:-1]), pos))
        elif kind == "op":
            tokens.append(Token(raw, pos=pos))
        pos = m.end()
    tokens.append(Token("eof", pos=pos))
    return tokens
