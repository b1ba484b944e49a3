"""KQL lexer.

Token surface parity: miso-kql/src/lexer.rs — keywords, timespan
literals in short and long form (1d / 2hours / 3minutes / 4seconds /
5ms / 6microseconds / 7nanos / 8ticks — lexer.rs:247), datetime(...)
plus bare datetime literals (lexer.rs:208-227, priority-3 regexes),
strings (quoted with the full escape set incl. \\xHH/\\uHHHH/
\\UHHHHHHHH/octal + the reference's literal-fallback rules, ``@``-raw
with doubled-quote escapes, triple-backtick and triple-tilde multiline
— lexer.rs:224-236), ``h``/``H``-prefixed hex (byte) strings in every
form (tokenized as ``bytestring``; the parser rejects them with the
reference's verbatim message, parser.rs:482), numbers incl. hex ints,
scientific floats and trailing-dot floats, digit-led identifiers
(``123xyz``), ``True/TRUE/False/FALSE`` variants (lexer.rs:199-204),
``@``-prefixed identifiers, operators incl. ``..`` ``$`` ``|``.
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
  | (?P<comment>//[^\n\r]*)
  | (?P<special>project-rename|mv-expand|!between)
  | (?P<datetime>datetime\s*\(\s*[^)]*\))
  | (?P<baredt>""" + _BARE_DT_RE + r""")
  | (?P<timespan>\d+(?:\.\d+)?""" + _TIMESPAN_UNIT_RE + r"""\b)
  | (?P<float>\d+\.(?!\.)\d*(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<hexint>0[xX][0-9a-fA-F]+(?![\w@]))
  | (?P<identnum>\d+[A-Za-z_][\w@]*)
  | (?P<int>\d+)
  | (?P<hexml>[hH](?:```[\s\S]*?(?:```|$)|~~~[\s\S]*?(?:~~~|$)))
  | (?P<hexraw>[hH]@"(?:[^"]|"")*"|[hH]@'(?:[^']|'')*')
  | (?P<hexstring>[hH]"(?:\\"|[^"])*"|[hH]'(?:\\'|[^'])*')
  | (?P<mlstring>```[\s\S]*?(?:```|$)|~~~[\s\S]*?(?:~~~|$))
  | (?P<rawstring>@"(?:[^"]|"")*"|@'(?:[^']|'')*')
  | (?P<ident>[@_A-Za-z][\w@]*)
  | (?P<string>"(?:\\"|[^"])*"|'(?:\\'|[^'])*')
  | (?P<op>==|!=|<=|>=|\.\.|[|.,()\[\]<>=+\-*/$;])
    """,
    re.VERBOSE,
)

#: single-char escapes (lexer.rs parse_string_literal:289-300)
_ESCAPES = {
    "'": "'",
    '"': '"',
    "\\": "\\",
    "a": "\x07",
    "b": "\x08",
    "f": "\x0c",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\x0b",
}


def _unescape(body: str) -> str:
    """Escape processing with the reference's exact fallback rules
    (lexer.rs parse_string_literal): full C-style set, ``\\xHH``,
    ``\\uHHHH``, ``\\UHHHHHHHH`` (invalid length / codepoint → kept
    literally), 1-3 digit octal ≤ 0o377 (overflow → kept literally),
    unknown escapes and a trailing backslash kept as-is."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= n:
            out.append("\\")  # trailing backslash
            i += 1
            continue
        nxt = body[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
        elif nxt in "xuU":
            width = {"x": 2, "u": 4, "U": 8}[nxt]
            hexpart = body[i + 2 : i + 2 + width]
            if len(hexpart) == width and all(c in "0123456789abcdefABCDEF" for c in hexpart):
                cp = int(hexpart, 16)
                # char::from_u32 rejects surrogates and > U+10FFFF
                if cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                    out.append(chr(cp))
                else:
                    out.append("\\" + nxt + hexpart)
                i += 2 + width
            else:
                out.append("\\" + nxt)
                i += 2
        elif nxt in "01234567":
            octal = nxt
            j = i + 2
            while j < n and len(octal) < 3 and body[j] in "01234567":
                octal += body[j]
                j += 1
            code = int(octal, 8)
            if code <= 0xFF:
                out.append(chr(code))
            else:
                out.append("\\" + octal)
            i = j
        else:
            # unknown escapes (e.g. \d in a regex literal) keep the backslash
            out.append("\\" + nxt)
            i += 2
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
        elif kind == "identnum":
            # digit-led identifiers (lexer.rs:251 `[0-9]+[_a-zA-Z][...]`,
            # e.g. `123xyz`, `5msABC` where the timespan \b fails)
            tokens.append(Token("ident", raw, pos))
        elif kind == "hexml":
            body = raw[4:]
            delim = raw[1:4]
            if body.endswith(delim):
                body = body[:-3]
            tokens.append(Token("bytestring", body, pos))
        elif kind == "hexraw":
            quote = raw[2]
            tokens.append(Token("bytestring", raw[3:-1].replace(quote * 2, quote), pos))
        elif kind == "hexstring":
            tokens.append(Token("bytestring", _unescape(raw[2:-1]), pos))
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
