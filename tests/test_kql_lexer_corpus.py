"""Exhaustive port of the reference lexer corpus
(miso-kql/src/lexer_tests.rs, 435 lines): string forms and the full
escape surface, hex (byte) strings, numbers, booleans, comments,
timespans, and token-priority rules — asserted on our token stream.
"""

from __future__ import annotations

import pytest

from miso_spark.kql.lexer import tokenize


def toks(text: str):
    return [(t.kind, t.value) for t in tokenize(text) if t.kind != "eof"]


def one(text: str):
    ts = toks(text)
    assert len(ts) == 1, ts
    return ts[0]


# -- string literals (lexer_tests.rs:7-24) ----------------------------------


@pytest.mark.parametrize(
    "src,kind,val",
    [
        ('"hello world"', "string", "hello world"),
        ("'hello world'", "string", "hello world"),
        ('h"hello"', "bytestring", "hello"),
        ('H"world"', "bytestring", "world"),
        ("h'test'", "bytestring", "test"),
        ("H'TEST'", "bytestring", "TEST"),
        ('""', "string", ""),
        ("''", "string", ""),
        ('h""', "bytestring", ""),
    ],
)
def test_string_literals(src, kind, val):
    assert one(src) == (kind, val)


# -- escapes (lexer_tests.rs:22-114) ----------------------------------------


@pytest.mark.parametrize(
    "src,val",
    [
        (r'"Hello\nWorld"', "Hello\nWorld"),
        (r'"Tab\there"', "Tab\there"),
        (r'"Quote: \"Hello\""', 'Quote: "Hello"'),
        (r'"Backslash: \\"', "Backslash: \\"),
    ],
)
def test_escape_sequences(src, val):
    assert one(src) == ("string", val)


@pytest.mark.parametrize(
    "src,val",
    [
        (r'"\a"', "\x07"),
        (r'"\b"', "\x08"),
        (r'"\f"', "\x0c"),
        (r'"\n"', "\n"),
        (r'"\r"', "\r"),
        (r'"\t"', "\t"),
        (r'"\v"', "\x0b"),
        (r'"\'"', "'"),
        (r'"\""', '"'),
        (r'"\\"', "\\"),
    ],
)
def test_all_basic_escape_sequences(src, val):
    assert one(src) == ("string", val)


@pytest.mark.parametrize(
    "src,val",
    [
        (r'"\x41"', "A"),
        (r'"\x7A"', "z"),
        (r'"\x4"', "\\x4"),  # too short → literal
        (r'"\xGG"', "\\xGG"),  # non-hex → literal
    ],
)
def test_hex_escape_sequences(src, val):
    assert one(src) == ("string", val)


@pytest.mark.parametrize(
    "src,val",
    [
        (r'"\u0041"', "A"),
        (r'"\U00000041"', "A"),
        (r'"\u263A"', "☺"),
        (r'"\u41"', "\\u41"),  # too short → literal
        (r'"\U0041"', "\\U0041"),
    ],
)
def test_unicode_escape_sequences(src, val):
    assert one(src) == ("string", val)


@pytest.mark.parametrize(
    "src,val",
    [
        (r'"\7"', "\x07"),
        (r'"\77"', "?"),
        (r'"\101"', "A"),
        (r'"\8"', "\\8"),  # not octal → literal
        (r'"\78"', "\x078"),  # octal stops at non-octal digit
        (r'"\377"', "\xff"),  # max u8
        (r'"\400"', "\\400"),  # overflow → literal
    ],
)
def test_octal_escape_sequences(src, val):
    assert one(src) == ("string", val)


@pytest.mark.parametrize(
    "src,val",
    [
        (r'"\q"', "\\q"),
        (r'"\z"', "\\z"),
        ('"hello\\"', "hello\\"),  # trailing backslash kept (maximal munch)
    ],
)
def test_unknown_and_edge_escape_sequences(src, val):
    assert one(src) == ("string", val)


def test_complex_escape_combinations():
    assert one(r'"\n\t\r\\\""') == ("string", '\n\t\r\\"')
    assert one(r'"\x41\u0042\101"') == ("string", "ABA")


def test_invalid_unicode_codepoints():
    assert one(r'"\U00110000"') == ("string", "\\U00110000")


# -- raw strings (lexer_tests.rs:116-157) -----------------------------------


@pytest.mark.parametrize(
    "src,kind,val",
    [
        ('@"hello world"', "string", "hello world"),
        ("@'hello world'", "string", "hello world"),
        (r'@"hello\nworld"', "string", "hello\\nworld"),  # no escape processing
        ('@"Say ""Hello"" to me"', "string", 'Say "Hello" to me'),
        ("@'Don''t worry'", "string", "Don't worry"),
        ('h@"hello"', "bytestring", "hello"),
        ("H@'world'", "bytestring", "world"),
    ],
)
def test_raw_strings(src, kind, val):
    assert one(src) == (kind, val)


# -- multiline strings (lexer_tests.rs:151-163, 258) ------------------------


@pytest.mark.parametrize(
    "src,kind,val",
    [
        ("```hello\nworld```", "string", "hello\nworld"),
        ("h```hex\ncontent```", "bytestring", "hex\ncontent"),
        ("~~~hello\nworld~~~", "string", "hello\nworld"),
        ("H~~~HEX\nCONTENT~~~", "bytestring", "HEX\nCONTENT"),
        ("```hello\nworld", "string", "hello\nworld"),  # unterminated → rest
        ("~~~incomplete", "string", "incomplete"),
        ("``````", "string", ""),
        ("~~~~~~", "string", ""),
    ],
)
def test_multiline_strings(src, kind, val):
    assert one(src) == (kind, val)


def test_multiline_with_delimiter_in_content():
    assert toks("```hello``` ```world```") == [
        ("string", "hello"),
        ("string", "world"),
    ]


def test_whitespace_skipping():
    assert toks('  "hello"   "world"  ') == [("string", "hello"), ("string", "world")]


def test_mixed_string_types():
    src = '"regular" h\'hex\' @"raw" ```multi\nline``` ~~~tilde~~~'
    assert toks(src) == [
        ("string", "regular"),
        ("bytestring", "hex"),
        ("string", "raw"),
        ("string", "multi\nline"),
        ("string", "tilde"),
    ]


# -- numbers (lexer_tests.rs:273-312) ---------------------------------------


@pytest.mark.parametrize(
    "src,val",
    [
        ("123e4", 123e4),
        ("456E10", 456e10),
        ("789e-3", 789e-3),
        ("42E+5", 42e5),
        ("123.456e4", 123.456e4),
        ("0.5E-10", 0.5e-10),
        ("99.99e+2", 99.99e2),
        ("123.e5", 123.0e5),
        ("123.456", 123.456),
        ("0.5", 0.5),
        ("42.0", 42.0),
        ("123.", 123.0),
        ("1e100", 1e100),
        ("1e-100", 1e-100),
        ("0.0", 0.0),
        ("0e0", 0.0),
    ],
)
def test_float_tokens(src, val):
    assert one(src) == ("float", val)


@pytest.mark.parametrize(
    "src,val",
    [
        ("0x1A", 0x1A),
        ("0X2B", 0x2B),
        ("0xDEADBEEF", 0xDEADBEEF),
        ("0x0", 0),
        ("0xfF", 0xFF),
        ("123", 123),
        ("0", 0),
        ("999999", 999999),
    ],
)
def test_integer_tokens(src, val):
    assert one(src) == ("int", val)


@pytest.mark.parametrize(
    "src,kind", [("true", "true"), ("True", "true"), ("TRUE", "true"),
                 ("false", "false"), ("False", "false"), ("FALSE", "false")]
)
def test_boolean_literals(src, kind):
    assert one(src)[0] == kind


def test_pattern_precedence():
    assert one("123e4") == ("float", 123e4)  # sci beats int
    assert one("123.456") == ("float", 123.456)  # decimal beats int
    assert one("0x123") == ("int", 0x123)  # hex beats decimal


def test_mixed_tokens():
    assert toks("123 45.6 true 0xFF 1e10 false") == [
        ("int", 123),
        ("float", 45.6),
        ("true", None),
        ("int", 0xFF),
        ("float", 1e10),
        ("false", None),
    ]


def test_whitespace_handling():
    assert toks("  123.45   true   0xFF  ") == [
        ("float", 123.45),
        ("true", None),
        ("int", 0xFF),
    ]


# -- comments (lexer_tests.rs:362-410) --------------------------------------


def test_comments():
    assert toks("// This is a comment") == []
    assert toks("// Comment\nx = 5") == [("ident", "x"), ("=", None), ("int", 5)]
    assert toks("x = 5 // This is an inline comment") == [
        ("ident", "x"),
        ("=", None),
        ("int", 5),
    ]
    assert toks("// First comment\n// Second comment\nx = 5") == [
        ("ident", "x"),
        ("=", None),
        ("int", 5),
    ]
    assert toks("// Comment with symbols: !@#$%^&*()") == []
    assert toks("//") == []
    # \r terminates a comment like \n
    assert toks("// Comment\rx = 5")[0] == ("ident", "x")
    # a lone / is division, not a comment opener
    assert toks("x / y") == [("ident", "x"), ("/", None), ("ident", "y")]


# -- timespans (lexer_tests.rs:400-435) -------------------------------------


@pytest.mark.parametrize(
    "src,seconds",
    [
        ("5ms", 0.005),
        ("30s", 30.0),
        ("2.5m", 150.0),
        ("10minutes", 600.0),
        ("45seconds", 45.0),
        ("3hours", 10800.0),
        ("1.5days", 129600.0),
        ("24hrs", 86400.0),
        ("1hr", 3600.0),
        ("15min", 900.0),
        ("500milliseconds", 0.5),
        ("1000microseconds", 0.001),
        ("500nanoseconds", 5e-7),
        ("100ticks", 1e-5),  # .NET tick = 100ns
        ("3.25s", 3.25),
        ("0.5hours", 1800.0),
    ],
)
def test_timespan_literals(src, seconds):
    kind, val = one(src)
    assert kind == "timespan" and val == pytest.approx(seconds)


def test_timespan_vs_ident_priority():
    assert one("5ms")[0] == "timespan"
    assert one("5msABC") == ("ident", "5msABC")
    assert one("123xyz") == ("ident", "123xyz")


# -- parser-level byte-string rejection (parser.rs:482) ---------------------


def test_byte_strings_rejected_with_reference_message():
    from miso_spark.kql import parse_kql

    with pytest.raises(Exception, match="byte strings are currently not supported"):
        parse_kql('connector.table | where field1 == h"68656c6c6f"')
