"""CLI table renderer + REPL history (the miso-tui surface, text-mode:
miso-tui's interactive table rendering and scrollback/history)."""

from __future__ import annotations

from miso_spark.cli import format_table, repl


def test_format_table_snapshot():
    rows = [
        {"name": "alpha", "n": 3, "score": 0.5},
        {"name": "b", "n": 41, "score": None},
        {"name": None, "n": 7, "score": 12.25},
    ]
    assert format_table(rows) == "\n".join([
        "name    n  score",
        "-----  --  -----",
        "alpha   3    0.5",
        "b      41   null",
        "null    7  12.25",
        "(3 rows)",
    ])


def test_format_table_truncation_and_empty():
    rows = [{"i": i} for i in range(5)]
    out = format_table(rows, max_rows=2)
    assert "... (3 more rows)" in out and out.endswith("(5 rows)")
    assert format_table([]) == "(0 rows)"


def test_format_table_union_of_schemas():
    # rows with differing keys: columns appear in first-seen order
    out = format_table([{"a": 1}, {"b": "x"}])
    assert out.splitlines()[0].split() == ["a", "b"]


def test_repl_history_and_rerun():
    ran: list[str] = []
    outs: list[str] = []
    errs: list[str] = []
    history = repl(
        ran.append,
        ["t.x | count", ":history", ":1", ":9", "boom", ""],
        out=outs.append,
        err=errs.append,
    )
    # :1 re-ran the first query; :9 errored; blank exited
    assert ran == ["t.x | count", "t.x | count", "boom"]
    assert history == ["t.x | count", "t.x | count", "boom"]
    assert outs[0].strip().startswith("1") and "t.x | count" in outs[0]
    assert "> t.x | count" in outs
    assert errs == ["error: no history entry 9"]


def test_repl_survives_query_errors():
    def run_one(q: str) -> None:
        raise ValueError(f"bad: {q}")

    errs: list[str] = []
    history = repl(run_one, ["q1", "q2", ""], out=lambda s: None, err=errs.append)
    assert history == ["q1", "q2"]
    assert errs == ["error: bad: q1", "error: bad: q2"]
