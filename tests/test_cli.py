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


def test_results_pager_scrollback_snapshots():
    """miso-tui results_list.rs parity, text-mode: pinned header,
    selection the viewport follows, half-page jumps, 5-char horizontal
    scroll, position footer. Snapshot the exact rendering."""
    from miso_spark.cli import ResultsPager

    rows = [{"n": i, "name": f"row-{i:02d}", "note": "x" * 30} for i in range(12)]
    p = ResultsPager(rows, height=4, width=24)
    assert p.render() == "\n".join([
        "   n  name    note        ",
        "  --  ------  ------------",
        ">  0  row-00  xxxxxxxxxxxx",
        "   1  row-01  xxxxxxxxxxxx",
        "   2  row-02  xxxxxxxxxxxx",
        "   3  row-03  xxxxxxxxxxxx",
        "[rows 1-4 of 12  j/k u/d h/l g/G q]",
    ])  # header shares the body's 2-char gutter: columns align
    # selection moves inside the window without scrolling...
    for _ in range(3):
        p.key("j")
    assert p.scroll_y == 0 and p.selected == 3
    # ...then the viewport follows (results_list.rs:68-71)
    p.key("j")
    assert p.scroll_y == 1 and p.selected == 4
    lines = p.render().split("\n")
    assert lines[2].startswith("   1") and lines[-2].startswith(">  4")
    assert lines[-1] == "[rows 2-5 of 12  j/k u/d h/l g/G q]"
    # half-page down twice + clamp at the end
    p.key("d"); p.key("d"); p.key("G")
    assert p.selected == 11 and p.scroll_y == 8
    assert p.render().split("\n")[-1] == "[rows 9-12 of 12  j/k u/d h/l g/G q]"
    # horizontal scroll clips header and body together, 5-char steps
    p.key("g"); p.key("l"); p.key("l")
    out = p.render().split("\n")
    # 10 chars scrolled off: the name column is gone from the header
    assert out[0].strip() == "note"
    assert out[0].startswith("  ")  # gutter keeps header/body aligned
    assert out[2].startswith("> ")  # selection mark survives clipping
    assert out[2][2:].strip().startswith("xxx")  # body clipped in lockstep
    assert out[-1].endswith("cols +10  j/k u/d h/l g/G q]")
    p.key("h")
    assert p.scroll_x == 5
    # q closes
    assert p.key("q") is False


def test_page_results_drives_keys_and_stops_on_q():
    from miso_spark.cli import page_results

    rows = [{"i": i} for i in range(30)]
    frames: list[str] = []
    pager = page_results(rows, ["j", "d", "q", "j"], out=frames.append,
                         height=5, width=40)
    assert len(frames) == 3  # initial + j + d; q stops before the last j
    assert pager.selected == 3  # j then half-page (5//2=2)
    assert frames[0] != frames[1]


def test_final_rows_reduces_partial_stream():
    """final_rows: untagged final batch wins; without one the newest
    DONE round is the best state (metadata stripped); a mid-flight cut
    (round without its marker) falls back to the last complete round;
    non-partial row lists pass through untouched."""
    from miso_spark.cli import final_rows

    r0a = {"k": "a", "n": 1, "_miso_metadata": {"id": 0}}
    r0_done = {"_miso_metadata": {"id": 0, "done": True}}
    r1a = {"k": "a", "n": 5, "_miso_metadata": {"id": 1}}
    r1b = {"k": "b", "n": 2, "_miso_metadata": {"id": 1}}
    r1_done = {"_miso_metadata": {"id": 1, "done": True}}
    fin = [{"k": "a", "n": 9}, {"k": "b", "n": 3}]

    # final batch present → exactly the final rows
    assert final_rows([r0a, r0_done, r1a, r1b, r1_done, *fin]) == fin
    # stream cut after round 1's marker → round 1, metadata stripped
    assert final_rows([r0a, r0_done, r1a, r1b, r1_done]) == [
        {"k": "a", "n": 5},
        {"k": "b", "n": 2},
    ]
    # cut MID-round-1 (no marker) → round 0 is the last complete state
    assert final_rows([r0a, r0_done, r1a]) == [{"k": "a", "n": 1}]
    # non-partial results untouched
    assert final_rows(fin) == fin
    assert final_rows([]) == []
