"""Full-screen interactive query TUI.

Parity: miso-tui/src — the same component architecture, message flow
and key bindings as the reference's ratatui app, rendered to plain
text frames so every component is testable headless (snapshot tests in
tests/test_tui.py, like the r7 pager's):

- :class:`TextBuffer` — multi-line editing buffer with cursor
  (text_buffer.rs: push/remove/delete char, remove line, remove word,
  cursor movement, horizontal window).
- :func:`highlight_kql` — KQL token classification through the
  engine's own lexer (kql_syntax_highlight.rs runs its own lexer).
- :class:`QueryInput` — editable query box, Ctrl+R runs
  (query_input.rs).
- :class:`LogView` — one row pretty-printed, j/k + page scroll
  (log_view.rs).
- :class:`ResultsWithPreview` — results list (the r7
  :class:`miso_spark.cli.ResultsPager` viewport model) beside a live
  preview of the selected row; Enter zooms the preview full-screen,
  Esc returns, Ctrl+O copies the selected row as JSON
  (results_with_preview.rs).
- :class:`ErrorModal` / :class:`Footer` — error popup with
  copy/dismiss; ``:`` command line (``:q`` quits) (error_modal.rs,
  footer.rs).
- :class:`App` — focus routing (Tab toggles Query/Results, ``:``
  opens the footer from Results), query execution through an injected
  runner, clipboard through an injected sink (app.rs route_key).

Keys are plain strings: printable characters, or ``"enter" "esc"
"tab" "backspace" "delete" "up" "down" "left" "right" "home" "end"
"pageup" "pagedown" "ctrl+r" "ctrl+o" "ctrl+c" "ctrl+d" "ctrl+w"``.

``run_terminal()`` drives the same App through stdlib curses for
actual interactive use — no third-party TUI dependency.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Optional

from miso_spark.cli import ResultsPager

# ---------------------------------------------------------------------------
# text buffer (text_buffer.rs)


class TextBuffer:
    def __init__(self, text: str = "", multiline: bool = True):
        self.lines = (text or "").split("\n")
        self.multiline = multiline
        self.y = len(self.lines) - 1
        self.x = len(self.lines[self.y])

    def value(self) -> str:
        return "\n".join(self.lines)

    def first_line(self) -> str:
        return self.lines[0]

    def line_count(self) -> int:
        return len(self.lines)

    def push_char(self, c: str) -> None:
        line = self.lines[self.y]
        self.lines[self.y] = line[: self.x] + c + line[self.x :]
        self.x += 1

    def add_line(self) -> None:
        if not self.multiline:
            return
        line = self.lines[self.y]
        self.lines[self.y] = line[: self.x]
        self.lines.insert(self.y + 1, line[self.x :])
        self.y += 1
        self.x = 0

    def remove_char(self) -> None:  # backspace
        if self.x > 0:
            line = self.lines[self.y]
            self.lines[self.y] = line[: self.x - 1] + line[self.x :]
            self.x -= 1
        elif self.y > 0:  # join with previous line (text_buffer.rs)
            prev = self.lines[self.y - 1]
            self.x = len(prev)
            self.lines[self.y - 1] = prev + self.lines.pop(self.y)
            self.y -= 1

    def delete_char(self) -> None:  # forward delete
        line = self.lines[self.y]
        if self.x < len(line):
            self.lines[self.y] = line[: self.x] + line[self.x + 1 :]
        elif self.y + 1 < len(self.lines):
            self.lines[self.y] = line + self.lines.pop(self.y + 1)

    def remove_line(self) -> None:  # ctrl+d
        if len(self.lines) > 1:
            self.lines.pop(self.y)
            self.y = min(self.y, len(self.lines) - 1)
        else:
            self.lines[0] = ""
        self.x = min(self.x, len(self.lines[self.y]))

    def remove_word_before_cursor(self) -> None:  # ctrl+w
        line = self.lines[self.y]
        i = self.x
        while i > 0 and line[i - 1] == " ":
            i -= 1
        while i > 0 and line[i - 1] != " ":
            i -= 1
        self.lines[self.y] = line[:i] + line[self.x :]
        self.x = i

    def move_left(self) -> None:
        if self.x > 0:
            self.x -= 1
        elif self.y > 0:
            self.y -= 1
            self.x = len(self.lines[self.y])

    def move_right(self) -> None:
        if self.x < len(self.lines[self.y]):
            self.x += 1
        elif self.y + 1 < len(self.lines):
            self.y += 1
            self.x = 0

    def move_up(self) -> None:
        if self.y > 0:
            self.y -= 1
            self.x = min(self.x, len(self.lines[self.y]))

    def move_down(self) -> None:
        if self.y + 1 < len(self.lines):
            self.y += 1
            self.x = min(self.x, len(self.lines[self.y]))

    def move_home(self) -> None:
        self.x = 0

    def move_end(self) -> None:
        self.x = len(self.lines[self.y])

    def handle_key(self, key: str) -> bool:
        """Shared editing-key dispatch; True when the key was consumed."""
        if key == "backspace":
            self.remove_char()
        elif key == "delete":
            self.delete_char()
        elif key == "ctrl+w":
            self.remove_word_before_cursor()
        elif key == "left":
            self.move_left()
        elif key == "right":
            self.move_right()
        elif key == "home":
            self.move_home()
        elif key == "end":
            self.move_end()
        elif len(key) == 1 and key.isprintable():
            self.push_char(key)
        else:
            return False
        return True


# ---------------------------------------------------------------------------
# KQL highlighting (kql_syntax_highlight.rs: the real lexer classifies)

#: token kind → highlight class, mirroring the reference's style map
_HL_CLASSES = {
    "string": "string",
    "int": "number",
    "float": "number",
    "datetime_lit": "number",
    "timespan": "number",
}
_HL_KEYWORDS = {
    "where", "project", "extend", "summarize", "sort", "order", "top",
    "take", "limit", "count", "distinct", "union", "join", "on", "by",
    "asc", "desc", "nulls", "first", "last", "let", "mv-expand", "kind",
    "between", "and", "or", "not", "in", "has", "has_cs", "contains",
    "startswith", "endswith", "exists",
}


def highlight_kql(text: str) -> list[tuple[str, str]]:
    """(class, fragment) spans covering ``text``; classes: keyword,
    string, number, ident, punct, ws, error. Uses the engine's lexer,
    so what highlights is exactly what parses."""
    from miso_spark.kql.lexer import LexError, tokenize

    try:
        tokens = [t for t in tokenize(text) if t.kind != "eof"]
    except LexError:
        return [("error", text)]
    spans: list[tuple[str, str]] = []
    bounds = [t.pos for t in tokens][1:] + [len(text)]
    pos = 0
    for t, next_pos in zip(tokens, bounds):
        if t.pos > pos:
            spans.append(("ws", text[pos : t.pos]))
        full = text[t.pos : next_pos]
        frag = full.rstrip()
        if t.kind in _HL_CLASSES:
            cls = _HL_CLASSES[t.kind]
        elif t.kind in _HL_KEYWORDS:
            cls = "keyword"
        elif t.kind == "ident":
            cls = "ident"
        else:
            cls = "punct"
        spans.append((cls, frag))
        if len(frag) < len(full):
            spans.append(("ws", full[len(frag) :]))
        pos = next_pos
    return spans


# ---------------------------------------------------------------------------
# components


class QueryInput:
    """query_input.rs: boxed editor, Ctrl+R emits ("run", query)."""

    def __init__(self, text: str = ""):
        self.buffer = TextBuffer(text)
        self.focused = False

    def height(self) -> int:
        return self.buffer.line_count() + 2

    def value(self) -> str:
        return self.buffer.value()

    def handle_key(self, key: str):
        if key == "enter":
            self.buffer.add_line()
        elif key == "ctrl+r":
            return ("run", self.buffer.value())
        elif key == "ctrl+d":
            self.buffer.remove_line()
        elif key == "up":
            self.buffer.move_up()
        elif key == "down":
            self.buffer.move_down()
        else:
            self.buffer.handle_key(key)
        return None

    def render(self, width: int) -> list[str]:
        inner = width - 4
        top = "┌ Query " + "─" * max(0, width - 9) + "┐"
        out = [top]
        for i, line in enumerate(self.buffer.lines):
            shown = line
            cursor = ""
            if self.focused and i == self.buffer.y:
                x = self.buffer.x
                shown = line[:x] + "█" + line[x + 1 :] if x < len(line) else line + "█"
            out.append("│ " + shown[:inner].ljust(inner) + " │")
        hint = " Ctrl+R to run "
        out.append("└" + hint + "─" * max(0, width - 2 - len(hint)) + "┘")
        return out


class LogView:
    """log_view.rs: one row, pretty JSON, vertical scroll."""

    def __init__(self):
        self.row: Optional[dict] = None
        self.scroll_y = 0
        self.focused = False
        self._page = 8  # body lines of the last render (height - 2)

    def set_row(self, row: Optional[dict]) -> None:
        self.row = row
        self.scroll_y = 0

    def _text_lines(self) -> list[str]:
        if self.row is None:
            return ["(no row selected)"]
        return json.dumps(self.row, indent=2, sort_keys=True, default=str).split("\n")

    def handle_key(self, key: str, height: int | None = None) -> None:
        # default to the page size of the last render — a hardcoded
        # height would make the tail of a long row unreachable on
        # shorter panes (max_scroll clamped too low) and mis-size the
        # page step on taller ones
        h = height if height is not None else self._page
        n = len(self._text_lines())
        max_scroll = max(0, n - h)
        if key in ("k", "up"):
            self.scroll_y = max(0, self.scroll_y - 1)
        elif key in ("j", "down"):
            self.scroll_y = min(max_scroll, self.scroll_y + 1)
        elif key == "pageup":
            self.scroll_y = max(0, self.scroll_y - max(1, h // 2))
        elif key == "pagedown":
            self.scroll_y = min(max_scroll, self.scroll_y + max(1, h // 2))
        elif key == "home":
            self.scroll_y = 0
        elif key == "end":
            self.scroll_y = max_scroll

    def render(self, width: int, height: int) -> list[str]:
        self._page = max(1, height - 2)
        title = "┌ Log " + "─" * max(0, width - 7) + "┐"
        inner = width - 4
        body = self._text_lines()[self.scroll_y : self.scroll_y + height - 2]
        out = [title]
        for line in body:
            out.append("│ " + line[:inner].ljust(inner) + " │")
        while len(out) < height - 1:
            out.append("│ " + " " * inner + " │")
        out.append("└" + "─" * (width - 2) + "┘")
        return out


class ResultsWithPreview:
    """results_with_preview.rs: list + preview split; Enter zooms the
    preview, Esc/Backspace returns, Ctrl+O copies the selected row."""

    def __init__(self):
        self.rows: list[dict] = []
        self.log_view = LogView()
        self.mode = "list"  # "list" | "log"
        self.focused = False
        self._pager: Optional[ResultsPager] = None
        self._pager_dims = (0, 0)

    # -- data flow ----------------------------------------------------
    def push_row(self, row: dict) -> None:
        self.rows.append(row)
        self._pager = None
        if len(self.rows) == 1:
            self.log_view.set_row(row)

    def clear(self) -> None:
        self.rows = []
        self._pager = None
        self.mode = "list"
        self.log_view.set_row(None)

    def selected_row(self) -> Optional[dict]:
        if not self.rows:
            return None
        sel = self._pager.selected if self._pager else 0
        return self.rows[min(sel, len(self.rows) - 1)]

    def _pager_for(self, width: int, height: int) -> ResultsPager:
        if self._pager is None or self._pager_dims != (width, height):
            old = self._pager
            self._pager = ResultsPager(self.rows, height=max(1, height - 4), width=width - 2)
            self._pager_dims = (width, height)
            if old is not None:
                self._pager.selected = min(old.selected, max(0, len(self.rows) - 1))
                self._pager.key("noop")  # re-clamp the viewport
        return self._pager

    # -- keys (results_with_preview.rs handle_key) ---------------------
    def handle_key(self, key: str):
        if key == "ctrl+o":
            if self.rows:
                return ("copy", json.dumps(self.selected_row(), default=str))
            return None
        if key in ("q", "ctrl+c"):
            return ("exit", None)
        if self.mode == "list":
            if key == "enter" and self.rows:
                self.mode = "log"
                return None
            if self._pager is not None:
                self._pager.key(key)
            elif self.rows:
                self._pager_for(80, 24).key(key)
            self.log_view.set_row(self.selected_row())
            return None
        # log mode
        if key in ("esc", "backspace"):
            self.mode = "list"
            return None
        self.log_view.handle_key(key)
        return None

    # -- render -------------------------------------------------------
    def render(self, width: int, height: int) -> list[str]:
        if self.mode == "log":
            return self.log_view.render(width, height)
        if not self.rows:
            empty = "┌ Results " + "─" * max(0, width - 11) + "┐"
            out = [empty]
            for _ in range(height - 2):
                out.append("│" + " " * (width - 2) + "│")
            out.append("└" + "─" * (width - 2) + "┘")
            return out
        # 50/50 split (results_with_preview.rs view)
        lw = width // 2
        rw = width - lw
        pager = self._pager_for(lw, height)
        self.log_view.set_row(self.selected_row())
        left = pager.render().split("\n")
        left = [line[: lw - 1].ljust(lw - 1) for line in left][:height]
        while len(left) < height:
            left.append(" " * (lw - 1))
        right = self.log_view.render(rw, height)
        return [l + "│" + r[: rw - 1] for l, r in zip(left, right)]


class ErrorModal:
    """error_modal.rs: show/dismiss/copy/exit."""

    def __init__(self):
        self.message: Optional[str] = None

    def is_visible(self) -> bool:
        return self.message is not None

    def show(self, message: str) -> None:
        self.message = message

    def handle_key(self, key: str):
        if key in ("esc", "enter"):
            self.message = None
            return ("dismissed", None)
        if key == "ctrl+o" and self.message is not None:
            return ("copy", self.message)
        if key in ("q", "ctrl+c"):
            return ("exit", None)
        return None

    def render(self, width: int) -> list[str]:
        if self.message is None:
            return []
        inner = max(10, int(width * 0.6) - 4)
        out = ["╔═ Error " + "═" * max(0, inner - 6) + "╗"]
        text = self.message
        while text:
            out.append("║ " + text[:inner].ljust(inner) + " ║")
            text = text[inner:]
        out.append("║ " + "Esc/Enter close  Ctrl+O copy".ljust(inner) + " ║")
        out.append("╚" + "═" * (inner + 2) + "╝")
        return out


class Footer:
    """footer.rs: single-line ``:`` command input; Enter emits it."""

    def __init__(self):
        self.buffer = TextBuffer(multiline=False)

    def height(self) -> int:
        return 1

    def handle_key(self, key: str):
        if key == "enter":
            return ("command", self.buffer.value())
        self.buffer.handle_key(key)
        return None

    def render(self, width: int) -> str:
        line = self.buffer.first_line()
        x = self.buffer.x
        shown = line[:x] + "█" + line[x:] if len(line) >= x else line + "█"
        return (":" + shown)[:width]


# ---------------------------------------------------------------------------
# app (app.rs)


#: rows to drain from an active stream per UI tick (app.rs LOGS_CHUNK)
LOGS_CHUNK = 4096


class _QueryStream:
    """client.rs query_stream: read the runner's row iterable on a
    background thread into a queue of ``("log", row)`` /
    ``("error", msg)`` messages (StreamMessage analog), terminated by
    ``("eos", None)`` (the channel-disconnect the reference sees when
    the sender drops). The app drains it non-blocking per tick."""

    def __init__(self, runner: Callable[[str], Iterable[dict]], query: str):
        import queue
        import threading

        self.q: "queue.Queue[tuple[str, object]]" = queue.Queue()
        self._empty = queue.Empty

        def work() -> None:
            try:
                for row in runner(query):
                    self.q.put(("log", row))
            except Exception as e:  # noqa: BLE001 — surfaces as modal
                self.q.put(("error", str(e)))
            finally:
                self.q.put(("eos", None))

        threading.Thread(target=work, daemon=True).start()

    def try_recv(self):
        """One queued message or None (mpsc try_recv: Empty → None)."""
        try:
            return self.q.get_nowait()
        except self._empty:
            return None


class App:
    """The reference TUI's message loop, headless. ``runner(query)``
    returns an iterable of row dicts (raise to surface an error modal);
    copied text lands in ``self.clipboard`` (a list — the injected
    arboard analog).

    ``incremental=True`` is the remote (client.rs) mode: ``run_query``
    spawns the runner on a background thread and returns immediately;
    the terminal loop calls :meth:`poll_stream` each tick to drain up
    to LOGS_CHUNK rows into the results view — rows render as the SSE
    stream delivers them instead of after the query completes. Rows
    tagged ``_miso_metadata`` (the server's partial_stream protocol,
    partial_stream.rs:33-34) render as replace-on-round-done previews
    through ResultsWithPreview; the untagged final batch replaces the
    last preview."""

    def __init__(self, runner: Callable[[str], Iterable[dict]],
                 query: str | None = None, incremental: bool = False):
        self.runner = runner
        self.incremental = incremental
        self.stream: Optional[_QueryStream] = None
        self._round_buf: list[dict] = []
        self._partial_seen = False
        self._final_started = False
        self.results = ResultsWithPreview()
        self.query_input = QueryInput(query or "")
        self.footer = Footer()
        self.error_modal = ErrorModal()
        self.focused = "query"  # "query" | "results" | "footer"
        self.exit = False
        self.clipboard: list[str] = []
        self.query_input.focused = True
        if query:
            self.run_query(query)

    # -- focus (app.rs change_focus) -----------------------------------
    def change_focus(self, target: str) -> None:
        self.results.focused = target == "results"
        self.query_input.focused = target == "query"
        self.focused = target

    # -- key routing (app.rs route_key) --------------------------------
    def handle_key(self, key: str) -> None:
        if self.error_modal.is_visible():
            self._dispatch(self.error_modal.handle_key(key), source="error")
            return
        if key == "esc":
            if self.focused == "footer":
                self.change_focus("results")
            elif self.focused == "results":
                self.results.handle_key(key)
            return
        if key == ":" and self.focused == "results":
            self.change_focus("footer")
            return
        if key == "tab":
            if self.focused == "results":
                self.change_focus("query")
            elif self.focused == "query":
                self.change_focus("results")
            else:
                self.footer.handle_key(key)
            return
        if self.focused == "results":
            self._dispatch(self.results.handle_key(key), source="results")
        elif self.focused == "query":
            self._dispatch(self.query_input.handle_key(key), source="query")
        else:
            self._dispatch(self.footer.handle_key(key), source="footer")

    def _dispatch(self, out, source: str) -> None:
        if out is None:
            return
        kind, payload = out
        if kind == "run":
            self.run_query(payload)
        elif kind == "copy":
            self.clipboard.append(payload)
        elif kind == "exit":
            self.exit = True
        elif kind == "dismissed":
            self.change_focus("query")
        elif kind == "command":
            if payload == "q":
                self.exit = True
            self.footer.buffer = TextBuffer(multiline=False)
            self.change_focus("results")

    # -- query execution (app.rs run_query) -----------------------------
    def run_query(self, query: str) -> None:
        if self.incremental:
            if self.stream is not None:
                return  # app.rs:262 — one active stream at a time
            self.results.clear()
            self._round_buf = []
            self._partial_seen = False
            self._final_started = False
            self.change_focus("results")
            self.stream = _QueryStream(self.runner, query)
            return
        self.results.clear()
        self.change_focus("results")
        try:
            for row in self.runner(query):
                self.results.push_row(row)
        except Exception as e:  # noqa: BLE001 — any engine error → modal
            self.error_modal.show(str(e))
            self.change_focus("query")

    # -- incremental drain (app.rs handle_events:114-135) ---------------
    def poll_stream(self, max_logs: int = LOGS_CHUNK) -> int:
        """Drain up to ``max_logs`` queued stream rows into the results
        view; error → modal + focus back to query (app.rs:124-128);
        eos → stream slot freed. Returns rows pushed (0 = idle tick)."""
        if self.stream is None:
            return 0
        pushed = 0
        while pushed < max_logs:
            msg = self.stream.try_recv()
            if msg is None:
                break
            kind, payload = msg
            if kind == "log":
                self._push_stream_row(payload)
                pushed += 1
            elif kind == "error":
                self.stream = None
                self.error_modal.show(str(payload))
                self.change_focus("query")
                break
            else:  # eos
                self.stream = None
                break
        return pushed

    def _push_stream_row(self, row: dict) -> None:
        """Partial-stream protocol (server.py /query + partial_stream
        .rs): rows tagged ``_miso_metadata.id`` buffer until the
        round's ``done`` marker, which REPLACES the view with that
        round (each round is the full current partial state); the
        untagged final batch replaces the last preview."""
        meta = row.get("_miso_metadata") if isinstance(row, dict) else None
        if meta is not None:
            self._partial_seen = True
            if meta.get("done"):
                self.results.clear()
                for r in self._round_buf:
                    self.results.push_row(r)
                self._round_buf = []
            else:
                self._round_buf.append(
                    {k: v for k, v in row.items() if k != "_miso_metadata"}
                )
            return
        if self._partial_seen and not self._final_started:
            self.results.clear()  # final batch supersedes the preview
        self._final_started = True
        self.results.push_row(row)

    # -- frame --------------------------------------------------------
    def render(self, width: int = 80, height: int = 24) -> str:
        q_h = self.query_input.height()
        f_h = self.footer.height() if self.focused == "footer" else 0
        r_h = max(3, height - q_h - f_h)
        frame = self.results.render(width, r_h)
        frame += self.query_input.render(width)
        if f_h:
            frame.append(self.footer.render(width))
        if self.error_modal.is_visible():
            modal = self.error_modal.render(width)
            top = max(0, (len(frame) - len(modal)) // 2)
            left = max(0, (width - len(modal[0])) // 2)
            for i, mline in enumerate(modal):
                if top + i < len(frame):
                    base = frame[top + i].ljust(width)
                    frame[top + i] = (
                        base[:left] + mline + base[left + len(mline):]
                    )[:width]
        return "\n".join(line[:width] for line in frame)


# ---------------------------------------------------------------------------
# terminal driver (stdlib curses — no third-party TUI dependency)


def run_terminal(runner: Callable[[str], Iterable[dict]],
                 query: str | None = None,
                 incremental: bool = False) -> None:  # pragma: no cover
    """Interactive loop: curses reads keys, App renders frames. With
    ``incremental`` (remote mode) the key read is non-blocking and each
    tick drains the active SSE stream, so rows appear as they arrive —
    the reference's event loop (app.rs handle_events: poll terminal
    first, then drain up to LOGS_CHUNK stream messages)."""
    import curses

    def main(stdscr):
        curses.curs_set(0)
        if incremental:
            stdscr.timeout(50)  # ms; getch returns -1 on idle ticks
        app = App(runner, query, incremental=incremental)
        keymap = {
            curses.KEY_UP: "up", curses.KEY_DOWN: "down",
            curses.KEY_LEFT: "left", curses.KEY_RIGHT: "right",
            curses.KEY_HOME: "home", curses.KEY_END: "end",
            curses.KEY_PPAGE: "pageup", curses.KEY_NPAGE: "pagedown",
            curses.KEY_BACKSPACE: "backspace", 127: "backspace",
            curses.KEY_DC: "delete", 9: "tab", 10: "enter", 27: "esc",
            18: "ctrl+r", 15: "ctrl+o", 3: "ctrl+c", 4: "ctrl+d",
            23: "ctrl+w",
        }
        while not app.exit:
            h, w = stdscr.getmaxyx()
            stdscr.erase()
            for i, line in enumerate(app.render(w - 1, h - 1).split("\n")[: h - 1]):
                stdscr.addstr(i, 0, line)
            stdscr.refresh()
            c = stdscr.getch()
            if c == -1:  # idle tick (incremental mode timeout)
                app.poll_stream()
                continue
            key = keymap.get(c)
            if key is None and 32 <= c < 127:
                key = chr(c)
            if key is not None:
                app.handle_key(key)
            if incremental:
                app.poll_stream()

    curses.wrapper(main)
