"""Command-line client — the engine-appropriate analog of the
reference's TUI client (miso-tui): type KQL, see rows.

Modes:
- local:  ``python -m miso_spark.cli --data-dir /path 'KQL'`` spins up
  a session, registers the dir as connector ``t``, runs the query and
  pretty-prints rows (or ``--explain`` for the physical plan).
- remote: ``python -m miso_spark.cli --server http://host:port 'KQL'``
  POSTs to the HTTP server's /query route and streams the SSE frames
  as they arrive — the reference's curl workflow with a table printer.
- REPL:   omit the query to read statements interactively.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from typing import Iterable, Iterator


def format_table(rows: list[dict], max_rows: int = 50) -> str:
    """Fixed-width table for a list of row dicts (insertion order).
    Numeric columns right-align, like the reference TUI's table
    renderer (miso-tui table.rs)."""
    if not rows:
        return "(0 rows)"
    cols: list[str] = []
    for r in rows:
        for c in r:
            if c not in cols:
                cols.append(c)
    widths = {c: len(c) for c in cols}
    shown = rows[:max_rows]
    cells = [[_fmt(r.get(c)) for c in cols] for r in shown]
    numeric = {
        c: all(
            isinstance(r.get(c), (int, float)) and not isinstance(r.get(c), bool)
            for r in shown
            if r.get(c) is not None
        )
        for c in cols
    }
    for row in cells:
        for c, v in zip(cols, row):
            widths[c] = max(widths[c], len(v))

    def pad(c: str, v: str) -> str:
        return v.rjust(widths[c]) if numeric[c] else v.ljust(widths[c])

    lines = [
        "  ".join(pad(c, c) for c in cols),
        "  ".join("-" * widths[c] for c in cols),
    ]
    for row in cells:
        lines.append("  ".join(pad(c, v) for c, v in zip(cols, row)))
    extra = len(rows) - len(shown)
    if extra > 0:
        lines.append(f"... ({extra} more rows)")
    lines.append(f"({len(rows)} rows)")
    return "\n".join(lines)


def _fmt(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def stream_remote(server: str, query: str, partial: bool = False) -> Iterator[dict]:
    """Yield row dicts from the server's SSE stream; raises on an
    in-band ``event: error`` frame."""
    body = {"query": query}
    if partial:
        body["partial_stream"] = True
    req = urllib.request.Request(
        f"{server.rstrip('/')}/query",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = urllib.request.urlopen(req)
    pending_error = False
    done = False
    for raw in resp:
        line = raw.decode().strip()
        if line.startswith("event: error"):
            pending_error = True
        elif line.startswith("event: done"):
            done = True
        elif line.startswith("data: "):
            obj = json.loads(line[6:])
            if pending_error:
                raise RuntimeError(obj.get("error", "query failed"))
            if not done:
                yield obj


def run_remote(server: str, query: str, partial: bool = False) -> list[dict]:
    return list(stream_remote(server, query, partial))


def repl(run_one, lines: Iterable[str], out=print, err=None) -> list[str]:
    """The interactive loop, decoupled from stdin for testability.

    Commands (the miso-tui scrollback/history surface, text-mode):
    ``:history`` lists this session's queries, ``:N`` re-runs the Nth,
    a blank line exits. Returns the final history list.
    """
    err = err or (lambda msg: print(msg, file=sys.stderr))
    history: list[str] = []
    for line in lines:
        q = line.strip()
        if not q:
            break
        if q == ":history":
            for i, h in enumerate(history, 1):
                out(f"{i:3}  {h}")
            continue
        if q.startswith(":") and q[1:].isdigit():
            n = int(q[1:])
            if not 1 <= n <= len(history):
                err(f"error: no history entry {n}")
                continue
            q = history[n - 1]
            out(f"> {q}")
        history.append(q)
        try:
            run_one(q)
        except Exception as e:  # noqa: BLE001 - REPL keeps going
            err(f"error: {e}")
    return history


def main(argv: list[str] | None = None) -> int:  # pragma: no cover - thin shell
    ap = argparse.ArgumentParser(prog="miso-spark", description=__doc__)
    ap.add_argument("query", nargs="?", help="KQL query (omit for a REPL)")
    ap.add_argument("--data-dir", help="parquet dir registered as connector 't'")
    ap.add_argument("--server", help="HTTP server base URL (remote mode)")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--json", action="store_true", help="print JSON lines, not a table")
    ap.add_argument("--partial", action="store_true", help="request partial_stream")
    args = ap.parse_args(argv)

    if args.server:
        def run_one(q: str) -> None:
            rows = run_remote(args.server, q, args.partial)
            print("\n".join(json.dumps(r) for r in rows) if args.json else format_table(rows))
    else:
        from miso_spark.api import MisoSpark
        from miso_spark.session import get_spark
        from miso_spark.sources import ParquetDirSource

        m = MisoSpark(get_spark("miso_spark_cli"))
        if args.data_dir:
            m.registry.register("t", ParquetDirSource(args.data_dir))

        def run_one(q: str) -> None:
            if args.explain:
                print(m.explain(q))
                return
            rows = list(m.query_rows(q))
            print("\n".join(json.dumps(r, default=str) for r in rows) if args.json else format_table(rows))

    if args.query:
        run_one(args.query)
        return 0
    # REPL — line editing + in-process arrow-key history when the
    # readline module is available (no files written)
    try:
        import readline  # noqa: F401
    except ImportError:
        pass
    print("miso-spark> enter KQL (:history lists, :N re-runs, blank exits)")

    def prompt_lines() -> Iterator[str]:
        # input() routes through readline (arrow keys, ctrl-r) on a tty
        while True:
            try:
                yield input("miso-spark> ")
            except EOFError:
                return

    repl(run_one, prompt_lines() if sys.stdin.isatty() else sys.stdin)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
