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
    """Fixed-width table for a list of row dicts (insertion order)."""
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
    for row in cells:
        for c, v in zip(cols, row):
            widths[c] = max(widths[c], len(v))
    lines = [
        "  ".join(c.ljust(widths[c]) for c in cols),
        "  ".join("-" * widths[c] for c in cols),
    ]
    for row in cells:
        lines.append("  ".join(v.ljust(widths[c]) for c, v in zip(cols, row)))
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
    # REPL
    print("miso-spark> enter KQL (blank line or Ctrl-D to exit)")
    for line in sys.stdin:
        q = line.strip()
        if not q:
            break
        try:
            run_one(q)
        except Exception as e:  # noqa: BLE001 - REPL keeps going
            print(f"error: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
