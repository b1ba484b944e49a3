"""Connector field statistics (stats.rs parity).

Behavioral parity with the reference's stats layer
(miso-connectors/src/stats.rs:9-45): per-collection, per-field
``FieldStats`` with a ``distinct_count``, refetched from the connector
at an interval (the reference's ``IntervalStatsCollector`` runs
``Connector::fetch_stats`` every 3 hours — config.rs:14
DEFAULT_STATS_FETCH_INTERVAL). The engine uses these to drive
optimization decisions — dynamic-filter eligibility and broadcast-side
choice for engine-vs-connector joins (lib.rs:295-301 documents exactly
this use).

Instead of a background task, :class:`StatsCache` refreshes lazily on
read when the TTL has lapsed — same freshness contract, no thread. The
fetch itself goes over each connector's native cardinality surface:
ES / Quickwit ``cardinality`` aggregations (the same metric agg the
reference's dcount pushdown emits — quickwit.rs:1414), Splunk
``tstats dc(...)``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

#: config.rs:14 DEFAULT_STATS_FETCH_INTERVAL (3 hours)
DEFAULT_STATS_TTL_S = 3 * 3600.0


def parse_duration(v) -> float:
    """humantime-style duration → seconds (config.rs deserializes
    ``stats_fetch_interval`` with the humantime crate): ``"3h"``,
    ``"30m"``, ``"1h 30m"``, ``"500ms"``, compound tokens allowed.
    Bare JSON NUMBERS (int/float values) are seconds; a digit-only
    STRING like ``"300"`` is rejected, exactly as humantime rejects
    unitless strings — pass the number unquoted or add a unit."""
    import re

    if isinstance(v, (int, float)):
        return float(v)
    units = {
        "ns": 1e-9, "us": 1e-6, "ms": 1e-3,
        "s": 1.0, "sec": 1.0, "secs": 1.0, "second": 1.0, "seconds": 1.0,
        "m": 60.0, "min": 60.0, "mins": 60.0, "minute": 60.0, "minutes": 60.0,
        "h": 3600.0, "hr": 3600.0, "hrs": 3600.0, "hour": 3600.0, "hours": 3600.0,
        "d": 86400.0, "day": 86400.0, "days": 86400.0,
        "w": 604800.0, "week": 604800.0, "weeks": 604800.0,
        # humantime's month = 30.44 d, year = 365.25 d
        "month": 2629746.0, "months": 2629746.0,
        "y": 31557600.0, "year": 31557600.0, "years": 31557600.0,
    }
    units["M"] = units["month"]  # capital M only (m is minutes)
    toks = re.findall(r"(\d+(?:\.\d+)?)\s*([a-zA-Z]+)", str(v))
    if not toks or not re.fullmatch(r"(\s*\d+(?:\.\d+)?\s*[a-zA-Z]+\s*)+", str(v)):
        raise ValueError(f"bad duration {v!r}")
    total = 0.0
    for num, unit in toks:
        u = unit if unit == "M" else unit.lower()
        if u not in units:
            raise ValueError(f"bad duration unit {unit!r} in {v!r}")
        total += float(num) * units[u]
    return total


@dataclass(frozen=True)
class FieldStats:
    """stats.rs:13 — only distinct_count for now, like the reference."""

    distinct_count: int | None = None


#: stats.rs:9-10 — {collection: {field: FieldStats}}
ConnectorStats = dict


class StatsCache:
    """Lazy-TTL view over one source's ``fetch_stats()``.

    ``get(collection, field)`` mirrors ``Scan::get_field_stats``
    (miso-workflow/src/scan.rs:79): None when the connector has no
    stats for the field (or fetch_stats is unimplemented / the service
    is unreachable — stats are advisory, never load-bearing)."""

    def __init__(self, source, ttl_s: float = DEFAULT_STATS_TTL_S):
        self._source = source
        self._ttl_s = ttl_s
        self._stats: ConnectorStats = {}
        self._fetched_at: float | None = None

    def refresh(self) -> None:
        fetched = None
        try:
            fetched = self._source.fetch_stats()
        except Exception:  # noqa: BLE001 - advisory only, never fail a query
            pass
        if fetched is not None:
            self._stats = fetched
        self._fetched_at = time.monotonic()

    def get(self, collection: str, field: str) -> FieldStats | None:
        if (
            self._fetched_at is None
            or time.monotonic() - self._fetched_at > self._ttl_s
        ):
            self.refresh()
        return self._stats.get(collection, {}).get(field)

    def distinct_count(self, collection: str, field: str) -> int | None:
        fs = self.get(collection, field)
        return fs.distinct_count if fs is not None else None
