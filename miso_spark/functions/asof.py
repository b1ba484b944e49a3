"""As-of (point-in-time) join — the classic event-data operator Spark
has no built-in for.

Composition of existing DataFrame ops, not a UDF: tag both sides, union
them, sort within each key by (ts, side) and carry the right side's
values forward with ``last(ignorenulls)`` over a running window, then
keep only left rows. ONE shuffle on the key (the window's partition),
no join explosion, no Python — survives arbitrarily large inputs as
long as a single key's timeline fits a partition (same contract as any
windowed operator; salt the key upstream if one entity dominates).

Backward semantics: each left row gets the latest right row with
``right.ts <= left.ts`` (ties: the right row wins, i.e. inclusive) —
matching DuckDB's ``ASOF JOIN`` which the catalog uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_right",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row's
    ``value_cols`` (and its timestamp as ``{ts}{suffix}``) with
    ``right.{ts} <= left.{ts}`` per ``key``; null when no earlier right
    row exists. ``tolerance_s`` drops matches older than the given gap
    (nulls the attached columns, like pandas.merge_asof tolerance).
    """
    matched_ts = f"{ts}{suffix}"
    out_cols = [f"{c}{suffix}" for c in value_cols]

    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(ts),
        F.col(ts).alias(matched_ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__side", F.lit(0))

    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → ties are inclusive
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in [matched_ts, *out_cols]:
        unioned = unioned.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))

    out = unioned.filter(F.col("__side") == 1).drop("__side")
    if tolerance_s is not None:
        within = (
            F.col(matched_ts).isNotNull()
            & (F.unix_micros(ts) - F.unix_micros(matched_ts) <= int(tolerance_s * 1e6))
        )
        for c in [matched_ts, *out_cols]:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out
