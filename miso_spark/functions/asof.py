"""As-of (point-in-time) join — the classic event-data operator Spark
has no built-in for.

Composition of existing DataFrame ops, not a UDF: tag both sides, union
them, sort within each key by (ts, side) and carry the right side's row
forward as ONE struct with ``last(ignorenulls)`` over a running window,
then keep only left rows. The struct carry is what makes the attached
columns row-consistent: every output column comes from the SAME matched
right row, even when that row holds nulls (per-column carries would
silently substitute older non-null values).

ONE shuffle on the key (the window's partition) in the default mode, no
join explosion, no Python. A single hyperactive key serializes through
one task, though — ``salt_bucket_s`` splits each key's timeline into
fixed time buckets, runs the carry per (key, bucket) in parallel, and
stitches bucket boundaries with a tiny per-bucket prefix pass (the
standard parallel-scan decomposition: local scan + carry-in merge).

Directions (pandas ``merge_asof`` parity, ties inclusive):
``backward`` (default) — latest right row with right.ts <= left.ts,
matching DuckDB's ``ASOF JOIN`` which the catalog uses as the oracle;
``forward`` — earliest right row with right.ts >= left.ts;
``nearest`` — whichever of the two is closer (exact-distance ties →
backward, like pandas). backward and forward are the same window
with reversed ordering; nearest computes both carries in ONE pass
(same partitioning, two sorts) and picks per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_right",
    tolerance_s: float | None = None,
    salt_bucket_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matched right row's
    ``value_cols`` (and its timestamp as ``{ts}{suffix}``) per
    ``key`` and ``direction``; null when no matching right row exists.
    ``tolerance_s`` drops matches farther than the given gap (nulls
    the attached columns, like pandas.merge_asof tolerance).

    ``salt_bucket_s`` (seconds) enables the hot-key path: the window
    partitions on (key, time-bucket) so one dominant key's timeline
    spreads over timeline/salt_bucket_s tasks instead of one. Bucket
    boundaries are stitched by carrying each bucket's last (backward) /
    first (forward) right row across neighboring buckets — an
    aggregate over (key, bucket) rows, vanishingly small next to the
    data. Results are identical to the unsalted mode (asserted in
    tests); pick a bucket width around timeline_span /
    desired_parallelism.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    matched_ts = f"{ts}{suffix}"
    out_names = [matched_ts] + [f"{c}{suffix}" for c in value_cols]
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")

    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(ts),
        F.struct(
            F.col(ts).alias(matched_ts),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        ).alias("__r"),
    ).withColumn("__side", F.lit(0))

    unioned = l.unionByName(r, allowMissingColumns=True)
    part = [key]
    if salt_bucket_s is not None:
        unioned = unioned.withColumn(
            "__bkt", F.floor(F.unix_micros(F.col(ts)) / F.lit(int(salt_bucket_s * 1e6)))
        )
        part = [key, "__bkt"]

    # right rows sort before left rows at equal ts → ties are inclusive
    # in both directions
    frame = (Window.unboundedPreceding, 0)
    if need_b:
        wb = (
            Window.partitionBy(*part)
            .orderBy(F.col(ts).asc(), F.col("__side").asc())
            .rowsBetween(*frame)
        )
        unioned = unioned.withColumn("__cb", F.last("__r", ignorenulls=True).over(wb))
    if need_f:
        wf = (
            Window.partitionBy(*part)
            .orderBy(F.col(ts).desc(), F.col("__side").asc())
            .rowsBetween(*frame)
        )
        unioned = unioned.withColumn("__cf", F.last("__r", ignorenulls=True).over(wf))

    if salt_bucket_s is not None:
        # per-(key, bucket) boundary right rows; struct min/max order by
        # the first field (the right ts). Buckets with no right rows
        # stay null and last(ignorenulls) skips them.
        right_struct = F.when(F.col("__side") == 0, F.col("__r"))
        bounds = unioned.groupBy(key, "__bkt").agg(
            F.max(right_struct).alias("__last_r"),
            F.min(right_struct).alias("__first_r"),
        )
        sel = [F.col(key), F.col("__bkt")]
        if need_b:
            wprev = (
                Window.partitionBy(key)
                .orderBy(F.col("__bkt").asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            bounds = bounds.withColumn(
                "__prev", F.last("__last_r", ignorenulls=True).over(wprev)
            )
            sel.append(F.col("__prev"))
        if need_f:
            wnext = (
                Window.partitionBy(key)
                .orderBy(F.col("__bkt").desc())
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            bounds = bounds.withColumn(
                "__next", F.last("__first_r", ignorenulls=True).over(wnext)
            )
            sel.append(F.col("__next"))
        unioned = unioned.join(bounds.select(*sel), [key, "__bkt"], "left")
        if need_b:
            unioned = unioned.withColumn("__cb", F.coalesce("__cb", "__prev"))
        if need_f:
            unioned = unioned.withColumn("__cf", F.coalesce("__cf", "__next"))

    out = unioned.filter(F.col("__side") == 1)

    def gap(carry: str) -> Column:
        return F.abs(
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{carry}.{matched_ts}"))
        )

    if direction == "backward":
        carry = F.col("__cb")
    elif direction == "forward":
        carry = F.col("__cf")
    else:  # nearest: closer of the two; exact tie → backward (pandas)
        carry = (
            F.when(F.col("__cb").isNull(), F.col("__cf"))
            .when(F.col("__cf").isNull(), F.col("__cb"))
            .when(gap("__cb") <= gap("__cf"), F.col("__cb"))
            .otherwise(F.col("__cf"))
        )
    out = out.withColumn("__carry", carry)

    if tolerance_s is not None:
        within = F.col(f"__carry.{matched_ts}").isNotNull() & (
            F.abs(
                F.unix_micros(F.col(ts))
                - F.unix_micros(F.col(f"__carry.{matched_ts}"))
            )
            <= int(tolerance_s * 1e6)
        )
        out = out.withColumn("__carry", F.when(within, F.col("__carry")))
    return out.select(
        *left.columns,
        *[F.col(f"__carry.{n}").alias(n) for n in out_names],
    )
