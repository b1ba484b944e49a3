"""Range (interval) join — value ∈ [lo, hi] matching without a cross
join.

Spark plans a naive ``l.x BETWEEN r.lo AND r.hi`` join as
BroadcastNestedLoopJoin (quadratic when neither side broadcasts). The
scale technique is binning: bucket left values by ``bin_size``, explode
each right interval into every bin it overlaps, hash-join on the bin
with the exact range predicate in the join condition. Shuffle = rows +
intervals×spans; the candidate set per bin is bounded by bin width —
pick ``bin_size`` near the typical interval width so each interval
spans O(1) bins.

Join modes: the bin equality makes matches unique (a left row lives in
exactly ONE bin, and each interval has exactly one copy per bin), so
``inner`` and ``left`` fall out of the binned join directly. ``right``
and ``outer`` need the unmatched *intervals* back un-exploded — those
are recovered with an anti-join on a per-interval surrogate id and a
null-padded union, never by filtering exploded copies (an interval
matched in one bin is still matched, whatever its other bins did).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MODES = ("inner", "left", "right", "outer", "full")


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` to intervals of ``right`` where
    ``left.value_col`` ∈ [right.lo_col, right.hi_col] (inclusive both
    ends). Column names must not collide (select/alias beforehand).

    ``how`` ∈ inner|left|right|outer(full). For right/outer the right
    side is materialized once (localCheckpoint) to pin the surrogate
    ids the unmatched-interval recovery anti-joins on — the interval
    side is normally the small side, so this is a modest cost for exact
    outer semantics.
    """
    if how == "full":
        how = "outer"
    if how not in _MODES:
        raise ValueError(f"how must be one of {_MODES}, got {how!r}")

    need_rid = how in ("right", "outer")
    r = right
    if need_rid:
        # monotonically_increasing_id is only stable within one
        # evaluation; the checkpoint pins ids so the anti-join branch
        # and the join branch agree
        r = right.withColumn("__rid", F.monotonically_increasing_id()).localCheckpoint()

    lbin = left.withColumn("__lbin", F.floor(F.col(value_col) / F.lit(bin_size)))
    rbin = r.withColumn(
        "__rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_size)),
                F.floor(F.col(hi_col) / F.lit(bin_size)),
            )
        ),
    )
    cond = (
        (F.col("__lbin") == F.col("__rbin"))
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col))
    )
    # left/outer keep unmatched left rows here (each left row has ONE
    # bin → no duplicate null-padding); right starts from the matches
    base_how = "left" if how in ("left", "outer") else "inner"
    joined = lbin.join(rbin, cond, base_how).drop("__lbin", "__rbin")

    if need_rid:
        matched_ids = joined.select("__rid").where(F.col("__rid").isNotNull()).distinct()
        unmatched = r.join(matched_ids, "__rid", "left_anti")
        joined = joined.unionByName(unmatched, allowMissingColumns=True).drop("__rid")
    return joined
