"""Range (interval) join — value ∈ [lo, hi] matching without a cross
join.

Spark plans a naive ``l.x BETWEEN r.lo AND r.hi`` join as
BroadcastNestedLoopJoin (quadratic when neither side broadcasts). The
scale technique is binning: bucket left values by ``bin_size``, explode
each right interval into every bin it overlaps, hash-join on the bin,
then apply the exact predicate. Shuffle = rows + intervals×spans; the
candidate set per bin is bounded by bin width — pick ``bin_size`` near
the typical interval width so each interval spans O(1) bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """
    lbin = left.withColumn("__bin", F.floor(F.col(value_col) / F.lit(bin_size)))
    rbin = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_size)),
                F.floor(F.col(hi_col) / F.lit(bin_size)),
            )
        ),
    )
    return (
        lbin.join(rbin, "__bin", how)
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)))
        .drop("__bin")
    )
