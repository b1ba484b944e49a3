"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in the session factory) handles
most skew at runtime; explicit salting is for the pathological case —
a handful of hot keys joined against a replicable-but-not-broadcastable
side, where even split shuffle partitions overload single tasks.

``salted_join`` spreads each hot key across ``num_salts`` shuffle
partitions by appending a deterministic salt on the probe side and
replicating the build side once per salt value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__miso_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the left side salted and the right side replicated.

    The salt derives from a hash of the whole left row (deterministic,
    no rand()), so repeated runs shuffle identically. Correct for
    ``inner`` and ``left`` joins; for right/outer joins replicating the
    right side would duplicate unmatched rows — use AQE skew handling
    there instead.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins (right rows are replicated)")
    lsalt = left.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)).cast("int"),
    )
    rsalt = (
        right.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    )
    cond = (lsalt[left_on] == rsalt[right_on]) & (lsalt[SALT_COL] == rsalt[SALT_COL])
    return lsalt.join(rsalt, cond, how).drop(SALT_COL)
