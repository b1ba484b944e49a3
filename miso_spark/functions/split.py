"""Deterministic dataset splitting for training pipelines.

Assignment is a pure function of the CONTENT hash (md5 of normalized
text), not of row order, partitioning, or a seed — so the same document
lands in the same split on any cluster, any run, any engine, and
near-duplicate leakage across splits can be audited by joining the
dedup tables. ``randomSplit`` gives none of those guarantees (it
re-rolls per partitioning).

The first two hex digits of the hash partition [0x00, 0xff] into
lexicographic ranges: hex strings compare like their numeric values, so
the boundaries below are exact percentages and reproduce in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miso_spark.functions.text import normalize

#: default 80/10/10: 0x00-0xcb train (204/256), 0xcc-0xe5 val (26/256),
#: 0xe6-0xff test (26/256)
DEFAULT_BOUNDS = (("train", "cc"), ("val", "e6"))


def split_assignment(
    text: Column, bounds: tuple[tuple[str, str], ...] = DEFAULT_BOUNDS, last: str = "test"
) -> Column:
    key = F.substring(F.md5(normalize(text)), 1, 2)
    col = None
    for name, upper in bounds:
        cond = key < upper
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return col.otherwise(last)


def with_split(
    df: DataFrame,
    text_col: str = "text",
    bounds: tuple[tuple[str, str], ...] = DEFAULT_BOUNDS,
    last: str = "test",
) -> DataFrame:
    return df.withColumn("split", split_assignment(F.col(text_col), bounds, last))
