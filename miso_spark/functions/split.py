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


def sample_flag(rate: float, key_col: str = "doc_id", seed: str = "") -> Column:
    """Boolean keep-decision of :func:`hash_sample` as a column —
    md5(seed || key) below ``rate`` of the 32-bit hash space."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    # first 8 hex chars → 32-bit uniform; threshold on the integer
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return bucket < F.lit(int(rate * 0x100000000))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose
    md5(seed || key) falls below ``rate`` of the hash space.

    Unlike ``df.sample()`` this is stable across runs, engines, Spark
    versions, partitionings and retries — the property a training
    pipeline needs so a re-run reproduces the same corpus subset. The
    decision is per-KEY, so rows sharing a key are kept or dropped
    together (downstream of dedup that means per-document). Zero
    shuffle: one hash + compare per row, fully pushdown-friendly.

    ``seed`` namespaces the hash so independent samples of the same
    table don't correlate (sample(0.1, seed="a") and seed="b" overlap
    on ~1% of keys, not 10%).
    """
    return df.filter(sample_flag(rate, key_col, seed))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    seed: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value
    → keep rate (e.g. {"en": 0.1, "de": 0.5}) — how a multilingual
    corpus is rebalanced without a shuffle. Strata absent from
    ``rates`` keep ``default_rate``."""
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    thresh = F.lit(int(default_rate * 0x100000000))
    for value, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0, 1], got {rate} for {value!r}")
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * 0x100000000))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    order_col: str | None = None,
    ascending: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_rows`` rows per group — the crawl-curation
    staple "at most N documents per domain" (or per source, per
    author, ...), keeping the best-ranked ones when ``order_col`` is
    given (descending by default: highest score survives) and breaking
    ties on ``id_col`` so the selection is deterministic across runs,
    partitionings and cluster sizes.

    Scale shape: one hash shuffle on ``group_col`` + a per-group
    row_number window — groups run in parallel, and Spark's window
    TopK pushdown (rank-limit) keeps per-group state at ``max_rows``
    rows. A skewed mega-group is bounded by its own size only; for
    adversarial skew, pre-filter with an approximate per-group count.
    """
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    from pyspark.sql import Window

    orders = []
    if order_col is not None:
        orders.append(
            F.col(order_col).asc() if ascending else F.col(order_col).desc()
        )
    orders.append(F.col(id_col))
    w = Window.partitionBy(group_col).orderBy(*orders)
    # collision-safe scratch name: a caller's own __rn column must
    # survive untouched
    rn = "__rn"
    while rn in df.columns:
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= max_rows)
        .drop(rn)
    )
