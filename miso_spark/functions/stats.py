"""Cheap cardinality estimates for operator auto-sizing.

Several operators derive a tuning knob from the input row count (LSH
plane count ≈ log2(N / target bucket)). A ``df.count()`` is a full
scan — unacceptable as a default probe at 100 TB — so size from
metadata when the frame is file-backed and only fall back to counting.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def approx_row_count(df: DataFrame) -> int:
    """Row-count estimate for sizing decisions, cheapest source first:

    1. ``MISO_SPARK_ROWCOUNT_HINT`` env var — cluster jobs that know
       their table statistics pass N explicitly (also the documented
       contract: operators take the knob itself as an argument; this
       probe only serves defaulted calls).
    2. Parquet footer metadata summed over ``df.inputFiles()`` —
       driver-side footer reads, no data IO. Upstream filters make
       this an over-estimate, which for log-scaled knobs only rounds
       up (the safe direction).
    3. ``df.count()`` — exact, full scan; last resort.
    """
    hint = os.environ.get("MISO_SPARK_ROWCOUNT_HINT")
    if hint:
        return int(hint)
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and all(".parquet" in f for f in files):
        try:
            import pyarrow.parquet as pq

            total = 0
            for f in files:
                p = urlparse(f).path if ":" in f else f
                total += pq.ParquetFile(p).metadata.num_rows
            if total > 0:
                return total
        except Exception:
            pass
    return df.count()
