#!/usr/bin/env python3
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (results drained to the driver or
a noop sink) and timed individually; `value` is the sum. Each query
runs SPARK_GRAFT_BENCH_REPEAT times (default 3) and records the best —
single-run numbers at sub-second query times are dominated by
scheduler/stage-launch variance (the r01→SURVEY §8 13.25s-vs-11s drift
was exactly that). Compare against BASELINE.md per-query records.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family, weighted toward the
# shuffle/join/agg paths that dominate at scale
HEADLINE = [
    "pricing_summary",
    "where_string_ops",
    "project_extend",
    "summarize_bin_time",
    "summarize_countif_dcount",
    "join_inner",
    "join_left",
    "q5_local_supplier",
    "union_op",
    "top_n",
    "distinct_op",
    "mv_expand",
    "dedup_exact",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "ann_bruteforce",
    "near_dedup_pipeline",
    "text_quality",
    "text_lang_id",
]


def main() -> None:
    from miso_spark.catalog import CATALOG
    from miso_spark.session import get_spark

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("miso_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, codegen, noop sink, and parquet reader paths once so
    # per-query timings measure the queries, not first-use setup
    warm = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    warm.limit(1000).write.format("noop").mode("overwrite").save()

    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
    timings: dict[str, float] = {}
    singles: dict[str, float] = {}
    for name in HEADLINE:
        if name not in CATALOG:
            continue
        runs: list[float] = []
        for _ in range(repeat):
            df = CATALOG[name](spark, SF_DIR)
            t0 = time.perf_counter()
            # noop sink drains every row through the full pipeline
            # without collecting to the driver
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # report BOTH: best-of-N (plan cost, scheduler noise removed —
        # the BASELINE.md regression gate) and the first run (what a
        # cold query actually costs; keeps BENCH files cross-comparable
        # after r2 switched the headline from single-run to best-of-N)
        timings[name] = round(min(runs), 3)
        singles[name] = round(runs[0], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "value_single": round(sum(singles.values()), 3),
                "queries_single": singles,
                "repeat": repeat,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
