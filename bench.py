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
    "decontaminate",
    "token_budget_filter",
    "asof_join",
    "range_join",
    "corpus_bigram_logprob",
    "dynamic_filter",
    "dynamic_at_rest",
    "skew_join_aqe",
    "skew_join_salted",
    "multimodal_decode",
    "dedup_embedding_lsh",
]


def _b_token_budget_filter(spark, sf_dir):
    """Bench-only entry (r8): the two-pass distributed prefix sum +
    budget filter — the newest shuffle-bearing shape
    (range-repartition → per-partition window → offset attach). The
    fixed budget keeps ~60% of sf0.1's tokens; the prefix-sum cost it
    measures is budget-independent."""
    from pyspark.sql import functions as F

    from miso_spark.catalog import _documents
    from miso_spark.functions.packing import token_budget_filter
    from miso_spark.functions.text import token_count

    docs = _documents(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return token_budget_filter(docs, budget=600_000)


def _b_dynamic_filter(spark, sf_dir):
    """Bench-only entry (r8, r9-fast-pathed): the dynamic (VARIANT)
    comparison path — parse events.props per row, total-order filter
    on a dynamic key. Tracks the cost of per-row dynamic typing vs the
    typed get_json_object equivalent. r9: a scalar literal routes
    through dyn.vcompare_literal (what the engine compiles for
    `x > 2`), which folds every different-class branch to a constant —
    measured ~2× over the r8 sort-key struct comparison."""
    from pyspark.sql import functions as F

    from miso_spark import dynamic as dyn
    from miso_spark.sources import ParquetDirSource

    ev = ParquetDirSource(sf_dir).table(spark, "events")
    kv = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "variant")
    return ev.withColumn("kv", kv).filter(
        dyn.vcompare_literal("gt", F.col("kv"), 2)
    ).select("event_id")


def _b_dynamic_at_rest(spark, sf_dir):
    """Bench-only entry (r9): the same dynamic filter as
    `dynamic_filter`, but over VARIANT AT REST — events.props ingested
    once into a variant-columned parquet table (dynamic_parquet_dir
    model) and scanned columnar per query, instead of try_parse_json
    per row per query. The delta between this entry and
    `dynamic_filter` is the parse cost the at-rest story amortizes
    away; the remaining gap to the typed baseline is the price of
    per-row dynamic typing itself."""
    from pyspark.sql import functions as F

    from miso_spark import dynamic as dyn
    from miso_spark.sources import ParquetDirSource

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        f"dynrest_{os.path.basename(sf_dir.rstrip('/'))}.parquet",
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        ev = ParquetDirSource(sf_dir).table(spark, "events")
        (
            ev.select(
                "event_id",
                F.try_variant_get(
                    F.try_parse_json(F.col("props")), "$.k", "variant"
                ).alias("kv"),
            )
            .write.mode("overwrite").parquet(out)
        )
    df = spark.read.parquet(out)
    return df.filter(dyn.vcompare_literal("gt", F.col("kv"), 2)).select("event_id")


def _b_skew_join(salted: bool):
    """Hot-key join arm (r9): one key carries ~50% of the fact rows
    (every even user_id folds to key 0), joined to a per-key dim too
    wide to broadcast by hint. ``salted=False`` measures Spark's AQE
    skew-join split handling the straggler partition at runtime;
    ``salted=True`` measures functions/skew.py salted_join spreading
    the hot key across 16 salts up front. Both must scale ~linearly
    (sf1 exponent gate ≤ ~1.0); which wins is the documented tradeoff
    — AQE needs no plan change, salting caps the worst partition
    deterministically."""

    def run(spark, sf_dir):
        from pyspark.sql import functions as F

        from miso_spark.functions.skew import salted_join
        from miso_spark.sources import ParquetDirSource

        ev = ParquetDirSource(sf_dir).table(spark, "events")
        hot = F.when(F.col("user_id") % 2 == 0, F.lit(0)).otherwise(
            F.col("user_id")
        )
        left = ev.withColumn("k", hot)
        right = (
            ev.select(hot.alias("k"))
            .distinct()
            .withColumn("w", F.sha2(F.col("k").cast("string"), 256))
            # hint away the broadcast: the scenario is a replicable-but-
            # not-broadcastable side, the case salted_join exists for
            .hint("shuffle_hash")
        )
        if salted:
            joined = salted_join(left, right, "k", "k", num_salts=16)
            return joined.select("event_id", "w")
        return left.join(right, left["k"] == right["k"]).select("event_id", "w")

    return run


#: bench entries that are not driver-catalog queries (no SQL oracle
#: needed here — correctness lives in pytest; this measures the plan)
def _b_multimodal_decode(spark, sf_dir):
    """The repo's one Pandas-UDF hot path (r12): real ppm/bmp/png
    decode + nearest-neighbor resize over Arrow batches. Synthesized
    images are cached as parquet (bench_cache) so the timed region is
    scan → Arrow → numpy decode (incl. zlib inflate + unfilter for
    png) / resample → PPM re-encode → noop, i.e. pure Python-stage
    throughput — a regression here means the Arrow batch path or the
    decoders got slower, nothing else in the repo uses row-at-a-time
    Python."""
    from miso_spark.functions.multimodal import (
        resize_pixels,
        synthesize_images,
    )

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
        # v2: the synthesized mix gained png payloads (r12)
        "multimodal_images_v2.parquet",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        synthesize_images(spark, n=2000).repartition(8).write.mode(
            "overwrite"
        ).parquet(out)
    media = spark.read.parquet(out)
    return resize_pixels(media, max_side=16)


def _b_dedup_embedding_lsh(spark, sf_dir):
    """Bench-only entry (r12): the embedding near-dup SCALE path —
    random-hyperplane LSH blocking (plane count derived from the row
    count, the 100 TB sizing rule) + within-bucket cosine. The label-
    blocked variant is the driver-oracled `dedup_embedding`; this one
    measures the plan that replaces it when no blocking key exists,
    and its sf1 exponent verifies the bucket structure keeps pair
    volume near-linear as N grows (planes_for_rows adds planes with
    log N, splitting buckets as the corpus grows)."""
    from miso_spark.functions.dedup import embedding_dedup_pairs
    from miso_spark.sources import ParquetDirSource

    emb = ParquetDirSource(sf_dir).table(spark, "embeddings")
    return embedding_dedup_pairs(
        emb, block_col="lsh", threshold=0.97, dim=64
    )


EXTRA_BENCH = {
    "token_budget_filter": _b_token_budget_filter,
    "dynamic_filter": _b_dynamic_filter,
    "dynamic_at_rest": _b_dynamic_at_rest,
    "skew_join_aqe": _b_skew_join(salted=False),
    "skew_join_salted": _b_skew_join(salted=True),
    "multimodal_decode": _b_multimodal_decode,
    "dedup_embedding_lsh": _b_dedup_embedding_lsh,
}


#: entries timed from plan BUILD through execution (r15, VERDICT r14
#: #7): token_budget_filter's two-pass prefix sum used to run its
#: totals collect() at plan-build time — outside the timer — so the
#: recorded 0.02 s measured only the offset-attach pass. The operator
#: is now fully lazy (functions/packing.py: offsets broadcast-join
#: inside the plan, no driver collect), but AQE still materializes the
#: range-shuffle MAP stage when the partition-pinning localCheckpoint
#: plans its RDD at build time, so build+execute is the honest window
#: for this entry. Old-methodology record: 0.022 s best-of-3
#: (BENCH_r14.json) — re-baselined in BASELINE.md.
BUILD_TIMED = {"token_budget_filter"}


#: multi-file rewrite targets (files per table): the driver's testdata
#: tables are single parquet files with one row group, so every scan is
#: ONE task regardless of cluster width — flooring each query at
#: stage-launch cost and hiding plan differences (VERDICT r6 #3). A
#: real 100 TB dataset arrives as many splittable files; the bench
#: rewrites each table once (cached) into that shape so the gate
#: measures plans, not the testdata artifact.
MULTIFILE_PARTS = {
    "lineitem": 16, "orders": 8, "events": 8, "documents": 6,
    "embeddings": 6, "customer": 4, "part": 2, "supplier": 1,
    "nation": 1, "region": 1,
}


def ann_recall_queries(spark, sf_dir: str, n: int = 4):
    """Deterministic query rows for the ANN recall gauge: the first
    ``n`` vectors (by vec_id) of a sparse id slice — fixed across runs
    so the recorded recall is comparable round over round."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = (
        emb.filter(F.col("vec_id") % 997 == 1)
        .orderBy("vec_id")
        .limit(n)
        .collect()
    )
    return emb, rows


def _ann_recall_sf1(spark, sf_dir: str) -> dict[str, float]:
    """recall@10 vs exact brute force at the sf1 corpus size, for the
    lsh arm at its derived plane count (the r14 recall-safe auto
    default, the explicit single-probe minimum-scan mode, and the
    16-bucket budget) and the ivf arm at its defaults."""
    from miso_spark.functions.similarity import (
        bruteforce_topk,
        ivf_topk,
        lsh_topk,
    )

    emb, rows = ann_recall_queries(spark, sf_dir)
    emb = emb.persist()
    try:
        sums = {
            "lsh_default": 0.0, "lsh_single": 0.0,
            "lsh_probes16": 0.0, "ivf_default": 0.0,
        }
        for qr in rows:
            qv = [float(x) for x in qr["embedding"]]
            truth = {r["id"] for r in bruteforce_topk(emb, qv, 10).collect()}
            arms = {
                # probes defaults to the 1 + P + C(P,2) budget (r14)
                "lsh_default": lsh_topk(emb, qv, 10, num_planes=None),
                "lsh_single": lsh_topk(emb, qv, 10, num_planes=None, probes=1),
                "lsh_probes16": lsh_topk(emb, qv, 10, num_planes=None, probes=16),
                "ivf_default": ivf_topk(emb, qv, 10),
            }
            for name, df in arms.items():
                got = {r["id"] for r in df.collect()}
                sums[name] += len(got & truth) / 10.0
        return {k: round(v / max(1, len(rows)), 3) for k, v in sums.items()}
    finally:
        emb.unpersist()


def _cache_is_current(marker: str, stamp: str) -> bool:
    """A cache built under a different layout must rebuild, or the
    bench silently measures a stale artifact (e.g. a pre-r7 .sf1_cache
    built single-file would inflate every scaling exponent while the
    sf0.1 arm runs multi-file)."""
    try:
        with open(marker) as f:
            return f.read() == stamp
    except OSError:
        return False


def ensure_multifile_dir(spark, base_dir: str) -> str:
    """Materialize (once, cached in-repo) a multi-file copy of
    ``base_dir``'s tables, partition counts per MULTIFILE_PARTS.
    Disable with SPARK_GRAFT_MULTIFILE=0 to bench the raw layout."""
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_cache", os.path.basename(base_dir.rstrip("/")),
    )
    marker = os.path.join(out, "_DONE")
    stamp = f"v1 parts={sorted(MULTIFILE_PARTS.items())}"
    if _cache_is_current(marker, stamp):
        return out
    os.makedirs(out, exist_ok=True)
    from miso_spark.sources import ParquetDirSource

    src = ParquetDirSource(base_dir)  # nano-timestamp-safe read path
    for table, parts in MULTIFILE_PARTS.items():
        if not os.path.exists(os.path.join(base_dir, f"{table}.parquet")):
            continue
        (
            src.table(spark, table)
            .repartition(parts)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{table}.parquet"))
        )
    with open(marker, "w") as f:
        f.write(stamp)
    return out


# sf1 scaling arm: the five most scale-sensitive headliners run once
# more against a 10×-scaled dataset derived from sf0.1, and the JSON
# carries per-query scaling exponents (log10 of the time ratio across
# one decade of data — 1.0 = linear). Gated off with SPARK_GRAFT_SF1=0.
SF1_HEADLINE = [
    "pricing_summary",
    "q5_local_supplier",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "sessionize_native",
    "near_dedup_pipeline",
    "decontaminate",
    "token_budget_filter",
    "skew_join_aqe",
    "skew_join_salted",
    # r12 widening: the remaining scale-sensitive operator families —
    # the one-shuffle exact dedup, the zero-shuffle text path, the
    # tagged-union single-shuffle as-of join, the bin-bucketed range
    # join, brute-force ANN over 10× embeddings, the vocab-bounded
    # bigram agg, and the per-row dynamic-typing filter
    "dedup_exact",
    "text_quality",
    "asof_join",
    "range_join",
    "ann_bruteforce",
    "corpus_bigram_logprob",
    "dynamic_filter",
    "dedup_embedding_lsh",
]
SF1_COPIES = 10


def ensure_sf1_dir(spark, base_dir: str) -> str:
    """Materialize (once, cached in-repo) a 10× dataset from ``base_dir``.

    Fact tables replicate with shifted keys so per-copy join/group
    structure is preserved (join fan-in scales, clusters don't merge
    across copies); document text gets a per-copy suffix on EVERY word
    so copies share no shingles — the near-dup pair structure scales
    linearly like a real 10× crawl, instead of every doc gaining 9
    exact twins (which would measure a pathological flood, not scale).
    Dimension tables pass through unchanged.
    """
    from pyspark.sql import functions as F

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".sf1_cache")
    marker = os.path.join(out, "_DONE")
    stamp = (f"v4-embeddings-signflip copies={SF1_COPIES} "
             f"parts={sorted(MULTIFILE_PARTS.items())}")
    if _cache_is_current(marker, stamp):
        return out
    os.makedirs(out, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(i) for i in range(SF1_COPIES)])).alias("__i")

    def scale(table: str, build) -> None:
        df = spark.read.parquet(os.path.join(base_dir, f"{table}.parquet"))
        # 10× data in multi-file form (4× the sf0.1 file count, capped
        # at the local core count): scans must parallelize here or the
        # scaling exponents measure the single-file artifact, not plans
        parts = min(32, MULTIFILE_PARTS.get(table, 1) * 4)
        build(df).repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )

    def passthrough(table: str) -> None:
        scale(table, lambda df: df)

    KEY_SHIFT = 10_000_000  # > any sf0.1 key
    scale("lineitem", lambda df: df.select("*", copies)
          .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__i") * KEY_SHIFT)
          .drop("__i"))
    scale("orders", lambda df: df.select("*", copies)
          .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__i") * KEY_SHIFT)
          .drop("__i"))
    for t in ("customer", "supplier", "nation", "region"):
        passthrough(t)
    scale("documents", lambda df: df.select("*", copies)
          .withColumn("doc_id", F.col("doc_id") + F.col("__i") * KEY_SHIFT)
          # suffix EVERY word with the copy id: a bijection per copy, so
          # within-copy Jaccard is untouched while copies share nothing
          .withColumn("text", F.regexp_replace(
              F.col("text"), F.lit(r"(\S+)"),
              F.concat(F.lit(r"$1x"), F.col("__i").cast("string"))))
          .drop("__i"))
    scale("events", lambda df: df.select("*", copies)
          .withColumn("user_id", F.col("user_id") + F.col("__i") * KEY_SHIFT)
          .drop("__i"))
    # embeddings: shifted ids; each copy's vectors get a deterministic
    # per-copy SIGN-FLIP pattern (flip coordinate ix when
    # xxhash64(copy, ix) is odd). Flipping the same coordinates of
    # every vector in a copy preserves all WITHIN-copy norms and
    # pairwise cosines exactly — the per-copy near-dup/ANN structure
    # is the sf0.1 one — while cross-copy cosines decorrelate to ~0,
    # so a 10× corpus has 10× the structure instead of every vector
    # gaining 9 near-twins (a pathological flood, not scale)
    scale("embeddings", lambda df: df.select("*", copies)
          .withColumn("vec_id", F.col("vec_id") + F.col("__i") * KEY_SHIFT)
          .withColumn("embedding", F.transform(
              F.col("embedding"),
              lambda v, ix: F.when(
                  F.xxhash64(F.col("__i"), ix) % 2 == 0, v
              ).otherwise(-v)))
          .drop("__i"))
    passthrough("part")
    with open(marker, "w") as f:
        f.write(stamp)
    return out


#: entries whose dominant shuffle's row WIDTH we track (VERDICT r9 #6:
#: dedup_minhash_verified's banding shuffle is the widest-exponent
#: entry — a row-width regression (e.g. banding starting to carry text
#: instead of hashed longs) should surface as bytes/row here before it
#: costs wall time at sf1)
SHUFFLE_PROFILE = {
    "dedup_minhash_verified",
    "near_dedup_pipeline",
    # r11: the other width-sensitive exchanges (r10 verdict #7) — the
    # tagged-union single shuffle (asof), the bin-bucketed hash join
    # (range), and the two-pass prefix sum (token budget)
    "asof_join",
    "range_join",
    "token_budget_filter",
}


def _shuffle_totals(spark) -> tuple[int, int, int, int]:
    """Cumulative (shuffle write bytes, records, memory-spill bytes,
    disk-spill bytes) across all completed stages, from the JVM
    AppStatusStore (works with spark.ui.enabled false — it backs the
    REST API). Deltas around a query's runs give the query's shuffle
    volume; bytes/records is the mean shuffled row width,
    repeat-count invariant. Spill deltas are the early warning the
    r11 verdict asked for: a nonzero spill at sf1 means per-task
    working sets outgrew execution memory — fix partitioning before
    it costs wall time at the next scale decade."""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *defaults)
    tot_b = tot_r = tot_ms = tot_ds = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        tot_b += s.shuffleWriteBytes()
        tot_r += s.shuffleWriteRecords()
        tot_ms += s.memoryBytesSpilled()
        tot_ds += s.diskBytesSpilled()
    return tot_b, tot_r, tot_ms, tot_ds


def main() -> None:
    from miso_spark.catalog import CATALOG
    from miso_spark.session import get_spark

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("miso_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # bench against the multi-file rewrite of the testdata (built once,
    # outside the timed region) — see MULTIFILE_PARTS
    bench_dir = SF_DIR
    if os.environ.get("SPARK_GRAFT_MULTIFILE", "1") != "0":
        bench_dir = ensure_multifile_dir(spark, SF_DIR)

    # warm the JVM, codegen, noop sink, and parquet reader paths once so
    # per-query timings measure the queries, not first-use setup
    warm = spark.read.parquet(os.path.join(bench_dir, "lineitem.parquet"))
    warm.limit(1000).write.format("noop").mode("overwrite").save()

    # load sentinel (r10 verdict #6): a fixed, shuffle-free, CPU-bound
    # 32-task stage with a KNOWN cost. Its time moves with background
    # container load and NOT with any plan in this repo, so a BENCH
    # artifact self-reports whether it was taken on a clean machine:
    # uniform inflation of the sentinel ≈ uniform inflation of every
    # entry (environment), a clean sentinel with one drifted entry is
    # a real plan regression. BASELINE.md records update only when the
    # sentinel is within tolerance of its record.
    def _calibrate() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            # ~0.5 s of pure whole-stage-codegen arithmetic: long
            # enough that stage-launch variance (~±50 ms) is noise,
            # short enough to cost nothing against the bench
            spark.range(0, 256_000_000, 1, 32).selectExpr(
                "sum(id * 3 + 7) as s"
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = -1.0
    _calibrate()  # discarded: C2-compile the calibration codegen so
    # the start reading measures the same warm path as the end one
    calib_sec = _calibrate()

    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
    timings: dict[str, float] = {}
    singles: dict[str, float] = {}
    def build(name, sf_dir):
        if name in CATALOG:
            return CATALOG[name](spark, sf_dir)
        return EXTRA_BENCH[name](spark, sf_dir)

    shuffle_profile: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        if name not in CATALOG and name not in EXTRA_BENCH:
            continue
        profiled = name in SHUFFLE_PROFILE
        if profiled:
            b0, r0, ms0, ds0 = _shuffle_totals(spark)
        runs: list[float] = []
        for _ in range(repeat):
            # noop sink drains every row through the full pipeline
            # without collecting to the driver; BUILD_TIMED entries
            # start the clock before plan build (see the set's comment)
            t0 = time.perf_counter()
            df = build(name, bench_dir)
            if name not in BUILD_TIMED:
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        if profiled:
            b1, r1, ms1, ds1 = _shuffle_totals(spark)
            db, dr = b1 - b0, r1 - r0
            shuffle_profile[name] = {
                "shuffle_bytes": db // repeat,
                "shuffle_records": dr // repeat,
                "bytes_per_row": round(db / dr, 2) if dr else 0.0,
                "mem_spill": (ms1 - ms0) // repeat,
                "disk_spill": (ds1 - ds0) // repeat,
            }
        # report BOTH: best-of-N (plan cost, scheduler noise removed —
        # the BASELINE.md regression gate) and the first run (what a
        # cold query actually costs; keeps BENCH files cross-comparable
        # after r2 switched the headline from single-run to best-of-N)
        timings[name] = round(min(runs), 3)
        singles[name] = round(runs[0], 3)

    try:
        load_end = round(os.getloadavg()[0], 2)
    except OSError:
        load_end = -1.0
    # second calibration AFTER the headline set: host-level contention
    # can arrive mid-run (observed in r11 — every entry uniformly
    # +40% while the start sentinel read clean), so a single
    # point-in-time reading under-reports; a run is clean only when
    # BOTH readings are within tolerance
    calib_sec_end = _calibrate()
    total = round(sum(timings.values()), 3)
    # key order is deliberate: the driver records only the TAIL of
    # stdout, and the r10/r11 artifacts lost the best-of-N gate block
    # to truncation — so the gate-critical keys (metric/value/queries)
    # serialize LAST and survive any prefix cut (VERDICT r11 #2)
    result = {
        "unit": "sec",
        "repeat": repeat,
        "sf": sf,
        "shuffle_profile": shuffle_profile,
        "sentinel": {
            "calib_sec": calib_sec,
            "calib_sec_end": calib_sec_end,
            "loadavg_start": load_start,
            "loadavg_end": load_end,
        },
        "value_single": round(sum(singles.values()), 3),
        "queries_single": singles,
    }

    # sf1 scaling arm (one decade up from sf0.1; best-of-2 per query —
    # a single run can read freshly written cache files cold and
    # overstate the exponent by 2x on the heavy dedup entries)
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and abs(sf - 0.1) < 1e-9:
        import math

        sf1_dir = ensure_sf1_dir(spark, bench_dir)
        sf1_timings: dict[str, float] = {}
        exponents: dict[str, float] = {}
        sf1_profile: dict[str, dict[str, float]] = {}
        sf1_calibs: dict[str, float] = {}

        def timed(name: str, sf_dir: str, reps: int = 2) -> float:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                df = build(name, sf_dir)
                if name not in BUILD_TIMED:
                    t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        base_timings: dict[str, float] = {}
        for name in SF1_HEADLINE:
            if name not in CATALOG and name not in EXTRA_BENCH:
                continue
            base_t = timings.get(name)
            if base_t is None:  # not in the sf0.1 headline set
                base_t = timed(name, bench_dir)
            base_timings[name] = base_t
            b0, r0, ms0, ds0 = _shuffle_totals(spark)
            sf1_timings[name] = timed(name, sf1_dir)
            b1, r1, ms1, ds1 = _shuffle_totals(spark)
            db, dr = (b1 - b0) // 2, (r1 - r0) // 2
            # width + spill AT SCALE (VERDICT r11 #6): the sf0.1-only
            # gauge can't see a working set outgrowing task memory
            sf1_profile[name] = {
                "shuffle_bytes": db,
                "shuffle_records": dr,
                "bytes_per_row": round(db / dr, 2) if dr else 0.0,
                "mem_spill": (ms1 - ms0) // 2,
                "disk_spill": (ds1 - ds0) // 2,
            }
            # per-entry sentinel (VERDICT r11 #1): one post-arm reading
            # demonstrably missed mid-arm contention — a drifted entry
            # with a clean neighboring calib is a real regression, an
            # entry whose own calib drifted was environment
            sf1_calibs[name] = _calibrate()
            # time ratio across one decade of data: 1.0 = linear
            exponents[name] = round(
                math.log10(max(sf1_timings[name], 1e-3) / max(base_t, 1e-3)), 3
            )
        result["sf1"] = {
            "copies": SF1_COPIES,
            "base_queries": base_timings,
            "queries": sf1_timings,
            "shuffle_profile": sf1_profile,
            "calib_per_entry": sf1_calibs,
            "calib_sec_sf1": _calibrate(),
            "scaling_exponent": exponents,
            # ANN recall@10 at sf1 (VERDICT r12 #3): planes_for_rows(N)
            # changes bucket geometry with N, so recall is re-measured
            # at THIS corpus size against exact brute force. The
            # sign-flip corpus's true top-10 sit at cosine ~0.4-0.5
            # (θ≈63°, per-plane collision ~0.65) — hyperplane LSH needs
            # a large probe budget here by construction, while IVF
            # rides the corpus's actual cluster structure; BASELINE.md
            # documents the envelope and the floors.
            "ann_recall": _ann_recall_sf1(spark, sf1_dir),
        }

    # gate-critical keys LAST (see the result-dict comment above)
    result["metric"] = "headline_queries_total_sec"
    result["value"] = total
    result["queries"] = timings

    print(json.dumps(result))

    # FINAL compact line (VERDICT r12 #5): the driver records only the
    # last 2000 chars of stdout, and the verbose line above never fits
    # — r12's artifact kept the gate block but lost sf1 raw seconds,
    # sentinels, and singles to the prefix cut, and its last-line parse
    # failed. This second line carries the gate-critical subset,
    # rounded, and a size guard drops the least-critical blocks first
    # so the LAST stdout line always parses as one complete document.
    def _r(d: dict, nd: int = 2) -> dict:
        return {k: round(v, nd) for k, v in d.items()}

    compact = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "calib": [
            round(calib_sec, 3),
            round(calib_sec_end, 3),
            round(result.get("sf1", {}).get("calib_sec_sf1", -1.0), 3),
        ],
        "queries": _r(timings),
    }
    if "sf1" in result:
        compact["ann_recall"] = result["sf1"]["ann_recall"]
        compact["sf1_sec"] = _r(result["sf1"]["queries"])
        compact["sf1_exp"] = _r(result["sf1"]["scaling_exponent"])
        compact["sf1_spill"] = sum(
            p["mem_spill"] + p["disk_spill"]
            for p in result["sf1"]["shuffle_profile"].values()
        )
    for drop in ("sf1_sec", "queries"):
        if len(json.dumps(compact)) <= 1900:
            break
        compact.pop(drop, None)
        compact["dropped"] = compact.get("dropped", []) + [drop]
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
