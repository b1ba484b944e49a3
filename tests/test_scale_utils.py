"""Scale utilities: salted joins match plain joins; bucketed joins plan
without exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from miso_spark.sources import ParquetDirSource
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tables(spark):
    src = ParquetDirSource(SF_DIR)
    return {n: src.table(spark, n) for n in ("customer", "orders", "nation")}


def test_salted_join_matches_plain_inner(tables):
    from miso_spark.functions.skew import salted_join

    orders, customer = tables["orders"], tables["customer"]
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    salted = salted_join(orders, customer, "o_custkey", "c_custkey", num_salts=8).select(
        "o_orderkey", "c_custkey"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_left(tables):
    from miso_spark.functions.skew import salted_join

    customer, nation = tables["customer"], tables["nation"]
    plain = customer.join(nation, customer.c_nationkey == nation.n_nationkey, "left").select(
        "c_custkey", "n_name"
    )
    salted = salted_join(customer, nation, "c_nationkey", "n_nationkey", 4, how="left").select(
        "c_custkey", "n_name"
    )
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_salted_join_rejects_outer(tables):
    from miso_spark.functions.skew import salted_join

    with pytest.raises(ValueError):
        salted_join(tables["orders"], tables["customer"], "o_custkey", "c_custkey", how="outer")


def test_bucketed_join_has_no_exchange(spark, tables, tmp_path_factory):
    from miso_spark.sources.bucketing import bucketed_table, save_bucketed

    save_bucketed(tables["orders"], "b_orders", "o_custkey", num_buckets=8)
    save_bucketed(
        tables["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        num_buckets=8,
    )
    # at this scale Spark rightly prefers broadcast; force the shuffle
    # path to show the bucketed layout replaces the exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_table(spark, "b_orders").join(
            bucketed_table(spark, "b_customer"), "o_custkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # correctness too, not just plan shape
        n_plain = tables["orders"].join(
            tables["customer"], tables["orders"].o_custkey == tables["customer"].c_custkey
        ).count()
        assert j.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_approx_row_count_uses_footers_not_scan(spark):
    """File-backed frames size from parquet footer metadata (VERDICT r2
    #4): exact for a plain scan, env hint wins, and non-file frames
    fall back to count()."""
    import os

    from miso_spark.functions.stats import approx_row_count
    from tests.conftest import SF_DIR

    df = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    assert approx_row_count(df) == df.count()

    os.environ["MISO_SPARK_ROWCOUNT_HINT"] = "123456"
    try:
        assert approx_row_count(df) == 123456
    finally:
        del os.environ["MISO_SPARK_ROWCOUNT_HINT"]

    mem = spark.range(777)
    assert approx_row_count(mem) == 777


def test_ann_recall_floor_at_sf1(spark):
    """ANN recall gate at the sf1 corpus size (VERDICT r12 #3):
    ``planes_for_rows(N)`` changes the LSH bucket geometry with N, so
    recall@10 vs exact brute force is asserted at 10× the bench scale,
    not just the unit-test corpus. Floors sit WELL below the measured
    means (ivf 0.675, lsh probes=16 0.40, lsh default 0.125 on the v4
    sign-flip corpus — whose true top-10 live at cosine ~0.4-0.5, a
    weak-similarity regime where hyperplane LSH needs a large probe
    budget by construction; BASELINE.md documents the envelope).
    Deterministic end to end: fixed query ids, seeded IVF k-means,
    derived plane ids."""
    import os

    import bench

    sf1 = os.path.join(os.path.dirname(bench.__file__), ".sf1_cache")
    if not os.path.exists(os.path.join(sf1, "_DONE")):
        pytest.skip("sf1 cache not materialized (run bench.py once)")
    rec = bench._ann_recall_sf1(spark, sf1)
    assert rec["ivf_default"] >= 0.45, rec
    assert rec["lsh_probes16"] >= 0.20, rec
    # r14: probes defaults to the recall-safe 1 + P + C(P,2) budget —
    # the DEFAULT now holds multi-probe recall (measured 0.4-0.6 band)
    assert rec["lsh_default"] >= 0.20, rec
    # the explicit single-probe mode trades recall for a 1/2^planes
    # scan — must still beat random chance (10/20000) by orders of
    # magnitude
    assert rec["lsh_single"] >= 0.05, rec
