"""asof_join / range_join ↔ DuckDB differential fuzzer (VERDICT r12
#6): the driver oracle pins ONE fixed shape per op; this suite
generates key/time distributions — dense ties, empty sides, a single
hot key — and checks all three asof directions × tolerance ×
salted/unsalted against DuckDB's native ASOF JOIN (backward/forward)
and a correlated-subquery oracle (nearest, which DuckDB's ASOF can't
express), and all four range_join modes against BETWEEN joins.

Determinism discipline: right-side values are a FUNCTION of
(key, ts), so duplicate right rows are identical and either engine's
arbitrary pick among ties is invisible; left rows carry a unique id.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from miso_spark.functions.asof import asof_join
from miso_spark.functions.rangejoin import range_join

# -- strategies -------------------------------------------------------------

#: small ts universe → dense ties; a hot-key draw puts ~80% of rows on
#: one key
_keys = st.sampled_from(["a", "b", "c"])
_ts = st.integers(0, 30)


@st.composite
def _asof_case(draw):
    hot = draw(st.booleans())
    key = st.sampled_from(["a"] * 8 + ["b", "c"]) if hot else _keys
    left = draw(st.lists(st.tuples(key, _ts), min_size=0, max_size=25))
    right = draw(st.lists(st.tuples(key, _ts), min_size=0, max_size=20))
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tolerance = draw(st.sampled_from([None, 0, 3, 10]))
    salt = draw(st.sampled_from([None, 4.0, 7.0]))
    return left, right, direction, tolerance, salt


def _mk_asof_frames(spark, con, left, right):
    lrows = [(i, k, t) for i, (k, t) in enumerate(left)]
    # value deterministic in (key, ts): duplicates are identical rows
    rrows = [(k, t, hash((k, t)) % 97) for k, t in right]
    ldf = spark.createDataFrame(
        lrows or [(None, None, None)], "id int, k string, ts_s int"
    )
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "k string, ts_s int, v int"
    )
    if not lrows:
        ldf = ldf.filter(F.lit(False))
    if not rrows:
        rdf = rdf.filter(F.lit(False))
    ldf = ldf.withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
    rdf = rdf.withColumn("ts", F.timestamp_seconds("ts_s")).drop("ts_s")
    con.execute("DROP TABLE IF EXISTS l"); con.execute("DROP TABLE IF EXISTS r")
    con.execute("CREATE TABLE l (id INT, k VARCHAR, ts TIMESTAMP)")
    con.execute("CREATE TABLE r (k VARCHAR, ts TIMESTAMP, v INT)")
    if lrows:
        con.executemany(
            "INSERT INTO l VALUES (?, ?, to_timestamp(?)::TIMESTAMP)",
            [(i, k, t) for i, k, t in lrows],
        )
    if rrows:
        con.executemany(
            "INSERT INTO r VALUES (?, to_timestamp(?)::TIMESTAMP, ?)",
            [(k, t, v) for k, t, v in rrows],
        )
    return ldf, rdf


def _asof_oracle_sql(direction: str, tolerance) -> str:
    if direction in ("backward", "forward"):
        cmp_ = "l.ts >= r.ts" if direction == "backward" else "l.ts <= r.ts"
        base = f"""
        SELECT l.id,
               CAST(epoch(r.ts) AS BIGINT) AS mts,
               r.v AS mv
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND {cmp_}
        """
    else:
        # nearest (exact-distance ties → backward, i.e. the EARLIER
        # right ts — "ORDER BY abs-gap, r.ts" encodes that)
        base = """
        SELECT l.id,
               (SELECT CAST(epoch(r.ts) AS BIGINT) FROM r
                 WHERE r.k = l.k
                 ORDER BY abs(epoch(r.ts) - epoch(l.ts)), r.ts LIMIT 1) AS mts,
               (SELECT r.v FROM r
                 WHERE r.k = l.k
                 ORDER BY abs(epoch(r.ts) - epoch(l.ts)), r.ts LIMIT 1) AS mv
        FROM l
        """
    if tolerance is None:
        return base
    # tolerance nulls the attached columns past the gap; the matched
    # row itself is the same nearest-in-direction pick
    return f"""
    SELECT id,
           CASE WHEN abs(mts - lts) <= {tolerance} THEN mts END AS mts,
           CASE WHEN abs(mts - lts) <= {tolerance} THEN mv END AS mv
    FROM (SELECT q.*, CAST(epoch(l2.ts) AS BIGINT) AS lts
          FROM ({base}) q JOIN l l2 USING (id))
    """


@pytest.fixture(scope="module")
def ddb():
    return duckdb.connect()


@settings(
    max_examples=35,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(case=_asof_case())
@example(case=([], [("a", 5)], "backward", None, None))  # empty left
@example(case=([("a", 5)], [], "forward", None, None))  # empty right
@example(case=(  # dense ties: every row same ts
    [("a", 5), ("a", 5), ("b", 5)], [("a", 5), ("a", 5), ("b", 5)],
    "nearest", None, None,
))
@example(case=(  # single hot key, salted, with tolerance
    [("a", t) for t in range(0, 20)], [("a", t) for t in range(0, 20, 3)],
    "backward", 2, 4.0,
))
@example(case=(  # exact-distance nearest tie → backward pick
    [("a", 5)], [("a", 3), ("a", 7)], "nearest", None, None,
))
def test_asof_join_matches_duckdb(spark, ddb, case):
    left, right, direction, tolerance, salt = case
    ldf, rdf = _mk_asof_frames(spark, ddb, left, right)
    out = asof_join(
        ldf, rdf, key="k", ts="ts", value_cols=["v"],
        direction=direction,
        tolerance_s=tolerance,
        salt_bucket_s=salt,
    )
    got = sorted(
        (
            r["id"],
            None if r["uts"] is None else int(r["uts"]),
            r["v_right"],
        )
        for r in out.select(
            "id", F.unix_timestamp("ts_right").alias("uts"), "v_right"
        ).collect()
    )
    want = sorted(
        (i, None if m is None else int(m), v)
        for i, m, v in ddb.execute(
            _asof_oracle_sql(direction, tolerance)
        ).fetchall()
    )
    assert got == want, (direction, tolerance, salt, left, right)


# -- range join --------------------------------------------------------------


@st.composite
def _range_case(draw):
    n_l = draw(st.integers(0, 20))
    vals = draw(st.lists(st.integers(0, 40), min_size=n_l, max_size=n_l))
    n_r = draw(st.integers(0, 12))
    # intervals may be empty (lo > hi), duplicated, or point-sized
    ivals = draw(
        st.lists(
            st.tuples(st.integers(0, 40), st.integers(-5, 15)),
            min_size=n_r, max_size=n_r,
        )
    )
    how = draw(st.sampled_from(["inner", "left", "right", "outer"]))
    bin_size = draw(st.sampled_from([1.0, 3.0, 100.0]))
    return vals, ivals, how, bin_size


@settings(
    max_examples=35,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(case=_range_case())
@example(case=([5], [], "left", 1.0))  # empty interval side
@example(case=([], [(3, 4)], "right", 1.0))  # empty value side
@example(case=([7, 7, 7], [(7, 0), (7, 0)], "outer", 3.0))  # point ties
@example(case=([5], [(9, -2)], "outer", 100.0))  # lo > hi: empty interval
def test_range_join_matches_duckdb(spark, ddb, case):
    vals, ivals, how, bin_size = case
    lrows = [(i, float(v)) for i, v in enumerate(vals)]
    rrows = [(100 + j, float(lo), float(lo + width)) for j, (lo, width) in enumerate(ivals)]
    ldf = spark.createDataFrame(lrows or [(None, None)], "id int, val double")
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "rid int, lo double, hi double"
    )
    if not lrows:
        ldf = ldf.filter(F.lit(False))
    if not rrows:
        rdf = rdf.filter(F.lit(False))
    def _k(t):  # unmatched sides are None under left/right/outer
        return tuple((x is None, -1 if x is None else x) for x in t)

    out = range_join(ldf, rdf, "val", "lo", "hi", bin_size=bin_size, how=how)
    got = sorted(
        ((r["id"], r["rid"]) for r in out.select("id", "rid").collect()),
        key=_k,
    )
    ddb.execute("DROP TABLE IF EXISTS lv"); ddb.execute("DROP TABLE IF EXISTS rv")
    ddb.execute("CREATE TABLE lv (id INT, val DOUBLE)")
    ddb.execute("CREATE TABLE rv (rid INT, lo DOUBLE, hi DOUBLE)")
    if lrows:
        ddb.executemany("INSERT INTO lv VALUES (?, ?)", lrows)
    if rrows:
        ddb.executemany("INSERT INTO rv VALUES (?, ?, ?)", rrows)
    join_kw = {"inner": "JOIN", "left": "LEFT JOIN",
               "right": "RIGHT JOIN", "outer": "FULL JOIN"}[how]
    want = sorted(
        (
            (i, r)
            for i, r in ddb.execute(
                f"SELECT lv.id, rv.rid FROM lv {join_kw} rv"
                f" ON lv.val BETWEEN rv.lo AND rv.hi"
            ).fetchall()
        ),
        key=_k,
    )
    assert got == want, (how, bin_size, vals, ivals)
