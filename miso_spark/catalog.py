"""Query catalog: every operator from SURVEY.md §2 as a named query
over the TESTDATA tables, with a DuckDB oracle SQL string.

This backs ``__spark_entry__.queries()`` / ``oracle_sql()`` (the
driver's correctness gate) and ``bench.py``.

Float-aggregate outputs are rounded identically on both sides to absorb
summation-order differences; per-row float arithmetic is bit-exact
across engines and left unrounded. Queries under a LIMIT always sort on
a unique key first so both engines pick the same rows.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miso_spark.compiler import Compiler
from miso_spark.kql import parse_kql
from miso_spark.sources import SourceRegistry

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def make_registry(spark: SparkSession, sf_dir: str) -> SourceRegistry:
    """Connector ``t`` → the sf directory's parquet tables. Raw-SQL
    scans register their own collection's view at compile time
    (compiler.ScanRaw), so no eager per-table setup happens here —
    registering all 10 views cost ~1s of analysis per query call.

    The session may be externally provided (the driver's) — re-apply
    the confs the engine depends on (ns-timestamp reads, UTC)."""
    from miso_spark.session import tune_session

    tune_session(spark)
    return SourceRegistry(spark).register_parquet_dir("t", sf_dir)


def run_kql(spark: SparkSession, sf_dir: str, kql: str, rounding: dict[str, int] | None = None) -> DataFrame:
    df = Compiler(make_registry(spark, sf_dir)).run(parse_kql(kql))
    for col, nd in (rounding or {}).items():
        df = df.withColumn(col, F.round(F.col(col), nd))
    return df


class Q:
    """A catalog entry: KQL (or a python builder) + DuckDB oracle."""

    def __init__(
        self,
        kql: str | None = None,
        oracle: str | None = None,
        rounding: dict[str, int] | None = None,
        builder: Callable[[SparkSession, str], DataFrame] | None = None,
    ):
        assert (kql is None) != (builder is None)
        self.kql = kql
        self.oracle = oracle
        self.rounding = rounding
        self.builder = builder

    def __call__(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        if self.builder is not None:
            return self.builder(spark, sf_dir)
        return run_kql(spark, sf_dir, self.kql, self.rounding)


CATALOG: dict[str, Q] = {}


def q(name: str, **kw) -> None:
    CATALOG[name] = Q(**kw)


# ---------------------------------------------------------------------------
# §2.1 core pipeline operators

q(
    "pricing_summary",  # flagship; TPC-H Q1 shape through the KQL path
    kql="""
    t.lineitem
    | where l_shipdate <= datetime(1998-09-02)
    | summarize sum_qty=sum(l_quantity), sum_base=sum(l_extendedprice),
                avg_qty=avg(l_quantity), avg_price=avg(l_extendedprice),
                avg_disc=avg(l_discount), count_order=count()
      by l_returnflag, l_linestatus
    """,
    rounding={"sum_qty": 2, "sum_base": 2, "avg_qty": 4, "avg_price": 4, "avg_disc": 4},
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)       AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)  AS sum_base,
           ROUND(AVG(l_quantity), 4)       AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)  AS avg_price,
           ROUND(AVG(l_discount), 4)       AS avg_disc,
           COUNT(*)                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)

q(
    "where_basic",  # comparisons + in + between/!between in one row
    # (absorbed the former where_in_between entry to keep the 50-slot
    # driver window while adding chunk_documents in r8)
    kql="""
    t.lineitem
    | where l_quantity >= 45 and l_discount < 0.05
        and l_returnflag in ('N', 'R')
        and l_extendedprice between (1000.0 .. 80000.0)
        and l_quantity !between (46.0 .. 47.0)
    | project l_orderkey, l_linenumber, l_quantity
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 45 AND l_discount < 0.05
      AND l_returnflag IN ('N', 'R')
      AND l_extendedprice BETWEEN 1000.0 AND 80000.0
      AND l_quantity NOT BETWEEN 46.0 AND 47.0
    """,
)

q(
    # contains/startswith/endswith/has + case-sensitive has_cs and
    # not() in one driver row (absorbed the former where_negations)
    "where_string_ops",
    kql="""
    t.part
    | where p_name contains 'red' or p_type startswith 'SMALL'
        or p_name endswith 'blue' or p_type has 'steel'
        or (p_type has_cs 'ECONOMY' and not(p_type has_cs 'promo'))
    | project p_partkey, p_name, p_type
    """,
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE contains(p_name, 'red') OR starts_with(p_type, 'SMALL')
       OR ends_with(p_name, 'blue')
       OR regexp_matches(p_type, '(?i)(^|[^A-Za-z0-9])steel([^A-Za-z0-9]|$)')
       OR (regexp_matches(p_type, '(^|[^A-Za-z0-9])ECONOMY([^A-Za-z0-9]|$)')
           AND NOT regexp_matches(p_type, '(^|[^A-Za-z0-9])promo([^A-Za-z0-9]|$)'))
    """,
)

q(
    "project_extend",
    kql="""
    t.lineitem
    | extend revenue = l_extendedprice * (1 - l_discount),
             band = iff(l_quantity >= 25, 'high', 'low')
    | project l_orderkey, l_linenumber, revenue, band
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           CASE WHEN l_quantity >= 25 THEN 'high' ELSE 'low' END AS band
    FROM lineitem
    """,
)

q(
    # multi-arm case() + project-rename in one driver row (absorbed the
    # former standalone rename query)
    "case_multi",
    kql="""
    t.orders
    | project o_orderkey,
              tier = case(o_totalprice >= 300000, 'platinum',
                          o_totalprice >= 150000, 'gold',
                          o_totalprice >= 50000, 'silver',
                          'bronze')
    | project-rename order_id = o_orderkey, order_tier = tier
    """,
    oracle="""
    SELECT o_orderkey AS order_id,
           CASE WHEN o_totalprice >= 300000 THEN 'platinum'
                WHEN o_totalprice >= 150000 THEN 'gold'
                WHEN o_totalprice >= 50000 THEN 'silver'
                ELSE 'bronze' END AS order_tier
    FROM orders
    """,
)

q(
    "sort_take",
    kql="""
    t.orders
    | sort by o_totalprice desc, o_orderkey asc
    | take 10
    | project o_orderkey, o_totalprice
    """,
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)

q(
    "top_n",
    kql="""
    t.orders
    | top 5 by o_totalprice desc
    | project o_orderkey, o_totalprice
    """,
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC LIMIT 5
    """,
)

q(
    "summarize_bin_time",
    kql="""
    t.events
    | summarize n = count(), total = sum(value) by day = bin(ts, 1d)
    | project day = tolong(day), n, total
    """,
    rounding={"total": 2},
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS day,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1
    """,
)

q(
    "summarize_bin_numeric",
    kql="""
    t.orders
    | summarize n = count() by price_bucket = bin(o_totalprice, 50000)
    | project price_bucket = tolong(price_bucket), n
    """,
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) * 50000 AS BIGINT) AS price_bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)

q(
    # countif/dcount + min/max (numeric AND timestamp) in one driver
    # row (absorbed the former summarize_min_max)
    "summarize_countif_dcount",
    kql="""
    t.events
    | summarize hi = countif(value > 50), users = dcount(user_id), n = count(),
                first_seen = min(ts), last_seen = max(ts), peak = max(value)
      by event_type
    | project event_type, hi, users, n, first_seen = tolong(first_seen),
              last_seen = tolong(last_seen), peak
    """,
    oracle="""
    SELECT event_type,
           COUNT(CASE WHEN value > 50 THEN 1 END) AS hi,
           COUNT(DISTINCT user_id) AS users,
           COUNT(*) AS n,
           CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS first_seen,
           CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS last_seen,
           MAX(value) AS peak
    FROM events GROUP BY event_type
    """,
)

q(
    # agg-less summarize (parser.rs:1033 admits zero aggregations):
    # `summarize by x, y` is distinct over the group keys
    "summarize_by_only",
    kql="""
    t.orders
    | summarize by o_orderpriority, status = o_orderstatus
    """,
    oracle="""
    SELECT DISTINCT o_orderpriority, o_orderstatus AS status FROM orders
    """,
)

q(
    "distinct_op",
    kql="t.lineitem | distinct l_returnflag, l_linestatus",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)

q(
    # same-schema union AND heterogeneous-log union in one driver row
    # (absorbed the former union_mixed_schema): the second union pads
    # missing columns with nulls (unionByName allowMissingColumns) and
    # exists() observes the padding (the group key stays non-null —
    # summarize drops null groups by design, filter.rs parity)
    "union_op",
    kql="""
    t.orders
    | where o_totalprice > 300000
    | union (t.orders | where o_totalprice < 10000)
    | project k = o_orderkey, price = o_totalprice, status = o_orderstatus
    | union (t.customer | project k = c_custkey, bal = c_acctbal, status = 'cust')
    | summarize n = count(), with_price = countif(exists(price)),
                with_bal = countif(exists(bal)) by status
    """,
    oracle="""
    WITH u AS (
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status,
             NULL::DOUBLE AS bal
      FROM orders WHERE o_totalprice > 300000 OR o_totalprice < 10000
      UNION ALL
      SELECT c_custkey, NULL, 'cust', c_acctbal FROM customer
    )
    SELECT status, COUNT(*) AS n,
           COUNT(CASE WHEN price IS NOT NULL THEN 1 END) AS with_price,
           COUNT(CASE WHEN bal IS NOT NULL THEN 1 END) AS with_bal
    FROM u GROUP BY status
    """,
)

q(
    "join_inner",
    kql="""
    t.customer
    | join kind=inner (t.nation) on $left.c_nationkey == $right.n_nationkey
    | summarize n = count(), total_bal = sum(c_acctbal) by n_name
    """,
    rounding={"total_bal": 2},
    oracle="""
    SELECT n_name, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

q(
    "join_left",
    kql="""
    t.customer
    | join kind=left (t.orders | summarize n_orders = count() by o_custkey)
      on $left.c_custkey == $right.o_custkey
    | project c_custkey, n_orders
    """,
    oracle="""
    SELECT c_custkey, n_orders
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ) sub ON c_custkey = o_custkey
    """,
)

q(
    # kind=right + hint.partitions=N (join.rs:720: N-way partitioned
    # hash join; plan asserted in
    # tests/test_plans.py::test_join_partitions_hint_honored) in one
    # driver row — absorbed the former join_hint_partitions query
    "join_right",
    kql="""
    t.orders
    | summarize n_orders = count() by o_custkey
    | join kind=right hint.partitions=8 (t.customer) on $left.o_custkey == $right.c_custkey
    | project c_custkey, n_orders
    """,
    oracle="""
    SELECT c_custkey, n_orders
    FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) sub
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)

q(
    "join_outer",
    kql="""
    t.supplier
    | join kind=outer (t.customer | where c_acctbal > 9000)
      on $left.s_nationkey == $right.c_nationkey
    | project s_suppkey, c_custkey
    """,
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier FULL OUTER JOIN (
      SELECT * FROM customer WHERE c_acctbal > 9000
    ) c ON s_nationkey = c_nationkey
    """,
)

def _b_tee_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tee → scan-back round trip over a REAL sink (the workflow Tee
    step + create_sink negotiation, miso-server lib.rs): filter
    lineitem, `tee` into a temp parquet connector, then scan the
    tee'd collection back and `count` it. The oracle checks the whole
    write→read path — rows that survive the filter, land in the sink,
    and read back — giving the §2.1 tee/write row an oracle-checked
    entry (previously pytest-only) while keeping the bare-count step
    covered (the scan-back ends in CountStep)."""
    import tempfile

    from miso_spark.sources import ParquetDirSource

    reg = make_registry(spark, sf_dir)
    reg.register("sink", ParquetDirSource(tempfile.mkdtemp(prefix="miso_tee_")))
    c = Compiler(reg)
    # the Tee step writes eagerly at compile time and passes rows on
    c.run(parse_kql("t.lineitem | where l_quantity > 45 | tee sink.teed"))
    return c.run(parse_kql("sink.teed | count"))


q(
    "tee_roundtrip",
    builder=_b_tee_roundtrip,
    oracle='SELECT COUNT(*) AS "Count" FROM lineitem WHERE l_quantity > 45',
)

q(
    "let_binding",
    kql="""
    let busy = t.orders | summarize n = count() by o_custkey | where n >= 12;
    busy
    | join kind=inner (t.customer) on $left.o_custkey == $right.c_custkey
    | project c_custkey, c_name, n
    """,
    oracle="""
    WITH busy AS (
      SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    )
    SELECT c_custkey, c_name, n
    FROM busy JOIN customer ON o_custkey = c_custkey
    """,
)

q(
    "casts_op",  # casts + (r11) cross-class TYPED comparisons in one
    # row: the r10 total-order semantics (exprs.py _cross_class_cmp,
    # value/mod.rs:147 class ranks Bool < numbers < String) get a
    # driver-oracle cell via CASE-encoded DuckDB equivalents —
    # string-vs-int is TRUE/FALSE by class rank (never a coercion
    # crash), null is the smallest value, bool ranks below numbers.
    # s1 is null on ~5/7 of rows (extract yields null on no match),
    # so both branches of each comparison are exercised.
    kql="""
    t.lineitem
    | project l_orderkey, l_linenumber,
              q_int = toint(l_quantity),
              q_str = tostring(l_linenumber),
              big = tobool(iff(l_quantity > 25, 1, 0)),
              price_long = tolong(l_extendedprice)
    | extend s1 = extract('^([12].*)', 1, q_str)
    | extend cc_sgt = s1 > 5, cc_slt = s1 < 5, cc_seq = s1 == 5,
             cc_blt = big < 5, cc_bgt = big > 5
    | project l_orderkey, l_linenumber, q_int, q_str, big, price_long,
              cc_sgt, cc_slt, cc_seq, cc_blt, cc_bgt
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(TRUNC(l_quantity) AS BIGINT) AS q_int,
           CAST(l_linenumber AS VARCHAR) AS q_str,
           CAST(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS BOOLEAN) AS big,
           CAST(TRUNC(l_extendedprice) AS BIGINT) AS price_long,
           -- cross-class by total-order class rank: String > Number
           -- when present, Null smallest, Bool < Number, eq never
           -- crosses classes
           (NULLIF(regexp_extract(CAST(l_linenumber AS VARCHAR),
                                  '^([12].*)', 1), '') IS NOT NULL)
               AS cc_sgt,
           (NULLIF(regexp_extract(CAST(l_linenumber AS VARCHAR),
                                  '^([12].*)', 1), '') IS NULL)
               AS cc_slt,
           FALSE AS cc_seq,
           TRUE AS cc_blt,
           FALSE AS cc_bgt
    FROM lineitem
    """,
)

q(
    "exists_op",  # exists() gate + extract() projection in one row
    # (absorbed the former extract_op entry to keep the 50-slot driver
    # window: both operators stay driver-oracle-checked here).
    # r13: the `g` column drives extract over a DYNAMIC (variant)
    # source through the driver oracle — its three-way outcome keeps
    # the reference's null worlds apart (interpreter/mod.rs:406-409,
    # string_ops.rs:30-32): a MISSING source (every 7th event_id)
    # stays missing (NULL out), a no-match on a present string is a
    # PRESENT Value::Null that tostring renders "null" (Val::cast),
    # and a match renders the captured group.
    kql="""
    t.events.raw('SELECT event_id, props, try_variant_get(parse_json(to_json(named_struct("v", CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END))), "$.v", "variant") AS s FROM events')
    | where exists(props) and not(exists(props) and false)
    | extend f = extract("(pur.+)", 1, s)
    | project event_id, k = toint(extract('"k": (\\d+)', 1, props)),
              g = tostring(f)
    """,
    oracle="""
    SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_type LIKE 'pur%' THEN regexp_extract(event_type, '(pur.+)', 1)
                ELSE 'null' END AS g
    FROM events WHERE props IS NOT NULL
    """,
)

q(
    "scan_raw",
    kql="""
    t.lineitem.raw('SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag')
    | sort by n desc
    """,
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag
    """,
)

q(
    "mv_expand",
    # two arms (VERDICT r11 #7): kind=array over a real array, UNIONED
    # with kind=bag (default) over an OBJECT — the struct branch emits
    # one row per PRESENT key as a single-key object (expand.rs), which
    # the extend discriminates via exists() and re-encodes as a string
    # so the union stays one relational shape for the oracle
    kql="""
    t.documents.raw('SELECT doc_id, split(text, " ") AS words FROM documents')
    | mv-expand kind=array words
    | summarize n = count() by words
    | union (
        t.documents.raw('SELECT doc_id, named_struct("lang", lang, "src", source) AS obj FROM documents')
        | mv-expand obj
        | extend words = iff(exists(obj.lang), "lang:" + obj.lang, "src:" + obj.src)
        | summarize n = count() by words
      )
    """,
    oracle="""
    SELECT w AS words, COUNT(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ) GROUP BY w
    UNION ALL
    SELECT words, COUNT(*) AS n FROM (
      SELECT 'lang:' || lang AS words FROM documents WHERE lang IS NOT NULL
      UNION ALL
      SELECT 'src:' || source FROM documents WHERE source IS NOT NULL
    ) GROUP BY words
    """,
)

def _b_static_time_field(spark, sf_dir):
    """Collection static_fields (lib.rs:137, scan.rs
    apply_static_fields): the connector maps ``@time`` to its real
    timestamp column at scan, so queries use the standardized name.
    The where clause additionally carries the datetime-literal surface
    (absorbed the former datetime_arith entry): datetime() literal +
    bare datetime-with-time literal + long-form (36hours/30minutes)
    and short-form (1d) timespans + datetime ± timespan arithmetic
    (lexer.rs:208-247 literal parity)."""
    from miso_spark.session import tune_session
    from miso_spark.sources import ParquetDirSource, SourceRegistry

    tune_session(spark)  # events.ts needs the nanosAsLong/UTC confs
    reg = SourceRegistry(spark).register(
        "s", ParquetDirSource(sf_dir, static_fields={"events": {"@time": "ts"}})
    )
    return Compiler(reg).run(
        parse_kql(
            "s.events"
            " | where @time between (datetime(2024-01-05) .."
            "                        2024-01-05 00:00:00 + 36hours + 30minutes + 1d)"
            " | summarize n = count() by event_type"
        )
    )


q(
    "static_time_field",
    builder=_b_static_time_field,
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-05'
          AND TIMESTAMP '2024-01-05 00:00:00' + INTERVAL 36 HOUR
              + INTERVAL 30 MINUTE + INTERVAL 1 DAY
    GROUP BY event_type
    """,
)

# ---------------------------------------------------------------------------
# §2.5 LLM-data-pipeline operators (documents / embeddings tables)


def _documents(spark, sf_dir):
    return make_registry(spark, sf_dir).table("t", "documents")


def _embeddings(spark, sf_dir):
    return make_registry(spark, sf_dir).table("t", "embeddings")


def _b_dedup_exact(spark, sf_dir):
    from miso_spark.functions.dedup import exact_dedup

    return exact_dedup(_documents(spark, sf_dir))


q(
    "dedup_exact",
    builder=_b_dedup_exact,
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)


def _b_dedup_ngram(spark, sf_dir):
    from miso_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_documents(spark, sf_dir), threshold=0.5)


#: exact word-3-gram Jaccard pairs at threshold 0.5 — shared by
#: dedup_ngram_jaccard (the exact method) and dedup_minhash_verified
#: (the LSH path, whose verified output must equal the exact set)
_NGRAM_JACCARD_ORACLE = """
    WITH w AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
                    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM w
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    """

q("dedup_ngram_jaccard", builder=_b_dedup_ngram, oracle=_NGRAM_JACCARD_ORACLE)


def _b_dedup_assignments(spark, sf_dir):
    """Pairs → decisions: connected components over the exact n-gram
    Jaccard pair graph, min id kept per cluster (dedup.py
    connected_components / dedup_assignments). Oracle: DuckDB recursive
    CTE reachability over the same pair set."""
    from miso_spark.functions.dedup import dedup_assignments, ngram_jaccard_pairs

    docs = _documents(spark, sf_dir)
    return dedup_assignments(docs, ngram_jaccard_pairs(docs, threshold=0.5))


q(
    "dedup_assignments",
    builder=_b_dedup_assignments,
    oracle="""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
                    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM w
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    canon AS (
      SELECT s AS doc_id, LEAST(s, MIN(d)) AS canonical_id
      FROM reach GROUP BY s
    )
    SELECT dd.doc_id AS id,
           COALESCE(canon.canonical_id, dd.doc_id) AS canonical_id,
           dd.doc_id = COALESCE(canon.canonical_id, dd.doc_id) AS is_kept
    FROM documents dd LEFT JOIN canon ON dd.doc_id = canon.doc_id
    """,
)


def _b_dedup_minhash_verified(spark, sf_dir):
    """MinHash-LSH at max-recall banding (bands = num_hashes: a pair
    collides if ANY of the 16 minhash values agree) whose exact-Jaccard
    verified output is held to the *exact* n-gram oracle set — LSH
    recall failures become a red driver cell instead of a pytest-only
    signal."""
    from miso_spark.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _documents(spark, sf_dir), num_hashes=16, bands=16, threshold=0.5
    )


q("dedup_minhash_verified", builder=_b_dedup_minhash_verified, oracle=_NGRAM_JACCARD_ORACLE)


def _b_dedup_simhash_verified(spark, sf_dir):
    """SimHash with the md5-derived word hash (``md5_word_hash``) and
    exhaustive block-combination buckets (no cap; num_blocks=4 >
    max_hamming=3 → pigeonhole guarantees every hamming≤3 pair shares a
    block) — so the candidate machinery must reproduce EXACTLY the
    brute-force hamming≤3 set, which the DuckDB oracle computes from
    md5 hex nibbles (md5 is the one 128-bit hash both engines share)."""
    from miso_spark.functions.dedup import md5_word_hash, simhash_candidates

    return simhash_candidates(
        _documents(spark, sf_dir),
        max_hamming=3,
        max_bucket_size=None,
        word_hash=md5_word_hash,
    )


def _simhash_md5_oracle(max_hamming: int = 3) -> str:
    """Brute-force simhash-hamming oracle: per-word 64-bit hash = lower
    half of md5 (bit j = bit (j%4) of hex digit 15-j//4 of the last 16
    chars — the exact bit layout ``md5_word_hash`` produces), per-doc
    signature = sign of the 64 bit-vote sums, pairs scored by bit
    disagreement over an O(N²) self-join."""
    digits = "0123456789abcdef"

    def bit(j: int) -> str:
        i = 15 - j // 4
        return (
            f"(((strpos('{digits}', substr(md5(w), {17 + i}, 1)) - 1)"
            f" >> {j % 4}) & 1)"
        )

    votes = ",\n           ".join(
        f"SUM(CASE WHEN {bit(j)} = 1 THEN 1 ELSE -1 END) > 0 AS b{j}"
        for j in range(64)
    )
    ham = "\n             + ".join(
        f"CASE WHEN a.b{j} <> b.b{j} THEN 1 ELSE 0 END" for j in range(64)
    )
    return f"""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
           {votes}
      FROM w GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           {ham} AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE {ham} <= {max_hamming}
    """


q("dedup_simhash_verified", builder=_b_dedup_simhash_verified, oracle=_simhash_md5_oracle())


def _b_dedup_embedding(spark, sf_dir):
    from miso_spark.functions.dedup import embedding_dedup_pairs

    return embedding_dedup_pairs(_embeddings(spark, sf_dir), threshold=0.35)


q(
    "dedup_embedding",
    builder=_b_dedup_embedding,
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)
             AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)
          >= 0.35
    """,
)


#: fixed ANN query vector: embedding of vec_id=0, fetched once per
#: sf_dir (a 1-row pushed-filter scan) and cached across calls
_QUERY_VEC_CACHE: dict[str, list[float]] = {}


def _query_vec(spark, sf_dir):
    if sf_dir not in _QUERY_VEC_CACHE:
        row = _embeddings(spark, sf_dir).filter(F.col("vec_id") == 0).first()
        _QUERY_VEC_CACHE[sf_dir] = [float(x) for x in row["embedding"]]
    return _QUERY_VEC_CACHE[sf_dir]


def _b_ann_bruteforce(spark, sf_dir):
    from miso_spark.functions.similarity import bruteforce_topk

    emb = _embeddings(spark, sf_dir)
    return bruteforce_topk(emb, _query_vec(spark, sf_dir), k=10)


q(
    "ann_bruteforce",
    builder=_b_ann_bruteforce,
    oracle="""
    WITH qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0)
    SELECT vec_id AS id,
           ROUND(list_dot_product(embedding::DOUBLE[], q)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q, q))), 4) AS cosine
    FROM embeddings, qv
    ORDER BY cosine DESC, id ASC LIMIT 10
    """,
)


def _b_multimodal_features(spark, sf_dir):
    """Multimodal plumbing as a first-class query: documents become
    opaque binary payloads (UTF-8 bytes, deterministic ``fake`` format)
    and flow through the Arrow-batched mapInPandas featurizer — the
    exact pipeline a real codec would plug into (multimodal.py). The
    oracle recomputes byte length and md5 SQL-side."""
    from miso_spark.functions.multimodal import extract_features

    media = _documents(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("format"),
        F.col("text").cast("binary").alias("payload"),
    )
    return extract_features(media).select("media_id", "n_samples", "feature_hash")


q(
    "multimodal_features",
    builder=_b_multimodal_features,
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_samples,
           md5(text) AS feature_hash
    FROM documents
    """,
)


def _b_near_dedup_pipeline(spark, sf_dir):
    """The composed production near-dedup runbook (exact pre-pass →
    capped LSH over representatives → connected components → member
    re-attach) at the max-recall banding the driver oracle demands
    (bands = num_hashes, like dedup_minhash_verified). The bucket cap
    keeps its production default ON — the exact pre-pass guarantees a
    bucket only overflows on genuinely distinct near-dup text. Oracle:
    the uncapped naive composition in DuckDB — exact groups to a min-id
    representative, exact n-gram Jaccard pairs over representatives,
    recursive-CTE reachability, members re-attached through their
    representative."""
    from miso_spark.functions.dedup import near_dedup_pipeline

    return near_dedup_pipeline(
        _documents(spark, sf_dir), num_hashes=16, bands=16, threshold=0.5
    )


q(
    "near_dedup_pipeline",
    builder=_b_near_dedup_pipeline,
    oracle="""
    WITH RECURSIVE norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext
      FROM documents
    ),
    grp AS (SELECT ntext, MIN(doc_id) AS rep_id FROM norm GROUP BY ntext),
    w AS (
      SELECT rep_id AS doc_id, string_split(ntext, ' ') AS ws FROM grp
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
                    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM w
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    canon AS (
      SELECT s AS doc_id, LEAST(s, MIN(d)) AS canonical_id
      FROM reach GROUP BY s
    ),
    rep_canon AS (
      SELECT g.rep_id, COALESCE(c.canonical_id, g.rep_id) AS canonical_id
      FROM grp g LEFT JOIN canon c ON g.rep_id = c.doc_id
    )
    SELECT n.doc_id AS id, rc.canonical_id AS canonical_id,
           n.doc_id = rc.canonical_id AS is_kept
    FROM norm n
    JOIN grp g ON n.ntext = g.ntext
    JOIN rep_canon rc ON g.rep_id = rc.rep_id
    """,
)


def _b_text_quality(spark, sf_dir):
    """Quality scoring + token counting + language prediction in one
    pass over documents (token counts folded in from the former
    text_tokens entry, lang_pred from the former text_lang_id entry —
    both moves keep the catalog at the driver's 50-row window; the
    per-language scores stay covered by tests/test_oracle.py through
    this entry's lang_pred and by functions/text.py unit tests)."""
    from miso_spark.functions.text import (
        bpe_token_count,
        with_lang_id,
        with_quality,
    )

    return with_lang_id(with_quality(_documents(spark, sf_dir))).select(
        "doc_id", "n_words", "avg_word_len", "stopword_ratio", "punct_ratio",
        "quality_score",
        # n_tokens ≡ n_words by construction: token_count counts the
        # pieces of split(text, '\s+') (regexp_count(\s+)+1) and
        # n_words is size() of that very split — reusing the computed
        # column drops a full regex pass per row (r15, guide §1.2)
        F.col("n_words").alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        "lang_pred",
    )


q(
    "text_quality",
    builder=_b_text_quality,
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             len(regexp_split_to_array(text, '\\s+')) AS n_words,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                 w -> w = 'the' OR w = 'a' OR w = 'and' OR w = 'of' OR w = 'to'
                   OR w = 'in' OR w = 'is' OR w = 'it')) AS stop,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
      FROM documents
    ),
    r AS (
      -- all-DOUBLE arithmetic on pre-rounded ratios, mirroring the
      -- Spark expression tree exactly (decimal literals would diverge)
      SELECT doc_id, n_chars, n_words,
             ROUND(CAST(n_chars AS DOUBLE) / greatest(n_words, 1), 4) AS avg_word_len,
             ROUND(CAST(stop AS DOUBLE) / greatest(n_words, 1), 4) AS stopword_ratio,
             ROUND(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio
      FROM t
    ),
    lw AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    ls AS (
      -- the lang-id n-gram heuristic, on the NORMALIZED split (the
      -- quality word split above intentionally uses the raw text)
      SELECT doc_id,
        len(list_filter(ws, w -> w = 'the' OR w = 'and' OR w = 'of' OR w = 'to' OR w = 'is')) AS score_en,
        len(list_filter(ws, w -> w = 'der' OR w = 'die' OR w = 'und' OR w = 'ist' OR w = 'nicht')) AS score_de,
        len(list_filter(ws, w -> w = 'le' OR w = 'la' OR w = 'et' OR w = 'est' OR w = 'pas')) AS score_fr
      FROM lw
    )
    SELECT r.doc_id, n_words, avg_word_len, stopword_ratio, punct_ratio,
           ROUND(least(CAST(n_words AS DOUBLE) / 20.0::DOUBLE, 1.0::DOUBLE) * 0.4::DOUBLE
               + least(stopword_ratio * 5.0::DOUBLE, 1.0::DOUBLE) * 0.3::DOUBLE
               + (1.0::DOUBLE - least(punct_ratio * 4.0::DOUBLE, 1.0::DOUBLE)) * 0.3::DOUBLE, 6)
             AS quality_score,
           len(regexp_split_to_array(d.text, '\\s+')) AS n_tokens,
           len(regexp_extract_all(d.text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpe_tokens,
           CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
                WHEN score_de >= score_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM r JOIN documents d ON r.doc_id = d.doc_id
    JOIN ls ON ls.doc_id = r.doc_id
    """,
)


def _b_decontaminate(spark, sf_dir):
    """Benchmark decontamination (dedup.decontaminate): every 20th
    document plays the eval corpus; training docs sharing ≥ 2 distinct
    word-3-gram shingles with ANY eval doc flag contaminated. The
    oracle recomputes the same shingle sets string-wise in DuckDB
    (shingle CTE + semi join — the dedup_ngram_jaccard shape)."""
    from miso_spark.functions.dedup import decontaminate

    docs = _documents(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    return decontaminate(docs, ev, n=3, min_common_shingles=2)


q(
    "decontaminate",
    builder=_b_decontaminate,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
                    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM w
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
    hits AS (
      SELECT sh.doc_id AS id, COUNT(*) AS common_shingles
      FROM sh JOIN ev ON sh.s = ev.s
      GROUP BY 1
    )
    SELECT d.doc_id AS id,
           COALESCE(h.common_shingles, 0) AS common_shingles,
           COALESCE(h.common_shingles, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
    """,
)


def _b_text_fingerprint(spark, sf_dir):
    """Document fingerprint + PII redaction + Gopher repetition signals
    in one driver row (absorbed the former text_redaction and
    text_repetition entries to keep the 50-slot driver window —
    functions/text.redact: emails/URLs/IPs/phone runs → typed
    placeholders via a JVM regexp_replace chain whose patterns are
    RE2-compatible so DuckDB replays the identical chain;
    functions/text.with_repetition: dup-word + top-word fractions)."""
    from miso_spark.functions.text import (
        fingerprint,
        with_redaction,
        with_repetition,
    )

    docs = _documents(spark, sf_dir)
    base = with_redaction(docs).select(
        "doc_id", fingerprint(F.col("text")).alias("fp"), "redacted"
    )
    return base.join(with_repetition(docs), "doc_id")


def _redaction_expr() -> str:
    from miso_spark.functions.text import REDACTION_PATTERNS

    expr = "text"
    for pat, token in REDACTION_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


q(
    "text_fingerprint",
    builder=_b_text_fingerprint,
    oracle=f"""
    WITH n AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(ws) AS n_words,
             ROUND(1.0 - len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1), 4)
               AS dup_word_frac
      FROM n
    ),
    counts AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(ws) AS w FROM n)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS top_word_frac
      FROM counts GROUP BY doc_id
    )
    SELECT d.doc_id,
           md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g')))) AS fp,
           {_redaction_expr()} AS redacted,
           base.n_words, base.dup_word_frac, top.top_word_frac
    FROM documents d
    JOIN base ON base.doc_id = d.doc_id
    JOIN top  ON top.doc_id = d.doc_id
    """,
)


def _b_chunk_documents(spark, sf_dir):
    """Sliding-window chunking (functions/text.chunk_documents): the
    long-document → training/RAG window splitter, oracle-checked
    against DuckDB's range + list_slice formulation."""
    from miso_spark.functions.text import chunk_documents

    return chunk_documents(
        _documents(spark, sf_dir), chunk_tokens=64, overlap=16
    )


q(
    "chunk_documents",
    builder=_b_chunk_documents,
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws,
             len(regexp_split_to_array(text, '\\s+')) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, ws, n,
             unnest(range(0, greatest(n - 1, 0) + 1, 48)) AS chunk_start,
             generate_subscripts(range(0, greatest(n - 1, 0) + 1, 48), 1) - 1
               AS chunk_id
      FROM t
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(least(64, n - chunk_start) AS INT) AS chunk_n_tokens,
           array_to_string(list_slice(ws, chunk_start + 1, chunk_start + 64), ' ')
             AS chunk_text
    FROM s WHERE chunk_start < n
    """,
)


def _b_pack_sequences(spark, sf_dir):
    """Sequence packing (functions/packing.py): every document's place
    in the concatenated token stream via the two-pass distributed
    prefix sum — the driver oracle is the single-window SQL
    formulation, proving the distributed offsets are exact."""
    from miso_spark.functions.packing import pack_sequences
    from miso_spark.functions.text import token_count

    docs = _documents(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, max_tokens=256)


q(
    "pack_sequences",
    builder=_b_pack_sequences,
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(text, '\\s+')) AS n,
             COALESCE(SUM(len(regexp_split_to_array(text, '\\s+')))
               OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS gs
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(gs AS BIGINT) AS global_start,
           CAST(gs // 256 AS BIGINT) AS pack_id,
           CAST(gs % 256 AS BIGINT) AS pack_offset,
           CAST(greatest(gs + n - 1, gs) // 256 AS BIGINT) AS end_pack_id
    FROM t
    """,
)


def _b_corpus_lm(spark, sf_dir):
    """Corpus-LM bigram quality scoring (functions/text.py
    corpus_bigram_logprob): mean joint log-prob of each doc's word
    bigrams under the corpus's own add-1-smoothed distribution. The
    driver oracle is the straight SQL formulation of the same model;
    avg_logprob rounds to 4 decimals so libm-vs-JVM ln() ulp noise
    can't flip a digit (perplexity is a derived view, omitted here —
    pytest pins it)."""
    from miso_spark.functions.text import corpus_bigram_logprob

    out = corpus_bigram_logprob(_documents(spark, sf_dir))
    return out.select(
        F.col("id").alias("doc_id"),
        "n_bigrams",
        F.round("avg_logprob", 4).alias("avg_logprob"),
    )


q(
    "corpus_bigram_logprob",
    builder=_b_corpus_lm,
    oracle="""
    WITH w AS (
      SELECT doc_id AS id, unnest(
        string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
      ) AS w1,
      generate_subscripts(
        string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '), 1
      ) AS pos
      FROM documents
    ),
    bi AS (
      SELECT id, w1, lead(w1) OVER (PARTITION BY id ORDER BY pos) AS w2
      FROM w
    ),
    bi2 AS (SELECT * FROM bi WHERE w2 IS NOT NULL),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi2 GROUP BY 1, 2),
    voc AS (
      SELECT COUNT(*) AS v FROM (
        SELECT w1 AS w FROM bc UNION SELECT w2 FROM bc
      )
    ),
    consts AS (
      SELECT (SELECT SUM(c12) FROM bc)
             + 1.0 * (SELECT v FROM voc) * (SELECT v FROM voc) AS denom
    )
    SELECT id AS doc_id, COUNT(*) AS n_bigrams,
           ROUND(ROUND(AVG(LN((c12 + 1.0) / (SELECT denom FROM consts))), 6), 4)
             AS avg_logprob
    FROM bi2 JOIN bc USING (w1, w2)
    GROUP BY id
    """,
)


def _b_dataset_split(spark, sf_dir):
    """Content-hash train/val/test assignment (functions/split.py):
    stable across runs/engines — the oracle reproduces it in SQL.
    Also carries the deterministic md5-threshold Bernoulli sample
    decision as a boolean column (absorbed the former dataset_sample
    entry — functions/split.sample_flag, the reproducible-corpus-subset
    primitive)."""
    from miso_spark.functions.split import sample_flag, with_split

    return with_split(_documents(spark, sf_dir)).select(
        "doc_id", "split", sample_flag(0.3).alias("in_sample")
    )


q(
    "dataset_split",
    builder=_b_dataset_split,
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 2) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split,
           ('0x' || substr(md5('' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
             < {int(0.3 * 0x100000000)} AS in_sample
    FROM documents
    """,
)


def _b_split_leakage(spark, sf_dir):
    """Train/val/test leakage audit: near-dup clusters whose members
    land in more than one split — dedup (connected components) composed
    with the content-hash splitter; the pre-ship QA query of a training
    pipeline."""
    from miso_spark.functions.dedup import dedup_assignments, ngram_jaccard_pairs
    from miso_spark.functions.split import with_split

    docs = _documents(spark, sf_dir)
    assign = dedup_assignments(docs, ngram_jaccard_pairs(docs, threshold=0.5))
    splits = with_split(docs).select(F.col("doc_id").alias("id"), "split")
    return (
        assign.join(splits, "id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count_distinct("split").alias("n_splits"),
        )
        .filter(F.col("n_members") > 1)
        .withColumn("leaks", F.col("n_splits") > 1)
    )


q(
    "split_leakage",
    builder=_b_split_leakage,
    oracle="""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 1)),
                    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS s
      FROM w
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    canon AS (SELECT s AS doc_id, LEAST(s, MIN(d)) AS canonical_id FROM reach GROUP BY s),
    assigned AS (
      SELECT dd.doc_id, COALESCE(canon.canonical_id, dd.doc_id) AS canonical_id,
             CASE WHEN substr(md5(lower(trim(regexp_replace(dd.text, '\\s+', ' ', 'g')))), 1, 2) < 'cc'
                  THEN 'train'
                  WHEN substr(md5(lower(trim(regexp_replace(dd.text, '\\s+', ' ', 'g')))), 1, 2) < 'e6'
                  THEN 'val' ELSE 'test' END AS split
      FROM documents dd LEFT JOIN canon ON dd.doc_id = canon.doc_id
    )
    SELECT canonical_id, COUNT(*) AS n_members,
           COUNT(DISTINCT split) AS n_splits,
           COUNT(DISTINCT split) > 1 AS leaks
    FROM assigned GROUP BY canonical_id HAVING COUNT(*) > 1
    """,
)


q(
    "q5_local_supplier",  # TPC-H Q5 shape: 5 joins, dims broadcast
    kql="""
    t.customer
    | join kind=inner (t.orders) on $left.c_custkey == $right.o_custkey
    | join kind=inner (t.lineitem) on $left.o_orderkey == $right.l_orderkey
    | join kind=inner (t.supplier) on $left.l_suppkey == $right.s_suppkey
    | where c_nationkey == s_nationkey
        and o_orderdate between (datetime(1996-01-01) .. datetime(1997-01-01))
    | join kind=inner (t.nation) on $left.s_nationkey == $right.n_nationkey
    | join kind=inner (t.region) on $left.n_regionkey == $right.r_regionkey
    | where r_name == 'ASIA'
    | summarize revenue = sum(l_extendedprice * (1 - l_discount)) by n_name
    | sort by revenue desc
    """,
    rounding={"revenue": 2},
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-01-01'
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)

def _b_dcount_approx(spark, sf_dir):
    """HLL-sketch distinct — the 100 TB path where exact dcount's
    two-phase shuffle is too expensive. The sketch itself has no ANSI
    oracle, so the entry returns the EXACT dcount plus a boolean
    asserting the HLL estimate landed within 10% of it (default rsd is
    5%; 10% gives determinism headroom across SFs) — the oracle expects
    the exact counts and ``TRUE``, so an out-of-tolerance sketch is a
    red driver cell rather than a pytest-only signal."""
    from miso_spark import plan as P
    from miso_spark.compiler import Compiler
    from miso_spark.exprs import Field

    plan = P.Plan.scan("t", "orders").summarize(
        {
            "custs": P.Agg("dcount", Field.of("o_custkey")),
            "approx_custs": P.Agg("dcount_approx", Field.of("o_custkey")),
        },
        by=[P.ByField(Field.of("o_orderpriority"), "o_orderpriority")],
    )
    df = Compiler(make_registry(spark, sf_dir)).run(plan)
    return df.select(
        "o_orderpriority",
        "custs",
        (
            F.abs(F.col("approx_custs") - F.col("custs"))
            <= 0.10 * F.col("custs")
        ).alias("approx_ok"),
    )


q(
    "dcount_approx",
    builder=_b_dcount_approx,
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS custs,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# §2.4 streaming (drained deterministically with availableNow)


def _b_stream_windows(spark, sf_dir):
    import os
    import uuid

    from miso_spark.streaming import run_to_memory, stream_events, windowed_counts

    stream = windowed_counts(
        stream_events(spark, sf_dir, glob_filter="events.parquet"),
        window="1 day",
        watermark="1 hour",
    )
    got = run_to_memory(stream, "winc_" + uuid.uuid4().hex[:8], mode="update")
    return got.select(
        F.col("window_start").cast("long").alias("day"), "event_type", "n", "total"
    )


def _b_rollup_continuous_agg(spark, sf_dir):
    """Persisted continuous aggregate: stream events into partial
    rollup rows (streaming/rollup.py), then answer the daily aggregate
    from the rollup alone — the merged partials must equal the batch
    GROUP BY over raw events (the oracle)."""
    import tempfile
    import uuid

    from miso_spark.streaming import stream_events
    from miso_spark.streaming.rollup import maintain_rollup, query_rollup

    base = tempfile.mkdtemp(prefix="rollup_")
    rollup_dir = f"{base}/rollup"
    q = maintain_rollup(
        stream_events(spark, sf_dir, glob_filter="events.parquet"),
        rollup_dir,
        f"{base}/ckpt_{uuid.uuid4().hex[:8]}",
        window="1 day",
    )
    q.awaitTermination()
    return query_rollup(spark, rollup_dir).select(
        F.col("window_start").cast("long").alias("day"), "event_type", "n", "total"
    )


q(
    "rollup_continuous_agg",
    builder=_b_rollup_continuous_agg,
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS day,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)


q(
    "stream_windowed_counts",
    builder=_b_stream_windows,
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS day,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)


def _b_stream_sessionize(spark, sf_dir):
    """applyInPandasWithState sessionization drained with availableNow:
    append mode emits exactly the CLOSED sessions (a >30min gap after
    them); each user's final session stays open in state. The batch
    oracle reproduces that with LAG-gap sessionization minus each
    user's last session."""
    import uuid

    from miso_spark.streaming import run_to_memory, sessionize, stream_events

    sess = sessionize(
        stream_events(spark, sf_dir, glob_filter="events.parquet"), gap_s=1800
    )
    got = run_to_memory(sess, "sess_" + uuid.uuid4().hex[:8], mode="append")
    return got.select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
    )


def _b_range_join(spark, sf_dir):
    """Interval containment via bin-bucketed join (functions/rangejoin
    — hash join on overlap bins, never a nested-loop cross join):
    lineitem prices matched into ±500 windows around order totals."""
    from miso_spark.functions.rangejoin import range_join

    reg = make_registry(spark, sf_dir)
    li = (
        reg.table("t", "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )
    ranges = (
        reg.table("t", "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") - 500).alias("lo"),
            (F.col("o_totalprice") + 500).alias("hi"),
        )
    )
    out = range_join(li, ranges, "l_extendedprice", "lo", "hi", bin_size=1000.0)
    return out.select("l_orderkey", "l_linenumber", "o_orderkey")


q(
    "range_join",
    builder=_b_range_join,
    oracle="""
    SELECT l_orderkey, l_linenumber, o_orderkey
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice
          FROM lineitem WHERE l_orderkey <= 200) l
    JOIN (SELECT o_orderkey, o_totalprice - 500 AS lo, o_totalprice + 500 AS hi
          FROM orders WHERE o_orderkey <= 1000) r
      ON l.l_extendedprice BETWEEN r.lo AND r.hi
    """,
)


def _b_asof_join(spark, sf_dir):
    """Point-in-time join: each 'click' event picks up the latest
    'purchase' value at-or-before it per user (functions/asof.py —
    tagged-union + carry-forward window, one shuffle). Oracle: DuckDB's
    native ASOF JOIN."""
    from miso_spark.functions.asof import asof_join

    ev = make_registry(spark, sf_dir).table("t", "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(clicks, purchases, key="user_id", ts="ts", value_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("ts_right").alias("purchase_ts_us"),
        F.round("value_right", 4).alias("purchase_value"),
    )


q(
    "asof_join",
    builder=_b_asof_join,
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
           CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
           ROUND(p.value, 4) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)


def _b_sessionize_native(spark, sf_dir):
    """Built-in session_window over the batch events table — the
    zero-Python, state-store-scalable sessionize (session end = last
    event + gap, half-open merge bound)."""
    from miso_spark.streaming import sessionize_native

    ev = make_registry(spark, sf_dir).table("t", "events")
    out = sessionize_native(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
    )


q(
    "sessionize_native",
    builder=_b_sessionize_native,
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 1800 SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(MAX(ts) + INTERVAL 1800 SECOND) AS BIGINT) AS end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)


q(
    "stream_sessionize",
    builder=_b_stream_sessionize,
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 1800 SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ),
    agg AS (
      SELECT user_id, sid,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events
      FROM s GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(epoch_us(session_start) AS BIGINT) AS start_us,
           CAST(epoch_us(session_end) AS BIGINT) AS end_us,
           n_events
    FROM (SELECT *, MAX(sid) OVER (PARTITION BY user_id) AS last_sid FROM agg)
    WHERE sid < last_sid
    """,
)


#: exact cosine top-10 from vec_id=0 — shared by ann_bruteforce and the
#: exhaustive-probe ANN entry, whose pruning machinery must reproduce
#: it EXACTLY when told to probe everything
_ANN_TOP10_ORACLE = """
    WITH qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0)
    SELECT vec_id AS id,
           ROUND(list_dot_product(embedding::DOUBLE[], q)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q, q))), 4) AS cosine
    FROM embeddings, qv
    ORDER BY cosine DESC, id ASC LIMIT 10
    """


def _b_ann_pruned_verified(spark, sf_dir):
    """Both pruned-ANN paths, exhaustively probed, in one driver row
    (merged the former ann_lsh_verified + ann_ivf_verified so each
    stays inside the driver window):

    - ``lsh``: random-hyperplane LSH probing EVERY bucket
      (num_planes=2, probes=4 = the full flip set) — the bucket
      assignment + multi-probe sequence runs end-to-end and must equal
      exact brute force, a red driver cell if the machinery drops or
      double-counts a bucket.
    - ``ivf``: IVF probing EVERY cell (nprobe = n_cells) — k-means
      assignment + centroid ranking + cell pruning likewise.

    The production configs (more planes / fewer probes, nprobe <
    n_cells) stay recall-tested vs brute force in pytest
    (test_pipeline_ops)."""
    from miso_spark.functions.similarity import ivf_topk, lsh_topk

    emb = _embeddings(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    lsh = lsh_topk(emb, qv, k=10, num_planes=2, probes=4).select(
        F.lit("lsh").alias("method"), "id", "cosine"
    )
    ivf = ivf_topk(emb, qv, k=10, n_cells=8, nprobe=8).select(
        F.lit("ivf").alias("method"), "id", "cosine"
    )
    return lsh.unionByName(ivf)


q(
    "ann_pruned_verified",
    builder=_b_ann_pruned_verified,
    oracle=f"""
    SELECT m.method, t.id, t.cosine
    FROM ({_ANN_TOP10_ORACLE}) t
    CROSS JOIN (SELECT 'lsh' AS method UNION ALL SELECT 'ivf') m
    """,
)


def get(name: str) -> Q:
    return CATALOG[name]
