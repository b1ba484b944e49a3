"""Dynamic-typed (VARIANT) ingest + expression semantics.

The reference's data model is per-row dynamic: one column may hold
``5``, ``"5"`` and ``true`` in different rows, and a row that is
MISSING a key is distinct from a row holding an explicit JSON ``null``
(miso-workflow-types/src/value/mod.rs Value enum;
miso-workflow/src/interpreter/mod.rs Val(Option<Value>)). Spark's
typed rows conflate both, which is the one place the reference's own
test suite historically beat this engine (SURVEY.md §3).

Spark 4's VARIANT type closes the gap natively:

- each ingested top-level key becomes a VARIANT column;
- a MISSING key is SQL NULL (``Val::not_exist()``), while a present
  JSON null is a non-NULL variant whose ``is_variant_null`` is true
  (``Value::Null``) — the absent-vs-null distinction survives;
- per-row type tags come from ``schema_of_variant``, so the
  reference's cross-type total order (value/mod.rs:147: Null < Bool <
  numbers < ... < String < Array < Object, numerics comparable across
  Int/UInt/Float) compiles to pure JVM conditional expressions.

Everything here is built-in variant expressions — no UDFs, no
shuffles; at 100 TB these run inside whole-stage codegen exactly like
the typed path, and Parquet stores VARIANT natively (shredded columns
in Spark 4), so scans still prune.

Known best-effort divergences (none observable in the reference's own
suite): array/object ORDERING compares canonical JSON strings rather
than recursing the total order element-wise (equality is exact — both
sides canonicalize through parse_json); integers beyond 2^53 compare
as doubles unless both sides are BIGINT.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: reference total-order rank (value/mod.rs:147-207). Timestamp(3) and
#: Timespan(4) keep their slots but never arise from JSON ingest.
RANK_NULL, RANK_BOOL, RANK_NUM, RANK_STRING, RANK_ARRAY, RANK_OBJECT = (
    0, 1, 2, 5, 6, 7,
)

_NUM_TYPES = ("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")


import re as _re

#: keys addressable through a variant JSON path without quoting; other
#: keys would need a bracket syntax Spark's path grammar doesn't offer
_KEY_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")

#: hard cap on key discovery (`keys=None`): more distinct top-level
#: keys than this raises instead of collecting — one VARIANT column per
#: key stops being a schema and starts being a transposed row store
MAX_DISCOVERED_KEYS = 1000


def _dynamic_columns(
    df: DataFrame, raw_col: str, keys: list[str] | None
) -> DataFrame:
    """Shared tail of the dynamic ingests: raw JSON text column → one
    VARIANT column per top-level key."""
    # try_parse_json + filter: one blank or malformed line (common in
    # hand-edited / concatenated .jsonl) must not abort every query —
    # such lines drop, like the typed spark.read.json path tolerates
    # them. Valid-but-non-OBJECT lines (a bare scalar or array) drop
    # too: they carry no keys, and keeping them would inject phantom
    # all-missing rows that discovery (json_object_keys = NULL for
    # non-objects) never saw. An empty object {} is a legitimate row.
    pj = F.try_parse_json(F.col(raw_col))
    df = df.filter(
        pj.isNotNull() & F.json_object_keys(F.col(raw_col)).isNotNull()
    )
    if keys is None:
        # discovery collect is bounded by DISTINCT top-level keys, and
        # hard-capped: a corpus with per-row synthetic keys (request-id
        # -as-key logs) would otherwise stream an unbounded distinct
        # set into the driver. Over the cap we error and point at
        # `keys=` — same degrade-don't-collect posture as the dynamic
        # filter's _collect_join_keys bound (compiler.py:762).
        rows = (
            df.select(F.explode(F.json_object_keys(raw_col)).alias("k"))
            .distinct()
            .limit(MAX_DISCOVERED_KEYS + 1)
            .collect()
        )
        if len(rows) > MAX_DISCOVERED_KEYS:
            raise ValueError(
                f"dynamic ingest: more than {MAX_DISCOVERED_KEYS} distinct "
                f"top-level keys discovered — this data shape (per-row "
                f"synthetic keys?) would explode into one VARIANT column "
                f"per key; pass keys=[...] with the columns you need"
            )
        keys = sorted(r["k"] for r in rows)
    bad = [k for k in keys if not _KEY_RE.match(k)]
    if bad:
        raise ValueError(
            f"dynamic ingest: keys not addressable as JSON path "
            f"identifiers: {bad!r}"
        )
    return df.select(
        *[F.try_variant_get(pj, f"$.{k}", "variant").alias(k) for k in keys]
    )


def ingest_json_dynamic(
    spark: SparkSession, rows: list, keys: list[str] | None = None
) -> DataFrame:
    """Ingest JSON objects with one VARIANT column per top-level key.

    ``rows`` is a list of dicts (or JSON-object strings). When ``keys``
    is None they are discovered with one distinct pass over
    ``json_object_keys`` — bounded by the number of DISTINCT keys, not
    rows; a 100 TB caller passes ``keys`` explicitly and the whole
    ingest is a single scan-side projection.
    """
    if not rows:
        return spark.createDataFrame([], StructType([]))
    lines = [r if isinstance(r, str) else json.dumps(r) for r in rows]
    df = spark.createDataFrame([(ln,) for ln in lines], ["__raw"])
    return _dynamic_columns(df, "__raw", keys)


def read_json_dynamic_stream(
    spark: SparkSession,
    path: str,
    keys: list[str],
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming dynamic ingest: a text file-stream over a
    directory of JSON-lines files, each top-level key a VARIANT column
    — dynamic filters/projections then run per micro-batch with the
    same semantics as the batch path. ``keys`` is REQUIRED (streams
    can't run the discovery aggregation up front); blank/malformed
    lines drop, like the batch ingest."""
    if not keys:
        raise ValueError("streaming dynamic ingest requires explicit keys")
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _dynamic_columns(reader.text(path), "value", keys)


def read_json_dynamic(
    spark: SparkSession, path: str, keys: list[str] | None = None
) -> DataFrame:
    """Distributed dynamic ingest from JSON-lines files: splittable
    text scan → ``parse_json`` → one VARIANT column per top-level key.
    The production counterpart of :func:`ingest_json_dynamic` — rows
    never touch the driver. With ``keys=None`` discovery is one
    distinct aggregation over ``json_object_keys`` (map-side partial,
    result bounded by the number of DISTINCT keys); at 100 TB pass
    ``keys`` explicitly and ingest is a pure scan-side projection with
    no extra pass."""
    return _dynamic_columns(spark.read.text(path), "value", keys)


def variant_lit(value: object) -> Column:
    """A literal as a present dynamic value (``Expr::Literal`` →
    ``Val::borrowed`` — note a literal ``null`` is a PRESENT
    ``Value::Null``, not a missing operand: tests.rs filter_eq_null)."""
    return F.parse_json(F.lit(json.dumps(value)))


def wrap_variant(c: Column) -> Column:
    """Lift a typed Column into a variant. A SQL NULL input comes back
    as SQL NULL (missing), matching the reference's propagation of
    missing operands through ``Val``-producing sub-expressions."""
    return F.try_variant_get(
        F.parse_json(F.to_json(F.struct(c.alias("v")))), "$.v", "variant"
    )


def vclass(v: Column) -> Column:
    """Type-class rank per the reference total order; SQL NULL
    (missing) stays NULL."""
    sch = F.schema_of_variant(v)
    return (
        F.when(v.isNull(), F.lit(None).cast("int"))
        .when(sch == "VOID", F.lit(RANK_NULL))
        .when(sch == "BOOLEAN", F.lit(RANK_BOOL))
        .when(
            sch.isin(*_NUM_TYPES) | sch.startswith("DECIMAL"),
            F.lit(RANK_NUM),
        )
        .when(sch == "STRING", F.lit(RANK_STRING))
        .when(sch.startswith("ARRAY"), F.lit(RANK_ARRAY))
        .otherwise(F.lit(RANK_OBJECT))
    )


def as_string(v: Column) -> Column:
    """The string payload when the value IS a string, else NULL. (The
    reference bails on non-string operands to string ops,
    interpreter/mod.rs:32-50 impl_two_strs_fn; a vectorized engine
    can't abort per-row, so non-strings evaluate as missing instead.)"""
    return F.when(
        F.schema_of_variant(v) == "STRING", F.try_variant_get(v, "$", "string")
    )


def as_number(v: Column) -> Column:
    """Numeric payload as double when numeric-classed, else NULL."""
    sch = F.schema_of_variant(v)
    return F.when(
        sch.isin(*_NUM_TYPES) | sch.startswith("DECIMAL"),
        F.try_variant_get(v, "$", "double"),
    )


def as_array(v: Column) -> Column:
    """``array<variant>`` payload for array-classed values, else NULL."""
    return F.try_variant_get(v, "$", "array<variant>")


def as_object_map(v: Column) -> Column:
    """``map<string, variant>`` payload for object-classed values,
    else NULL (``try_cast`` — non-objects don't error)."""
    return v.try_cast("map<string,variant>")


def vbool(v: Column) -> Column:
    """``Value::to_bool`` (value/mod.rs:479): null→false, bool as-is,
    numbers ≠0, strings/arrays/objects non-empty. Missing stays NULL so
    ``Not``/``And``/``Or`` propagate not-exist (expr_eval.rs
    eval_to_bool!). Gates reference ONE schema expression (see
    :func:`sort_key` for why — class-chain duplication costs ~2× on
    filter-bound scans)."""
    sch = F.schema_of_variant(v)
    return (
        F.when(v.isNull(), F.lit(None).cast("boolean"))
        .when(sch == "VOID", F.lit(False))
        .when(sch == "BOOLEAN", F.try_variant_get(v, "$", "boolean"))
        .when(
            sch.isin(*_NUM_TYPES) | sch.startswith("DECIMAL"),
            F.try_variant_get(v, "$", "double") != 0.0,
        )
        .when(sch == "STRING", F.length(F.try_variant_get(v, "$", "string")) > 0)
        .when(sch.startswith("ARRAY"), F.size(as_array(v)) > 0)
        .otherwise(F.size(F.map_keys(as_object_map(v))) > 0)
    )


# ---------------------------------------------------------------------------
# comparisons
#
# Rather than a per-class when-chain at every comparison site (which
# duplicates schema_of_variant dozens of times and blows whole-stage
# codegen past Janino's method limit), each operand compiles ONCE into
# an orderable struct ``(rank, num, str, json)``. Spark compares
# structs lexicographically, so cross-class comparisons resolve on
# ``rank`` — exactly the reference total order — and same-class ones
# fall through to the payload slot (the other classes' slots hold
# constant zero values on both sides). A missing operand keys to NULL,
# and NULL struct comparisons are SQL-unknown, which is precisely
# impl_cmp's ``(None, _) => Ok(None)`` arm.


def sort_key(v: Column) -> Column:
    """Orderable total-order key for a VARIANT column (NULL when the
    value is missing). Bool payloads ride the num slot (false=0<true=1,
    matching bool::cmp).

    Built from ONE ``schema_of_variant`` expression with per-slot
    gates referencing it directly — routing each slot through
    :func:`vclass` would duplicate the whole class when-chain per slot
    (~25 schemaOfVariant evaluations per row when whole-stage codegen
    can't CSE them; measured ~2× slower on a filter-bound scan)."""
    sch = F.schema_of_variant(v)
    is_bool = sch == "BOOLEAN"
    is_num = sch.isin(*_NUM_TYPES) | sch.startswith("DECIMAL")
    is_str = sch == "STRING"
    rank = (
        F.when(sch == "VOID", F.lit(RANK_NULL))
        .when(is_bool, F.lit(RANK_BOOL))
        .when(is_num, F.lit(RANK_NUM))
        .when(is_str, F.lit(RANK_STRING))
        .when(sch.startswith("ARRAY"), F.lit(RANK_ARRAY))
        .otherwise(F.lit(RANK_OBJECT))
    )
    num = (
        F.when(is_bool, F.try_variant_get(v, "$", "boolean").cast("double"))
        .when(is_num, F.try_variant_get(v, "$", "double"))
    )
    s = F.when(is_str, F.try_variant_get(v, "$", "string"))
    j = F.when(
        ~(is_bool | is_num | is_str | (sch == "VOID")), F.to_json(v)
    )
    return F.when(
        v.isNotNull(),
        F.struct(
            rank.alias("r"),
            F.coalesce(num, F.lit(0.0)).alias("n"),
            F.coalesce(s, F.lit("")).alias("s"),
            F.coalesce(j, F.lit("")).alias("j"),
        ),
    )


def order_by_key(v: Column) -> Column:
    """Key for the SORT/TOP operators — distinct from comparison
    semantics: the reference's sort and topn place a present
    ``Value::Null`` according to the nulls first/last directive
    TOGETHER with missing values (sort.rs builds arrow nulls for
    Value::Null; topn.rs cmp_logs applies NullsOrder to it; tests.rs
    sort_nulls_order), whereas comparisons/min/max treat Null as the
    smallest present value. So both missing and variant-null key to
    SQL NULL here and Spark's asc/desc_nulls_first/last places them."""
    return F.when(~F.is_variant_null(v), sort_key(v))


def literal_sort_key(value: object) -> Column:
    """``sort_key`` of a Python literal, folded at compile time — a
    comparison against a literal costs one constant struct. A ``None``
    literal is a PRESENT ``Value::Null`` (rank 0), never a missing
    operand (tests.rs filter_eq_null)."""
    if value is None:
        rank, num, s, j = RANK_NULL, 0.0, "", ""
    elif isinstance(value, bool):
        rank, num, s, j = RANK_BOOL, float(value), "", ""
    elif isinstance(value, (int, float)):
        rank, num, s, j = RANK_NUM, float(value), "", ""
    elif isinstance(value, str):
        rank, num, s, j = RANK_STRING, 0.0, value, ""
    else:
        # array/object literals canonicalize through the same variant
        # machinery the column side uses, so the json slots agree
        return sort_key(variant_lit(value))
    return F.struct(
        F.lit(rank).alias("r"), F.lit(num).alias("n"),
        F.lit(s).alias("s"), F.lit(j).alias("j"),
    )


def bool_sort_key(b: Column) -> Column:
    """``sort_key`` of an already-boolean Column (e.g. a compiled
    ``not(...)``); NULL input stays NULL (missing propagates)."""
    return F.when(
        b.isNotNull(),
        F.struct(
            F.lit(RANK_BOOL).alias("r"), b.cast("double").alias("n"),
            F.lit("").alias("s"), F.lit("").alias("j"),
        ),
    )


def with_variant_field(obj: Column, key: str, val: Column) -> Column:
    """A copy of variant object ``obj`` with ``key`` set to variant
    ``val`` (replacing any existing entry). NULL/non-object ``obj``
    yields NULL."""
    m = obj.try_cast("map<string,variant>")
    merged = F.map_concat(
        F.map_filter(m, lambda k, _: k != key),
        F.create_map(F.lit(key), val),
    )
    return F.parse_json(F.to_json(merged))


def set_variant_path(v: Column, segs: list[str], leaf: Column) -> Column:
    """Rebuild dynamic value ``v`` with the nested path ``segs``
    replaced by ``leaf`` — the write-back half of mv-expand over a
    nested dynamic path (expand.rs insert_field_value). Intermediate
    non-objects/missing levels yield NULL (callers guard passthrough
    rows before writing)."""
    if not segs:
        return leaf
    child = F.try_variant_get(v, f"$.{segs[0]}", "variant")
    return with_variant_field(v, segs[0], set_variant_path(child, segs[1:], leaf))


def varithmetic(op: str, l: Column, r: Column) -> Column:
    """Value arithmetic with the reference's per-row typing
    (interpreter/mod.rs:234-306 impl_op + the String arm of add):

    - ``string + string`` concatenates (``Value::String``);
    - integer ⊕ integer keeps integers for ``+ - *`` (``Int``/``UInt``
      arms — JSON longs are BIGINT variants);
    - any float operand — or division — computes as double
      (``5.0`` parses as a decimal variant, i.e. the reference's
      ``Float``);
    - a missing operand propagates as missing;
    - combinations the reference ABORTS the query on (bool + int,
      string * string, ...) evaluate as missing instead — a vectorized
      plan can't abort per-row.

    The result is a VARIANT column, since the output type is decided
    per row."""
    if op not in ("add", "sub", "mul", "div"):
        raise ValueError(f"unknown arithmetic op {op}")
    # single-schema gates per operand (see sort_key) — as_number /
    # as_string would re-derive their own class checks per use
    ls, rs = F.schema_of_variant(l), F.schema_of_variant(r)
    l_num = F.when(
        ls.isin(*_NUM_TYPES) | ls.startswith("DECIMAL"),
        F.try_variant_get(l, "$", "double"),
    )
    r_num = F.when(
        rs.isin(*_NUM_TYPES) | rs.startswith("DECIMAL"),
        F.try_variant_get(r, "$", "double"),
    )
    num = {
        "add": l_num + r_num, "sub": l_num - r_num,
        "mul": l_num * r_num, "div": l_num / r_num,
    }[op]
    out = F.when(
        F.lit(op == "add") & (ls == "STRING") & (rs == "STRING"),
        wrap_variant(F.concat(
            F.try_variant_get(l, "$", "string"),
            F.try_variant_get(r, "$", "string"),
        )),
    )
    if op != "div":
        li = F.try_variant_get(l, "$", "bigint")
        ri = F.try_variant_get(r, "$", "bigint")
        iop = {"add": li + ri, "sub": li - ri, "mul": li * ri}[op]
        out = out.when(
            (ls == "BIGINT") & (rs == "BIGINT"), wrap_variant(iop)
        )
    return out.otherwise(wrap_variant(num))


#: comparison op name → predicate over two sort keys
_CMP_PRED = {
    "eq": lambda l, r: l == r,
    "ne": lambda l, r: l != r,
    "gt": lambda l, r: l > r,
    "gte": lambda l, r: l >= r,
    "lt": lambda l, r: l < r,
    "lte": lambda l, r: l <= r,
}


def vcompare(op: str, lk: Column, rk: Column) -> Column:
    """Boolean comparison over two sort keys with reference semantics;
    a missing operand (NULL key) makes the result SQL-unknown — the
    row is filtered and ``not()`` stays unknown (interpreter/mod.rs
    impl_cmp)."""
    return _CMP_PRED[op](lk, rk)


def vcompare_literal(op: str, v: Column, value: object) -> Column | None:
    """``vcompare`` fast path for ``<variant> <op> <scalar literal>``:
    the literal fixes its class, so the cross-type total order
    decomposes into ONE class-rank test plus ONE typed payload
    comparison — same truth table as comparing full sort keys
    (the literal's key has zero-default num/str/json slots, so the
    lexicographic struct comparison reduces to: same class → payload
    comparison; different class → rank comparison), but without
    building the 4-slot struct or ever rendering ``to_json``. Returns
    None for literal classes without a fast path (arrays/objects) —
    the caller falls back to full sort keys.

    Missing input stays SQL-unknown, like vcompare."""
    if isinstance(value, bool):
        lrank = RANK_BOOL

        def payload(vv):
            return F.try_variant_get(vv, "$", "boolean").cast("double")

        lpay = F.lit(1.0 if value else 0.0)
    elif isinstance(value, (int, float)):
        lrank = RANK_NUM

        def payload(vv):
            return F.try_variant_get(vv, "$", "double")

        lpay = F.lit(float(value))
    elif isinstance(value, str):
        lrank = RANK_STRING

        def payload(vv):
            return F.try_variant_get(vv, "$", "string")

        lpay = F.lit(value)
    elif value is None:
        lrank = RANK_NULL
        payload = None
        lpay = None
    else:
        return None

    if payload is None:  # null literal: same class ⇒ equal values
        same_result = F.lit(op in ("eq", "gte", "lte"))
    else:
        same_result = _CMP_PRED[op](payload(v), lpay)

    # every different-class branch folds to a CONSTANT at compile time
    # (rank vs rank is known here) — only the literal's own class reads
    # row data, so the whole filter is one schema_of_variant dispatch
    # plus one typed payload comparison
    def const(crank) -> Column:
        py = {"eq": crank == lrank, "ne": crank != lrank,
              "gt": crank > lrank, "gte": crank >= lrank,
              "lt": crank < lrank, "lte": crank <= lrank}[op]
        return F.lit(py)

    sch = F.schema_of_variant(v)
    is_num = sch.isin(*_NUM_TYPES) | sch.startswith("DECIMAL")
    by_class = (
        F.when(sch == "VOID",
               same_result if lrank == RANK_NULL else const(RANK_NULL))
        .when(sch == "BOOLEAN",
              same_result if lrank == RANK_BOOL else const(RANK_BOOL))
        .when(is_num, same_result if lrank == RANK_NUM else const(RANK_NUM))
        .when(sch == "STRING",
              same_result if lrank == RANK_STRING else const(RANK_STRING))
        .when(sch.startswith("ARRAY"), const(RANK_ARRAY))
        .otherwise(const(RANK_OBJECT))
    )
    return F.when(v.isNotNull(), by_class)
