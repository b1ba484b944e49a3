"""Run the REFERENCE's own workflow tests against this engine.

Extracts every simple ``check(query, input, expected)`` triple and
every ``check_multi_collection()`` case straight out of
miso-workflow/src/tests.rs (read at test time — nothing is copied into
this repo; the module skips when the reference checkout is absent) and
executes the query here, comparing JSON row sets.

Two ingest arms mirror the reference's data model split:

- **typed** (default): ``spark.read.json`` schema inference — the
  production path for schema-consistent data. Spark columns are
  single-typed and an absent key conflates with a present null.
- **dynamic** (``VARIANT_INGEST`` cases): Spark 4 VARIANT ingest
  (miso_spark/dynamic.py) — per-row dynamic values with the
  reference's cross-type total order and a real absent-vs-null
  distinction. This is what the reference's interpreter does natively
  (miso-workflow-types/src/value/mod.rs), so the mixed-type and
  missing-vs-null cases run through it.

The VARIANT_INGEST list polices itself in BOTH directions: each listed
case must PASS dynamic and still FAIL typed (otherwise it no longer
needs dynamic ingest and must be delisted), and every unlisted case
must pass typed. As of round 8 every one of the reference's own
simple checks passes on one of the two arms — the exclusion list of
rounds 4-7 is gone.
"""

from __future__ import annotations

import json
import os
import re

import pytest

TESTS_RS = "/root/reference/miso-workflow/src/tests.rs"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TESTS_RS),
    reason="reference checkout not present",
)

#: name → why this case needs per-row dynamic (VARIANT) ingest; the
#: typed arm MUST still fail each of these (checked below) so the list
#: can't absorb cases the typed model learns to handle
VARIANT_INGEST = {
    # per-row mixed types in one column (read.json infers one type)
    "filter_eq_bool": "column holds 5 and true in different rows",
    "filter_eq_fields": "column holds 1 and '33' in different rows",
    "filter_eq_not_fields": "mixed numeric/string/bool column",
    "filter_not_eq_fields": "mixed numeric/string column",
    "expand_array": "array column holds [10,20] and ['a','b'] rows",
    "comparison_cross_type": "column holds 5, '5', 5.0 and true",
    "filter_starts_with_on_object": "column is string in some rows, object in others",
    "filter_exists_on_object": "column is string in some rows, object in others",
    # absent key vs present null (typed rows conflate; variant keeps
    # SQL NULL = missing, variant-null = present Value::Null)
    "filter_eq_null": "rows MISSING the key must not match == null",
    "filter_ne": "missing-key rows must be filtered, present values keep total order",
    "filter_lt": "missing-key rows must be filtered",
    "filter_lte": "missing-key rows must be filtered",
    "filter_exists_null": "exists() must see a present-but-null key",
    # schema-on-read loses empty structures; variant keeps {}
    "expand_empty_object": "read.json drops an always-empty object column",
    "expand_object_array_kind_empty": "read.json drops an always-empty object column",
}


def _extract_simple():
    src = open(TESTS_RS).read()
    out = []
    for body in re.split(r"async fn ", src)[1:]:
        name = body.split("(")[0]
        m = re.search(
            r'check\(\s*r#"(.*?)"#\s*,\s*r#"(.*?)"#\s*,\s*r#"(.*?)"#\s*,?\s*\)',
            body, re.S)
        if not m:
            continue
        q, inp, exp = m.groups()
        if not re.match(r"\s*test\.\w+", q):
            continue  # let-prefixed queries go through the corpus tests
        try:
            json.loads(inp), json.loads(exp)
        except ValueError:
            continue
        out.append((name, q, {re.match(r"\s*test\.(\w+)", q).group(1): inp}, exp))
    return out


def _extract_multi():
    src = open(TESTS_RS).read()
    out = []
    for body in re.split(r"async fn ", src)[1:]:
        name = body.split("(")[0]
        if "check_multi_collection()" not in body:
            continue
        m = re.search(r'\.query\(\s*r#"(.*?)"#\s*\)', body, re.S)
        im = re.search(r"\.input\(\s*btreemap!\s*\{(.*?)\}\s*\)", body, re.S)
        em = re.search(r'\.expect\(\s*r#"(.*?)"#\s*,?\s*\)', body, re.S)
        if not (m and im and em):
            continue
        colls = dict(re.findall(r'"(\w+)"\s*=>\s*r#"(.*?)"#', im.group(1), re.S))
        try:
            [json.loads(v) for v in colls.values()], json.loads(em.group(1))
        except ValueError:
            continue
        out.append((name, m.group(1), colls, em.group(1)))
    return out


def _norm(v):
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return int(v)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def _run_case(spark, query, collections, expected, dynamic=False):
    from pyspark.sql.types import StructType

    from miso_spark import dynamic as dyn
    from miso_spark.api import MisoSpark
    from miso_spark.sources import MemorySource

    m = MisoSpark(spark)
    mem = MemorySource()
    for cname, cjson in collections.items():
        rows = json.loads(cjson)
        if dynamic:
            df = dyn.ingest_json_dynamic(spark, rows)
        elif not rows:
            # schema-less empty input: a zero-column, zero-row table
            # (the reference's empty collection)
            df = spark.createDataFrame([], StructType([]))
        else:
            rdd = spark.sparkContext.parallelize([json.dumps(r) for r in rows])
            df = spark.read.json(rdd)
        mem.put(cname, df)
    m.registry.register("test", mem)
    got = [json.loads(s) for s in m.query(query).toJSON().collect()]
    exp = json.loads(expected)
    ordered = any(k in query for k in ("sort", "top"))
    gn = [json.dumps(_norm(r), sort_keys=True) for r in got]
    en = [json.dumps(_norm(r), sort_keys=True) for r in exp]
    if not ordered:
        gn, en = sorted(gn), sorted(en)
    return gn == en


def test_reference_simple_checks(spark):
    cases = _extract_simple()
    assert len(cases) > 100, "extraction broke — far fewer cases than expected"
    failed, passed = [], 0
    for name, q, colls, exp in cases:
        try:
            ok = _run_case(spark, q, colls, exp, dynamic=name in VARIANT_INGEST)
        except Exception:
            ok = False
        if ok:
            passed += 1
        else:
            failed.append(name)
    assert not failed, f"reference tests diverged: {failed}"
    assert passed == len(cases)


def test_variant_ingest_list_is_minimal(spark):
    """Each VARIANT_INGEST case must still FAIL on the typed arm —
    otherwise it no longer needs dynamic ingest and belongs in the
    default set (the list must shrink, never silently absorb)."""
    cases = {n: (q, c, e) for n, q, c, e in _extract_simple()}
    missing = [n for n in VARIANT_INGEST if n not in cases]
    assert not missing, f"VARIANT_INGEST names not in reference suite: {missing}"
    typed_passing = []
    for name in VARIANT_INGEST:
        q, colls, exp = cases[name]
        try:
            ok = _run_case(spark, q, colls, exp, dynamic=False)
        except Exception:
            ok = False
        if ok:
            typed_passing.append(name)
    assert not typed_passing, (
        f"typed arm now passes — remove from VARIANT_INGEST: {typed_passing}"
    )


def test_reference_simple_checks_all_dynamic(spark):
    """The ENTIRE simple suite must also pass under dynamic (VARIANT)
    ingest — not just the VARIANT_INGEST-routed cases. Both data
    models satisfy the reference's own tests: the typed arm for
    schema-consistent data, the dynamic arm for per-row mixed types
    (it subsumes the typed semantics on uniform inputs)."""
    cases = _extract_simple()
    failed = []
    for name, q, colls, exp in cases:
        try:
            ok = _run_case(spark, q, colls, exp, dynamic=True)
        except Exception:
            ok = False
        if not ok:
            failed.append(name)
    assert not failed, f"dynamic arm diverged from reference tests: {failed}"


@pytest.mark.parametrize("dynamic", [False, True], ids=["typed", "dynamic"])
def test_reference_multi_collection_checks(spark, dynamic):
    """Joins/unions across collections pass on BOTH ingest arms —
    dynamic join keys match by canonical value, empty collections are
    zero-column tables either way."""
    cases = _extract_multi()
    assert len(cases) >= 10
    failed = []
    for name, q, colls, exp in cases:
        try:
            ok = _run_case(spark, q, colls, exp, dynamic=dynamic)
        except Exception:
            ok = False
        if not ok:
            failed.append(name)
    assert not failed, f"multi-collection reference tests diverged: {failed}"
