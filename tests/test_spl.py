"""Expr → SPL translation, mirroring splunk/mod.rs
compile_filter_to_spl (:647-856): search vs where clause selection,
CASE() case-sensitive string search, batched AND splits."""

from __future__ import annotations

from miso_spark.kql import parse_kql
from miso_spark.sources.spl import SplFilter, compile_filter_spl


def filt(cond: str):
    return compile_filter_spl(parse_kql(f"c.t | where {cond}").steps[1].expr)


def test_search_terms():
    assert filt("status == 'active'") == SplFilter(search='status=CASE("active")')
    assert filt("count == 42") == SplFilter(search="count=42")
    assert filt("status != 'err'") == SplFilter(search='status!=CASE("err")')
    assert filt("val > 100") == SplFilter(search="val>100")
    assert filt("val <= 1.5") == SplFilter(search="val<=1.5")
    assert filt("path startswith '/api/'") == SplFilter(search="path=/api/*")
    assert filt("code in (1, 2)") == SplFilter(search="(code=1 OR code=2)")


def test_where_clauses():
    assert filt("exists(user.name)") == SplFilter(where="isnotnull(user.name)")
    assert filt("msg has 'Error'") == SplFilter(where='like(lower(msg), "%error%")')
    assert filt("msg has_cs 'Error'") == SplFilter(where='like(msg, "%Error%")')


def test_and_batches_search_and_where():
    r = filt("a == 1 and msg has 'x'")
    assert r == SplFilter(search="a=1", where='like(lower(msg), "%x%")')
    # all-search AND combines into one term
    assert filt("a == 1 and b == 2") == SplFilter(search="(a=1 AND b=2)")


def test_or_requires_single_kind():
    assert filt("a == 1 or b == 2") == SplFilter(search="(a=1 OR b=2)")
    # search-OR-where mixes into a where combination (mod.rs: any_where)
    r = filt("a == 1 or msg has 'x'")
    assert r.where is not None and "OR" in r.where
    assert filt("not(a == 1)") == SplFilter(search="NOT a=1")


def test_unpushable():
    assert filt("a contains 'x'") is None  # splunk translation has no contains
    assert filt("a + 1 == 2") is None
    assert filt("tags[0] == 'x'") is None


def test_splunk_source_apply_filter():
    from miso_spark.sources.external import SplunkSource

    expr = parse_kql("c.t | where level == 'error'").steps[1].expr
    assert SplunkSource("http://x:1").apply_filter(expr) == SplFilter(
        search='level=CASE("error")'
    )
