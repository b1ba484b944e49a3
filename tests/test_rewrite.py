"""Plan-rewrite passes (miso_spark/rewrite.py).

Parity targets: convert_sort_limit_to_topn.rs, push_limit_into_limit.rs,
push_limit_into_topn.rs, merge_topns.rs, project_propagation.rs and the
frontend distinct lowering (query_to_workflow.rs:146). The end-to-end
observable behavior (which steps a connector absorbs after these
rewrites) is covered by tests/test_connector_cases.py against the
reference's own connector corpus."""

from __future__ import annotations

from miso_spark import plan as P
from miso_spark.exprs import BinOp, Exists, Extract, Field, Lit
from miso_spark.kql import parse_kql
from miso_spark.rewrite import optimize_steps


def opt(q: str) -> tuple:
    return optimize_steps(parse_kql(q).steps)


def kinds(steps) -> list[str]:
    return [type(s).__name__ for s in steps]


def test_sort_take_becomes_topn():
    out = opt("t.c | sort by x desc | take 3")
    assert kinds(out) == ["Scan", "Top"]
    assert out[1] == P.Top((P.Sort("x", "desc", "last"),), 3)


def test_take_take_merges_to_min():
    out = opt("t.c | take 5 | take 3")
    assert out[1] == P.Limit(3)
    out = opt("t.c | take 2 | take 9")
    assert out[1] == P.Limit(2)


def test_topn_take_merges():
    out = opt("t.c | top 5 by x | take 3")
    assert out[1] == P.Top((P.Sort("x", "asc", "last"),), 3)


def test_topn_topn_same_keys_merges_min():
    out = opt("t.c | top 5 by x | top 3 by x")
    assert kinds(out) == ["Scan", "Top"]
    assert out[1].n == 3


def test_topn_topn_different_keys_kept():
    out = opt("t.c | top 5 by x | top 3 by y")
    assert kinds(out) == ["Scan", "Top", "Top"]


def test_distinct_lowers_to_summarize_by(  # query_to_workflow.rs:146
):
    out = opt("t.c | distinct user")
    assert kinds(out) == ["Scan", "SummarizeStep"]
    assert out[1].aggs == ()
    assert [bf.name for bf in out[1].by] == ["user"]


def test_distinct_star_stays_distinct():
    out = opt("t.c | distinct *")
    assert kinds(out) == ["Scan", "Distinct"]


def test_filter_hoists_through_extend():
    out = opt("t.c | extend fw = extract('^(a)', 1, title) | where exists(fw)")
    assert kinds(out) == ["Scan", "Filter", "Extend"]
    f = out[1].expr
    assert isinstance(f, Exists) and isinstance(f.expr, Extract)


def test_filter_hoists_through_project_with_rename():
    out = opt("t.c | project a = b, c | where a > 5")
    assert kinds(out) == ["Scan", "Filter", "Project"]
    assert out[1].expr == BinOp("gt", Field.of("b"), Lit(5))


def test_extend_fuses_into_summarize_by():
    out = opt(
        "t.c | extend fw = extract('^(a)', 1, title)"
        " | summarize c = count() by fw | where exists(fw)"
    )
    assert kinds(out) == ["Scan", "SummarizeStep", "Filter"]
    by = out[1].by
    assert len(by) == 1 and by[0].name == "fw"
    assert isinstance(by[0].expr, Extract)
    # the post-summarize filter still references the output name
    assert out[2].expr == Exists(Field.of("fw"))


def test_extend_fuses_into_summarize_agg_arg():
    out = opt("t.c | extend d = x | summarize m = max(d) by user")
    assert kinds(out) == ["Scan", "SummarizeStep"]
    aggs = dict(out[1].aggs)
    assert aggs["m"] == P.Agg("max", Field.of("x"))


def test_sort_on_computed_column_not_rewritten():
    # Sort.by is a name, not an expression — inlining is impossible,
    # the pass must leave the pipeline alone rather than corrupt it
    out = opt("t.c | extend d = x * 2 | sort by d | take 3")
    assert kinds(out) == ["Scan", "Extend", "Top"]


def test_nested_target_blocks_propagation():
    out = opt("t.c | extend a.b = x | where y > 1")
    assert kinds(out) == ["Scan", "Extend", "Filter"]


def test_literal_definition_drops_from_sort():
    # project a = b, c = 50 | sort by a, c → sort by b (reference
    # example in project_propagation.rs module docs)
    out = opt("t.c | project a = b, c = 50 | sort by a, c | take 2")
    assert kinds(out) == ["Scan", "Top", "Project"]
    assert out[1] == P.Top((P.Sort("b", "asc", "last"),), 2)


def test_union_subplan_recursed():
    out = opt("t.c | union (t.d | sort by x | take 1)")
    assert kinds(out) == ["Scan", "Union"]
    assert kinds(out[1].sub.steps) == ["Scan", "Top"]


def test_noop_on_plain_pipeline():
    steps = parse_kql("t.c | where x > 1 | take 5").steps
    assert optimize_steps(steps) == steps


def test_project_not_moved_past_middle_extend():
    # a restrictive project moved after an extend would drop the
    # extend's output column — the pass must leave this pipeline alone
    out = opt("t.c | project a = b | where a > 1 | extend c = a")
    assert kinds(out) == ["Scan", "Project", "Filter", "Extend"]


def test_simultaneous_binding_substitution():
    # extend fields all evaluate against the INPUT row, so `c = a`
    # reads the input's a — substitution into a later filter preserves
    # that (c > 5 becomes input-a > 5, legal before the extend)
    out = opt("t.c | extend a = b * 2, c = a | where c > 5")
    assert kinds(out) == ["Scan", "Filter", "Extend"]
    assert out[1].expr == BinOp("gt", Field.of("a"), Lit(5))


def test_filter_pushes_into_union_branches():
    # push_steps_into_union.rs: the filter copies into each branch AND
    # moves before the union run
    out = opt("t.a | union (t.b) | where x > 1 | take 5")
    assert kinds(out) == ["Scan", "Filter", "Union", "Limit"]
    assert kinds(out[2].sub.steps) == ["Scan", "Filter"]
    assert out[1] == out[2].sub.steps[1]


def test_project_pushes_into_union_branches():
    out = opt("t.a | union (t.b) | project x")
    assert kinds(out) == ["Scan", "Project", "Union"]
    assert kinds(out[2].sub.steps) == ["Scan", "Project"]


def test_multi_union_run_gets_the_copy():
    out = opt("t.a | union (t.b) | union (t.c) | where x > 1")
    assert kinds(out) == ["Scan", "Filter", "Union", "Union"]
    assert all(kinds(u.sub.steps) == ["Scan", "Filter"] for u in out[2:4])
