"""Generated-pipeline pushdown differential over the wire stubs.

test_connector_cases pins the reference's 42 FIXED shapes; this arm
generalizes the same invariant — pushdown-on == pushdown-off — to
hypothesis-generated pipelines over the stub corpus documents, per
connector. It exists because the fixed corpus has blind spots: the
r11 dcount find (wire cardinality/dc skip docs whose field is
missing while the engine counts the conflated null bucket) sat
exactly in a shape no fixed case exercises. The stack documents are
rich in PARTIALLY-MISSING fields (type/answerId/body exist only on
answers, title/tags/acceptedAnswerId only on questions), so absorbed
filters, aggregations, sorts, and unions all get driven across the
missing-field seam.

Determinism: `take` only generates directly after a sort on
creationDate (unique across the corpus), so the limited row set is
identical no matter which side orders it. Everything else is
multiset-compared.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(__file__))

import connector_corpus as corpus  # noqa: E402

from miso_spark.kql import parse_kql  # noqa: E402

from test_connector_cases import _compilers, _rows, rigs  # noqa: E402,F401

pytestmark = pytest.mark.skipif(
    not os.path.exists(corpus.TEST_CASES_RS),
    reason="reference checkout not present",
)

#: suite-runtime budget (r15, VERDICT r14 #1): these fuzz arms are the
#: suite's longest pole — the pushdown differential alone ran ~5 min
#: BEST case at 25 examples × 3 connectors and blew past pytest.ini's
#: 900 s faulthandler_timeout under host contention, killing the whole
#: run (rc=139). The default budget keeps the worst case on a loaded
#: host well inside the faulthandler; the pinned @example regressions
#: below always run regardless. Set SPARK_GRAFT_FUZZ_EXAMPLES=25 to
#: restore the deep pre-release sweep.
_EXAMPLES = max(1, int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "8")))

#: stack-document fields by class (several PARTIALLY missing)
NUM_FIELDS = ["questionId", "answerId", "acceptedAnswerId"]
STR_FIELDS = ["user", "type", "title"]


@st.composite
def pipelines(draw) -> str:
    steps: list[str] = []
    terminal = False
    expanded = False  # mv-expand duplicates @time → take would be
    # tie-nondeterministic afterwards
    joined = False
    for _ in range(draw(st.integers(min_value=1, max_value=4))):
        if terminal:
            break
        # join is ~3-5× the cost of any other step (dynamic-filter key
        # collection + a second negotiated fetch, per connector, twice)
        # — keep it rare so the 25-example budget stays minutes
        kind = draw(
            st.sampled_from(
                ["where", "where", "project", "sort", "sort", "union",
                 "summarize", "summarize", "count", "join",
                 "mv_expand", "mv_expand"]
            )
        )
        if kind == "join" and (joined or draw(st.integers(0, 2)) != 0):
            kind = "where"
        if kind == "join":
            # exercises the join-feeding scan fetches and the
            # dynamic-filter pushdown of observed join keys; the
            # rename-project right side is connector-REFUSED, so the
            # engine fetches and projects the residual
            k = draw(st.sampled_from(["inner", "left"]))
            steps.append(
                f"join kind={k} (test.stack_mirror"
                " | project mqid = questionId, mty = type)"
                " on $left.questionId == $right.mqid"
            )
            joined = True
            expanded = True  # joins duplicate @time across matches
            continue
        if kind == "mv_expand":
            steps.append("mv-expand tags")
            expanded = True
            continue
        if kind == "where":
            arm = draw(st.sampled_from(["num", "str", "exists", "in"]))
            if arm == "num":
                c = draw(st.sampled_from(NUM_FIELDS))
                op = draw(st.sampled_from([">", "<", ">=", "<=", "==", "!="]))
                lit = draw(st.integers(min_value=0, max_value=20))
                steps.append(f"where {c} {op} {lit}")
            elif arm == "str":
                c = draw(st.sampled_from(STR_FIELDS))
                sop = draw(
                    st.sampled_from(["==", "contains", "startswith", "has"])
                )
                lit = draw(
                    st.sampled_from(["answer", "1", "Calculate", "c#", "9"])
                )
                steps.append(f'where {c} {sop} "{lit}"')
            elif arm == "in":
                c = draw(st.sampled_from(NUM_FIELDS))
                vals = sorted(
                    draw(st.sets(st.integers(0, 20), min_size=1, max_size=3))
                )
                pred = f"{c} in ({', '.join(map(str, vals))})"
                steps.append(
                    f"where not({pred})" if draw(st.booleans())
                    else f"where {pred}"
                )
            else:
                c = draw(st.sampled_from(NUM_FIELDS + STR_FIELDS))
                steps.append(
                    f"where not(exists({c}))" if draw(st.booleans())
                    else f"where exists({c})"
                )
        elif kind == "project":
            keep = sorted(
                draw(
                    st.sets(
                        st.sampled_from(NUM_FIELDS + STR_FIELDS),
                        min_size=1,
                        max_size=4,
                    )
                )
            )
            steps.append("project " + ", ".join(keep))
            terminal = True  # keep the grammar simple past a reshape
        elif kind == "sort":
            # sort the VISIBLE @time name (static_fields maps it to the
            # stored creationDate): referencing the hidden stored name
            # directly is a reference quirk — the wire sorts the stored
            # field while the engine sees only the restored visible
            # name, so absorbed and refused runs legitimately differ
            order = draw(st.sampled_from(["asc", "desc"]))
            steps.append(f"sort by @time {order}")
            if not expanded and draw(st.booleans()):
                # @time is unique across the corpus, so the limited
                # multiset is deterministic — UNLESS an expand/join
                # duplicated timestamps
                steps.append(f"take {draw(st.integers(1, 15))}")
                terminal = True
        elif kind == "union":
            # occasionally a RESULT-SHAPED branch (user-written
            # per-branch aggregate/cap): no engine-side merge copy
            # exists, so negotiation must keep the union engine-side
            # (r11 review find — one merged multi-index request
            # collapsed the union-all's per-branch rows)
            arm = draw(st.integers(0, 5))
            if arm == 0:
                steps.append(
                    "union (test.stack_mirror | summarize n = count())"
                )
                steps.insert(len(steps) - 1, "summarize n = count()")
                terminal = True
            elif arm == 1:
                # deterministic branch cap: top-n by unique @time (a
                # bare branch `take` is an arbitrary subset — the two
                # arms could legally pick different rows)
                n = draw(st.integers(1, 8))
                steps.append(
                    "union (test.stack_mirror"
                    f" | sort by @time asc | take {n})"
                )
            else:
                steps.append("union (test.stack_mirror)")
        elif kind == "summarize":
            c = draw(st.sampled_from(NUM_FIELDS))
            aggs = sorted(
                draw(
                    st.sets(
                        st.sampled_from(["n", "sx", "mx", "av", "dc", "ci"]),
                        min_size=1,
                        max_size=3,
                    )
                )
            )
            frag = []
            for a in aggs:
                frag.append(
                    {
                        "n": "n = count()",
                        "sx": f"sx = sum({c})",
                        "mx": f"mx = max({c})",
                        "av": f"av = avg({c})",
                        "dc": f"dc = dcount({c})",
                        "ci": f"ci = countif(exists({c}))",
                    }[a]
                )
            by = draw(
                st.sampled_from(
                    [None, "type", "user", "questionId", "bin(@time, 1d)",
                     "@time"]
                )
            )
            steps.append(
                "summarize " + ", ".join(frag)
                + (f" by k = {by}" if by else "")
            )
            terminal = True
        else:
            steps.append("count")
            terminal = True
    return "test.stack | " + " | ".join(steps) if steps else "test.stack"


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=pipelines())
# r11 fuzz find, replayed deterministically: a DUPLICATED union branch
# absorbed into one multi-index search returned each mirror document
# once where the engine union-all keeps both copies (apply_union now
# refuses duplicate indexes — pushdown.py / spl.py)
@example(q="test.stack | union (test.stack_mirror) | union (test.stack_mirror)")
# second r11 fuzz find: the union split's engine-side MERGE summarize
# (sum over the per-branch counts) was absorbed ON TOP of the already-
# absorbed per-branch aggregation, overwriting it — the service runs
# one aggregation stage over raw documents and can't compose a second
# (apply_summarize and the other apply_* now refuse once _aggregated)
@example(q="test.stack | union (test.stack_mirror) | summarize n = count()")
# third r11 fuzz find: a RENAMED timestamp group key (`k = bin(@time,
# 1d)`) decoded as raw epoch millis — the datetime restore matched the
# output NAME against the timestamp field instead of the by-expression
# (group_ts_keys now records timestamp-keyed outputs at absorb time)
@example(q="test.stack | summarize n = count() by k = bin(@time, 1d)")
# r12 fuzz find: an absorbed take-1 branch's inferred schema lacked
# answerId; the union's string∪array conflict lift on tags made the
# frames LOOK dynamic-model and the (then-new) one-sided
# missing-semantics lift misfired, turning the main branch's bigint
# into a variant. union_harmonized now tests dynamic-model on the
# INPUT frames, before its own conflict lifts.
@example(q="test.stack | mv-expand tags | sort by @time asc"
           " | union (test.stack_mirror | sort by @time asc | take 1)")
# r13 fuzz find (fixed r14): the absorbed not(exists) filter emptied
# the main branch, so its wire-inferred schema had NO tags column and
# the union saw no string∪array conflict — tags stayed a typed array
# while the engine arm (unfiltered fetch, post-union conflict) lifted
# to VARIANT. The VALUES were identical; the comparator conflated
# encoding with value by rendering VariantVal via default=str.
# _norm_val now decodes variants to what df.toJSON()/the server
# renders, so semantically-equal arms compare equal.
@example(q="test.stack | where not(exists(questionId)) | mv-expand tags"
           " | union (test.stack_mirror)")
@pytest.mark.parametrize("connector", ("Quickwit", "Elastic", "Splunk"))
def test_pushdown_matches_no_pushdown(spark, rigs, connector, q):
    stub, src = rigs[connector]
    push, plain = _compilers(spark, src)
    push_rows = _rows(push.run(parse_kql(q)))
    plain_rows = _rows(plain.run(parse_kql(q)))
    if connector == "Splunk" and any(f"by k = {f}" in q for f in NUM_FIELDS):
        # DOCUMENTED typing erasure (SURVEY §3, pinned in
        # test_spl.py::test_stats_numeric_by_key_typing_erasure):
        # Splunk's schema-on-read wire has no type channel for stats
        # group keys — a numeric-field key comes back a digit string,
        # and value-scanning can't recover it (the corpus's `user` is
        # a digit-STRING field; inference would break it the other
        # way). The reference ships the same strings. Everything BUT
        # the key's type must still match.
        push_rows = _stringify_key(push_rows)
        plain_rows = _stringify_key(plain_rows)
    assert push_rows == plain_rows, (
        f"[{connector}] pushdown changed results for: {q}"
    )


def _stringify_key(rows: list[str]) -> list[str]:
    import json

    out = []
    for r in rows:
        d = json.loads(r)
        if "k" in d and d["k"] is not None:
            v = d["k"]
            if isinstance(v, float) and v == int(v):
                v = int(v)
            d["k"] = str(v)
        out.append(json.dumps(d, sort_keys=True))
    return sorted(out)


# ---------------------------------------------------------------------------
# preview-streaming arm (VERDICT r11 #5): the Splunk partial path —
# generated FULLY-ABSORBED aggregation pipelines run through the real
# preview protocol (RUNNING polls serving a growing results_preview
# prefix, then DONE/results) and the FINAL round must equal the batch
# engine run of the same plan. ES/Quickwit have no preview protocol in
# the reference (enable_partial_stream / query_runner.rs
# poll_with_previews is Splunk-only); their partial story is the
# engine-side run_partial_stream over stream-capable sources, fuzzed in
# test_partial_stream_property.py.


@pytest.fixture(scope="module")
def preview_rig(spark):
    from miso_spark.sources.external import SplunkSource

    from search_stubs import SplunkStub

    docs = corpus.load_resources()
    ts = corpus.TIMESTAMP_FIELDS
    stub = SplunkStub(docs, ts, preview_polls=2)
    src = SplunkSource(stub.url)
    src.static_fields = {idx: {"@time": "_time"} for idx in ts}
    yield stub, src
    stub.shutdown()


def _preview_final_equals_batch(spark, preview_rig, q):
    import json as _json

    from miso_spark.sources.pushdown import negotiate

    from test_connector_cases import _norm_val

    stub, src = preview_rig
    plan = parse_kql(q)
    scan = plan.steps[0]
    handle, residual = negotiate(plan, src.handle(scan.collection), src)
    if len(residual.steps) != 1:
        return  # engine-side residual → the preview path doesn't apply
    if not any(op[0] == "stats" for op in handle.pipeline):
        return  # hit-row previews ship schema-on-read strings by
        # contract (SURVEY §3); the agg shapes are the typed surface
    push, _ = _compilers(spark, src)
    batch = _rows(push.run(parse_kql(q)))
    partials, finals = [], []
    for kind, rid, rows in src.run_job_with_previews(
        handle.build_spl(scan.collection), preview_interval_s=0.0
    ):
        coerced = [src.coerce_stats_row(r, handle) for r in rows]
        (finals if kind == "final" else partials).append((rid, coerced))
    assert len(finals) == 1, f"expected exactly one final round for: {q}"
    got = sorted(
        _json.dumps(
            {k: _norm_val(v) for k, v in r.items() if v is not None},
            sort_keys=True,
            default=str,
        )
        for r in finals[0][1]
    )
    assert got == batch, f"preview final != batch for: {q}"
    # growing-prefix previews: each partial round is a subset of the
    # final multiset (the stub serves prefixes of the finished rows)
    final_set = set(got)
    for rid, rows in partials:
        for r in rows:
            s = _json.dumps(
                {k: _norm_val(v) for k, v in r.items() if v is not None},
                sort_keys=True,
                default=str,
            )
            assert s in final_set, f"partial round {rid} row not in final: {q}"


@settings(
    max_examples=max(1, _EXAMPLES * 4 // 5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=pipelines())
# seed the shapes the preview path exists for: absorbed stats with and
# without group keys, dcount, countif, and a timestamp-binned key
@example(q="test.stack | where questionId > 5"
           " | summarize n = count(), sx = sum(answerId) by k = type")
@example(q="test.stack | summarize dc = dcount(acceptedAnswerId)")
@example(q="test.stack | summarize n = count() by k = bin(@time, 1d)")
@example(q="test.stack | summarize av = avg(questionId),"
           " ci = countif(exists(title)) by k = user")
def test_splunk_preview_final_equals_batch(spark, preview_rig, q):
    _preview_final_equals_batch(spark, preview_rig, q)


# ---------------------------------------------------------------------------
# saved views + query-status over GENERATED pipelines (VERDICT r12 #7):
# `views.<name>` splicing and status upserts were live-tested on fixed
# shapes only


@pytest.fixture(scope="module")
def view_servers(spark, rigs):
    """One socket-less MisoServer per connector rig (never started —
    only the planner surface `_plan` + the shared compiler run)."""
    from miso_spark.server import MisoServer

    servers = {}
    for connector, (stub, src) in rigs.items():
        srv = MisoServer(spark, port=0)
        srv.miso.registry.register("test", src)
        servers[connector] = srv
    yield servers
    for srv in servers.values():
        srv.httpd.server_close()


@settings(
    max_examples=max(1, _EXAMPLES // 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=pipelines())
@example(q="test.stack | where questionId > 5"
           " | summarize n = count(), sx = sum(answerId) by k = type")
@example(q="test.stack | mv-expand tags | sort by @time asc | take 3")
@pytest.mark.parametrize("connector", ("Quickwit", "Elastic", "Splunk"))
def test_view_splice_equals_inline(spark, view_servers, connector, q):
    """A generated pipeline saved as a view and queried through
    `views.<name>` must equal the inline pipeline — including when the
    view is referenced from a union SUB-branch (the recursive splice
    path, query_to_workflow.rs:70)."""
    srv = view_servers[connector]
    srv.views.clear()
    srv.views["v"] = q
    inline = _rows(srv.miso.compiler.run(srv._plan(q)))
    viewed = _rows(srv.miso.compiler.run(srv._plan("views.v")))
    assert viewed == inline, f"[{connector}] views.v != inline for: {q}"
    # referenced from a union sub-branch: both branches are the same
    # pipeline, so the union is the inline result doubled
    doubled = _rows(srv.miso.compiler.run(srv._plan(f"{q} | union (views.v)")))
    assert doubled == sorted(inline + inline), (
        f"[{connector}] union(views.v) != doubled inline for: {q}"
    )


@settings(
    max_examples=max(1, _EXAMPLES // 4),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=pipelines())
@example(q="test.stack | summarize dc = dcount(acceptedAnswerId)")
def test_query_status_upserts_on_generated_pipelines(spark, rigs, q):
    """Every generated pipeline run through the HTTP surface upserts a
    query-status row that lands at `success` with a run time, and the
    history is itself queryable through the engine (query_status.rs
    field names)."""
    import json as _json
    import urllib.request

    from miso_spark.server import MisoServer

    stub, src = rigs["Quickwit"]
    srv = MisoServer(spark, port=0, query_status_collection="mem.qs")
    srv.miso.registry.register("test", src)
    srv.start_background()
    try:
        qid = f"fuzz-{abs(hash(q)) % 10 ** 9}"
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=_json.dumps({"query": q, "query_id": qid}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            frames = resp.read().decode()
        assert "event: done" in frames
        rows = {
            r["id"]: r
            for r in srv.miso.query(
                "mem.qs | project id, status, error, run_time_secs"
            ).collect()
        }
        assert rows[qid]["status"] == "success", (q, rows.get(qid))
        assert rows[qid]["error"] is None
        assert rows[qid]["run_time_secs"] >= 0
    finally:
        srv.shutdown()
