"""Property-based partial-stream soundness.

The fixed-shape partial_stream tests (test_server.py, test_streaming)
pin the reference's partial_stream_* corpus; this arm generalizes the
core invariant — the FINAL partial round equals the batch answer for
the same data — to hypothesis-generated pipelines over the same
generator the rewrite-soundness suites use (test_rewrite_property).
Plans the classifier does not support (no aggregate/top/limit tail)
are skipped per-example; supported ones run a real availableNow file
stream through ``run_partial_stream`` and diff the final emit against
``Compiler.run`` on identical parquet data.

Parity anchor: miso-workflow/src/partial_stream.rs (the final round is
the exact query answer, tests.rs partial_stream_* family).
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, example, given, settings

from miso_spark import plan as P
from miso_spark.compiler import Compiler
from miso_spark.kql import parse_kql
from miso_spark.sources import ParquetDirSource, SourceRegistry
from miso_spark.streaming.partial import (
    plan_supports_partial_stream,
    run_partial_stream,
)

from test_rewrite_property import A_ROWS, B_ROWS, pipelines  # noqa: E402


@pytest.fixture(scope="module")
def rig(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("pstream")
    a = spark.createDataFrame(
        A_ROWS, "id long, x long, y double, s string, g string"
    )
    b = spark.createDataFrame(B_ROWS, "id long, x long, t string")
    # multiple files per collection → multiple stream triggers, so the
    # final state genuinely accumulates across rounds
    a.repartition(3).write.parquet(str(base / "a.parquet"))
    b.repartition(2).write.parquet(str(base / "b.parquet"))
    src = ParquetDirSource(str(base))
    return Compiler(SourceRegistry(spark).register("m", src))


def _canon(json_rows) -> list[str]:
    out = []
    for r in json_rows:
        d = json.loads(r) if isinstance(r, str) else r
        d = {
            k: (round(v, 6) if isinstance(v, float) else v)
            for k, v in d.items()
            if v is not None
        }
        out.append(json.dumps(d, sort_keys=True, default=str))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(q=pipelines())
# seed the three classifier modes: complete-mode aggregate, top/limit
# tail, and a multi-union head feeding an aggregate
@example(q="m.a | summarize n = count(), sx = sum(x) by g")
@example(q="m.a | sort by g asc, id asc, s asc, x asc, y asc | take 7")
@example(q="m.a | union (m.b) | summarize n = count() by x")
# r11 property find: the `distinct` lowering (agg-less summarize)
# compiled to streaming DEDUP, which complete mode rejects — the
# partial tail now compiles it as a grouped count with the helper
# column dropped (partial.py)
@example(q="m.a | distinct id")
@example(q="m.a | distinct g, id, s")
# r11: exact dcount can't stream directly (Spark refuses distinct
# aggs on streams) — the partial tail streams the union-split's
# null-keeping PARTIAL and finishes (merge + post) per batch
@example(q="m.a | summarize dc = dcount(x) by g")
@example(q="m.a | summarize dc = dcount(x), n = count(), av = avg(y)")
@example(q="m.a | union (m.b) | summarize dc = dcount(x), av = avg(x) by g")
def test_partial_final_round_equals_batch(rig, q):
    _assert_partial_equals_batch(rig, q)


def _assert_partial_equals_batch(rig, q):
    plan = parse_kql(q)
    if not plan_supports_partial_stream(plan, rig.registry):
        return
    batch = _canon(rig.run(plan).toJSON().collect())
    finals: list[list[str]] = []

    def emit(round_id, rows, is_final):
        if is_final:
            finals.append(list(rows))

    run_partial_stream(rig, plan, emit, debounce_s=0.0)
    assert finals, f"no final round emitted for: {q}"
    got = _canon(finals[-1])
    assert got == batch, f"partial final != batch for: {q}"


def test_partial_stream_over_dynamic_collection(spark, tmp_path):
    """r11: JsonDynamicDirSource.stream_table makes VARIANT
    collections partial-streamable — dcount over a dynamic column
    streams via the split partial (canonical-value grouping on the
    stream), distinct via the grouped-count shim; finals == batch."""
    rows = [{"k": i % 3, "v": i} if i % 5 else {"v": i} for i in range(60)]
    coll = tmp_path / "ev.jsonl"
    coll.mkdir()
    for part in range(3):
        with open(coll / f"p{part}.jsonl", "w") as f:
            for r in rows[part * 20:(part + 1) * 20]:
                f.write(json.dumps(r) + "\n")
    from miso_spark.sources import JsonDynamicDirSource

    rig = Compiler(
        SourceRegistry(spark).register("d", JsonDynamicDirSource(str(tmp_path)))
    )
    for q in (
        "d.ev | summarize dc = dcount(v), n = count() by k",
        "d.ev | distinct k",
        "d.ev | where v > 10 | summarize n = count()",
        # r12: dcount over a CAST arg (missing-as-null) — the streamed
        # split's merge must skip the preserved null group like batch
        # (the group-key metadata tag carries the semantics through
        # the partial)
        "d.ev | extend v2 = toint(v) | summarize dc = dcount(v2), n = count() by k",
        # append-mode tail over VARIANT columns: the bounded
        # accumulator re-creates a DataFrame from collected rows
        # holding VariantVals each round (probed in r12 — pinned so
        # the round-trip can't silently regress)
        "d.ev | sort by v asc, k asc | take 5",
    ):
        _assert_partial_equals_batch(rig, q)
