"""Progressive partial results for long-running aggregation queries.

Parity: miso-workflow/src/partial_stream.rs — while a query runs, the
engine periodically emits the aggregation's *current state*, tagged
with an incrementing partial-stream id plus a per-round done marker
(PARTIAL_STREAM_ID_FIELD_NAME / PARTIAL_STREAM_DONE_FIELD_NAME), with
debouncing so rounds aren't flooded; the final exact rows follow.

Spark-first mapping: the same logical plan is compiled against a
*file-stream* scan (``maxFilesPerTrigger=1``) and executed as a
Structured Streaming query in **complete** output mode — each
micro-batch materializes exactly "the aggregation's current state over
everything read so far", which is what the reference's ``get_partial``
returns. ``foreachBatch`` forwards every round to the caller;
``availableNow`` drains the input and terminates, after which the last
round is the exact final answer (same plan, all data).
"""

from __future__ import annotations

import time
from typing import Callable

from miso_spark import plan as P

#: metadata field names, matching partial_stream.rs:33-34
METADATA_FIELD = "_miso_metadata"
PARTIAL_ID_FIELD = "id"
PARTIAL_DONE_FIELD = "done"

#: plan steps that compile unchanged onto a streaming scan in complete
#: mode (no sorts/limits/joins — same scope the reference's
#: get_partial-capable operator chain covers for aggregations)
_STREAMABLE_MID_STEPS = (P.Filter, P.Project, P.Extend, P.Rename, P.Expand)
_STREAMABLE_LAST_STEPS = (P.SummarizeStep, P.CountStep)


def plan_supports_partial_stream(plan: P.Plan, registry) -> bool:
    """True when the plan is `scan | row-local steps... | aggregate`
    over a source that can serve an incremental file stream."""
    steps = plan.steps
    if len(steps) < 2 or not isinstance(steps[0], P.Scan):
        return False
    src = registry._sources.get(steps[0].connector)
    if src is None or not hasattr(src, "stream_table"):
        return False
    if not isinstance(steps[-1], _STREAMABLE_LAST_STEPS):
        return False
    return all(isinstance(s, _STREAMABLE_MID_STEPS) for s in steps[1:-1])


def run_partial_stream(
    compiler,
    plan: P.Plan,
    emit: Callable[[int, list[str], bool], None],
    debounce_s: float = 1.0,
    max_files_per_trigger: int = 1,
) -> None:
    """Execute ``plan`` incrementally; call ``emit(round_id, json_rows,
    is_final)`` for each debounced partial round and once for the final
    state. ``json_rows`` are executor-serialized JSON strings.

    Debounce matches the reference (partial_stream.rs:41-48): a round
    arriving sooner than ``debounce_s`` after the last emitted round is
    dropped — except the final one, which always emits.
    """
    scan = plan.steps[0]
    src = compiler.registry.source(scan.connector)
    sdf = src.stream_table(compiler.spark, scan.collection, max_files_per_trigger)
    # apply collection static_fields renames exactly as the batch path
    # does (SourceRegistry.table) so @time-style fields resolve the same
    # whether the query runs batch or partial-stream
    for to, frm in src.collection_static_fields(scan.collection).items():
        if frm in sdf.columns:
            sdf = sdf.withColumnRenamed(frm, to)
    for step in plan.steps[1:]:
        sdf = compiler._apply(step, sdf, {})

    # only the LATEST round is retained (the final emit needs just the
    # last state; buffering every round would grow driver memory by
    # O(rounds) for long streams)
    latest: list[tuple[int, list[str]]] = []
    last_emit = [0.0]

    def on_batch(batch_df, batch_id: int) -> None:
        rows = batch_df.toJSON().collect()
        latest[:] = [(int(batch_id), rows)]
        now = time.monotonic()
        if now - last_emit[0] >= debounce_s:
            last_emit[0] = now
            emit(int(batch_id), rows, False)

    query = (
        sdf.writeStream.outputMode("complete")
        .foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    if not latest:
        emit(0, [], True)
        return
    final_id, final_rows = latest[0]
    emit(final_id, final_rows, True)
