"""Structured Streaming dependency links (extension beyond reference parity).

The reference is strictly batch: cron re-runs the whole day hourly and relies
on sink idempotence (docker/periodic/hourly/zipkin-dependencies-today:8).
This module maps that contract onto Spark Structured Streaming two ways:

1. ``incremental_daily_links`` — *parity mode*: a ``foreachBatch`` stream
   that, per micro-batch, re-links the affected days from the accumulated
   span store and atomically overwrites those day partitions. Exactly the
   reference's "re-run today hourly" semantics, but event-driven and without
   re-reading unaffected days (partition pruning on the day column).

2. ``streaming_trace_links`` — *true streaming*: spans grouped by trace via
   ``applyInPandasWithState``; a trace's spans accumulate in state and the
   trace is linked + emitted once no new span arrives for ``trace_gap_ms``
   of processing time (traces have no close marker — a quiet gap is the
   streaming proxy for "trace complete"; late spans after the gap re-emit a
   delta, and the downstream sum stays correct because link counts add).

Scale notes (100 TB/day firehose):
- state per trace is bounded: only the 7 narrow linker columns are kept,
  never raw span payloads; state lives in the state store, not executor heap;
- the shuffle is the same hash-by-trace exchange as batch; processing-time
  timeouts garbage-collect closed traces, bounding state cardinality to
  in-flight traces;
- emitted deltas are tiny (distinct (parent, child) per trace), so a
  downstream day aggregation holds at most |services|² rows per day.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..linker import DependencyLinker, Span
from ..schemas import TRACE_LINKS_SCHEMA

#: state kept per in-flight trace: the narrow span columns, column-major
#: (arrays compress well in the state store and rebuild Spans cheaply).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("parent_id", T.ArrayType(T.StringType())),
        T.StructField("id", T.ArrayType(T.StringType())),
        T.StructField("kind", T.ArrayType(T.StringType())),
        T.StructField("local_service", T.ArrayType(T.StringType())),
        T.StructField("remote_service", T.ArrayType(T.StringType())),
        T.StructField("shared", T.ArrayType(T.BooleanType())),
        T.StructField("is_error", T.ArrayType(T.BooleanType())),
    ]
)

_STATE_COLS = [f.name for f in _STATE_SCHEMA.fields]

_EMPTY_LINKS = pd.DataFrame(columns=["parent", "child", "call_count", "error_count"])


def _link_columns(cols: dict[str, list]) -> pd.DataFrame:
    """Column-major state → linked per-trace links table."""
    spans = [
        Span(
            parent_id=p, id=i, kind=k, local_service=ls, remote_service=rs,
            shared=bool(sh) if sh is not None else False,
            is_error=bool(er) if er is not None else False,
        )
        for p, i, k, ls, rs, sh, er in zip(*(cols[c] for c in _STATE_COLS))
    ]
    links = DependencyLinker().put_trace(spans).link()
    if not links:
        return _EMPTY_LINKS
    return pd.DataFrame(links)[["parent", "child", "call_count", "error_count"]]


def streaming_trace_links(
    span_stream: DataFrame,
    trace_gap_ms: int = 30_000,
    timeout_mode: str = "processing",
) -> DataFrame:
    """LINK_INPUT_SCHEMA-shaped *streaming* DataFrame → per-trace link deltas.

    A trace emits once it has been quiet for ``trace_gap_ms``. Output is
    append-mode; downstream, sum by (parent, child) — counts are additive,
    so late re-emissions stay correct.

    ``timeout_mode``:
    - ``"processing"`` — wall-clock quiet gap (production default for a
      live firehose). NOT drainable: a processing-time timer only fires
      when a LATER batch runs, so an availableNow replay ends with every
      trace still parked in state (and the engine may spin keep-alive
      batches against due timers — measured, not theoretical).
    - ``"event"`` — WATERMARK quiet gap: a trace closes when the stream's
      event-time watermark advances ``trace_gap_ms`` past the last batch
      that touched it. Deterministic — timers are a pure function of the
      data's timestamps, so a replay emits identical output every run,
      which is what lets the oracle value-hash the stateful path
      (q_streaming_links_stateful). Caller must set ``withWatermark`` on
      an event-time column before this operator."""
    use_event = timeout_mode == "event"
    if timeout_mode not in ("processing", "event"):
        raise ValueError(f"unknown timeout_mode {timeout_mode!r}")

    def kernel(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            cols = dict(zip(_STATE_COLS, state.get))
            state.remove()
            yield _link_columns(cols)
            return
        acc = (
            dict(zip(_STATE_COLS, (list(x) for x in state.get)))
            if state.exists
            else {c: [] for c in _STATE_COLS}
        )
        for pdf in pdfs:
            for c in _STATE_COLS:
                # tolist() → native Python scalars (the state tuple is
                # pickled to the JVM, which rejects numpy types); scrub NaN
                acc[c].extend(
                    None if (x is None or x != x) else x for x in pdf[c].tolist()
                )
        state.update(tuple(acc[c] for c in _STATE_COLS))
        if use_event:
            # strictly > current watermark as the API requires; max(wm, 0)
            # guards the first batch, where the watermark is still unset
            state.setTimeoutTimestamp(
                max(state.getCurrentWatermarkMs(), 0) + trace_gap_ms
            )
        else:
            state.setTimeoutDuration(trace_gap_ms)
        yield _EMPTY_LINKS

    return span_stream.groupBy("trace_key").applyInPandasWithState(
        kernel,
        outputStructType=TRACE_LINKS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_event
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def incremental_daily_links(
    span_stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    spans_store_path: str,
    window: tuple[int, int] | None = None,
    trigger: dict | None = None,
    on_batch: Callable[[DataFrame, int], None] | None = None,
):
    """Parity-mode incremental job: per micro-batch, (1) append the batch's
    spans to a day-partitioned span store, (2) recompute links for ONLY the
    days present in the batch (partition pruning makes the re-read cheap),
    (3) dynamic-partition-overwrite those days in the sink — the reference's
    idempotent re-run contract (SURVEY §2.8 W1-W3), event-driven.

    ``span_stream`` is a streaming DataFrame in the v2 span shape (must carry
    ``timestamp`` in epoch µs). Returns the started StreamingQuery."""
    from ..functions import normalize_spans
    from ..operators.aggregate import aggregate_links
    from ..operators.link import trace_links_partitioned

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        stamped = batch_df.withColumn(
            "day", F.to_date(F.timestamp_micros(F.col("timestamp")))
        )
        stamped.write.partitionBy("day").mode("append").parquet(spans_store_path)

        days = [r["day"] for r in stamped.select("day").distinct().collect()]
        # ONE job re-links every affected day: day filter prunes store
        # partitions, (day, trace) grouping keeps per-day F1 semantics, and
        # dynamic partitionOverwriteMode replaces exactly the touched days —
        # the reference's per-day idempotent re-run, without a driver loop.
        affected = (
            spark.read.parquet(spans_store_path)
            .filter(F.col("day").isin(days))
        )
        normalized = normalize_spans(affected).withColumn(
            "day", F.to_date(F.timestamp_micros(F.col("timestamp")))
        )
        (
            aggregate_links(
                trace_links_partitioned(normalized, window=window, day_col="day"),
                extra_keys=["day"],
            )
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(sink_path)
        )
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    writer = (
        span_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
