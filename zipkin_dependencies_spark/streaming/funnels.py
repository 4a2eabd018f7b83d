"""Streaming funnel — the Structured Streaming twin of
``operators/funnel.py``, as a CUSTOM stateful operator
(``applyInPandasWithState``): per-user ordered-step progression that emits
a completion row the moment the last step lands, and a partial row when
the funnel expires (event-time timeout via the stream's watermark).

State design: one fixed-width tuple of step timestamps (µs, null until
reached) per user — O(k) per key regardless of event volume, the smallest
possible funnel state. Events are processed in event-time order within
each micro-batch; for in-order streams the greedy progression is exactly
the batch operator's greedy-from-first semantics (first qualifying event
per step). Cross-batch OUT-OF-ORDER events cannot retro-anchor an earlier
step (state only moves forward) — the documented best-effort divergence,
bounded by the watermark; the batch funnel over the lake is the repair
path, same philosophy as the incremental links job.

Timeout: event-time (not processing-time) — a user's funnel expires
``ttl_ms`` after their latest event, measured against the stream's
watermark, so replaying history at full speed produces the identical
output as real-time ingestion (processing-time timeouts would not).

Completion is sticky: a completed user keeps a one-bit ``done`` marker in
state (refreshed to ``ttl_ms`` past their latest event) so later events
cannot start a second funnel and re-emit — append mode stays
one-row-per-user, matching the batch operator, until the marker itself
expires by event-time TTL (after which a genuinely new burst of activity
is a new funnel, the intended restart). Without the marker a user who
completed in batch N and stayed active in batch N+1 would emit twice.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_funnel(
    event_stream: DataFrame,
    steps: Sequence[str],
    within_us: int | None = None,
    ttl_ms: int = 3_600_000,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ append-mode stream of (user_id, t1_us..tk_us, stage_reached,
    completed): one row per user funnel, emitted on completion or on
    event-time expiry (partial stages, ``completed = false``)."""
    from pyspark.sql import functions as F

    steps = list(steps)
    k = len(steps)
    if k == 0:
        raise ValueError("streaming_funnel needs at least one step")

    t_cols = [f"t{i}_us" for i in range(1, k + 1)]
    out_schema = (
        "user_id bigint, "
        + ", ".join(f"{c} bigint" for c in t_cols)
        + ", stage_reached int, completed boolean"
    )
    state_schema = ", ".join(f"{c} bigint" for c in t_cols) + ", done boolean"
    empty = pd.DataFrame(
        columns=["user_id", *t_cols, "stage_reached", "completed"]
    )

    def row(uid, ts_list, completed):
        stage = sum(1 for t in ts_list if t is not None)
        return pd.DataFrame(
            [[uid, *ts_list, stage, completed]],
            columns=["user_id", *t_cols, "stage_reached", "completed"],
        )

    def kernel(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            stored = list(state.get)
            ts_list, was_done = stored[:k], bool(stored[k])
            state.remove()
            if not was_done:
                # a completed marker expiring emits nothing (its row went
                # out at completion time); only live partials emit here
                yield row(uid, ts_list, False)
            else:
                yield empty
            return

        if state.exists:
            stored = list(state.get)
            ts_list, done = stored[:k], bool(stored[k])
        else:
            ts_list, done = [None] * k, False
        events = []
        for pdf in pdfs:
            events.extend(
                zip(pdf["_ts_us"].tolist(), pdf["_type"].tolist())
            )
        events.sort()
        if done:
            # sticky completion: ignore post-completion events, refresh the
            # marker's TTL past the newest one so suppression outlives an
            # active user's tail activity (append stays one-row-per-user)
            if events:
                newest = events[-1][0]
                state.update((*ts_list, True))
                state.setTimeoutTimestamp(newest // 1000 + ttl_ms)
            yield empty
            return
        max_ts = None
        for t, typ in events:
            max_ts = t if max_ts is None else max(max_ts, t)
            idx = sum(1 for x in ts_list if x is not None)
            if idx == k:
                break
            prev = ts_list[idx - 1] if idx > 0 else None
            if typ != steps[idx]:
                continue
            if prev is not None and not (
                t > prev and (within_us is None or t <= prev + within_us)
            ):
                continue
            ts_list[idx] = t

        if ts_list[k - 1] is not None:
            # keep a done marker (not the old remove()) so later batches'
            # events for this user cannot start and emit a second funnel
            state.update((*ts_list, True))
            if max_ts is not None:
                state.setTimeoutTimestamp(max_ts // 1000 + ttl_ms)
            yield row(uid, ts_list, True)
        elif any(t is not None for t in ts_list):
            state.update((*ts_list, False))
            if max_ts is not None:
                state.setTimeoutTimestamp(max_ts // 1000 + ttl_ms)
            yield empty
        else:
            # zero progress: hold no state (a user who never starts the
            # funnel costs nothing and emits nothing)
            if state.exists:
                state.remove()
            yield empty

    prepared = (
        event_stream.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("_ts"),
            F.col(type_col).alias("_type"),
        )
        .withWatermark("_ts", watermark)
        .withColumn("_ts_us", F.unix_micros(F.col("_ts")))
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
