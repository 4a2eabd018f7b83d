"""Streaming burst compression — the Structured Streaming twin of
``operators/events_analytics.collapse_bursts``, as a CUSTOM stateful
operator (``applyInPandasWithState``): per-(user, type) gap-chained burst
tracking that emits each burst row the moment a later event CLOSES it
(arrives more than ``gap_us`` after the burst's last event).

State per key is one open burst — (burst_seq, first_ts, last_ts, n) —
O(1) regardless of event volume. Events sort by event time within each
micro-batch; for in-order streams (cross-batch order bounded by the
watermark) the emitted rows are EXACTLY the batch operator's closed
bursts, with identical burst numbering — pinned end to end by the
``streaming_bursts_replay`` oracle query (drained stream ≡ batch
collapse_bursts minus each key's final still-open burst).

Emission is close-on-next-event, not watermark-driven: a burst needs no
timeout to be correct, only a successor event — so the final burst of a
key stays open at stream end (state discarded with the query). The
watermark still bounds state lifetime: keys silent past ``ttl_ms`` are
garbage-collected (their open burst is dropped unemitted, exactly like
stream shutdown — the batch operator over the lake is the completeness
repair path, same philosophy as the funnel).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, event_type string, burst_seq bigint, "
    "first_ts_us bigint, last_ts_us bigint, n_events bigint"
)
STATE_SCHEMA = (
    "burst_seq bigint, first_ts_us bigint, last_ts_us bigint, n_events bigint"
)

_COLS = [
    "user_id", "event_type", "burst_seq", "first_ts_us", "last_ts_us",
    "n_events",
]


def streaming_collapse_bursts(
    event_stream: DataFrame,
    gap_us: int,
    ttl_ms: int = 86_400_000,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ append-mode stream of closed bursts (one row per burst, emitted
    when its successor event arrives). Columns match the batch operator."""
    from pyspark.sql import functions as F

    empty = pd.DataFrame(columns=_COLS)

    def kernel(key, pdfs, state: GroupState):
        uid, etype = key
        if state.hasTimedOut:
            state.remove()  # open burst dropped unemitted (documented)
            yield empty
            return

        seq, first, last, n = (
            state.get if state.exists else (0, None, None, 0)
        )
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(pdf["_ts_us"].tolist())
        ts_list.sort()
        out = []
        for t in ts_list:
            if first is None:
                seq, first, last, n = seq + 1, t, t, 1
            elif t - last > gap_us:
                out.append([uid, etype, seq, first, last, n])
                seq, first, last, n = seq + 1, t, t, 1
            else:
                last, n = t, n + 1
        state.update((seq, first, last, n))
        if last is not None:
            state.setTimeoutTimestamp(last // 1000 + ttl_ms)
        yield pd.DataFrame(out, columns=_COLS) if out else empty

    prepared = (
        event_stream.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("_ts"),
            F.col(type_col).alias("event_type"),
        )
        .withWatermark("_ts", watermark)
        .withColumn("_ts_us", F.unix_micros(F.col("_ts")))
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        kernel,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
