"""Streaming exact dedup for a document firehose (extension, SURVEY §7 M5).

Batch `dedupe_exact` answers "which docs are copies" over a complete corpus;
an ingestion pipeline needs the streaming form: emit each distinct content
ONCE as it first arrives, drop replicas that land within the dedup horizon.

Spark-first mapping: content digest (md5, JVM-side) + event-time watermark +
``dropDuplicatesWithinWatermark`` — the built-in streaming dedup operator,
which keeps digest state ONLY for the watermark horizon instead of forever
(state is the scale hazard of infinite-stream dedup: an unbounded
`dropDuplicates` key set grows with corpus cardinality, a watermarked one
with arrival-window cardinality).

Scale notes (firehose):
- state per distinct content = one 32-hex digest + timestamp, never text;
- the exchange carries (digest, event_time, id) — document bodies stay in
  the source until the survivor row is emitted;
- replicas later than the horizon re-emit (they are new state entries) —
  the downstream batch `dedupe_exact` over the accumulated store is the
  backstop, same layering as the reference's hourly-re-run-over-idempotent-
  sink design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedupe_exact(
    docs: DataFrame,
    time_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame in, streaming DataFrame out: rows whose content
    digest was not already seen within the watermark horizon. All input
    columns pass through, plus ``text_hash``."""
    return (
        docs.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
