"""Streaming pipeline tests: the foreachBatch parity mode must converge to
exactly the batch pipeline's links (idempotent day overwrite), and the
stateful per-trace operator must emit each trace's links after its quiet gap."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _batch_links(spark, spans):
    from zipkin_dependencies_spark.functions import normalize_spans
    from zipkin_dependencies_spark.operators.link import links_from_spans

    return {
        tuple(r) for r in links_from_spans(normalize_spans(spans)).collect()
    }


def test_incremental_daily_links_matches_batch(spark, tmp_path):
    from zipkin_dependencies_spark.functions import normalize_spans
    from zipkin_dependencies_spark.operators.link import links_from_spans
    from zipkin_dependencies_spark.streaming import incremental_daily_links
    from zipkin_dependencies_spark.testdata import derived_spans

    # a 5-day slice keeps the per-day oracle loop tractable; spans filter on
    # their OWN timestamp (F1 semantics — partial traces are expected)
    lo = 820_454_400_000_000  # 1996-01-01 UTC µs
    hi = lo + 10 * 86_400_000_000 - 1
    spans = derived_spans(spark, SF_DIR).filter(F.col("timestamp").between(lo, hi))
    assert spans.count() > 20

    # stage the spans as two parquet files → two-ish micro-batches
    src = str(tmp_path / "src")
    half = F.pmod(F.hash("trace_id"), F.lit(2))
    spans.filter(half == 0).write.mode("append").parquet(src)
    spans.filter(half == 1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(spans.schema).parquet(src)
    q = incremental_daily_links(
        stream,
        sink_path=str(tmp_path / "sink"),
        checkpoint_path=str(tmp_path / "ckpt"),
        spans_store_path=str(tmp_path / "store"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)

    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == spans.count()  # no spans lost across batches

    got = {
        (str(r["day"]), r["parent"], r["child"], r["call_count"], r["error_count"])
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    # oracle: per-day F1 semantics — spans of one UTC day linked together
    # (a trace crossing days contributes its in-day spans to each day),
    # exactly what one batch run per day over the store would produce
    normalized = normalize_spans(store.drop("day")).withColumn(
        "day", F.to_date(F.timestamp_micros(F.col("timestamp")))
    )
    expected = set()
    for day_row in normalized.select("day").distinct().collect():
        day = day_row["day"]
        day_links = links_from_spans(
            normalized.filter(F.col("day") == F.lit(day)).drop("day")
        )
        expected |= {
            (str(day), r["parent"], r["child"], r["call_count"], r["error_count"])
            for r in day_links.collect()
        }
    assert got == expected


def test_streaming_trace_links_emits_after_gap(spark, tmp_path):
    from zipkin_dependencies_spark.functions import normalize_spans
    from zipkin_dependencies_spark.streaming import streaming_trace_links
    from zipkin_dependencies_spark.testdata import derived_spans

    spans = normalize_spans(derived_spans(spark, SF_DIR)).limit(300).cache()
    expected_traces = spans.select("trace_key").distinct().count()

    src = str(tmp_path / "stream-src")
    spans.write.mode("append").parquet(src)

    stream = spark.readStream.schema(spans.schema).parquet(src)
    out = streaming_trace_links(stream, trace_gap_ms=2_000)
    q = (
        out.writeStream.format("memory")
        .queryName("trace_links_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for the quiet gap to elapse and timeouts to fire
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM trace_links_out").collect()
            if got:
                break
            time.sleep(2)
        assert got, "no links emitted after trace gap"
        emitted = {}
        for r in got:
            cell = emitted.setdefault((r["parent"], r["child"]), [0, 0])
            cell[0] += r["call_count"]
            cell[1] += r["error_count"]
        # compare against batch linking of the same spans
        from zipkin_dependencies_spark.operators.link import links_from_spans

        batch = {
            (r["parent"], r["child"]): (r["call_count"], r["error_count"])
            for r in links_from_spans(spans).collect()
        }
        # the stream may not have flushed every trace yet; what it emitted
        # must be a consistent subset, and with all timeouts fired, equal
        for key, (n, e) in emitted.items():
            assert key in batch
            assert n <= batch[key][0] and e <= batch[key][1]
    finally:
        q.stop()


def test_streaming_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    """session_window streaming sessions must agree with the batch operator
    for sessions the watermark has closed (same counts and bounds); a far-
    future flush event closes everything under test."""
    import datetime as dt

    from pyspark.sql import Row

    from zipkin_dependencies_spark.operators.sessionize import sessionize
    from zipkin_dependencies_spark.streaming.sessions import streaming_sessionize

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda i, u, secs, typ="view": Row(  # noqa: E731
        event_id=i, ts=t0 + dt.timedelta(seconds=secs), user_id=u,
        event_type=typ, value=0.0, props="{}",
    )
    rows = [
        mk(0, 1, 0), mk(1, 1, 600, "error"), mk(2, 1, 1200),   # u1 session A
        mk(3, 1, 1200 + 2000),                                  # u1 session B (gap > 30 min)
        mk(4, 2, 100), mk(5, 2, 200),                           # u2 session A
        # flush: one event far in the future advances the watermark past all
        # of the above so append mode emits them
        mk(99, 99, 10 * 86400),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    sessions = streaming_sessionize(stream, gap_seconds=1800, watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.n_errors)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.n_errors)
        for r in sessionize(
            spark.createDataFrame(rows[:-1]), gap_seconds=1800
        ).collect()
    }
    # the closed sessions (users 1 and 2) must match the batch operator row
    # for row; the flush user may or may not have emitted
    got_closed = {g for g in got if g[0] in (1, 2)}
    assert got_closed == batch


def test_streaming_dedupe_exact_keeps_first_copy(spark, tmp_path):
    """Streaming exact dedup: duplicate contents across micro-batches within
    the watermark horizon collapse to one emitted row per distinct text;
    every distinct text survives."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.dedup import streaming_dedupe_exact

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (0, base, "alpha content"),
        (1, base + dt.timedelta(seconds=10), "beta content"),
        (2, base + dt.timedelta(seconds=20), "alpha content"),   # dup of 0
        (3, base + dt.timedelta(seconds=30), "gamma content"),
        (4, base + dt.timedelta(seconds=40), "alpha content"),   # dup again
        (5, base + dt.timedelta(seconds=50), "beta content"),    # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    src = str(tmp_path / "src")
    df.filter(F.col("doc_id") < 3).write.mode("append").parquet(src)
    df.filter(F.col("doc_id") >= 3).write.mode("append").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_dedupe_exact(stream, time_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "sink")).collect()
    texts = sorted(r.text for r in got)
    assert texts == ["alpha content", "beta content", "gamma content"]
    # the FIRST copy in event order survives within each micro-batch group
    survivors = {r.text: r.doc_id for r in got}
    assert survivors["gamma content"] == 3


def test_streaming_window_counts_drops_late_events(spark, tmp_path):
    """Watermarked sliding windows: (1) closed windows match the batch
    window expansion for on-time data; (2) an event arriving in a later
    micro-batch with an event time already behind the watermark is DROPPED
    (its windows were emitted without it and never re-emit)."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.windows import streaming_window_counts

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731

    # batch 1: two on-time clicks + a flush event far ahead that advances
    # the watermark past their windows
    batch1 = [
        (0, sec(60), "click"),
        (1, sec(120), "click"),
        (99, sec(6 * 3600), "flush"),
    ]
    # batch 2: a "click" whose EVENT time sits back in the already-closed
    # windows — behind the watermark, must be dropped
    batch2 = [(2, sec(180), "click")]

    src = tmp_path / "events"
    src.mkdir()
    schema = "event_id long, ts timestamp, event_type string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    out = tmp_path / "out"

    def run():
        # parquet sink (not memory): the file sink supports resuming from
        # the checkpoint, which the second phase of this test relies on
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_window_counts(
                stream, window="10 minutes", slide="5 minutes",
                watermark="30 minutes",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            (r.win_start_us, r.event_type): r.n_events
            for r in spark.read.parquet(str(out)).collect()
        }

    first = run()
    # both clicks in [0:00,0:10) and the two overlapping 5-min slides
    base_us = int(sec(0).timestamp() * 1e6)
    m = 60_000_000
    assert first[(base_us, "click")] == 2          # window [0, 10min)
    assert first[(base_us - 5 * m, "click")] == 2  # window [-5, 5min)

    # append the late batch; re-run the SAME checkpointed query
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    second = run()
    # the late click changed nothing: closed windows did not re-emit
    for k, v in first.items():
        assert second.get(k, v) == v
    assert second == first


def test_streaming_funnel_completion_and_timeout(spark, tmp_path):
    """Stateful streaming funnel: a user completing the chain across TWO
    micro-batches emits one completed row; a user stuck mid-funnel emits a
    partial row once the watermark passes their TTL; a user who never
    starts emits nothing."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.funnels import streaming_funnel

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    schema = "user_id long, ts timestamp, event_type string"

    # batch 1: u1 signs up + clicks; u2 signs up (then goes quiet);
    # u3 only clicks (never starts)
    batch1 = [
        (1, sec(0), "signup"),
        (1, sec(60), "click"),
        (2, sec(0), "signup"),
        (3, sec(0), "click"),
    ]
    # batch 2: u1 purchases (completes); a far-future flush event pushes
    # the watermark past u2's TTL so the timeout fires
    batch2 = [
        (1, sec(120), "purchase"),
        (99, sec(100_000), "signup"),
    ]
    src = tmp_path / "events"
    src.mkdir()
    out = tmp_path / "out"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_funnel(
                stream, ["signup", "click", "purchase"],
                ttl_ms=600_000, watermark="10 seconds",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            r["user_id"]: r for r in spark.read.parquet(str(out)).collect()
        }

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    first = run()
    assert 1 not in first and 2 not in first and 3 not in first

    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    second = run()

    us = lambda s: int(sec(s).timestamp() * 1e6)  # noqa: E731
    u1 = second[1]
    assert u1["completed"] and u1["stage_reached"] == 3
    assert (u1["t1_us"], u1["t2_us"], u1["t3_us"]) == (us(0), us(60), us(120))
    u2 = second[2]
    assert not u2["completed"] and u2["stage_reached"] == 1
    assert u2["t1_us"] == us(0) and u2["t3_us"] is None
    assert 3 not in second  # never started -> no state, no row


def test_streaming_funnel_sticky_completion_suppresses_second_emission(
    spark, tmp_path
):
    """A completed user keeps a done marker: a second full sequence while
    the marker is live emits NOTHING (append stays one-row-per-user like the
    batch funnel); once the marker expires by event-time TTL, a fresh
    sequence is a new funnel and MAY emit again (documented restart)."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.funnels import streaming_funnel

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    us = lambda s: int(sec(s).timestamp() * 1e6)  # noqa: E731
    schema = "user_id long, ts timestamp, event_type string"
    src = tmp_path / "events"
    src.mkdir()
    out = tmp_path / "out"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_funnel(
                stream, ["signup", "click", "purchase"],
                ttl_ms=3_600_000, watermark="10 seconds",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return [
            r for r in spark.read.parquet(str(out)).collect()
            if r["user_id"] == 1
        ]

    def append(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # batch 1: u1 completes -> one row, done marker set (TTL 1h past 120s)
    append([(1, sec(0), "signup"), (1, sec(60), "click"),
            (1, sec(120), "purchase")])
    first = run()
    assert len(first) == 1 and first[0]["completed"]

    # batch 2: u1 runs a SECOND full sequence while the marker is live
    # (watermark only reaches 990s < 120s+3600s); must be suppressed —
    # and the marker TTL refreshes to 420s+3600s
    append([(1, sec(300), "signup"), (1, sec(360), "click"),
            (1, sec(420), "purchase"), (9, sec(1_000), "flush")])
    second = run()
    assert len(second) == 1 and second[0]["t3_us"] == us(120)

    # batch 3: quiet gap — watermark 9_990s passes the marker's 4_020s
    # timeout; the done marker expires SILENTLY (no partial row)
    append([(9, sec(10_000), "flush")])
    assert len(run()) == 1

    # batch 4: post-expiry fresh sequence -> a NEW funnel may emit
    append([(1, sec(10_100), "signup"), (1, sec(10_160), "click"),
            (1, sec(10_220), "purchase"), (9, sec(20_000), "flush")])
    fourth = run()
    assert len(fourth) == 2
    assert sorted(r["t3_us"] for r in fourth) == [us(120), us(10_220)]


def test_streaming_anomalies_flags_spike_against_static_baseline(spark, tmp_path):
    """Stream-static join: windowed stream counts scored against a
    broadcast batch baseline; only the spiking window emits."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.windows import streaming_anomalies

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    schema = "user_id long, ts timestamp, event_type string"

    # baseline says clicks run 2 +/- 1 per hour window
    baseline = spark.createDataFrame(
        [("click", 2.0, 1.0)], "event_type string, mean double, std double"
    )
    # hour 0: 2 clicks (normal); hour 1: 6 clicks (z=4, anomalous);
    # flush event far ahead closes both windows
    rows = (
        [(1, sec(60 * i), "click") for i in range(2)]
        + [(1, sec(3600 + 60 * i), "click") for i in range(6)]
        + [(9, sec(10 * 86400), "flush")]
    )
    src = tmp_path / "events"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_anomalies(stream, baseline, window="1 hour",
                            watermark="10 seconds", z_threshold=2.0)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("SELECT * FROM anom_out").collect()
    assert len(got) == 1
    r = got[0]
    assert r["event_type"] == "click" and r["n_events"] == 6 and r["z9"] == 4.0
    assert r["win_start_us"] == int(sec(3600).timestamp() * 1e6)


def test_streaming_collapse_bursts_closes_on_successor_and_gc(spark, tmp_path):
    """Close-on-next-event semantics: a burst emits the moment an event
    beyond the gap arrives (cross-batch), numbering continues per key, the
    final open burst never emits, and a silent key's open burst is GC'd by
    the event-time TTL without emitting."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.bursts import (
        streaming_collapse_bursts,
    )

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    us = lambda s: int(sec(s).timestamp() * 1e6)  # noqa: E731
    schema = "user_id long, ts timestamp, event_type string"
    src = tmp_path / "events"
    src.mkdir()
    out = tmp_path / "out"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_collapse_bursts(
                stream, gap_us=60_000_000, ttl_ms=600_000,
                watermark="10 seconds",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return sorted(
            (r.user_id, r.burst_seq, r.first_ts_us, r.last_ts_us, r.n_events)
            for r in spark.read.parquet(str(out)).collect()
        )

    def append(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # batch 1: u1 chain 0,50,100 (one burst — each hop <= 60s);
    # u2 single event (stays open, then goes silent past TTL)
    append([(1, sec(0), "click"), (1, sec(50), "click"),
            (1, sec(100), "click"), (2, sec(0), "click")])
    assert run() == []  # nothing closed yet

    # batch 2: u1 event 61s after 100 closes burst 1 ACROSS the batch
    # boundary; a far-future u9 event pushes the watermark past u2's TTL
    # (GC, no emission) — u1's burst 2 stays open, never emits
    append([(1, sec(161), "click"), (9, sec(100_000), "flush")])
    got = run()
    assert got == [(1, 1, us(0), us(100), 3)]


def test_streaming_interval_join_matches_across_batches(spark, tmp_path):
    """A click in batch 1 joins a purchase arriving in batch 2 (state held
    across micro-batches); pairs beyond the interval never emit; emission
    needs no flush event (inner stream-stream joins emit on match)."""
    import datetime as dt

    from zipkin_dependencies_spark.streaming.joins import (
        streaming_interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    src = tmp_path / "events"
    src.mkdir()

    def append(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    append([(1, sec(0), "click", 10), (2, sec(0), "click", 20)])
    append([(1, sec(1800), "purchase", 11),   # inside 1h of click 10
            (2, sec(7200), "purchase", 21)])  # beyond 1h of click 20

    def typed(t):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .filter(F.col("event_type") == t)
        )

    q = (
        streaming_interval_join(
            typed("click"), typed("purchase"),
            within_seconds=3600, watermark="10 seconds",
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.user_id, r.left_id, r.right_id)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [(1, 10, 11)]
