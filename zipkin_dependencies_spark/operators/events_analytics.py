"""Event-stream analytics: transition counts and windowed anomaly scores
(extension operators; no reference analog — the reference's only event
stream is spans, but an analytics engine over event logs needs both).

Both are single-exchange window/aggregate compositions — no UDFs, no
driver loops, engine-exact arithmetic throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (prev_type, next_type, n): first-order Markov transition counts of
    each user's event sequence (the "what do users do after X" matrix).

    One lag window per user ordered by (ts, id) — the id tiebreak pins
    simultaneous events — then a count over the (prev, next) pairs. The
    user exchange is the only data-scale shuffle; the final aggregate is
    |types|² cardinality. Sequence starts (no previous event) surface as
    prev_type = '(start)' so row counts reconcile with the input."""
    w = Window.partitionBy("u").orderBy("ts", "id")
    return (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .groupBy(
            F.coalesce("prev_type", F.lit("(start)")).alias("prev_type"),
            "next_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: DuckDB twin — identical window + aggregate.
EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT coalesce(prev_type, '(start)') AS prev_type,
       next_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq GROUP BY 1, 2
"""


def window_anomalies(
    events: DataFrame,
    window_seconds: int = 86_400,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (event_type, win_start_us, n_events, z9): tumbling windows whose
    event count deviates ≥ ``z_threshold`` standard deviations from that
    type's own mean window count — the volume-anomaly monitor (outage dip /
    incident spike detection).

    Two aggregates, both tiny after the first: (1) count per (type, window)
    — the only data-scale shuffle, map-side combined; (2) mean/std per type
    over the window counts, broadcast back onto (1). Population variance is
    computed from EXACT integer sums (n·Σx² − (Σx)²)/n², so mean, std, and
    the z-scores are bit-identical across engines and partitionings —
    never a float accumulation. z9 is the round-9 z-score."""
    win_us = window_seconds * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # the counts aggregate feeds BOTH the stats pass and the scoring join;
    # materialize it once (eager checkpoint of the tiny types × windows
    # table) so the corpus is scanned exactly once — Spark does not reuse
    # the subtree across the two consumers on its own (verified: 2 scans
    # without this)
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            (F.floor(ts_us / win_us) * win_us).cast("long").alias("win_start_us"),
        )
        .groupBy("event_type", "win_start_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    # zero-variance guard BEFORE the division: engines disagree on whether
    # NaN compares >= threshold, so a constant-count type must never reach
    # the z expression (integer comparison — exact in both engines)
    joined = counts.join(F.broadcast(stats), "event_type").filter(
        F.col("n_w") * F.col("s2") > F.col("s1") * F.col("s1")
    )
    mean = F.col("s1") / F.col("n_w")
    var = (F.col("n_w") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("n_w") * F.col("n_w")
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        joined.withColumn("z9", F.round(z, 9))
        .filter(F.abs(F.col("z9")) >= z_threshold)
        .select("event_type", "win_start_us", "n_events", "z9")
    )


def window_anomalies_sql(
    window_seconds: int = 86_400, z_threshold: float = 2.0
) -> str:
    """DuckDB twin: same integer-sum variance, same rounding."""
    win_us = window_seconds * 1_000_000
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {win_us}) * {win_us} AS BIGINT)
           AS win_start_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_w,
         CAST(sum(n_events) AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM counts GROUP BY 1
),
scored AS (
  SELECT c.event_type, c.win_start_us, c.n_events,
         round((c.n_events - CAST(s.s1 AS DOUBLE) / s.n_w)
               / sqrt(CAST(s.n_w * s.s2 - s.s1 * s.s1 AS DOUBLE)
                      / (CAST(s.n_w AS DOUBLE) * s.n_w)), 9) AS z9
  FROM counts c JOIN stats s USING (event_type)
  WHERE s.n_w * s.s2 > s.s1 * s.s1
)
SELECT event_type, win_start_us, n_events, z9
FROM scored WHERE abs(z9) >= {z_threshold}
"""


def collapse_bursts(
    events: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (user_id, event_type, burst_seq, first_ts_us, last_ts_us,
    n_events): consecutive same-(user, type) events closer than ``gap_us``
    collapse into one burst row — the event-throttling / burst-compression
    primitive (retry storms, double-clicks, sensor chatter → one logical
    occurrence with a span and a count).

    Gap semantics (sessionize's, applied per (user, type)): a burst BREAKS
    when the gap from the PREVIOUS EVENT exceeds ``gap_us`` — lag + a
    cumulative sum of break flags numbers the bursts, then one aggregate
    per burst. All three windows and the aggregate share ONE hash exchange
    on (user, type); per key the cost is linear in that key's own events,
    so power users bound only themselves. Simultaneous events order by the
    id tiebreak — deterministic burst numbering on any partitioning."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("u", "t").orderBy("ts_us", "id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("t"),
            ts_us.alias("ts_us"),
            F.col(id_col).alias("id"),
        )
        .withColumn("prev", F.lag("ts_us").over(w))
        .withColumn(
            "brk",
            (F.col("prev").isNull() | (F.col("ts_us") - F.col("prev") > gap_us))
            .cast("long"),
        )
        .withColumn("burst_seq", F.sum("brk").over(cum))
    )
    return (
        marked.groupBy("u", "t", "burst_seq")
        .agg(
            F.min("ts_us").alias("first_ts_us"),
            F.max("ts_us").alias("last_ts_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("u").alias("user_id"),
            F.col("t").alias("event_type"),
            F.col("burst_seq").cast("long").alias("burst_seq"),
            "first_ts_us",
            "last_ts_us",
            "n_events",
        )
    )


def collapse_bursts_sql(gap_us: int) -> str:
    """DuckDB twin: identical lag → break flag → running sum → aggregate."""
    return f"""
WITH marked AS (
  SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts_us, event_id AS id,
         lag(epoch_us(ts)) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id)
),
numbered AS (
  SELECT u, t, ts_us, id,
         sum(CASE WHEN prev IS NULL OR ts_us - prev > {gap_us} THEN 1 ELSE 0 END)
           OVER (PARTITION BY u, t ORDER BY ts_us, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_seq
  FROM marked
)
SELECT u AS user_id, t AS event_type, CAST(burst_seq AS BIGINT) AS burst_seq,
       min(ts_us) AS first_ts_us, max(ts_us) AS last_ts_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered GROUP BY u, t, burst_seq
"""


def mad_window_anomalies(
    events: DataFrame,
    window_seconds: int = 86_400,
    mad_multiple: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (event_type, win_start_us, n_events, med2, mad4, rz9): tumbling
    windows whose event count deviates more than ``mad_multiple`` MADs
    from that type's MEDIAN window count — the robust twin of
    ``window_anomalies``. Mean/σ anomaly detection breaks when the
    baseline itself contains outliers (one huge spike inflates σ and
    masks everything else); median/MAD has a 50% breakdown point.

    Exactness: medians of bigint counts are either integers or .5s, so
    ``med2 = 2·median(n)`` and ``mad4 = 2·median(|2n − med2|)`` are exact
    bigints in both engines (×2 per median clears the .5), and the flag
    test ``2·|2n − med2| > mad_multiple·mad4`` — algebraically
    |n − med| > k·MAD with MAD = mad4/4 — is pure integer comparison.
    ``rz9`` is the round-9 robust z (1.4826·MAD ≈ σ for a normal
    baseline), one IEEE expression over those bigints. A zero-MAD type
    (over half its windows at the exact median) is EXCLUDED before the
    division — the classic MAD degeneracy, where every deviation would
    score infinite.

    Plan: identical skeleton to ``window_anomalies`` — the (type, window)
    count is the only data-scale shuffle; both median passes run on the
    tiny checkpointed counts table and broadcast back."""
    win_us = window_seconds * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            (F.floor(ts_us / win_us) * win_us).cast("long").alias("win_start_us"),
        )
        .groupBy("event_type", "win_start_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    med = counts.groupBy("event_type").agg(
        F.round(F.median("n_events") * 2).cast("long").alias("med2")
    )
    dev = counts.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.col("n_events") * 2 - F.col("med2"))
    )
    mad = dev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.round(F.median("dev2") * 2).cast("long").alias("mad4")
    )
    scored = dev.join(
        F.broadcast(mad), F.col("event_type") == F.col("m_type")
    ).filter(
        (F.col("mad4") > 0)
        & (F.col("dev2") * 2 > F.lit(int(mad_multiple)) * F.col("mad4"))
    )
    rz = (F.col("n_events") * 2 - F.col("med2")) * 2 / (
        F.lit(1.4826) * F.col("mad4")
    )
    return scored.select(
        "event_type", "win_start_us", "n_events", "med2", "mad4",
        F.round(rz, 9).alias("rz9"),
    )


def mad_window_anomalies_sql(
    window_seconds: int = 86_400, mad_multiple: int = 3
) -> str:
    """DuckDB twin: same ×2-scaled exact medians, same guard and rounding."""
    win_us = window_seconds * 1_000_000
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {win_us}) * {win_us} AS BIGINT)
           AS win_start_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, CAST(round(2 * median(n_events)) AS BIGINT) AS med2
  FROM counts GROUP BY 1
),
dev AS (
  SELECT c.*, m.med2, abs(c.n_events * 2 - m.med2) AS dev2
  FROM counts c JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, CAST(round(2 * median(dev2)) AS BIGINT) AS mad4
  FROM dev GROUP BY 1
)
SELECT d.event_type, d.win_start_us, d.n_events, d.med2, a.mad4,
       round((d.n_events * 2 - d.med2) * 2 / (1.4826 * a.mad4), 9) AS rz9
FROM dev d JOIN mad a USING (event_type)
WHERE a.mad4 > 0 AND d.dev2 * 2 > {int(mad_multiple)} * a.mad4
"""


def seasonal_decompose(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ (day, total_cents, dow, trend4, seasonal4, resid4): classical
    weekly seasonal decomposition of the daily value series — trend =
    centered 7-day moving average, seasonal = mean detrended value per
    ISO day-of-week, residual = what's left (the moving-average
    decomposition underlying STL; Cleveland et al. 1990's baseline).
    The monitoring primitive that separates "weekends are always low"
    from "this Tuesday is anomalous" — feeds the same alerting shape as
    ``window_anomalies`` but with seasonality removed.

    Exactness recipe: values quantize to integer cents at the scan; the
    trend's 7-day sum and the detrended numerator d7 = 7·total − trend7
    stay integers; seasonal means divide exact integer sums once;
    ``resid4`` subtracts the two ALREADY-ROUNDED doubles (identical
    inputs → identical IEEE result, no float fold anywhere). Edge days
    without a full 7-day window are excluded (both engines filter
    count==7, no null-arith branches).

    Scale (100 TB): the one data-sized operation is the per-day cents
    sum (map-side combined). Everything after runs at DAY cardinality —
    the ordered 7-row window and the 7-row seasonal profile are KBs at
    any horizon, so the single-partition window over days is bounded by
    the calendar, not the data."""
    from pyspark.sql.window import Window

    day = F.to_date(F.col(ts_col).cast("timestamp"))
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    daily = (
        events.select(day.alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("total_cents"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("trend7", F.sum("total_cents").over(w))
        .withColumn("cnt7", F.count(F.lit(1)).over(w))
        .filter(F.col("cnt7") == 7)
        .withColumn("d7", F.lit(7) * F.col("total_cents") - F.col("trend7"))
        .withColumn("dow", F.expr("weekday(day)") + 1)
    )
    seas = trended.groupBy("dow").agg(
        F.sum("d7").alias("sd7"), F.count(F.lit(1)).alias("n_dow")
    )
    trend4 = F.round(F.col("trend7") / 7.0, 4)
    seasonal4 = F.round(F.col("sd7") / (F.col("n_dow") * 7.0), 4)
    return (
        trended.join(F.broadcast(seas), "dow")
        .select(
            "day",
            "total_cents",
            F.col("dow").cast("int").alias("dow"),
            trend4.alias("trend4"),
            seasonal4.alias("seasonal4"),
            F.round(
                (F.col("total_cents") - trend4) - seasonal4, 4
            ).alias("resid4"),
        )
    )


SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM events GROUP BY 1
),
trended AS (
  SELECT day, total_cents,
         sum(total_cents) OVER w AS trend7,
         count(*) OVER w AS cnt7,
         isodow(day) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full_ AS (
  SELECT day, total_cents, dow, trend7,
         7 * total_cents - trend7 AS d7
  FROM trended WHERE cnt7 = 7
),
seas AS (
  SELECT dow, CAST(sum(d7) AS BIGINT) AS sd7,
         CAST(count(*) AS BIGINT) AS n_dow
  FROM full_ GROUP BY dow
)
SELECT f.day, f.total_cents, CAST(f.dow AS INT) AS dow,
       round(f.trend7 / 7.0, 4) AS trend4,
       round(s.sd7 / (s.n_dow * 7.0), 4) AS seasonal4,
       round((f.total_cents - round(f.trend7 / 7.0, 4))
             - round(s.sd7 / (s.n_dow * 7.0), 4), 4) AS resid4
FROM full_ f JOIN seas s USING (dow)
"""


def multitouch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_us: int = 7 * 86_400 * 1_000_000,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ (touch_type, position, n_touches, credit_q4): position-based
    multi-touch attribution (the 40/20/40 marketing model). Every
    conversion event's value is credited across the same user's touch
    events in the ``window_us`` before it: first touch 40%, last 40%,
    middles split the 20% (one touch → 100% as position 'only',
    two → 50/50).

    First/last election is a min/max over (ts, event_id) structs — one
    hash aggregate, no window sort, ties deterministic by event id.
    Credits quantize through ONE rounding into integer credit units
    (credit_q4 ≈ cents·1e4·share), so the rollup is an exact integer
    sum; round-half never fires on an exact .5 except through the
    middle split's division, where both engines round half away from
    zero on positives.

    Scale (100 TB): one user-keyed exchange (touches × conversions
    join) + a conversion-keyed aggregate; skew bound = one user's
    touch×conversion volume. An unkeyed variant would route through
    the bin-bucketed range join (operators/range_join.py)."""
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tus"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("cents"),
    )
    conv = ev.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("tus").alias("ctus"),
        F.col("cents").alias("ccents"),
    )
    touch = ev.filter(F.col("event_type") != conversion_type).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("tus").alias("ttus"),
    )
    j = touch.join(conv, "user_id").filter(
        (F.col("ttus") >= F.col("ctus") - window_us)
        & (F.col("ttus") < F.col("ctus"))
    )
    per_conv = j.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.min(F.struct("ttus", "touch_id")).alias("first_t"),
        F.max(F.struct("ttus", "touch_id")).alias("last_t"),
    )
    jj = j.join(per_conv, "conv_id").select(
        "touch_type",
        "ccents",
        "k",
        F.when(F.col("k") == 1, F.lit("only"))
        .when(
            (F.col("ttus") == F.col("first_t.ttus"))
            & (F.col("touch_id") == F.col("first_t.touch_id")),
            F.lit("first"),
        )
        .when(
            (F.col("ttus") == F.col("last_t.ttus"))
            & (F.col("touch_id") == F.col("last_t.touch_id")),
            F.lit("last"),
        )
        .otherwise(F.lit("middle"))
        .alias("position"),
    )
    num = (
        F.when(F.col("position") == "only", F.lit(100))
        .when(F.col("k") == 2, F.lit(50))
        .when(F.col("position") == "middle", F.lit(20))
        .otherwise(F.lit(40))
    )
    den = F.when(
        F.col("position") == "middle", (F.col("k") - 2) * 100
    ).otherwise(F.lit(100))
    credit_q = F.round(F.col("ccents") * num / den * 1e4).cast("bigint")
    return (
        jj.select("touch_type", "position", credit_q.alias("cq"))
        .groupBy("touch_type", "position")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("cq").alias("credit_q4"),
        )
    )
