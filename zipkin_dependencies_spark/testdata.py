"""Deterministic span/v1-table derivations from the driver-generated TPC-H-ish
parquet (TESTDATA.md). These give the zipkin pipeline real input at every
scale factor, with semantics simple enough to express as ANSI SQL for the
DuckDB oracle (see __spark_entry__.py — both sides derive the SAME spans).

Derivation spec (keep in lockstep with the oracle SQL!):

roots (one per order):
  trace_id   = lpad(o_orderkey, 16, '0')          # decimal-as-hex-safe string
  id         = trace_id, parent_id = NULL
  kind       = 'SERVER'
  local      = 'svc-' || (o_orderkey % 13)
  remote     = NULL when o_orderkey % 7 = 0 else 'client-' || (o_custkey % 5)
  timestamp  = epoch µs of o_orderdate
  error tag  when o_orderkey % 11 = 0

children (one per lineitem):
  trace_id   = lpad(l_orderkey, 16, '0')
  id         = lpad(l_orderkey * 10 + l_linenumber, 16, '0')
  parent_id  = root id
  kind       = l_linenumber % 4 → 0,1:'CLIENT'  2:'PRODUCER'  3:NULL
  local      = 'svc-' || (l_orderkey % 13)
  remote     = 'svc-' || (l_suppkey % 13)
  timestamp  = epoch µs of l_shipdate
  error tag  when l_returnflag = 'R'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import V1_ANNOTATIONS_SCHEMA, V1_SPANS_SCHEMA


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` normalized to a TIMESTAMP: the driver's parquet stores
    TIMESTAMP(NANOS) (no Spark type), read as long nanos and floor-truncated
    to µs exactly like DuckDB's ns→µs conversion.

    The nanos-as-long conf is set at runtime (it is runtime-settable) so the
    read works in ANY SparkSession, not just ones built by our session
    factory — external harnesses construct their own sessions."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":
        # integer DIV, not float division — epoch nanos exceed double's 2^53
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return ev


def epoch_us(col: Column | str) -> Column:
    """Epoch µs of a (possibly TIMESTAMP_NTZ) column. The session runs in UTC,
    so NTZ→TZ cast preserves the wall clock and matches DuckDB's epoch_us over
    naive timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def _pad16(c: Column) -> Column:
    return F.lpad(c.cast("string"), 16, "0")


def _endpoint(svc: Column) -> Column:
    return F.struct(
        svc.alias("service_name"),
        F.lit(None).cast("string").alias("ipv4"),
        F.lit(None).cast("string").alias("ipv6"),
        F.lit(None).cast("int").alias("port"),
    )


def _error_tags(cond: Column) -> Column:
    return F.when(cond, F.create_map(F.lit("error"), F.lit("")))


def _svc(prefix: str, key: Column, mod: int) -> Column:
    return F.concat(F.lit(prefix + "-"), (key % mod).cast("string"))


def derived_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level trace forest: one SERVER root per order, one child span per
    lineitem — returns canonical SPAN_SCHEMA columns."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    nulls = [
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("long").alias("duration"),
        F.lit(None)
        .cast("array<struct<timestamp:bigint,value:string>>")
        .alias("annotations"),
        F.lit(None).cast("boolean").alias("debug"),
    ]

    roots = orders.select(
        _pad16(F.col("o_orderkey")).alias("trace_id"),
        F.lit(None).cast("string").alias("parent_id"),
        _pad16(F.col("o_orderkey")).alias("id"),
        F.lit("SERVER").alias("kind"),
        nulls[0],
        epoch_us("o_orderdate").alias("timestamp"),
        nulls[1],
        _endpoint(_svc("svc", F.col("o_orderkey"), 13)).alias("local_endpoint"),
        _endpoint(
            F.when(
                F.col("o_orderkey") % 7 != 0, _svc("client", F.col("o_custkey"), 5)
            )
        ).alias("remote_endpoint"),
        nulls[2],
        _error_tags(F.col("o_orderkey") % 11 == 0).alias("tags"),
        F.lit(False).alias("shared"),
        nulls[3],
        F.to_date(F.col("o_orderdate")).alias("day"),
    )

    kind = (
        F.when(F.col("l_linenumber") % 4 < 2, F.lit("CLIENT"))
        .when(F.col("l_linenumber") % 4 == 2, F.lit("PRODUCER"))
    )
    # the synthetic lineitem holds duplicate (orderkey, linenumber) pairs, so
    # a deterministic per-trace row_number keeps span ids unique (duplicate
    # ids would merge in the linker's tree build and desync the SQL oracle)
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("l_orderkey").orderBy(
            "l_linenumber", "l_suppkey", "l_partkey", "l_quantity"
        )
    )
    children = lineitem.withColumn("rn", rn).select(
        _pad16(F.col("l_orderkey")).alias("trace_id"),
        _pad16(F.col("l_orderkey")).alias("parent_id"),
        _pad16(F.col("l_orderkey") * 100 + F.col("rn")).alias("id"),
        kind.alias("kind"),
        nulls[0],
        epoch_us("l_shipdate").alias("timestamp"),
        nulls[1],
        _endpoint(_svc("svc", F.col("l_orderkey"), 13)).alias("local_endpoint"),
        _endpoint(_svc("svc", F.col("l_suppkey"), 13)).alias("remote_endpoint"),
        nulls[2],
        _error_tags(F.col("l_returnflag") == "R").alias("tags"),
        F.lit(False).alias("shared"),
        nulls[3],
        F.to_date(F.col("l_shipdate")).alias("day"),
    )
    return roots.unionByName(children)


#: SQL CTE producing the identical span set in DuckDB (linker-consumed fields
#: only). Keep in lockstep with derived_spans.
SPANS_SQL_CTE = """
spans AS (
  SELECT lpad(CAST(o_orderkey AS VARCHAR), 16, '0') AS trace_id,
         CAST(NULL AS VARCHAR)                       AS parent_id,
         lpad(CAST(o_orderkey AS VARCHAR), 16, '0') AS id,
         'SERVER'                                    AS kind,
         'svc-' || CAST(o_orderkey % 13 AS VARCHAR)  AS local_service,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE 'client-' || CAST(o_custkey % 5 AS VARCHAR) END AS remote_service,
         (o_orderkey % 11 = 0)                       AS is_error,
         epoch_us(o_orderdate)                       AS ts,
         CAST(o_orderdate AS DATE)                   AS day
  FROM orders
  UNION ALL
  SELECT lpad(CAST(l_orderkey AS VARCHAR), 16, '0'),
         lpad(CAST(l_orderkey AS VARCHAR), 16, '0'),
         lpad(CAST(l_orderkey * 100 + rn AS VARCHAR), 16, '0'),
         CASE WHEN l_linenumber % 4 < 2 THEN 'CLIENT'
              WHEN l_linenumber % 4 = 2 THEN 'PRODUCER' END,
         'svc-' || CAST(l_orderkey % 13 AS VARCHAR),
         'svc-' || CAST(l_suppkey % 13 AS VARCHAR),
         (l_returnflag = 'R'),
         epoch_us(l_shipdate),
         CAST(l_shipdate AS DATE)
  FROM (
    SELECT l.*, row_number() OVER (
      PARTITION BY l_orderkey
      ORDER BY l_linenumber, l_suppkey, l_partkey, l_quantity
    ) AS rn
    FROM lineitem l
  )
)
"""

#: Link derivation for the two-level forest above, in plain SQL. Valid because
#: these traces exercise no shared-span folds or ancestor walks: each span
#: emits by the kind matrix alone (roots are SERVER, children CLIENT/PRODUCER/
#: kind-NULL-with-both-endpoints ⇒ CLIENT).
LINKS_SQL = """
SELECT parent, child,
       CAST(count(*) AS BIGINT) AS call_count,
       CAST(coalesce(sum(CASE WHEN is_error THEN 1 ELSE 0 END), 0) AS BIGINT) AS error_count
FROM (
  SELECT CASE WHEN kind = 'SERVER' THEN remote_service ELSE local_service END AS parent,
         CASE WHEN kind = 'SERVER' THEN local_service ELSE remote_service END AS child,
         is_error
  FROM spans
) WHERE parent IS NOT NULL AND child IS NOT NULL
GROUP BY parent, child
"""


def derived_v1_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """v1 two-table shape from lineitem (FIXTURES.md §F2): span rows plus a
    per-line annotation pattern cycling through the v1 instrumentation styles.

    l_linenumber % 5 → 0: sr+ca   1: cs+sa   2: cs only   3: ms+ma   4: mr+ma
    'error' (a_type=6) added when l_returnflag='R'; a noise key rides along.
    """
    li = load(spark, sf_dir, "lineitem")
    # Guide §2.5 input-skew rule: unlike derived_spans (whose row_number
    # window forces an exchange before the heavy projection), NOTHING here
    # shuffles before the annotation-array build + explode + pivot's partial
    # SortAggregate — over a single-row-group parquet file that whole chain
    # ran as ONE scan task (v1_links plan nodes 7-13 serial on one core).
    # Repartition the narrow source columns of the ANNOTATION branch only
    # (the spans select is a cheap projection; shuffling it too measured a
    # net loss on the shallow v1_reconstruct consumer). Stricter guard than
    # ensure_min_parallelism: the exchange moves the full lineitem
    # projection, so it pays only when the input is truly unsplittable — a
    # SINGLE file (the fixture's one-row-group parquet scans as one
    # row-bearing task however many byte-range splits the planner cuts:
    # v1_links 5.8 → 3.6 s clean at sf0.1). A multi-file input already
    # scans wide (a derived sf1's 11 files read 31-way here) and the
    # repartition measured a consistent small LOSS there (7.32/7.66 →
    # 7.89/7.90 interleaved clean minima) — so fire on file count, not on
    # split count, which over-reports single-row-group files. At any real
    # deployment the input is many files and this is a no-op.
    par = spark.sparkContext.defaultParallelism
    li_a = li.repartition(par) if par > 1 and len(li.inputFiles()) == 1 else li
    span_id = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    spans = li.select(
        F.lit(None).cast("long").alias("trace_id_high"),
        F.col("l_orderkey").cast("long").alias("trace_id"),
        span_id.cast("long").alias("id"),
        (F.col("l_orderkey") * 10).cast("long").alias("parent_id"),
        epoch_us("l_shipdate").alias("start_ts"),
    )

    style = F.col("l_linenumber") % 5
    owner = _svc("svc", F.col("l_orderkey"), 13)
    peer = _svc("svc", F.col("l_suppkey"), 13)

    # ONE lineitem scan: build the per-style annotation array and explode,
    # instead of an 11-way union that re-scans the table 11 times (same rows,
    # any order — downstream pivots are order-insensitive max() aggregates).
    def a(key, value, a_type=-1):
        return F.struct(
            F.lit(key).alias("a_key"),
            value.cast("string").alias("endpoint_service_name"),
            F.lit(a_type).cast("int").alias("a_type"),
        )

    per_style = (
        F.when(style == 0, F.array(a("sr", owner), a("ca", peer, 0)))
        .when(style == 1, F.array(a("cs", owner), a("sa", peer, 0), a("http.path", F.lit("/noise"))))
        .when(style == 2, F.array(a("cs", owner)))
        .when(style == 3, F.array(a("ms", owner), a("ma", peer, 0)))
        .otherwise(F.array(a("mr", owner), a("ma", peer, 0)))
    )
    with_error = F.when(
        F.col("l_returnflag") == "R",
        F.concat(per_style, F.array(a("error", F.lit("x"), 6))),
    ).otherwise(per_style)
    annos = li_a.select(
        F.lit(None).cast("long").alias("trace_id_high"),
        F.col("l_orderkey").cast("long").alias("trace_id"),
        span_id.cast("long").alias("span_id"),
        F.explode(with_error).alias("_a"),
    ).select(
        "trace_id_high", "trace_id", "span_id",
        F.col("_a.a_key").alias("a_key"),
        F.col("_a.endpoint_service_name").alias("endpoint_service_name"),
        F.col("_a.a_type").alias("a_type"),
    )
    return spans, annos


#: DuckDB CTEs mirroring derived_v1_tables. Keep in lockstep.
V1_SQL_CTES = """
v1_base AS (
  SELECT CAST(l_orderkey AS BIGINT) AS trace_id,
         CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS span_id,
         'svc-' || CAST(l_orderkey % 13 AS VARCHAR) AS owner,
         'svc-' || CAST(l_suppkey % 13 AS VARCHAR) AS peer,
         l_linenumber % 5 AS style,
         l_returnflag
  FROM lineitem
),
v1_spans AS (
  SELECT CAST(l_orderkey AS BIGINT)                      AS trace_id,
         CAST(l_orderkey * 10 + l_linenumber AS BIGINT)  AS id,
         CAST(l_orderkey * 10 AS BIGINT)                 AS parent_id,
         epoch_us(l_shipdate)                            AS start_ts
  FROM lineitem
),
v1_annos AS (
  SELECT trace_id, span_id, 'sr' AS a_key, owner AS endpoint_service_name, -1 AS a_type FROM v1_base WHERE style = 0
  UNION ALL SELECT trace_id, span_id, 'ca', peer, 0 FROM v1_base WHERE style = 0
  UNION ALL SELECT trace_id, span_id, 'cs', owner, -1 FROM v1_base WHERE style = 1
  UNION ALL SELECT trace_id, span_id, 'sa', peer, 0 FROM v1_base WHERE style = 1
  UNION ALL SELECT trace_id, span_id, 'cs', owner, -1 FROM v1_base WHERE style = 2
  UNION ALL SELECT trace_id, span_id, 'ms', owner, -1 FROM v1_base WHERE style = 3
  UNION ALL SELECT trace_id, span_id, 'ma', peer, 0 FROM v1_base WHERE style = 3
  UNION ALL SELECT trace_id, span_id, 'mr', owner, -1 FROM v1_base WHERE style = 4
  UNION ALL SELECT trace_id, span_id, 'ma', peer, 0 FROM v1_base WHERE style = 4
  UNION ALL SELECT trace_id, span_id, 'error', 'x', 6 FROM v1_base WHERE l_returnflag = 'R'
  UNION ALL SELECT trace_id, span_id, 'http.path', '/noise', -1 FROM v1_base WHERE style = 1
)
"""

#: The v1→v2 reconstruction matrix in SQL (the oracle re-derives the spec of
#: sources/v1.py independently — mysql/.../DependencyLinkSpanIterator.java
#: semantics, per-row reading as documented there).
V1_RECONSTRUCT_SQL = (
    "WITH "
    + V1_SQL_CTES.strip().lstrip()
    + """,
pivoted AS (
  SELECT s.trace_id, s.id, max(s.parent_id) AS parent_id,
         max(CASE WHEN a_key = 'lc' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS lc,
         max(CASE WHEN a_key = 'ca' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS ca0,
         max(CASE WHEN a_key = 'cs' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS cs,
         max(CASE WHEN a_key = 'sa' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS sa,
         max(CASE WHEN a_key = 'sr' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS sr,
         max(CASE WHEN a_key = 'ma' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS ma,
         max(CASE WHEN a_key = 'mr' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS mr,
         max(CASE WHEN a_key = 'ms' AND endpoint_service_name <> '' THEN endpoint_service_name END) AS ms,
         coalesce(max(a_key = 'error' AND a_type = 6), false) AS is_error
  FROM v1_spans s LEFT OUTER JOIN v1_annos a
    ON s.trace_id = a.trace_id AND s.id = a.span_id
   AND a.a_key IN ('lc','ca','cs','sa','sr','ma','ms','mr','error')
  GROUP BY s.trace_id, s.id
),
matrix AS (
  SELECT trace_id, id, parent_id,
         CASE WHEN sr IS NOT NULL THEN 'SERVER'
              WHEN sa IS NOT NULL THEN (CASE WHEN cs IS NOT NULL THEN 'CLIENT' END)
              WHEN cs IS NOT NULL THEN 'SERVER'
              WHEN mr IS NOT NULL THEN 'CONSUMER'
              WHEN ms IS NOT NULL THEN 'PRODUCER' END AS kind,
         CASE WHEN sr IS NOT NULL THEN sr
              WHEN sa IS NOT NULL THEN coalesce(ca, lc)
              WHEN cs IS NOT NULL THEN ca
              WHEN mr IS NOT NULL THEN mr
              WHEN ms IS NOT NULL THEN ms END AS local_service,
         CASE WHEN sr IS NOT NULL THEN ca
              WHEN sa IS NOT NULL THEN sa
              WHEN cs IS NOT NULL THEN NULL
              WHEN mr IS NOT NULL OR ms IS NOT NULL THEN ma END AS remote_service,
         is_error
  FROM (
    SELECT trace_id, id, parent_id, lc, cs, sa, sr, ma, mr, ms, is_error,
           CASE WHEN sa IS NOT NULL AND sa = coalesce(ca0, cs) THEN NULL
                ELSE coalesce(ca0, cs) END AS ca
    FROM pivoted
  )
)
SELECT lpad(lower(to_hex(trace_id)), 16, '0') AS trace_id,
       CASE WHEN parent_id IS NOT NULL AND parent_id <> 0
            THEN lpad(lower(to_hex(parent_id)), 16, '0') END AS parent_id,
       lpad(lower(to_hex(id)), 16, '0') AS id,
       kind, local_service, remote_service, is_error
FROM matrix
"""
)
