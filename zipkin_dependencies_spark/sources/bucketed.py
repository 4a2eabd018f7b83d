"""Bucketed span storage: the G1-parity path that removes the grouping
shuffle entirely (SURVEY §2.5 G1, §4 "shuffle-free grouping", §7 M4).

The reference's Cassandra path groups spans without a full shuffle because
the scan is already clustered by the table's partition key
(cassandra3/.../CassandraDependenciesJob.java:220 ``spanBy``). The Spark
equivalent is hash bucketing: write spans ``bucketBy(N, trace_key)`` once,
and every downstream daily run reads each bucket as one task that already
holds complete traces — the repartition exchange in the linker pipeline
(its ONE span-scale shuffle) disappears.

At 100 TB this moves the shuffle cost from every-daily-run to
once-at-ingest: the writer pays it, the (many) readers don't. Spans land
bucketed at ingest time anyway when the collector writes through this
module, so in steady state nobody pays it.

Bucket count: fixed at write time, so pick for the TARGET scale, not
today's — e.g. 4096 buckets keeps buckets ≤ ~25 GB at 100 TB/day and still
gives full parallelism on a 1000-executor cluster. Local tests use small
counts; the layout is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_spans_bucketed(
    normalized_spans: DataFrame,
    table: str,
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist normalized spans hash-bucketed by ``trace_key``.

    Catalog-registered (bucket metadata lives in the table catalog — plain
    ``read.parquet`` can't see bucketing); ``path`` makes it an external
    table. Sorting within buckets is NOT requested: the linker re-sorts
    within partitions anyway (multi-file buckets would lose the scan-order
    guarantee), and skipping it makes ingest cheaper."""
    writer = normalized_spans.write.mode(mode).bucketBy(num_buckets, "trace_key")
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_spans_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed span table. The scan's output partitioning is
    ``HashPartitioning(trace_key, N)`` — pass ``clustered=True`` to
    ``links_from_spans`` / ``trace_links_partitioned`` so the linker skips
    its repartition and the whole daily job runs shuffle-free up to the
    (link-cardinality) final aggregate."""
    return spark.table(table)
