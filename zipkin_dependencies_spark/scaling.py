"""Parallelism guards for CPU-heavy narrow stages.

Catalyst sizes scan partitions by BYTES (spark.sql.files.maxPartitionBytes),
which is right for I/O-bound scans and wrong for compute-bound projections:
a 5 MB parquet of 5k documents becomes ONE task, and a per-row kernel that
costs ~30 ms/doc then runs 150 s on a single core while 31 sit idle. (That
exact pathology: the MinHash signature stage pinned one executor thread at
100% for minutes in bench runs.)

At 100 TB inputs arrive in thousands of partitions and this helper is a
no-op — it only widens inputs that are *narrower* than the session's core
count, so the cost (one extra round-robin exchange of the narrow input) is
paid exactly when the alternative is a serial stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism when
    the plan would otherwise run in fewer tasks. Never decreases partitions."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
