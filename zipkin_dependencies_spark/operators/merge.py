"""CDC upsert merge: apply a change batch (insert / update / delete
rows with a version column) to a base snapshot and produce the next
snapshot — the MERGE INTO semantics every lakehouse table format
(Delta/Iceberg/Hudi) builds on, expressed as plain DataFrame ops so
the engine's contract is explicit and oracle-checkable.

Latest-wins per key: if a key appears several times in the change
batch, only the highest (version, tiebreak) change applies — the
standard CDC compaction rule, computed with a ``max_by`` hash
aggregate (no window sort). Semantics: the winning change is D →
key disappears; U/I → the change's payload replaces (or creates) the
row; keys untouched by the batch pass through.

Scale (100 TB base, GB-scale change batch): one key exchange for the
change compaction (batch-sized), one join keyed on the primary key —
with a bucketed base table that join is shuffle-free on the base side
(sources/bucketed.py), which is exactly how a lakehouse lays out the
table. Nothing driver-sized anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_merge(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    version_col: str = "version",
) -> DataFrame:
    """→ the next snapshot, same schema as ``base``. ``changes`` must
    carry ``key_col``, ``op_col`` in {'I','U','D'}, ``version_col``
    (integral), and the base's payload columns (ignored for D)."""
    payload = [c for c in base.columns if c != key_col]
    latest = changes.groupBy(key_col).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("_op"), *payload),
            F.struct(F.col(version_col), F.col(op_col)),
        ).alias("_w")
    )
    survivors = base.join(latest, key_col, "left_anti")
    applied = (
        latest.filter(F.col("_w._op") != "D")
        .select(key_col, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return survivors.unionByName(applied)
