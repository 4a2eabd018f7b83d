"""Near-duplicate clustering: connected components over verified near-dup
pairs — the operator that turns pairwise similarity output into the thing a
dedup pipeline actually consumes (one cluster id per document, keep one per
cluster).

Spark has no built-in iterative graph operator; this is the classic
min-label-propagation loop expressed in DataFrame ops:

    labels    ← every node labeled with itself
    repeat:   label(n) ← min(label(n), min over neighbors' labels)
    until     no label changed

Each iteration is one join + one aggregate; the loop converges in
O(graph diameter) iterations, and near-dup clusters are shallow (dup groups
are dense — diameters of 2-4), so 5-10 iterations close real corpora. The
driver only ever sees the one-row convergence count, never the labels.

Scale notes (100 TB):
- ``localCheckpoint`` truncates lineage each iteration — without it the plan
  doubles per round and planning time explodes by iteration ~8;
- the join is label-cardinality (nodes), not corpus-cardinality: only ids in
  at least one candidate pair enter the loop; isolated documents get their
  own id as component by the final coalesce, costing nothing;
- for graphs with continent-sized components (adversarial, not dup-shaped),
  swap in the large-star/small-star variant — same contract, fewer rounds;
  the oracle and tests don't change.

Reference parity note: the reference has no graph operators at all
(SURVEY §2 — zero joins beyond the pushed MySQL one); this is an extension
operator (SURVEY §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Undirected edge list → (id, component), component = min id reachable.

    Deterministic: labels are ids, min is order-free. Raises if the loop
    hasn't converged after ``max_iterations`` (a dup graph needing more is a
    sign the candidate generator is broken, not a reason to loop forever)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy(edges.src.alias("id"))
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left_outer")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
                (F.col("neighbor_component") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def near_dup_clusters(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents → (id, component): exact n-gram-Jaccard verified pairs,
    clustered. Isolated documents are their own (singleton) component —
    downstream keeps ``min(id) per component`` and drops the rest."""
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold)
    comp = connected_components(pairs)
    return docs.select(F.col(id_col).alias("id")).join(
        comp, "id", "left_outer"
    ).select("id", F.coalesce("component", "id").alias("component"))
