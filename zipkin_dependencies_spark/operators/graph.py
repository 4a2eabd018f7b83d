"""Service-graph analytics over the dependency-links table — centrality
(weighted PageRank) and per-service trace-size distributions. Extension
operators: the reference STOPS at the links table; these are the questions
an operator asks of it ("which service is most depended on", "how big are
the traces touching svc-X").

Scale note up front: everything here consumes the LINKS table (O(services²)
rows — KBs even for a 100 TB span corpus) or per-(trace, service) counts
(one row per trace-service pair, the same cardinality class as the
linker's own map-side output). Nothing in this module re-reads spans more
than once, and the iterative part iterates over the tiny graph, never the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def service_pagerank(
    links: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """→ (service, rank9): call-count-weighted PageRank of the service
    dependency graph, ``iterations`` unrolled rounds from a uniform start.

    Convention (kept deliberately simple so the SQL twin is an exact
    unroll): rank' = (1-d)/N + d·Σ_in rank·w/w_out, ranks ROUNDED to 9
    decimals after every round — the rounding pins cross-engine float
    parity (per-round accumulated error ~1e-15 « 0.5e-9) and makes the
    fixed point bit-stable. Dangling mass is not redistributed (documented
    simplification; ranks then sum to < 1 when sinks exist).

    The links input is MATERIALIZED once up front (eager localCheckpoint —
    services² rows, trivially small): the iteration references the edge
    table many times (nodes, out-weights, one join per round), and a lazy
    plan would inline the caller's full span→links pipeline at every
    reference — at 100 TB that is several full corpus scans for one graph.
    After the checkpoint each round is a broadcast-scale join over the
    tiny materialized table."""
    edges = links.select(
        F.col("parent"), F.col("child"), F.col("call_count").cast("double").alias("w")
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("parent").alias("service"))
        .unionByName(edges.select(F.col("child").alias("service")))
        .distinct()
    )
    n_total = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    out_w = edges.groupBy("parent").agg(F.sum("w").alias("w_out"))

    ranks = nodes.join(F.broadcast(n_total)).select(
        "service", F.round(F.lit(1.0) / F.col("n"), 9).alias("rank9")
    )
    for _ in range(iterations):
        contribs = (
            edges.join(out_w, "parent")
            .join(ranks.withColumnRenamed("service", "parent"), "parent")
            .select(
                F.col("child").alias("service"),
                (F.col("rank9") * F.col("w") / F.col("w_out")).alias("c"),
            )
            .groupBy("service")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "service", "left_outer")
            .join(F.broadcast(n_total))
            .select(
                "service",
                F.round(
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("in_sum"), F.lit(0.0)),
                    9,
                ).alias("rank9"),
            )
        )
    return ranks


def pagerank_sql(links_sql: str, iterations: int = 3, damping: float = 0.85) -> str:
    """DuckDB twin: the same unrolled rounds over a CTE producing
    (parent, child, call_count) — pass the links-derivation SQL in."""
    d = damping
    ctes = [
        f"links AS ({links_sql})",
        "edges AS (SELECT parent, child, CAST(call_count AS DOUBLE) AS w FROM links)",
        "nodes AS (SELECT DISTINCT service FROM "
        "(SELECT parent AS service FROM edges UNION SELECT child FROM edges))",
        "n_total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "out_w AS (SELECT parent, sum(w) AS w_out FROM edges GROUP BY 1)",
        "r0 AS (SELECT service, round(1.0 / n, 9) AS rank9 FROM nodes, n_total)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.child AS service, sum(r.rank9 * e.w / o.w_out) AS in_sum
  FROM edges e JOIN out_w o ON e.parent = o.parent
  JOIN r{i-1} r ON r.service = e.parent
  GROUP BY 1
),
r{i} AS (
  SELECT nodes.service,
         round((1.0 - {d}) / n_total.n
               + {d} * coalesce(c{i}.in_sum, 0.0), 9) AS rank9
  FROM nodes LEFT JOIN c{i} ON nodes.service = c{i}.service, n_total
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT service, rank9 FROM r{iterations}"
    )


def trace_size_percentiles(
    spans: DataFrame,
    service_col: str = "local_service",
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """→ (service, n_traces, p50, p95, max_size): distribution of
    spans-per-trace for traces each service participates in — the "how big
    are traces through svc-X" capacity-planning view.

    Two aggregates: per-(trace, service) span counts (the only span-scale
    shuffle, map-side combined), then exact interpolated percentiles per
    service over those counts (group cardinality = traces × avg services
    per trace — the same class as the linker's shuffle, not bigger).
    Expects the flat span projection (trace_id + service string)."""
    sizes = (
        spans.filter(F.col(service_col).isNotNull())
        .groupBy("trace_id", F.col(service_col).alias("service"))
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    aggs = [F.count(F.lit(1)).alias("n_traces")]
    for p in percentiles:
        aggs.append(
            F.round(F.percentile("n_spans", F.lit(p)), 9).alias(
                f"p{int(p * 100)}"
            )
        )
    aggs.append(F.max("n_spans").alias("max_size"))
    return sizes.groupBy("service").agg(*aggs)


def trace_size_percentiles_sql(
    spans_cte: str, percentiles: tuple[float, ...] = (0.5, 0.95)
) -> str:
    """DuckDB twin: quantile_cont matches Spark's exact ``percentile``."""
    pct_cols = ", ".join(
        f"round(quantile_cont(n_spans, {p}), 9) AS p{int(p * 100)}"
        for p in percentiles
    )
    return f"""
WITH {spans_cte.strip()},
sizes AS (
  SELECT trace_id, local_service AS service,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM spans WHERE local_service IS NOT NULL
  GROUP BY 1, 2
)
SELECT service, CAST(count(*) AS BIGINT) AS n_traces, {pct_cols},
       max(n_spans) AS max_size
FROM sizes GROUP BY service
"""


def service_reachability(
    links: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """→ (service, downstream, hops): every service reachable from
    ``service`` in ≤ ``max_hops`` calls, with the MINIMUM hop count — the
    "blast radius" query over the dependency graph ("if svc-X degrades,
    who is downstream?").

    Hop-bounded unrolled expansion (no fixpoint probe, same discipline as
    ``service_pagerank``): frontier(k) = frontier(k-1) ⋈ edges, unioned
    with min-hop dedup at the end. All integer arithmetic — no float
    parity concerns — and every join is links-table-sized (services²
    ceiling), so the corpus is never touched. Self-loops collapse
    (service ≠ downstream enforced on output)."""
    edges = (
        links.select(F.col("parent"), F.col("child"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = edges.select(
        F.col("parent").alias("service"),
        F.col("child").alias("downstream"),
        F.lit(1).alias("hops"),
    )
    layers = [frontier]
    for _ in range(max_hops - 1):
        f, e = frontier.alias("f"), edges.alias("e")
        frontier = (
            f.join(e, F.col("f.downstream") == F.col("e.parent"))
            .select(
                F.col("f.service").alias("service"),
                F.col("e.child").alias("downstream"),
                (F.col("f.hops") + 1).alias("hops"),
            )
            .distinct()
        )
        layers.append(frontier)
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    return (
        out.filter(F.col("service") != F.col("downstream"))
        .groupBy("service", "downstream")
        .agg(F.min("hops").cast("int").alias("hops"))
    )


def reachability_sql(links_sql: str, max_hops: int = 3) -> str:
    """DuckDB twin: the same unrolled hop expansion over the links CTE."""
    ctes = [
        f"links AS ({links_sql})",
        "edges AS (SELECT DISTINCT parent, child FROM links)",
        "h1 AS (SELECT parent AS service, child AS downstream, 1 AS hops FROM edges)",
    ]
    for i in range(2, max_hops + 1):
        ctes.append(
            f"h{i} AS (SELECT DISTINCT h.service, e.child AS downstream, {i} AS hops "
            f"FROM h{i-1} h JOIN edges e ON h.downstream = e.parent)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM h{i}" for i in range(1, max_hops + 1))
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT service, downstream, CAST(min(hops) AS INT) AS hops
FROM ({union}) WHERE service <> downstream
GROUP BY service, downstream"""
    )


def service_components(links: DataFrame, max_rounds: int = 16) -> DataFrame:
    """→ (service, component): undirected connected components of the
    dependency graph, component id = lexicographically smallest service
    name in the component — "how many independent systems live in this
    trace corpus, and who belongs to which" (the macro complement of the
    per-service clustering coefficient).

    Min-label propagation with a convergence probe: each round every
    vertex takes the min of its own label and its neighbors' labels; the
    loop exits as soon as a round changes NOTHING (counting changed rows
    on the already-materialized frame — the linker's E4 early-exit
    discipline), with ``max_rounds`` as the cycle-proof upper bound.
    Rounds needed = graph diameter; every join and aggregate is at
    services² (links-table) cardinality — the span corpus is never
    touched after the linker, so the iteration cost is microscopic at any
    data scale. Labels are service-name strings and min is lexicographic,
    making the fixpoint engine-exact (the DuckDB twin computes true
    components via recursive closure; equality of the two REQUIRES the
    propagation to have converged, so the gate also proves convergence)."""
    sym = links.select(
        F.col("parent").alias("a"), F.col("child").alias("b")
    ).filter(F.col("a") != F.col("b"))
    edges = (
        sym.unionByName(
            sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("service"))
        .distinct()
        .select("service", F.col("service").alias("component"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_rounds):
        l, e = labels.alias("l"), edges.alias("e")
        neighbor_min = (
            e.join(l, F.col("e.a") == F.col("l.service"))
            .groupBy(F.col("e.b").alias("service"))
            .agg(F.min("l.component").alias("_nmin"))
        )
        new_labels = (
            labels.alias("cur")
            .join(neighbor_min.alias("nm"), "service", "left_outer")
            .select(
                "service",
                F.least(
                    F.col("cur.component"), F.col("nm._nmin")
                ).alias("component"),
                (
                    F.least(F.col("cur.component"), F.col("nm._nmin"))
                    != F.col("cur.component")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        converged = new_labels.filter(F.col("_changed")).isEmpty()
        labels = new_labels.select("service", "component")
        if converged:
            break
    if not converged:
        # falling through silently would return WRONG (unconverged) labels
        # on a graph whose diameter exceeds max_rounds — and only an
        # oracle-gated caller would notice. Same discipline as
        # connected_components in llm/cluster.py: fail loudly; callers
        # with long-chain graphs raise max_rounds or use the star variant.
        raise RuntimeError(
            f"service_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds max_rounds; raise it or use "
            "connected_components_star)"
        )
    return labels


def service_components_sql(links_sql: str) -> str:
    """DuckDB twin: true components via recursive undirected closure —
    component(v) = min over everything v reaches (plus v itself)."""
    return f"""
WITH RECURSIVE links AS ({links_sql}),
sym AS (
  SELECT parent AS a, child AS b FROM links WHERE parent <> child
  UNION
  SELECT child AS a, parent AS b FROM links WHERE parent <> child
),
reach(v, u) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.v, s.b FROM reach r JOIN sym s ON s.a = r.u WHERE s.b <> r.v
)
SELECT v AS service, least(v, min(u)) AS component
FROM reach GROUP BY v
"""


def kcore(
    edges: DataFrame,
    k: int = 3,
    id_a: str = "a",
    id_b: str = "b",
    max_rounds: int = 32,
) -> DataFrame:
    """→ (node, core_degree): the k-core of the undirected graph — the
    maximal subgraph where every vertex keeps ≥ k distinct neighbors —
    by iterative peeling (drop all vertices with degree < k, recompute,
    repeat until stable). The classic cohesion filter a co-occurrence
    graph runs before community detection: peeling strips the long tail
    of incidental pairs, the core keeps the dense heart.

    Every round is one map-side-combined degree aggregate plus two
    semi-joins at EDGE cardinality (the node set never re-touches the
    source data), with the same fail-loud discipline as
    service_components: a RuntimeError rather than silently returning a
    half-peeled graph when max_rounds is exhausted. Rounds needed =
    number of cascade waves, ≤ peeled-vertex count, in practice a
    handful. Deterministic: the peel set per round is a pure function of
    the graph, so the fixpoint (unlike iteration traces) is engine-exact
    — the DuckDB twin unrolls the same peeling.

    r10 loop-cost shape (guide §1.2/§2.4 — the cascade runs a
    driver-synced round per wave, so per-round fixed cost multiplies by
    wave count at any scale): TWO jobs per round instead of four. The
    keep set is NOT separately materialized — it inlines twice into the
    peeled frame's plan (two map-side degree aggregates over the
    checkpointed edges, cheaper than an extra materialization barrier) —
    and convergence is detected by EDGE-COUNT equality on the already-
    checkpointed result instead of a separate node/keep count pair: an
    edge survives iff both endpoints kept, so the peel dropped nothing
    ⟺ the edge count is unchanged (the degree aggregate sees every
    node with ≥1 edge by construction, so "no edge dropped" ⟺ "no
    node below k")."""
    sym = (
        edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    cur = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = cur.count()
    converged = False
    for _ in range(max_rounds):
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("a")
        cur = (
            cur.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_next = cur.count()
        if n_next == n_prev:
            converged = True
            break
        n_prev = n_next
    if not converged:
        raise RuntimeError(
            f"kcore did not stabilize in {max_rounds} rounds "
            "(pathological cascade; raise max_rounds)"
        )
    return cur.groupBy("a").agg(F.count(F.lit(1)).alias("core_degree")).select(
        F.col("a").alias("node"), "core_degree"
    )


def kcore_sql(edges_sql: str, k: int, rounds: int = 32) -> str:
    """DuckDB twin of ``kcore``: the same peeling unrolled ``rounds``
    times as a CTE chain (degree aggregate + two semi-joins per round —
    the pointer-doubling-oracle discipline: a fixed unroll that provably
    covers the fixture's cascade depth, so green also proves the Spark
    loop CONVERGED within the unroll)."""
    # every CTE MATERIALIZED: DuckDB inlines plain CTEs, and each round
    # references its predecessor three times — an un-materialized chain
    # expands 3^rounds ways (measured: "too many open files" at 16 rounds)
    ctes = [
        f"raw AS MATERIALIZED ({edges_sql})",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM raw UNION ALL SELECT b AS a, a AS b FROM raw
  ) WHERE a <> b
)""",
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
  SELECT a FROM (SELECT a, count(*) AS c FROM {prev} GROUP BY a)
  WHERE c >= {k}
),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  SEMI JOIN k{r} x ON e.a = x.a
  SEMI JOIN k{r} y ON e.b = y.a
)"""
        )
        prev = f"e{r}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a AS node, CAST(count(*) AS BIGINT) AS core_degree "
        f"FROM {prev} GROUP BY a"
    )


def lpa_communities(
    edges: DataFrame,
    rounds: int = 3,
    id_a: str = "a",
    id_b: str = "b",
    weight_col: str | None = None,
) -> DataFrame:
    """→ (node, community): weighted label propagation, ``rounds``
    SYNCHRONOUS unrolled rounds — the community-detection pass a
    co-occurrence graph runs after k-core peeling (Raghavan et al. 2007,
    "Near linear time algorithm to detect community structures" — public
    method; this is the deterministic fixed-round variant).

    Every node starts labeled with itself; each round, every node adopts
    the label with the LARGEST total incident edge weight among its
    neighbors' current labels, ties broken by the SMALLEST label. Fixed
    synchronous rounds — no convergence probe — because sync LPA can
    oscillate on bipartite structures and a convergence loop would hang
    there; a fixed unroll is deterministic on every input, and the DuckDB
    twin (``lpa_sql``) unrolls the identical rounds, so the gate compares
    the exact same fixpoint-or-not state. Labels are node ids and the
    update is a pure argmax — no floats anywhere, bit-exact by
    construction.

    Scale: each round is one edge-cardinality join (labels attach to the
    neighbor side) + one map-side-combinable (node, label) weight sum +
    one ``max_by`` argmax per node — never a window, never a collect;
    ``localCheckpoint`` per round truncates the lineage exactly like
    ``connected_components``. Nodes derive from the edge list (an
    isolated node never enters; callers coalesce like the components
    operators)."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    half = edges.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b"), w.alias("w")
    ).filter(F.col("a") != F.col("b"))
    sym = (
        half.unionByName(
            half.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
            )
        )
        # parallel edges collapse (max weight) so both engines see one
        # canonical weight per (a, b) whatever the caller's edge list held
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(rounds):
        labels = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a.alias("node"), F.col("label"))
            .agg(F.sum("w").alias("wt"))
            .groupBy("node")
            .agg(
                F.expr("max_by(label, struct(wt, -label))").alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def lpa_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB twin of ``lpa_communities``: the same synchronous rounds
    unrolled as a CTE chain (materialized — same 3^rounds inlining hazard
    as ``kcore_sql``). ``edges_sql`` must yield (a, b, w)."""
    ctes = [
        f"raw AS MATERIALIZED ({edges_sql})",
        """e AS MATERIALIZED (
  SELECT a, b, max(w) AS w FROM (
    SELECT a, b, w FROM raw WHERE a <> b
    UNION ALL
    SELECT b AS a, a AS b, w FROM raw WHERE a <> b
  ) GROUP BY a, b
)""",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM e)",
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT e.a AS node, l.label, sum(e.w) AS wt,
           row_number() OVER (
             PARTITION BY e.a
             ORDER BY sum(e.w) DESC, l.label ASC
           ) AS rn
    FROM e JOIN {prev} l ON e.b = l.node
    GROUP BY e.a, l.label
  ) WHERE rn = 1
)"""
        )
        prev = f"l{r}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label AS community FROM {prev}"
    )
