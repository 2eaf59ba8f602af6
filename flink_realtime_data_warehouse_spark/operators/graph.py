"""Distributed connected components — transitive near-duplicate groups.

LSH candidate pairs (``dedup.minhash_lsh_candidate_pairs``) are edges;
the duplicate *group* is the connected component (A~B, B~C ⇒ {A,B,C}
even when A and C never collide in a band). A curation pipeline keeps
one representative per component — the closure the round-1 pipeline
deferred (VERDICT.md: "connected-components for transitive dups
deferred").

Algorithm: iterative min-label propagation. Each round every vertex
takes the minimum label among itself and its neighbors; convergence in
O(component diameter) rounds. Near-dup components are tiny and shallow
(dozens of documents), so the round count stays small at any corpus
size; each round is one shuffle join + one aggregation, all JVM-side.
Lineage is truncated per round (``localCheckpoint``) so the plan stays
flat across iterations. For pathological graph shapes (web-scale link
graphs with huge diameters) the two-phase large-star/small-star
variant halves the rounds — not needed for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Label every vertex with the minimum vertex id of its component.

    ``edges``: (src, dst) undirected pairs (each pair once is enough);
    ``vertices``: (id) — must include isolated vertices.
    Returns (id, label).
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # only edge-connected vertices need iteration — for a dedup workload
    # that set is a sliver of the corpus (pairs, not documents), so each
    # round's join runs over thousands of rows even on a 100 TB corpus;
    # isolated vertices keep their own label by construction
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    converged = False
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels["id"] == neigh_min["src"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("new_label"),
                F.col("label").alias("old_label"),
            )
        ).localCheckpoint()
        converged = new_labels.filter(F.col("new_label") != F.col("old_label")).isEmpty()
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        if converged:
            break
    if not converged:
        # a component with diameter > max_iter would otherwise silently
        # keep split labels and corrupt dedup groups downstream (ADVICE
        # r2) — fail loudly; callers can raise max_iter for deep graphs
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "a component has diameter > max_iter — raise max_iter"
        )
    return (
        vertices.select("id")
        .join(labels.withColumnRenamed("id", "cid"), F.col("id") == F.col("cid"), "left")
        .select("id", F.coalesce("label", "id").alias("label"))
    )


# ---------------------------------------------------------------------------
# PageRank over the event-transition graph
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000_000  #: fixed-point scale (1e9)
PR_ITERS = 5
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  #: damping 0.85 as a ratio


def pagerank_fixed_point(nodes: DataFrame, edges: DataFrame, n_nodes: int,
                         iters: int = PR_ITERS) -> DataFrame:
    """PageRank in scaled-integer arithmetic — bit-identical anywhere.

    Float PageRank is not oracle-checkable: summation order perturbs
    the low bits and K iterations amplify the drift. Here ranks are
    fixed-point BIGINTs (×1e9) and every division is integer division
    on positive operands, so Spark and any SQL engine converge to the
    SAME integers.

    Scale shape: the expensive pass (facts → transition counts) runs
    ONCE and is checkpointed; the K iterations join rank(|V| rows)
    against the edge aggregate (|V|² max, event-type graphs are tiny)
    — the fact table is never rescanned. Per-edge transfer uses the
    precomputed scaled ratio ``p = w·SCALE/outw ≤ SCALE``, keeping
    every product ≤ 1e18 (no BIGINT overflow); corpora where a single
    edge weight exceeds ~1e9 should lift ranks to DECIMAL(38,0).

    ``nodes``: (node); ``edges``: (src, dst, p).
    """
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE) // (PR_DAMP_DEN * n_nodes)
    edges = edges.localCheckpoint(eager=True)
    r = nodes.withColumn("r", F.lit(PR_SCALE // n_nodes))
    for _ in range(iters):
        contrib = (
            edges.join(r, edges["src"] == r["node"])
            .select("dst", F.expr(f"(r * p) div {PR_SCALE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        r = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(c, 0)) div {PR_DAMP_DEN}"
                    )
                ).alias("r"),
            )
        )
    return r


def _pagerank_oracle() -> str:
    """Unrolled-CTE oracle: the same fixed-point iterations in SQL."""
    iters = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""r{k} AS (
  SELECT nodes.node,
         CAST((SELECT ({PR_DAMP_DEN - PR_DAMP_NUM}::BIGINT * {PR_SCALE}) // ({PR_DAMP_DEN} * n) FROM nn)
         + ({PR_DAMP_NUM}::BIGINT * coalesce(s.c, 0)) // {PR_DAMP_DEN} AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum(({prev}.r * e.p) // {PR_SCALE}) AS c
    FROM edges e JOIN {prev} ON e.src = {prev}.node
    GROUP BY e.dst) s USING (node))""")
        prev = f"r{k}"
    iters_sql = ",\n".join(iters)
    return f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL),
tr AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev),
w_edges AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
outw AS (SELECT src, sum(w) AS ow FROM w_edges GROUP BY 1),
edges AS (
  SELECT e.src, e.dst, (e.w * {PR_SCALE}::BIGINT) // o.ow AS p
  FROM w_edges e JOIN outw o ON e.src = o.src),
nodes AS (SELECT DISTINCT event_type AS node FROM ev),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, (SELECT {PR_SCALE} // n FROM nn) AS r FROM nodes),
{iters_sql}
SELECT node AS event_type, CAST(r AS BIGINT) AS rank_e9 FROM {prev} ORDER BY event_type
"""


@query("graph_pagerank_event_transitions", oracle=_pagerank_oracle())
def graph_pagerank_event_transitions(spark, sf_dir: str) -> DataFrame:
    """PageRank centrality of event types in the user-journey graph.

    Edges = consecutive-event transitions per user (deterministic
    (ts, event_id) ordering); weights = transition counts. The rank
    answers "which page/event type is most central to user flows" —
    the ADS-layer analysis the reference's traffic theme feeds.
    """
    from flink_realtime_data_warehouse_spark.sources.tables import load_table
    from pyspark.sql.window import Window

    # NULL ts would sort NULLS FIRST in Spark but NULLS LAST in DuckDB,
    # silently changing the transition edges — filter keys on BOTH sides
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(win).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    w_edges = tr.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outw = w_edges.groupBy("src").agg(F.sum("w").alias("ow"))
    edges = w_edges.join(outw, "src").select(
        "src", "dst", F.expr(f"(w * {PR_SCALE}) div ow").alias("p")
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    n_nodes = nodes.count()  # O(|event types|) — bounded driver action
    if n_nodes == 0:
        return spark.createDataFrame([], "event_type string, rank_e9 bigint")
    ranks = pagerank_fixed_point(nodes, edges, n_nodes)
    return ranks.select(
        F.col("node").alias("event_type"), F.col("r").alias("rank_e9")
    ).orderBy("event_type")
