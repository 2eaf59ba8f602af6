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
