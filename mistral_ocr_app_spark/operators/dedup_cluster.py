"""Near-duplicate clustering: candidate pairs → connected components →
canonical document per cluster.

The d-family queries (operators/corpus.py) emit candidate PAIRS
(MinHash/SimHash bucket collisions, embedding near-dups). A dedup
pipeline must then pick one survivor per duplicate CLUSTER, which is
connected components over the pair graph. At 10¹²-doc scale that is an
iterative DataFrame job — min-label propagation (each vertex adopts the
smallest label among itself and its neighbors) combined with pointer
jumping (each vertex then adopts its LABEL's label — path compression),
the two-phase formulation of MapReduce connected components (Kiveris et
al., "Connected Components in MapReduce and Beyond", public). Neighbor-
min alone moves labels one hop per round (O(diameter) rounds — a long
chain stalls); with the jumping step label distances halve per round,
giving O(log n) convergence on any graph.

No driver-side graph materialization: edges and labels stay DataFrames;
the only driver values are per-iteration convergence counts.
``localCheckpoint`` truncates the growing lineage each iteration (the
plan would otherwise deepen linearly and re-execute from the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """pairs(src, dst) → (doc_id, component) with component = min doc_id
    reachable. Raises if not converged within ``max_iter`` — with
    pointer jumping that bound covers graphs astronomically larger than
    any real corpus (2^25 ≫ 10¹² path length)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # phase 1 — neighbor min: component = min over {self} ∪ neighbors
        nbr_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(nbr_min, labels.doc_id == nbr_min.u, "left").select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", "component")
            ).alias("component"),
        )
        # phase 2 — pointer jumping: component = component's component
        # (halves every label's distance to its cluster minimum)
        parent = stepped.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        new_labels = (
            stepped.join(parent, stepped.component == parent.p_id, "left")
            .select(
                "doc_id",
                F.coalesce("p_comp", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def canonicalize(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Full dedup mapping: every doc → its canonical survivor.

    Docs not in any pair map to themselves; paired docs map to the
    smallest id in their connected component (the reference-style
    deterministic winner — same min-id rule as d1's ``canonical_id``)."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=20)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )
