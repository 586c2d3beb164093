"""Connected components over near-dup pairs (dedup clustering).

A dedup pipeline ends with *clusters*, not pairs: the (doc_a, doc_b)
edges from Jaccard/MinHash/SimHash need grouping so one representative
per component survives. This is inherently iterative (no single SQL
query), so it's the one operator here built as a driver-side loop of
DataFrame steps — large-neighborhood label propagation, the same
dataflow GraphX/GraphFrames use for CC:

  label(v) <- min(label(v), min(label(u) for u adjacent))   until fixed

Each iteration is one shuffle (groupBy min over the undirected edge
list); convergence takes O(diameter) iterations — near-dup graphs are
star/clique-shaped, so 2-4 in practice. ``checkpoint_every`` truncates
the lineage so plans don't grow exponentially at scale (uses
localCheckpoint to avoid requiring a checkpoint dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(a, b) edge list → (node, component) with component = min node id
    reachable. Deterministic (min-label), loop ends early on a fixed
    point (counted via one aggregate per iteration)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iter):
        # candidate labels: own label + the label of every neighbor
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Full dedup: keep the min-id document of each near-dup component,
    plus every document that appears in no pair."""
    comp = connected_components(pairs, a_col, b_col)
    keepers_in_components = comp.groupBy("component").agg(
        F.min("node").alias(id_col)
    ).select(id_col)
    clustered = comp.select(F.col("node").alias(id_col))
    untouched = docs.select(id_col).join(clustered, id_col, "left_anti")
    return untouched.union(keepers_in_components)
