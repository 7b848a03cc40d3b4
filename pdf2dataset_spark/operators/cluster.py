"""Near-duplicate clustering: connected components over a pair list.

Dedup pair generators (MinHash LSH f2a, exact Jaccard f2b, embedding
cosine f13) emit EDGES; corpus dedup needs the transitive closure —
"keep one document per connected component". This is the canonical
iterative-DataFrame algorithm (SURVEY §2 notes iterative algorithms
as the non-SQL-expressible class): smallest-label propagation until
fixpoint.

Scale posture: each iteration is one join + one aggregate on
(node, label) pairs — narrow rows, hash-partitioned on node; lineage
is cut with localCheckpoint each round (otherwise plans grow
exponentially); iterations needed = graph diameter, which for
near-dup clusters is tiny (dup clusters are cliques or short
chains). The per-iteration driver-side convergence count is one
scalar — unavoidable and standard for fixpoint loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `edges`, component = the
    smallest node id reachable from it. Deterministic."""
    sym = edges.select(
        F.col(id1).alias("src"), F.col(id2).alias("dst")
    ).union(edges.select(F.col(id2).alias("src"), F.col(id1).alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        neighbor_labels = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Keep one representative (the smallest id) per near-dup
    component; rows not in any pair survive untouched. The standard
    final step after LSH/Jaccard pair generation."""
    comp = connected_components(pairs, id1, id2)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_by_components_quality(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Quality-aware canonicalization: per near-dup component keep the
    member with the HIGHEST `quality_col` (ties → lowest id), not just
    the smallest id — the curation-grade final step (keep the longest/
    cleanest duplicate, drop the rest).

    One CC fixpoint + one groupBy on components + one anti join; the
    corpus itself is never shuffled, only the (small) clustered
    subset."""
    comp = connected_components(pairs, id1, id2)
    members = df.select(
        F.col(id_col).alias("__m_id"), F.col(quality_col).alias("__q")
    ).join(comp, F.col("__m_id") == F.col("node"))
    winners = members.groupBy("component").agg(
        F.max_by(
            "__m_id", F.struct(F.col("__q"), (-F.col("__m_id")).alias("__neg"))
        ).alias("__keep_id")
    )
    losers = (
        members.join(winners, "component")
        .filter(F.col("__m_id") != F.col("__keep_id"))
        .select(F.col("__m_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
