"""Distributed connected components — near-duplicate CLUSTERS, not pairs.

A dedup pipeline needs groups: pair output (MinHash/SimHash/phash/embedding
candidates) must collapse into components so one representative per cluster
survives (the set-level generalization of the reference's first-wins
done_ids guard, /root/reference/pgsql2osm/pgsql2osm.py:521-522). This is
iterative and not SQL-expressible in one query — the classic case for a
driver-paced loop of Spark joins.

Algorithm: min-label propagation over the symmetrized edge list. Each round
every vertex takes the minimum label in its closed neighborhood; labels are
lazily localCheckpoint()ed per round (truncates the growing lineage — any
iterative algorithm needs this or the plan tree doubles per round) and the
loop stops at the fixpoint (no label changed) or ``max_iter``. Rounds needed
= graph diameter; near-dup graphs are shallow (clusters are quasi-cliques).
For adversarially deep graphs swap in alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce"), which converges in
O(log^2 n) — same join shapes, more bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(v, component) for every vertex in ``edges``; component = min vertex
    id reachable from v. Deterministic, order-independent (SURVEY.md O1)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("u").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # silently returning partially-propagated labels would split true
        # components (and dedup_clusters would keep duplicate representatives)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing — graph diameter exceeds "
            "max_iter; raise it, or use a star-contraction variant for "
            "adversarially deep graphs)"
        )
    return labels.select(F.col("v"), F.col("label").alias("component"))


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Collapse near-dup pairs into clusters and pick the min-id
    representative per cluster: every row of ``df`` gains (component,
    is_representative). Rows in no pair form singleton components."""
    comp = connected_components(pairs)
    out = df.join(comp, df[id_col] == comp["v"], "left").drop("v")
    out = out.withColumn("component", F.coalesce("component", F.col(id_col)))
    rep = out.groupBy("component").agg(F.min(id_col).alias("_rep"))
    return (
        out.join(rep, "component")
        .withColumn("is_representative", F.col(id_col) == F.col("_rep"))
        .drop("_rep")
    )
