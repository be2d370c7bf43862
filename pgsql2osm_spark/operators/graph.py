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
For adversarially deep graphs pass method='star': alternating
large-star/small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which converges in O(log^2 n) rounds — same join
shapes, more bookkeeping per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    method: str = "label",
) -> DataFrame:
    """(v, component) for every vertex in ``edges``; component = min vertex
    id reachable from v. Deterministic, order-independent (SURVEY.md O1).

    method='label' (default) is min-label propagation — rounds = graph
    diameter, the right shape for shallow near-dup graphs. method='star' is
    the alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — O(log^2 n) rounds on
    ANY graph, the escape hatch for adversarially deep pair chains (a
    200-vertex path converges in ~8 star rounds vs 199 label rounds)."""
    if method == "star":
        return _connected_components_star(edges, src, dst, max_iter)
    if method != "label":
        raise ValueError(f"unknown method {method!r}")
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


def _connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star contraction.

    Per round (Kiveris et al.): large-star connects every neighbor v > u to
    m = min(N(u) ∪ {u}); small-star directs each edge max->min, then
    connects every smaller neighbor (and u itself) to the group minimum.
    The edge set monotonically contracts toward per-component stars rooted
    at the component minimum; fixpoint reached in O(log^2 n) rounds.

    Convergence detect: a round that reproduces the same edge set (count +
    modular hash-sum signature — pmod keeps the ANSI sum far from int64
    overflow up to ~4e9 edges) is the fixpoint — stars map to themselves
    under both operations. Raises past max_iter like the label variant."""
    verts = (
        edges.select(F.col(src).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig, converged = None, False
    for _ in range(max_iter):
        # --- large-star ---
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star ---
        dire = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = dire.groupBy("u").agg(F.min("v").alias("m"))
        j = dire.join(mins2, "u")
        small = (
            j.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(j.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)  # truncate per-round lineage
        )
        row = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 31))).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        e = small
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds — "
            "O(log^2 n) bound implies a far smaller round count; "
            "raise max_iter"
        )
    # fixpoint edges are (member, root) stars; roots + isolated vertices
    # label themselves
    labels = e.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("v"), "component"
    )
    roots = verts.join(labels, "v", "left_anti").select(
        "v", F.col("v").alias("component")
    )
    return labels.unionByName(roots)


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
