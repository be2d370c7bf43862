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
loop stops at the fixpoint (no label changed) or ``max_iter``. Each round
also pointer-jumps (label <- label(label)), so rounds needed are
O(log diameter), not O(diameter); near-dup graphs are shallow anyway
(clusters are quasi-cliques) and converge in a handful of rounds.
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

    method='label' (default) is min-label propagation with per-round
    pointer jumping — O(log diameter) rounds, the right shape for near-dup
    graphs. method='star' is the alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log^2 n) rounds with contracting edge volume, the escape
    hatch when the EDGE SET itself is too large to rejoin every round."""
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
    # Convergence detect: labels are MONOTONE (every step takes a min with
    # the current label, so no label ever increases), hence the exact
    # decimal sum of labels strictly decreases until the fixpoint and
    # "sum unchanged" <=> "no label changed". One small agg job per round
    # replaces the r5 join+count job (same stop condition, half the
    # actions). decimal(38,0) keeps the sum exact at any vertex count.
    def _sig(lbl: DataFrame):
        row = lbl.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return (row["n"], row["s"])

    prev_sig = _sig(labels)  # also materializes the lazy checkpoints
    changed = True
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.min("label").alias("nlabel"))
        )
        cand = labels.join(neighbor_min, "v", "left").select(
            "v",
            F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
        )
        # Pointer jump (path doubling): every label IS a vertex id in the
        # same component, so label(label(v)) is also a reachable-min bound.
        # Shortcutting through it after each propagation round makes chain
        # components converge in O(log diameter) rounds instead of
        # O(diameter) — same monotone lattice, same fixpoint (at the
        # fixpoint label(label)=label), so the output is identical.
        new_labels = (
            cand.alias("a")
            .join(
                cand.select(
                    F.col("v").alias("_lv"), F.col("label").alias("_ll")
                ).alias("b"),
                F.col("a.label") == F.col("_lv"),
                "left",
            )
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("_ll", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        sig = _sig(new_labels)
        labels = new_labels
        if sig == prev_sig:
            changed = False
            break
        prev_sig = sig
    if changed:
        # silently returning partially-propagated labels would split true
        # components (and dedup_clusters would keep duplicate representatives)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(labels still changing — with pointer jumping that implies "
            "diameter > 2^max_iter; raise max_iter, or use method='star')"
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
