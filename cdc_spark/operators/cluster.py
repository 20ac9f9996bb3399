"""Near-dup clustering: connected components over a pair graph.

Dedup pipelines need *groups*, not just pairs: all transitively-linked
near-dups form one cluster, and one canonical document (min id)
survives. This is connected components by iterated min-label
propagation — each round, every node adopts the smallest label among
itself and its neighbors; converges in O(cluster diameter) rounds.
Near-dup clusters are tiny in practice (diameter ≤ a handful), so a
small fixed iteration count with a convergence check suffices; each
round is one join + one aggregation, fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id_a, id_b) edges → (doc_id, cluster_id=min id in component).

    Only nodes appearing in at least one edge are returned (singletons
    are their own trivial cluster by definition). Raises if labels have
    not converged within ``max_iterations`` — silently-partial clusters
    would report one duplicate group as several.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(
            pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
        )
        .distinct()
        .cache()  # reused every round — never re-derive the pair graph
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # labels only ever DECREASE, so "changed" is simply new < old —
        # computed as a flag column riding the same checkpoint (round
        # 13): the convergence probe then filters the materialized
        # partitions instead of re-joining this round's labels against
        # last round's (one join + one shuffle per round saved; the
        # probe is a cached-scan + limit 1).
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                new_label.alias("__new"),
                (new_label < F.col("label")).alias("__chg"),
            )
            .withColumnRenamed("__new", "label")
            # truncate lineage: without this, each round's plan embeds
            # every earlier round (quadratic recomputation with the
            # convergence action below)
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — a component's diameter exceeds the budget; "
            "raise max_iterations"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    max_iterations: int = 10,
) -> DataFrame:
    """Drop every near-dup except the min-id representative of each
    cluster: corpus anti-join (cluster members \\ canonicals)."""
    comps = connected_components(pairs, max_iterations=max_iterations)
    losers = comps.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
