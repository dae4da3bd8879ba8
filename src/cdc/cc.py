"""Connected components over a candidate-pair edge list — the transitive
closure step of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/embedding
LSH) chain into GROUPS (a~b, b~c => {a,b,c}), and the keeper is one doc per
group, not per pair.

Algorithm: iterative min-label propagation. Every node starts labeled with
itself; each round every node takes the min label among itself and its
neighbors; converged when no label changes. Rounds = graph diameter — for
dedup graphs (near-cliques of copies) that is 1–2 rounds. Each round is ONE
equi-join + ONE groupBy-min, both shuffle-partitioned on the node id, plus
an O(1)-row convergence count — no driver-side graph state ever.

Scale note: at web scale with long chains the escalation is the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — the same join/agg shape per round but
O(log^2 n) rounds on any graph. The propagation form here is the right
default for dedup graphs, where diameter is tiny and each round is cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the smallest node id reachable from it. Undirected
    (edges are symmetrized). Raises if ``max_iter`` rounds don't converge
    — raise it for high-diameter graphs or switch to large-star/small-star
    (see module docstring)."""
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionAll(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b")))
           .distinct()
           # the edge list is consumed EVERY round (join + convergence
           # count) — persist it so an expensive upstream (the MinHash
           # pipeline) runs once, not 2x per round
           .persist())
    labels = (und.select(F.col("a").alias("id")).distinct()
              .withColumn("grp", F.col("id")))
    labels = labels.persist()
    labels.count()   # materialize so each round folds ONE join, not a chain
    try:
        for _ in range(max_iter):
            neigh = (und.join(labels.select(F.col("id").alias("b"),
                                            F.col("grp").alias("ngrp")), "b")
                     .groupBy("a").agg(F.min("ngrp").alias("nmin")))
            new = (labels.join(neigh, labels.id == neigh.a, "left")
                   .select(F.col("id"),
                           F.least(F.col("grp"),
                                   F.coalesce(F.col("nmin"),
                                              F.col("grp"))).alias("grp")))
            new = new.persist()
            changed = (new.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.grp") != F.col("o.grp")).count())
            labels.unpersist()
            labels = new
            if changed == 0:
                # cut the per-round lineage chain before the caches are
                # released below — otherwise the caller's first action
                # recomputes every round from the raw edges. localCheckpoint
                # keeps the materialized blocks (executor-local; use a
                # reliable checkpoint dir instead under dynamic allocation).
                return (labels.select(F.col("id"), F.col("grp"))
                        .localCheckpoint(eager=True))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(graph diameter exceeds max_iter) — raise max_iter or use a "
            f"large-star/small-star implementation for this graph")
    finally:
        labels.unpersist()
        und.unpersist()


def dedup_keepers(components: DataFrame) -> DataFrame:
    """One keeper per component (the min id — deterministic) plus the
    group size: the final decision table of a dedup pipeline. Input is
    ``connected_components`` output (id, grp)."""
    return (components.groupBy("grp")
            .agg(F.min("id").alias("keeper"),
                 F.count(F.lit(1)).alias("n_members"))
            .select(F.col("grp").alias("group_id"), "keeper", "n_members"))
