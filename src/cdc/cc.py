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


def _free(df: DataFrame) -> None:
    """Best-effort IMMEDIATE release of a localCheckpoint'd frame's
    executor blocks — the frame must never be used again. Without this,
    each round's label/edge copy lingers until the ContextCleaner notices
    the GC'd py4j reference, so a long run can hold O(rounds) copies in
    storage memory; with it, exactly the live round is resident."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass   # fall back to ContextCleaner-on-GC


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25,
                         escalate: bool = True) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the smallest node id reachable from it. Undirected
    (edges are symmetrized). If ``max_iter`` propagation rounds don't
    converge (diameter > max_iter) it ESCALATES to the
    large-star/small-star form (O(log^2 n) rounds on any graph) rather
    than failing the pipeline mid-job; ``escalate=False`` restores the
    raise for callers that want to detect pathological pair graphs."""
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionAll(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b")))
           .distinct()
           # the edge list is consumed EVERY round (join + convergence
           # count) — persist it so an expensive upstream (the MinHash
           # pipeline) runs once, not 2x per round
           .persist())
    # labels are localCheckpoint'ed (NOT persist'ed) EVERY round. Each
    # round references the previous labels twice (neighbor probe + the
    # update join), so an uncut logical plan doubles per round — and even
    # though persist keeps EXECUTION incremental (cache substitution),
    # every action still formats the full nested plan for the SQL-listener
    # event (InMemoryRelation.innerChildren expands the cached subtree),
    # which made round k pay O(2^k) DRIVER time in ExplainUtils before it
    # ran a single task. A LogicalRDD leaf has no inner children, so the
    # per-round plan is O(1). (Executor-local blocks; use a reliable
    # checkpoint dir instead under dynamic allocation.)
    labels = (und.select(F.col("a").alias("id")).distinct()
              .withColumn("grp", F.col("id"))
              .localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            neigh = (und.join(labels.select(F.col("id").alias("b"),
                                            F.col("grp").alias("ngrp")), "b")
                     .groupBy("a").agg(F.min("ngrp").alias("nmin")))
            new = (labels.join(neigh, labels.id == neigh.a, "left")
                   .select(F.col("id"),
                           F.least(F.col("grp"),
                                   F.coalesce(F.col("nmin"),
                                              F.col("grp"))).alias("grp"))
                   .localCheckpoint(eager=True))
            changed = (new.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.grp") != F.col("o.grp")).count())
            _free(labels)   # count above was this round's last use
            labels = new
            if changed == 0:
                return labels.select(F.col("id"), F.col("grp"))
        if not escalate:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                f"rounds (graph diameter exceeds max_iter) — raise "
                f"max_iter or use connected_components_star")
        # long-chain graph: restart with the O(log^2 n)-round form on the
        # cached symmetric edge list (dedup inputs are near-cliques, so
        # this path is cold in practice)
        _free(labels)
        return connected_components_star(und, src="a", dst="b")
    finally:
        und.unpersist()


def connected_components_star(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              max_iter: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14) — the LONG-CHAIN escalation of ``connected_components``:
    converges in O(log²  n) rounds on ANY graph (propagation needs
    diameter rounds), with the same per-round shape (a groupBy-min and a
    join). Use it when the graph may contain paths longer than a few
    dozen hops; for dedup near-cliques the propagation form is cheaper.

    Each round:
      large-star — every node connects its STRICTLY LARGER neighbors to
      the minimum of its neighborhood (incl. itself);
      small-star — every node connects its smaller-or-equal neighbors
      (and itself) to that minimum.
    The edge set converges to a star forest whose centers are the
    component minima; the fixed point is detected with a cheap
    (count, hash-sum) signature instead of a full set comparison.
    Returns (id, grp) like ``connected_components`` — including
    self-loop-only nodes as singletons (the rounds drop self loops, so
    those nodes are re-attached from the input's node set at the end)."""

    def canon(e: DataFrame) -> DataFrame:
        return (e.select(F.least("u", "v").alias("u"),
                         F.greatest("u", "v").alias("v"))
                .filter(F.col("u") != F.col("v")).distinct())

    def star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.unionAll(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
        m = (sym.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        nbrs = sym.filter(F.col("v") > F.col("u")) if large \
            else sym.filter(F.col("v") < F.col("u"))
        out = nbrs.join(m, "u").select(F.col("v").alias("u"),
                                       F.col("m").alias("v"))
        if not large:
            # small-star also re-points u itself at the minimum
            out = out.unionAll(m.select(F.col("u"), F.col("m").alias("v")))
        return canon(out)

    uv = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # every input node, self-loop-only ones included — the rounds filter
    # self loops, so these must be re-attached as singletons at the end
    all_nodes = (uv.select(F.col("u").alias("id"))
                 .unionAll(uv.select(F.col("v").alias("id"))).distinct()
                 .localCheckpoint(eager=True))
    # localCheckpoint (NOT persist) each round: one star round references
    # `e` ~16 times (sym twice per star, twice per round, plus the join),
    # so without a lineage cut the logical plan grows exponentially and
    # the optimizer itself becomes the bottleneck long before execution.
    e = canon(uv).localCheckpoint(eager=True)
    sig = None
    for _ in range(max_iter):
        nxt = star(star(e, large=True), large=False) \
            .localCheckpoint(eager=True)
        row = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor is order-independent and overflow-free (ANSI
            # mode rejects a plain sum of 64-bit hashes)
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")),
                       F.lit(0)).alias("h")
        ).collect()[0]
        new_sig = (row["n"], row["h"])
        _free(e)   # nxt is materialized; the previous round's blocks die
        e = nxt
        if new_sig == sig:
            # fixed point: every edge now points a node at its
            # component minimum (a star forest)
            roots = e.select(F.col("u").alias("id"),
                             F.col("u").alias("grp"))
            leaves = e.select(F.col("v").alias("id"),
                              F.col("u").alias("grp"))
            comp = (leaves.unionAll(roots).groupBy("id")
                    .agg(F.min("grp").alias("grp")))
            singles = (all_nodes.join(comp, "id", "left_anti")
                       .select(F.col("id"), F.col("id").alias("grp")))
            out = comp.unionAll(singles).localCheckpoint(eager=True)
            _free(e)
            _free(all_nodes)
            return out
        sig = new_sig
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} "
        f"rounds — pathological input (star converges in O(log^2 n))")


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _incremental_parts(prior: DataFrame, edges: DataFrame, src: str,
                       dst: str, touched: DataFrame | None = None
                       ) -> tuple[DataFrame, DataFrame, DataFrame,
                                  DataFrame]:
    """Shared body of the incremental CC forms. Returns
    ``(merged, kept, fresh, sub)`` — every frame O(churn):

    - ``sub``      — the prior rows of components TOUCHED by a new edge;
    - ``merged``   — the CC replay of sub's star edges + the new edges;
    - ``kept``     — sub rows the replay never saw (touched singletons
                     whose only new edge was a self loop);
    - ``fresh``    — brand-new self-loop-only nodes, as singletons.

    ``touched`` — optional pre-computed one-column (grp) frame of the
    touched component labels. Callers that keep the assignment in a
    key-partitioned table can derive it from a partition-pruned point
    read of the edge endpoints (``CdcTable.lookup_keys``) instead of the
    full-prior semi join done here; it MUST contain the grp of every
    prior row whose id appears in ``edges`` (a superset is correct,
    merely less incremental).

    ``prior`` is only ever SCANNED (semi/anti joins against small
    broadcast sides) — never shuffled, never materialized."""
    et = dict(edges.dtypes)

    def norm(name: str, out: str):
        # integral id types unify to long (int edges vs long prior would
        # otherwise union-coerce per call site); anything else — string
        # md5 keys, decimals — passes through unchanged, matching the
        # type-agnostic full recompute. A lossy silent cast (string ->
        # long NULL) can no longer happen: non-integral types are never
        # cast, and a genuine prior/edges type mismatch fails loudly in
        # the union below.
        c = F.col(name)
        return (c.cast("long") if et[name] in _INTEGRAL else c).alias(out)

    raw = (edges.select(norm(src, "src"), norm(dst, "dst"))
           # consumed several times below (node set, replay union) — cut
           # whatever expensive LSH plan produced it
           .localCheckpoint(eager=True))
    # node set BEFORE dropping self loops: a self-loop-only node must
    # still land in the output (as its prior row, or a new singleton)
    nodes = (raw.select(F.col("src").alias("id"))
             .unionAll(raw.select(F.col("dst").alias("id"))).distinct())
    e = raw.filter(F.col("src") != F.col("dst"))
    if touched is None:
        touched = (prior.join(nodes, "id", "left_semi")
                   .select("grp").distinct())
    else:
        touched = touched.select("grp").distinct()
    # a USING join moves the key column first — re-select (id, grp) so the
    # unions below stay positional-safe. sub is consumed up to three times
    # (star edges, kept, the callers' changed-row anti join), each a scan
    # of the full prior — materialize the O(churn) subset once instead.
    sub = (prior.join(touched, "grp", "left_semi").select("id", "grp")
           .localCheckpoint(eager=True))
    star_edges = (sub.filter(F.col("id") != F.col("grp"))
                  .select(F.col("id").alias("src"),
                          F.col("grp").alias("dst")))
    merged = connected_components(star_edges.unionAll(e))
    # prior rows the replay never saw: touched singletons (id == grp, no
    # star edge) whose only new edge was a self loop keep their row
    kept = sub.join(merged, "id", "left_anti").select("id", "grp")
    # brand-new self-loop-only nodes (in no real edge, absent from prior)
    # become singletons. nodes∩prior ⊆ sub by construction (a prior row
    # with an edge endpoint id has a touched grp), so the not-in-prior
    # test anti-joins the O(churn) sub — NEVER the full prior.
    fresh = (nodes.join(merged, "id", "left_anti")
             .join(sub, "id", "left_anti")
             .select(F.col("id"), F.col("id").alias("grp")))
    return merged, kept, fresh, sub


def connected_components_incremental(prior: DataFrame, edges: DataFrame,
                                     src: str = "src", dst: str = "dst",
                                     touched: DataFrame | None = None
                                     ) -> DataFrame:
    """Merge NEW candidate-pair edges into a PRIOR (id, grp) assignment —
    the continuous-dedup shape: as a corpus grows, each ingest emits LSH
    pairs only for the new documents, and recomputing components over
    every pair ever seen is O(corpus) per ingest. This is O(churn):

    1. components TOUCHED by a new edge are found with one semi join
       (new-edge endpoints -> their prior grp);
    2. only the touched components' star edges (id—grp, grp is the
       component min so the star preserves both connectivity and the min
       label) are replayed through ``connected_components`` together with
       the new edges;
    3. every untouched row of ``prior`` passes through verbatim (anti
       join) — at web scale that is the overwhelming majority, and it is
       never shuffled through the CC rounds.

    Equal to a full recompute over (prior-as-edges ∪ edges) by
    construction — property-pinned in tests. New nodes (absent from
    ``prior``) may appear on either side of a new edge. Output: (id, grp),
    grp = smallest reachable node id, same contract as
    ``connected_components``. Standing-state maintainers that only need
    the rows that DIFFER from prior should call
    ``connected_components_incremental_delta`` instead — it skips the
    O(corpus)-row untouched passthrough entirely."""
    merged, kept, fresh, sub = _incremental_parts(prior, edges, src, dst,
                                                  touched)
    untouched = (prior.join(sub.select("grp").distinct(), "grp",
                            "left_anti").select("id", "grp"))
    return merged.unionAll(kept).unionAll(fresh).unionAll(untouched)


def connected_components_incremental_delta(
        prior: DataFrame, edges: DataFrame, src: str = "src",
        dst: str = "dst", touched: DataFrame | None = None) -> DataFrame:
    """ONLY the assignment rows that CHANGED (or are new) when merging
    ``edges`` into ``prior`` — the O(churn) upsert frame of a continuous
    dedup pipeline. Provably equal to
    ``connected_components_incremental(...) ⟕anti prior on (id, grp)``:
    untouched rows equal their prior rows by construction and can never
    survive that anti join, and ``kept ⊆ prior`` likewise — only
    ``merged ∪ fresh`` can. For merged rows, membership in prior equals
    membership in the touched subset ``sub`` (a prior row whose id is a
    replay node has a touched grp), so the anti join runs against the
    O(churn) sub, never the corpus. Per epoch nothing here shuffles,
    scans, or materializes more than O(churn) + one broadcast-semi pass
    over prior (zero full passes when ``touched`` is supplied from a
    partition-pruned table probe)."""
    merged, _kept, fresh, sub = _incremental_parts(prior, edges, src, dst,
                                                   touched)
    changed = merged.join(sub, ["id", "grp"], "left_anti")
    return changed.unionAll(fresh)


def dedup_keepers(components: DataFrame) -> DataFrame:
    """One keeper per component (the min id — deterministic) plus the
    group size: the final decision table of a dedup pipeline. Input is
    ``connected_components`` output (id, grp). With the min-id policy the
    keeper EQUALS the group label (grp is already the component min);
    the separate column is the seam for richer policies (keep-longest,
    keep-highest-quality) that re-rank members by a metadata join."""
    return (components.groupBy("grp")
            .agg(F.min("id").alias("keeper"),
                 F.count(F.lit(1)).alias("n_members"))
            .select(F.col("grp").alias("group_id"), "keeper", "n_members"))
