"""Distributed connected components over a pair-graph DataFrame.

The fuzzy-dedup keeper rule (q71) needs, for every doc in a verified
near-dup pair, the smallest doc_id in its connected component.  The
reference has no graph stage (its one job is a dense matmul,
``program.c:479-514``); this operator exists for the north-star dedup
pipeline, where the pair graph at 100 TB can hold billions of edges and
component shapes are adversarial (scraped-page chains, boilerplate
stars).

Algorithm: min-label propagation with POINTER JUMPING, the classic
PRAM/MapReduce hybrid (cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — two-phase rounds that contract paths
logarithmically).  Each round runs two label-shrinking steps, both plain
hash-partitioned equi-joins:

1. neighbor step — ``nlab(v) = min(lab(u)) over edges (u, v)``: moves the
   component minimum one hop along graph edges;
2. jump step — ``lab(v) = min(lab(v), lab(lab(v)))``: labels are
   themselves node ids, so a self-join on ``lab = node`` replaces each
   label by its label's label, halving the remaining pointer-chain depth.

Both steps only ever DECREASE labels and keep the invariant "lab(v) is a
node id inside v's component", so the iteration is monotone over a finite
lattice and its fixpoint is constant-per-component; with lab(v) <= v that
constant is the component minimum.  The jump step is what makes rounds
O(log diameter) instead of O(diameter): plain one-hop propagation needs
`diameter` rounds, so a 100-node path would silently exceed a 64-round
cap, while with jumping even a 2^50-node path converges in ~50 rounds.
Non-convergence inside ``max_rounds`` raises instead of returning wrong
components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Free the block-storage blocks behind a localCheckpoint()ed frame
    (or a projection over one): find the LogicalRDD leaves of its analyzed
    plan and unpersist their RDDs.  Best-effort — internal-API shape
    changes degrade to the old keep-until-context-exit behavior, never to
    an error (blocking=False, so no wait on block removal either)."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup must never fail the query
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """Return ``(node, lab)`` where ``lab`` is the minimum node id in the
    connected component of ``node``, for every node incident to an edge.

    ``edges`` must be symmetric (both (a,b) and (b,a) present); node ids
    must be non-null and orderable (the min over the component is the
    label).  Every step is a keyed equi-join / aggregation — no driver
    materialization of the graph; the per-round driver action is a single
    changed-row count.

    Raises ``RuntimeError`` if the fixpoint is not reached in
    ``max_rounds`` rounds (cannot happen below ~2**max_rounds path
    length thanks to pointer jumping; a loud error beats silently wrong
    cluster assignments).
    """
    # Iterative plans EXPLODE without lineage truncation: each round
    # references the previous labels plan ~5 times, so after k rounds the
    # logical plan has ~5^k nodes (measured: a 300-node chain overflowed
    # the 2 GiB plan-string cap around round 13 under plain persist()).
    # localCheckpoint materializes each round's labels AND replaces its
    # plan with a LogicalRDD leaf — constant plan size per round, the
    # standard Spark pattern for iterative graph algorithms (GraphFrames
    # does the same).  On a multi-node cluster prefer rdd checkpoint() to
    # a reliable dir if executor loss mid-iteration must be survivable.
    # Once a round's checkpoint has materialized, the PREVIOUS round's
    # checkpointed RDD is unpersisted (ADVICE r8) so at most two rounds'
    # two-column frames are ever resident — only the returned final
    # labels frame stays pinned for the caller.
    labels = (
        edges.select(F.col(src).alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint()
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    for _ in range(max_rounds):
        # 1. neighbor step: min label over incoming edges
        prop = (
            e.join(labels, e.e_src == labels.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
            )
        )
        # 2. jump step: lab(lab) — labels are node ids, so look the label
        # up as a node and take ITS label; halves pointer-chain depth
        lab_of_lab = stepped.select(
            F.col("node").alias("lab"), F.col("lab").alias("jlab")
        )
        jumped = (
            stepped.join(lab_of_lab, "lab", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("jlab", "lab")).alias("lab"),
            )
        )
        merged = (
            jumped.join(labels.select("node", F.col("lab").alias("old")), "node")
            .select("node", "lab", (F.col("lab") < F.col("old")).alias("changed"))
            .localCheckpoint()
        )
        n_changed = merged.filter("changed").count()
        _unpersist_checkpoint(labels)  # this round consumed it; free the blocks
        labels = merged.select("node", "lab")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        f"(component diameter ~2^{max_rounds}?)"
    )
