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
from pyspark.sql.types import StructField, StructType

# Edge-count boundary below which the component computation runs as a
# DRIVER-LOCAL union-find instead of distributed pointer jumping — the
# same regime dispatch as a broadcast hash join: when one side fits in
# driver memory, shipping it beats launching O(log d) shuffle rounds.
# 2^20 directed edges ≈ 16 MB of (long, long) rows — the broadcast-side
# size class.  At dedup-grade thresholds the verified pair graph is
# orders of magnitude smaller than the corpus (sf0.1 measures hundreds
# of edges), so in practice the distributed path engages exactly when
# the graph is big enough to amortize its per-round jobs.  Measured
# sf0.1 q75b: pointer jumping 10.7 s for the registered union vs 3.7 s
# pairs-only; the local regime removes nearly all of that fixed cost.
LOCAL_CC_MAX_EDGES = 1 << 20


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


def _local_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Driver-local union-find over a SMALL edge frame (bounded by the
    LOCAL_CC_MAX_EDGES dispatch in connected_components) — path-halving
    find + union, then one pass mapping every node to its component
    minimum.  Identical output contract to the distributed path (pinned
    equal in tests/test_pipeline_ops.py)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # one collect, bounded by the local_max_edges dispatch (≤ ~16 MB);
    # toLocalIterator would run one sequential job PER PARTITION — ~128
    # tiny jobs ≈ 5 s of pure scheduling on a cached 333-row frame
    # (measured round 11)
    for row in edges.select(src, dst).collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by label order: smaller id becomes the root, so the
            # root IS the component minimum when all unions are done
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(node, find(node)) for node in parent]
    id_type = edges.schema[src].dataType
    schema = StructType(
        [StructField("node", id_type, False), StructField("lab", id_type, False)]
    )
    return edges.sparkSession.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    local_max_edges: int = LOCAL_CC_MAX_EDGES,
) -> DataFrame:
    """Return ``(node, lab)`` where ``lab`` is the minimum node id in the
    connected component of ``node``, for every node incident to an edge.

    ``edges`` must be symmetric (both (a,b) and (b,a) present); node ids
    must be non-null and orderable (the min over the component is the
    label).  Every step is a keyed equi-join / aggregation — no driver
    materialization of the graph above ``local_max_edges``; the per-round
    driver action is a single changed-row count.

    REGIME DISPATCH (round 11): one edge count decides the physical
    strategy — below ``local_max_edges`` the graph collects to the
    driver and a union-find labels it in microseconds (the broadcast-
    join-style small-side regime; see LOCAL_CC_MAX_EDGES); above it the
    distributed pointer-jumping rounds run.  Callers are expected to
    persist ``edges`` (both in-repo callers do), so the count job scans
    cached blocks.  Pass ``local_max_edges=0`` to force the distributed
    path (tests pin both regimes equal).

    Raises ``RuntimeError`` if the fixpoint is not reached in
    ``max_rounds`` rounds (cannot happen below ~2**max_rounds path
    length thanks to pointer jumping; a loud error beats silently wrong
    cluster assignments).
    """
    if local_max_edges and edges.limit(local_max_edges + 1).count() <= local_max_edges:
        return _local_components(edges, src, dst)
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
        # 1. neighbor step: min label over incoming edges.  The round's
        # STARTING label rides along as `old` so convergence detection
        # costs a comparison, not a third join back to `labels`
        # (round 11 — was jumped ⋈ labels purely to compute `changed`).
        prop = (
            e.join(labels, e.e_src == labels.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.col("lab").alias("old"),
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
            )
        )
        # 2. jump step: lab(lab) — labels are node ids, so look the label
        # up as a node and take ITS label; halves pointer-chain depth
        lab_of_lab = stepped.select(
            F.col("node").alias("lab"), F.col("lab").alias("jlab")
        )
        new_lab = F.least(F.col("lab"), F.coalesce("jlab", "lab"))
        merged = (
            stepped.join(lab_of_lab, "lab", "left")
            .select(
                "node",
                new_lab.alias("lab"),
                (new_lab < F.col("old")).alias("changed"),
            )
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
