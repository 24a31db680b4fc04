"""Similarity search over the `embeddings` table (array<float> vectors).

- q75: brute-force cosine near-dup pairs on a bounded slice — DuckDB-oracle
  checked.  Vectors are quantized to integers (floor(v·1000)) so dot
  products and norms are exact BIGINT math in both engines; only the final
  cosine = dot/sqrt(na·nb) touches floating point (identical doubles in,
  identical doubles out).
- q76: exact cosine top-k, brute force — broadcast the queries, one pass
  over the corpus, zip_with dot products in JVM expressions, per-query
  window top-k; O(Q·N·d), no corpus shuffle — exactly how you'd
  brute-force 100 TB.  Brute-only so the headline timing stays
  round-comparable.
- q76b: the same exact answer computed two ways under one oracle ('brute'
  and 'ivf_full' = the trained IVF index probed exhaustively).  The
  driver's value-hash proves both equal the SQL answer — the IVF==brute
  equivalence as driver correctness, separate from the timed q76.
- q77: the APPROXIMATE scale paths — hyperplane-LSH bucketing and IVF at
  nprobe < nlist.  Rows-only for the driver (hash/centroid internals are
  engine-specific); tests/test_pipeline_ops.py measures recall vs brute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.plans.inspect import plan_size_bytes
from emulating_hadoop_with_mpi_spark.registry import query
from emulating_hadoop_with_mpi_spark.sources.tables import load_table

# corpus-size boundary above which q75b's verify joins stop broadcasting
# the O(corpus) quantized-vector frames (same regime as the dedup family)
SEMANTIC_PARTITIONED_BYTES = 64 * 1024 * 1024

NEARDUP_SLICE = 300  # vec_id bound for the oracle-checked brute-force pair scan
NEARDUP_MIN_COSINE = 0.25
# SemDeDup drop threshold (q75b's 'drop' section): deliberately ABOVE the
# pair-listing threshold — SemDeDup removes only near-identical members,
# and the transitive closure of a looser relation chains the whole corpus
# into one giant component (measured at sf0.1: tau=0.25 gives ~3k edges
# over 2k vectors → one component, ~20 pointer-jumping rounds; tau=0.35
# gives 333 edges → small components, CC converges in a handful of
# sub-second rounds).  Both engines compare the same ROUND(cosine, 6).
SEMDEDUP_TAU = 0.35
TOPK_QUERIES = 8  # vec_id < 8 are the query vectors
TOPK_K = 10
LSH_PLANES = 16


def quantize(col: Column) -> Column:
    """array<float> → array<bigint> via floor(v·1000): float→double is
    exact, ·1000 and floor are deterministic, so both engines hold the
    same integers."""
    return F.transform(col, lambda v: F.floor(v.cast("double") * 1000).cast("bigint"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


_SQL_QVEC = (
    "list_transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT))"
)


@query(
    "q75_embedding_neardup",
    oracle=f"""
    WITH q AS (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings WHERE vec_id < {NEARDUP_SLICE}),
    n AS (SELECT vec_id, list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS norm2
          FROM q),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_reduce(list_transform(list_zip(a.qv, b.qv),
                                          p -> p[1] * p[2]),
                           (x, y) -> x + y) AS dot
        FROM q a JOIN q b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)), 6)
               AS cosine
    FROM pairs JOIN n na ON vec_a = na.vec_id JOIN n nb ON vec_b = nb.vec_id
    WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE))
          >= {NEARDUP_MIN_COSINE}
    ORDER BY vec_a, vec_b
    """,
)
def q75_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute force on a bounded
    slice (the oracle-checkable correctness baseline for q77's LSH path)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < NEARDUP_SLICE)
    qv = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    withnorm = qv.withColumn("norm2", dot_q(F.col("qv"), F.col("qv")))
    a = withnorm.select(
        F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"), F.col("norm2").alias("na")
    )
    b = withnorm.select(
        F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"), F.col("norm2").alias("nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cosine = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return (
        pairs.withColumn("dot", dot_q(F.col("qa"), F.col("qb")))
        .filter(cosine >= NEARDUP_MIN_COSINE)
        .select("vec_a", "vec_b", F.round(cosine, 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


_SEMANTIC_NEARDUP_ORACLE = """
    WITH RECURSIVE q AS (SELECT vec_id, __QVEC__ AS qv FROM embeddings),
    n AS (SELECT vec_id, list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS norm2
          FROM q),
    signsum AS (
        SELECT q.vec_id, p.i AS p,
               SUM(q.qv[CAST(d.i AS INT) + 1] *
                   (CASE WHEN ((((1103515245 * (p.i * 4096 + d.i) + 12345) & 2147483647)
                                >> 16) & 1) = 1
                         THEN 1 ELSE -1 END)) AS proj
        FROM q
        CROSS JOIN (SELECT unnest(generate_series(0, __PLANES_M1__)) AS i) p
        CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) d
        GROUP BY q.vec_id, p.i
    ),
    codes AS (
        SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (1 << p) ELSE 0 END) AS INT) AS code
        FROM signsum GROUP BY vec_id
    ),
    probe AS (
        SELECT c.vec_id,
               CASE WHEN pr.i = __PLANES__ THEN c.code
                    ELSE CAST(xor(CAST(c.code AS BIGINT), (1 << pr.i)) AS INT) END AS pcode
        FROM codes c
        CROSS JOIN (SELECT unnest(generate_series(0, __PLANES__)) AS i) pr
    ),
    cand AS (
        SELECT p.vec_id AS vec_a, c.vec_id AS vec_b
        FROM probe p JOIN codes c ON c.code = p.pcode AND p.vec_id < c.vec_id
    ),
    vpairs AS (
        SELECT vec_a, vec_b,
               ROUND(CAST(__DOT__ AS DOUBLE)
                     / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)), 6) AS cosine
        FROM cand
        JOIN q qa ON qa.vec_id = vec_a
        JOIN q qb ON qb.vec_id = vec_b
        JOIN n na ON na.vec_id = vec_a
        JOIN n nb ON nb.vec_id = vec_b
        WHERE CAST(__DOT__ AS DOUBLE)
              / sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) >= __TAU__
    ),
    sem_edges AS (
        SELECT vec_a AS a, vec_b AS b FROM vpairs WHERE cosine >= __SEMTAU__
        UNION
        SELECT vec_b AS a, vec_a AS b FROM vpairs WHERE cosine >= __SEMTAU__
    ),
    sem_reach(node, lab) AS (
        SELECT a, a FROM sem_edges
        UNION
        SELECT e.b, r.lab FROM sem_reach r JOIN sem_edges e ON e.a = r.node
    ),
    sem_labels AS (
        SELECT node AS vec_id, MIN(lab) AS keeper FROM sem_reach GROUP BY node
    )
    SELECT 'pair' AS method, vec_a, vec_b, cosine FROM vpairs
    UNION ALL
    SELECT 'drop' AS method, vec_id AS vec_a, keeper AS vec_b,
           CAST(NULL AS DOUBLE) AS cosine
    FROM sem_labels WHERE vec_id != keeper
    ORDER BY method, vec_a, vec_b
    """.replace(
    "__QVEC__", _SQL_QVEC
).replace(
    "__DOT__",
    "list_reduce(list_transform(list_zip(qa.qv, qb.qv), z -> z[1] * z[2]), (x, y) -> x + y)",
).replace(
    "__PLANES_M1__", str(LSH_PLANES - 1)
).replace(
    "__PLANES__", str(LSH_PLANES)
).replace(
    "__TAU__", str(NEARDUP_MIN_COSINE)
).replace(
    "__SEMTAU__", str(SEMDEDUP_TAU)
)


@query("q75b_semantic_neardup_lsh", oracle=_SEMANTIC_NEARDUP_ORACLE)
def q75b_semantic_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, BUCKETED — the scale path next to
    q75's bounded brute baseline, over the FULL corpus (no slice).

    Contract (deterministic, engine-reproducible, so fully hash-checked):
    emit (vec_a, vec_b, cosine) for every pair whose 16-bit hyperplane-LSH
    codes differ by ≤ 1 bit AND whose exact quantized cosine ≥ τ (q75's
    threshold).  Candidate generation is a bucket equi-join — each vector
    probes its own code plus all 16 single-bit flips (one probe can match
    per pair, so no dedup pass is needed) — then candidates are verified
    with exact BIGINT dot products.  The probe side explodes ids only;
    the 64-long arrays join back at verify time, so candidate count (not
    corpus size × 17 × array width) bounds the wide shuffle.  At 100 TB
    the same shape holds with wider codes (collision mass ~ n²·P/2^w —
    the same width-vs-corpus lever q74/simhash120 measure for SimHash).
    Recall vs the q75 brute baseline is measured in
    tests/test_pipeline_ops.py.

    Since round 10 the query is a method-tagged union (the q70/q74
    convention): section 'pair' is the verified near-dup pair list
    above; section 'drop' is SEMDEDUP — the keep-one-per-component
    policy of Abbas et al. 2023 (arXiv:2303.09540) over that pair
    graph: connected components via distributed pointer jumping
    (operators/graph.py), every non-minimum member emitted as
    (vec_a=dropped id, vec_b=its keeper, cosine=NULL).  The oracle
    reproduces the components with a recursive CTE, so the driver hash
    covers the iterative clustering, not just the pair list."""
    pairs = semantic_neardup_pairs(load_table(spark, sf_dir, "embeddings"))
    # persist: the pair list feeds BOTH the 'pair' section and the CC
    # edge set; CC's per-round jobs would otherwise re-run the whole
    # candidate+verify pipeline each round.  Same clearCache contract
    # as q74's sketch frame (the union result is lazy; the builder
    # cannot unpersist what the driver hasn't read).
    pairs = pairs.persist()
    drops = semantic_dedup_drops(pairs.filter(F.col("cosine") >= SEMDEDUP_TAU))
    pair_rows = pairs.select(
        F.lit("pair").alias("method"), "vec_a", "vec_b", "cosine"
    )
    drop_rows = drops.select(
        F.lit("drop").alias("method"),
        F.col("vec_id").alias("vec_a"),
        F.col("keeper").alias("vec_b"),
        F.lit(None).cast("double").alias("cosine"),
    )
    return pair_rows.unionByName(drop_rows).orderBy("method", "vec_a", "vec_b")


def semantic_dedup_drops(pairs: DataFrame) -> DataFrame:
    """(vec_id, keeper): SemDeDup verdicts over a near-dup pair frame —
    for every vector in a component that is NOT the component minimum,
    the id to drop plus the id it duplicates (Abbas et al. 2023
    keep-one policy; component = transitive closure of the near-dup
    relation).  Components come from operators/graph.py pointer jumping:
    O(log diameter) rounds of keyed equi-joins over the PAIR graph only
    (O(near-dup vectors) rows per round, never the corpus)."""
    from emulating_hadoop_with_mpi_spark.operators.graph import connected_components

    edges = (
        pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
        .unionAll(pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")))
    )
    labels = connected_components(edges)
    return labels.filter(F.col("node") != F.col("lab")).select(
        F.col("node").alias("vec_id"), F.col("lab").alias("keeper")
    )


def semantic_neardup_pairs(
    emb: DataFrame, tau: float = NEARDUP_MIN_COSINE
) -> DataFrame:
    """Core of q75b over an arbitrary (vec_id, embedding) frame — see
    q75b_semantic_neardup_lsh for the contract and scale shape.

    Cache contract (ADVICE r8): in the partitioned regime two
    candidate-bounded frames are cache()d lazily and stay resident for
    the session; long-running callers issuing many independent passes
    should spark.catalog.clearCache() between them (same contract as
    minhash_verified_pairs)."""
    coded = lsh_codes(emb)
    qv = coded.select(
        "vec_id", quantize(F.col("embedding")).alias("qv"), "code"
    ).withColumn("norm2", dot_q(F.col("qv"), F.col("qv")))
    probes = F.array(
        F.col("code"), *[F.col("code").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)]
    )
    a = qv.select(F.col("vec_id").alias("vec_a"), F.explode(probes).alias("pcode"))
    b = qv.select(F.col("vec_id").alias("vec_b"), F.col("code").alias("bcode"))
    cand = a.join(
        b, (F.col("pcode") == F.col("bcode")) & (F.col("vec_a") < F.col("vec_b"))
    ).select("vec_a", "vec_b")
    sa = qv.select(
        F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"), F.col("norm2").alias("na")
    )
    sb = qv.select(
        F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"), F.col("norm2").alias("nb")
    )
    # Same size-dispatched verify shape as the MinHash/ppjoin family
    # (plans/inspect.plan_size_bytes): above the corpus boundary the
    # qv-array frames must never broadcast — semi-join them down to
    # candidate ids and build shuffle_hash on the ids-only candidate side,
    # everything bounded by candidate count.  Below it Catalyst's
    # broadcast plan wins.
    size = plan_size_bytes(emb)
    if size is None or size > SEMANTIC_PARTITIONED_BYTES:
        cand = cand.cache()
        cand_ids = (
            cand.select(F.col("vec_a").alias("vec_id"))
            .unionAll(cand.select(F.col("vec_b").alias("vec_id")))
            .distinct()
        )
        bounded = qv.join(cand_ids, "vec_id", "left_semi").cache()
        sa = bounded.select(
            F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"), F.col("norm2").alias("na")
        )
        sb = bounded.select(
            F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"), F.col("norm2").alias("nb")
        )
        joined = cand.hint("shuffle_hash").join(sa, "vec_a").hint("shuffle_hash").join(sb, "vec_b")
    else:
        joined = cand.join(sa, "vec_a").join(sb, "vec_b")
    cosine = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    # no trailing sort: the pair list is an unordered ledger (the q70
    # lesson — a corpus-wide range sort for presentation only); q75b's
    # union applies its own final ORDER BY and every test consumer
    # compares order-insensitively
    return (
        joined
        .withColumn("dot", dot_q(F.col("qa"), F.col("qb")))
        .filter(cosine >= tau)
        .select("vec_a", "vec_b", F.round(cosine, 6).alias("cosine"))
    )


# The exact top-k answer in SQL.  Used twice: q76 checks the brute
# broadcast scan against it (the ratcheted headline entry, brute-ONLY so
# its timing stays comparable across rounds), and q76b re-emits it under
# two method tags to hash-check that the exhaustive-probe IVF equals brute.
_TOPK_CORE = f"""
    WITH q AS (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings),
    n AS (SELECT vec_id, list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS norm2
          FROM q),
    scored AS (
        SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(CAST(list_reduce(list_transform(list_zip(qs.qv, c.qv),
                                                     p -> p[1] * p[2]),
                                      (x, y) -> x + y) AS DOUBLE)
                     / sqrt(CAST(nq.norm2 AS DOUBLE) * CAST(nc.norm2 AS DOUBLE)), 6) AS cosine
        FROM q qs JOIN q c ON qs.vec_id < {TOPK_QUERIES} AND c.vec_id <> qs.vec_id
        JOIN n nq ON qs.vec_id = nq.vec_id
        JOIN n nc ON c.vec_id = nc.vec_id
    ),
    topk AS (
        SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rnk
            FROM scored
        ) WHERE rnk <= {TOPK_K}
    )
    """

_TOPK_ORACLE = _TOPK_CORE + """
    SELECT query_id, neighbor_id, cosine, rnk FROM topk ORDER BY query_id, rnk
    """

_TOPK_BOTH_WAYS_ORACLE = _TOPK_CORE + """
    SELECT m.method, query_id, neighbor_id, cosine, rnk
    FROM topk CROSS JOIN (VALUES ('brute'), ('ivf_full')) m(method)
    ORDER BY m.method, query_id, rnk
    """


def brute_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast Q query vectors against one scan
    of the corpus (no corpus shuffle), exact integer dots, per-query
    window top-k on the ROUNDED cosine (ties broken by neighbor_id so the
    ranking is engine-independent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    withnorm = qv.withColumn("norm2", dot_q(F.col("qv"), F.col("qv")))
    queries = withnorm.filter(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq"), F.col("norm2").alias("nq")
    )
    corpus = withnorm.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qc"), F.col("norm2").alias("nc")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", dot_q(F.col("qq"), F.col("qc")))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("nq").cast("double") * F.col("nc").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOPK_K)
        .orderBy("query_id", "rnk")
    )


@query("q76_cosine_topk", oracle=_TOPK_ORACLE)
def q76_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k, brute force: one broadcast-join scan of the
    corpus — how you'd brute-force 100 TB: queries broadcast, corpus
    scanned once, no corpus shuffle.  Brute-ONLY so the ratcheted headline
    timing stays comparable across rounds; the IVF==brute equivalence
    proof lives in q76b_ivf_equals_brute."""
    return brute_cosine_topk(spark, sf_dir)


@query("q76b_ivf_equals_brute", oracle=_TOPK_BOTH_WAYS_ORACLE)
def q76b_ivf_equals_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF==brute equivalence proof, driver-hash-checked: the exact
    top-k computed TWO ways under one output contract, tagged by `method`:

    - 'brute':    the q76 broadcast scan.
    - 'ivf_full': the trained IVF index probed exhaustively
                  (nprobe == nlist) — every cell searched, so the result
                  must equal brute force exactly.

    The SQL oracle emits the exact answer under both tags, so the driver's
    value-hash proves the IVF machinery (centroid training, cell
    assignment, probe ordering, candidate scoring) reproduces the exact
    top-k — the equivalence that justifies trusting IVF at nprobe < nlist
    (the approximate scale path, registered as q77's 'ivf' branch)."""
    brute = brute_cosine_topk(spark, sf_dir).select(
        F.lit("brute").alias("method"), "query_id", "neighbor_id", "cosine", "rnk"
    )
    ivf_full = ivf_topk(spark, sf_dir, nprobe=IVF_NLIST).select(
        F.lit("ivf_full").alias("method"), "query_id", "neighbor_id", "cosine", "rnk"
    )
    return brute.unionAll(ivf_full).orderBy("method", "query_id", "rnk")


def _hyperplane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 entry of random hyperplane `plane` at `dim`
    (LCG-parity; reproduced verbatim in tests)."""
    x = (1103515245 * (plane * 4096 + dim) + 12345) & 0x7FFFFFFF
    return 1 if (x >> 16) & 1 else -1


def lsh_codes(emb: DataFrame, planes: int = LSH_PLANES, dim: int = 64) -> DataFrame:
    """(vec_id, embedding, code): 16-bit random-hyperplane code per vector.
    Signs are deterministic constants baked into the plan (broadcast-free).

    Projections are EXACT BIGINT dots over the QUANTIZED vector (±1 sign
    array), not float sums — floor(v·1000) then integer arithmetic is
    bit-identical in every engine, which is what lets DuckDB re-derive
    the codes and the driver hash-check q77 (promoted from rows-only,
    round 8).  The quantized array is materialized as a column first:
    Catalyst does not CSE inside lambda bodies, so an inline quantize
    would re-run floor(v·1000) once per plane."""
    base = emb.select("vec_id", "embedding", quantize(F.col("embedding")).alias("__qv"))
    code = F.lit(0).cast("int")
    for p in range(planes):
        signs = F.array(
            *[F.lit(_hyperplane_sign(p, d)).cast("bigint") for d in range(dim)]
        )
        proj = dot_q(F.col("__qv"), signs)
        code = code.bitwiseOR(F.shiftleft(F.when(proj > 0, 1).otherwise(0), p))
    return base.select("vec_id", "embedding", code.alias("code"))


def q77_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH codes bucket the corpus;
    each query MULTI-PROBES its own bucket plus every Hamming-1 neighbor
    code (17 probes of a 16-bit code) — the standard recall lever that
    costs extra probe lookups, not a bigger index.  Exact cosine within
    probed buckets.  At 100 TB: one pass to code + bucket the corpus
    (write bucketed parquet), then each query is a partition-pruned scan
    of 17 buckets.  Recall vs brute-force q76 is measured in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    coded = lsh_codes(emb)
    qv = coded.select(
        "vec_id", quantize(F.col("embedding")).alias("qv"), "code"
    ).withColumn("norm2", dot_q(F.col("qv"), F.col("qv")))
    # each query probes its own code and all 16 single-bit flips
    probes = F.array(
        F.col("code"), *[F.col("code").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)]
    )
    queries = (
        qv.filter(F.col("vec_id") < TOPK_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("qq"),
            F.col("norm2").alias("nq"),
            F.explode(probes).alias("qcode"),
        )
    )
    corpus = qv.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("qc"),
        F.col("norm2").alias("nc"),
        F.col("code").alias("ccode"),
    )
    scored = (
        corpus.join(
            F.broadcast(queries),
            (F.col("ccode") == F.col("qcode")) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("dot", dot_q(F.col("qq"), F.col("qc")))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("nq").cast("double") * F.col("nc").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOPK_K)
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the OTHER classic scale path next to q77's LSH:
# partition the corpus into nlist Voronoi cells around trained centroids;
# each query probes only the nprobe nearest cells.  Candidate cost is
# ~nprobe/nlist of the corpus instead of all of it.  With nprobe == nlist
# the search is exhaustive and must EQUAL the brute-force top-k (q76) —
# pinned in tests/test_pipeline_ops.py, alongside a recall measurement at
# nprobe < nlist.  Driver-visible through q77_ann_topk's 'ivf' branch.
# ---------------------------------------------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 4


def _centroids_df(spark: SparkSession, centers: list[list[int]]) -> DataFrame:
    """ONE row holding `carr: array<struct<cell, cvec, c2>>` — the trained
    centroids as data, not literals.  Broadcast-cross-joining this single
    row beats baking the centroids in as literal arrays: nlist × dim
    literals made Catalyst analysis/codegen the dominant cost (measured
    ~12 s per run at nlist=16, dim=64 — 10× the actual search).  And
    carrying ALL centroids in one array column lets nearest-cell
    assignment be a pure projection (transform + array_sort over nlist
    structs per row) — zero shuffle, vs the earlier per-(row, centroid)
    explode + window argmin that hash-partitioned the whole corpus per
    Lloyd iteration and per search."""
    arr = [
        (i + 1, [int(x) for x in c], sum(int(x) * int(x) for x in c))
        for i, c in enumerate(centers)
    ]
    return spark.createDataFrame(
        [(arr,)], "carr array<struct<cell: int, cvec: array<bigint>, c2: bigint>>"
    )


def _scored_cells(qv_col: str) -> Column:
    """array<struct<cell_score, cell>> — exact BIGINT L2² score minus the
    row-constant |v|² term (|c|² − 2·v·c, same argmin as true L2) against
    every centroid.  Field order (score first) makes array_sort's
    lexicographic struct ordering exactly our (score asc, cell asc)
    tie-break."""
    return F.transform(
        F.col("carr"),
        lambda c: F.struct(
            (c["c2"] - F.lit(2).cast("bigint") * dot_q(F.col(qv_col), c["cvec"])).alias(
                "cell_score"
            ),
            c["cell"].alias("cell"),
        ),
    )


def assign_cells(qv_df: DataFrame, centroids: DataFrame, qv_col: str = "qv") -> DataFrame:
    """Nearest-centroid assignment (ties → lowest cell id): broadcast the
    one-row centroid array, then a pure projection takes the argmin —
    one corpus scan, NO shuffle of any kind."""
    best = F.array_sort(_scored_cells(qv_col))[0]["cell"]
    return (
        qv_df.join(F.broadcast(centroids))
        .withColumn("cell", best)
        .drop("carr")
    )


def probe_cells_df(qv_df: DataFrame, centroids: DataFrame, nprobe: int, qv_col: str = "qv") -> DataFrame:
    """One row per (input row, probed cell): the nprobe nearest cells
    (ties → lowest cell id), via the same projection-only sort + slice.
    Already exploded — ready to equi-join the bucketed corpus."""
    probes = F.slice(F.array_sort(_scored_cells(qv_col)), 1, nprobe)
    return (
        qv_df.join(F.broadcast(centroids))
        .withColumn("cell", F.explode(F.transform(probes, lambda s: s["cell"])))
        .drop("carr")
    )


def ivf_centroids(
    corpus_qv: DataFrame, nlist: int = IVF_NLIST, lloyd_iters: int = 1
) -> list[list[int]]:
    """Train quantized centroids: deterministic pseudo-random init (the
    nlist lowest xxhash64(vec_id) rows — one job, no separate count pass),
    then `lloyd_iters` distributed Lloyd steps (assign via the broadcast
    centroid join and element-wise mean via posexplode + two hash
    aggregates).  Only nlist rows ever reach the driver per iteration —
    the standard k-means sync point.  At 100 TB: train on a sample,
    exactly this code on corpus_qv.sample()."""
    init = (
        corpus_qv.select("vec_id", "qv")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(nlist)
        .collect()
    )
    centers = [list(r.qv) for r in init][:nlist]
    spark = corpus_qv.sparkSession
    for _ in range(lloyd_iters):
        assigned = assign_cells(corpus_qv, _centroids_df(spark, centers))
        rows = (
            assigned.select("cell", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell",
                F.transform("pm", lambda s: F.floor(s["m"]).cast("bigint")).alias("c"),
            )
            .collect()
        )
        by_cell = {int(r.cell): list(r.c) for r in rows}
        # empty cells keep their previous centroid
        centers = [by_cell.get(i + 1, centers[i]) for i in range(len(centers))]
    return centers


def _ivf_search(
    corpus_qv: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    k: int,
    n_queries: int,
) -> DataFrame:
    """Shared IVF search tail: bucket the corpus (projection-only
    assignment), explode each query to its nprobe probe cells, equi-join
    on cell, exact cosine on candidates only, per-query window top-k.
    Same output contract and tie-breaks as q76."""
    from pyspark.sql import Window

    corpus = assign_cells(corpus_qv, centroids)
    queries = probe_cells_df(
        corpus_qv.filter(F.col("vec_id") < n_queries), centroids, nprobe
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qqv"),
        F.col("norm2").alias("qnorm2"),
        "cell",
    )
    cands = F.broadcast(queries).join(corpus, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cosine = F.round(
        dot_q(F.col("qqv"), F.col("qv")).cast("double")
        / F.sqrt(F.col("qnorm2").cast("double") * F.col("norm2").cast("double")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cosine.alias("cosine")
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    k: int = TOPK_K,
    n_queries: int = TOPK_QUERIES,
) -> DataFrame:
    """Trained IVF cosine top-k (k-means centroids via ``ivf_centroids``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    # cached: training (count + init + Lloyd) and the search plan all scan
    # the quantized corpus — without this the quantization recomputes once
    # per driver action.  (At real scale: persist to storage once, or
    # train on corpus_qv.sample() only.)
    corpus_qv = qv.withColumn("norm2", dot_q(F.col("qv"), F.col("qv"))).cache()
    centers = ivf_centroids(corpus_qv, nlist=nlist)
    centroids = _centroids_df(spark, centers)
    return _ivf_search(corpus_qv, centroids, nprobe, k, n_queries)


def sampled_centroids_df(corpus_qv: DataFrame, nlist: int = IVF_NLIST) -> DataFrame:
    """ONE row of `carr` (same shape as ``_centroids_df``): the nlist
    corpus vectors with the lowest md5(vec_id-as-string) digests, cell ids
    in digest order — a deterministic pseudo-random coarse quantizer.

    Sampling instead of k-means is the standard cheap IVF init (FAISS
    trains on a sample for the same reason); here it buys two things the
    Lloyd path can't give: the whole index build is DECLARATIVE (orderBy
    md5 + limit is one TakeOrdered job — no driver-side training sync),
    and every step is reproducible in ANSI SQL (md5 of the decimal string
    is engine-portable), which is what lets the driver hash-check q77's
    IVF branch end-to-end.  The trained Lloyd variant stays driver-checked
    via q76b (exhaustive-probe == brute) and recall-tested in tests."""
    from pyspark.sql import Window

    ordkey = F.md5(F.col("vec_id").cast("string"))
    w = Window.orderBy("__ord", "vec_id")
    cent = (
        corpus_qv.select("vec_id", "qv", "norm2", ordkey.alias("__ord"))
        .orderBy("__ord", "vec_id")
        .limit(nlist)
        .withColumn("cell", F.row_number().over(w).cast("int"))
    )
    return cent.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cell"),
                    F.col("qv").alias("cvec"),
                    F.col("norm2").alias("c2"),
                )
            )
        ).alias("carr")
    )


def ivf_sampled_topk(
    spark: SparkSession,
    sf_dir: str,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    k: int = TOPK_K,
    n_queries: int = TOPK_QUERIES,
) -> DataFrame:
    """IVF cosine top-k with the sampled (declarative, oracle-checkable)
    coarse quantizer — q77's registered IVF branch."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    corpus_qv = qv.withColumn("norm2", dot_q(F.col("qv"), F.col("qv")))
    centroids = sampled_centroids_df(corpus_qv, nlist)
    return _ivf_search(corpus_qv, centroids, nprobe, k, n_queries)


# q77's full SQL re-derivation: integer hyperplane projections (the same
# LCG sign constants, computed in SQL), 16-bit codes, Hamming-1
# multiprobe bucket join, plus the sampled-centroid IVF branch (md5-order
# sample, argmin cell assignment, nprobe probing) — every step exact
# integer math or engine-identical doubles, so the driver value-hash
# checks BOTH approximate paths end-to-end (promoted from rows-only, r8).
_SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]), (x, y) -> x + y)"
)

_ANN_ORACLE = f"""
    WITH q AS (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings),
    n AS (SELECT vec_id, list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS norm2
          FROM q),
    signsum AS (
        SELECT q.vec_id, p.i AS p,
               SUM(q.qv[CAST(d.i AS INT) + 1] *
                   (CASE WHEN ((((1103515245 * (p.i * 4096 + d.i) + 12345) & 2147483647)
                                >> 16) & 1) = 1
                         THEN 1 ELSE -1 END)) AS proj
        FROM q
        CROSS JOIN (SELECT unnest(generate_series(0, {LSH_PLANES - 1})) AS i) p
        CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) d
        GROUP BY q.vec_id, p.i
    ),
    codes AS (
        SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (1 << p) ELSE 0 END) AS INT) AS code
        FROM signsum GROUP BY vec_id
    ),
    lsh_probe AS (
        SELECT c.vec_id AS query_id,
               CASE WHEN pr.i = {LSH_PLANES} THEN c.code
                    ELSE CAST(xor(CAST(c.code AS BIGINT), (1 << pr.i)) AS INT) END AS pcode
        FROM codes c
        CROSS JOIN (SELECT unnest(generate_series(0, {LSH_PLANES})) AS i) pr
        WHERE c.vec_id < {TOPK_QUERIES}
    ),
    lsh_scored AS (
        SELECT pb.query_id, c.vec_id AS neighbor_id,
               ROUND(CAST({_SQL_DOT.format(a='qq.qv', b='qc.qv')} AS DOUBLE)
                     / sqrt(CAST(nq.norm2 AS DOUBLE) * CAST(nc.norm2 AS DOUBLE)), 6) AS cosine
        FROM lsh_probe pb
        JOIN codes c ON c.code = pb.pcode AND c.vec_id <> pb.query_id
        JOIN q qq ON qq.vec_id = pb.query_id
        JOIN q qc ON qc.vec_id = c.vec_id
        JOIN n nq ON nq.vec_id = pb.query_id
        JOIN n nc ON nc.vec_id = c.vec_id
    ),
    lshk AS (
        SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rnk
            FROM lsh_scored
        ) WHERE rnk <= {TOPK_K}
    ),
    cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(s.vec_id AS VARCHAR)), s.vec_id) AS cell,
               s.qv, s.norm2
        FROM (SELECT q.vec_id, q.qv, n.norm2
              FROM q JOIN n USING (vec_id)
              ORDER BY md5(CAST(q.vec_id AS VARCHAR)), q.vec_id
              LIMIT {IVF_NLIST}) s
    ),
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT q.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY c.norm2 - 2 * {_SQL_DOT.format(a='q.qv', b='c.qv')},
                                c.cell) AS rk
            FROM q CROSS JOIN cent c
        ) WHERE rk = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT q.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY c.norm2 - 2 * {_SQL_DOT.format(a='q.qv', b='c.qv')},
                                c.cell) AS rk
            FROM q CROSS JOIN cent c
            WHERE q.vec_id < {TOPK_QUERIES}
        ) WHERE rk <= {IVF_NPROBE}
    ),
    ivf_scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               ROUND(CAST({_SQL_DOT.format(a='qq.qv', b='qc.qv')} AS DOUBLE)
                     / sqrt(CAST(nq.norm2 AS DOUBLE) * CAST(nc.norm2 AS DOUBLE)), 6) AS cosine
        FROM qprobe p
        JOIN assign a USING (cell)
        JOIN q qq ON qq.vec_id = p.query_id
        JOIN q qc ON qc.vec_id = a.vec_id
        JOIN n nq ON nq.vec_id = p.query_id
        JOIN n nc ON nc.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id
    ),
    ivfk AS (
        SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rnk
            FROM ivf_scored
        ) WHERE rnk <= {TOPK_K}
    )
    SELECT 'lsh' AS method, query_id, neighbor_id, cosine, rnk FROM lshk
    UNION ALL
    SELECT 'ivf' AS method, query_id, neighbor_id, cosine, rnk FROM ivfk
    ORDER BY method, query_id, rnk
    """


@query("q77_ann_topk", oracle=_ANN_ORACLE)
def q77_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both ANN scale paths over one output contract, tagged by `method`:
    'lsh' = random-hyperplane codes with Hamming-1 multiprobe (index-free,
    one coding pass), 'ivf' = inverted-file cells around a deterministic
    md5-order sampled coarse quantizer, probed at nprobe < nlist.

    Fully driver-hash-checked (round 8): the LSH projections are exact
    BIGINT dots over quantized vectors with LCG sign constants, and the
    sampled IVF index build is declarative md5-order selection — both
    re-derivable in ANSI SQL, so the oracle recomputes codes, buckets,
    probes, and top-k end-to-end.  The TRAINED (Lloyd k-means) IVF
    variant — whose driver sync and xxhash64 init are not
    SQL-expressible — remains driver-hash-checked through q76b
    (exhaustive-probe == brute) and recall-tested in
    tests/test_pipeline_ops.py."""
    lsh = q77_ann_lsh_topk(spark, sf_dir).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "cosine", "rnk"
    )
    ivf = ivf_sampled_topk(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "cosine", "rnk"
    )
    return lsh.unionAll(ivf).orderBy("method", "query_id", "rnk")
