"""Physical-plan assertions: the properties that keep these queries viable
at 100 TB (pushdown, pruning, broadcast, JVM-only hot paths).  These guard
against regressions that correctness tests can't see."""

from __future__ import annotations

import pytest

from emulating_hadoop_with_mpi_spark.plans.inspect import (
    has_pushed_filters,
    python_eval_free,
    read_schema_columns,
    uses_broadcast_join,
)
from emulating_hadoop_with_mpi_spark.registry import all_queries

REGISTRY = all_queries()


def test_q02_filter_pushdown_and_column_pruning(spark, sf_dir):
    # q02 is unregistered (50-query driver cap, NOTES.md) but its plan
    # shape stays pinned here via a direct call.
    from emulating_hadoop_with_mpi_spark.operators.relational import q02_filter_project

    df = q02_filter_project(spark, sf_dir)
    assert has_pushed_filters(df), "lineitem filters must reach the parquet scan"
    cols = read_schema_columns(df)
    assert set(cols) <= {
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }, f"scan reads more than the projection needs: {cols}"


def test_q05_star_join_broadcasts_dimensions(spark, sf_dir):
    df = REGISTRY["q05_region_revenue"].fn(spark, sf_dir)
    assert uses_broadcast_join(df), "star-join dimensions must broadcast"


def test_q06_scan_agg_only(spark, sf_dir):
    df = REGISTRY["q06_forecast_revenue"].fn(spark, sf_dir)
    assert has_pushed_filters(df)
    cols = read_schema_columns(df)
    assert "l_extendedprice" in cols and "l_returnflag" not in cols


def test_jvm_only_hot_paths(spark, sf_dir):
    """Every relational/text/dedup/similarity query runs without Python
    evaluation (multimodal q78 is the one sanctioned Pandas stage)."""
    python_ok = {"q78_multimodal_features"}
    for name, q in REGISTRY.items():
        df = q.fn(spark, sf_dir)
        if name in python_ok:
            continue
        assert python_eval_free(df), f"{name} has Python in the hot path"


def test_matmul_broadcast_small_side(spark):
    from emulating_hadoop_with_mpi_spark.mapreduce import matmul_broadcast
    from emulating_hadoop_with_mpi_spark.sources.datagen import generate_matrix_df

    a = generate_matrix_df(spark, 64, 64, seed=1)
    b = generate_matrix_df(spark, 64, 64, seed=2)
    assert uses_broadcast_join(matmul_broadcast(a, b))


def test_new_pipeline_ops_are_jvm_only(spark, sf_dir):
    """Round-3 ops (chunking, packing, IVF) must stay pure JVM expressions
    on their scan paths — same bar as the registered queries."""
    from emulating_hadoop_with_mpi_spark.functions.similarity import ivf_topk
    from emulating_hadoop_with_mpi_spark.functions.text import (
        chunk_documents,
        pack_sequences,
    )
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert python_eval_free(chunk_documents(docs))
    assert python_eval_free(pack_sequences(docs))
    assert python_eval_free(ivf_topk(spark, sf_dir))


def test_ivf_cell_assignment_is_shuffle_free(spark, sf_dir):
    """Nearest-centroid assignment must be a pure projection over a
    broadcast of the one-row centroid array: zero shuffle exchanges per
    Lloyd iteration / per search (ADVICE r6 — the former window argmin
    hash-partitioned the whole corpus every pass)."""
    from pyspark.sql import functions as F

    from emulating_hadoop_with_mpi_spark.functions.similarity import (
        _centroids_df,
        assign_cells,
        dot_q,
        quantize,
    )
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select("vec_id", quantize(F.col("embedding")).alias("qv")).withColumn(
        "norm2", dot_q(F.col("qv"), F.col("qv"))
    )
    centroids = _centroids_df(spark, [[1] * 64, [2] * 64])
    plan = executed_plan(assign_cells(qv, centroids))
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 0, f"cell assignment shuffles:\n{plan}"
    # and the assignment itself is deterministic + total
    assigned = assign_cells(qv, centroids)
    assert assigned.filter(F.col("cell").isNull()).count() == 0


def test_q70_shuffles_digest_not_text(spark, sf_dir):
    """q70's dedup exchanges must partition on the 64-bit digest, never
    the document text: at 100 TB this is the difference between shuffling
    8-byte keys and shuffling the corpus (r7; slope 10× went 5.15 → 2.12
    with this change)."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    plan = executed_plan(REGISTRY["q70_dedup_exact"].fn(spark, sf_dir))
    assert "hashpartitioning(__k" in plan, plan
    assert "hashpartitioning(text" not in plan, "full text rides the exchange"


def test_q74_candidates_join_is_equi_not_nested_loop(spark, sf_dir):
    """SimHash candidate generation must be a key-partitioned equi-join on
    (block, value) — never a nested-loop all-pairs product, and never a
    broadcast of the ×70-exploded probe side (Catalyst's stats come from
    the 24-byte-per-doc cached sketch and don't see the explode; left
    unhinted it broadcast the probe frame — measured 5× slower with
    multi-hundred-second GC variance at the sf10 decade, r8)."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    plan = executed_plan(REGISTRY["q74_simhash_neardup"].fn(spark, sf_dir))
    assert "NestedLoop" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_pack_sequences_no_global_window(spark, sf_dir):
    """The packing prefix sum must NOT sort the corpus into a single
    partition: no window in the plan may be both unpartitioned and fed by
    the documents scan (the tiny range-offset window is fine — it sees at
    most PACK_NUM_RANGES rows, not per-document ones)."""
    from emulating_hadoop_with_mpi_spark.functions.text import pack_sequences
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    plan = pack_sequences(
        load_table(spark, sf_dir, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window over the raw token rows must carry a partition spec
    for m in re.finditer(r"Window \[sum\(n_tokens.*?\)", plan):
        window_line = m.group(0)
        assert "rng" in window_line or "bin_id" in window_line or "rng_total" in plan, (
            f"unpartitioned corpus-wide window: {window_line}"
        )


def test_q75b_semantic_neardup_is_bucketed_equi_join(spark, sf_dir):
    """q75b's candidate generation must be an equi-join on probe codes —
    never a nested-loop all-pairs over the corpus — and ppjoin-style the
    verify joins must not broadcast-build the array-carrying side (the
    probe side explodes ids only; the quantized vectors join back at
    verify time)."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    plan = executed_plan(REGISTRY["q75b_semantic_neardup_lsh"].fn(spark, sf_dir))
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ppjoin_verify_joins_are_shuffled_hash(spark, sf_dir):
    """ppjoin's verify joins are pinned ShuffledHashJoin building on the
    ids-only candidate side: AQE broadcast of the deserialized shingle-set
    arrays OOM'd the driver at the sf10 decade (round 8 — the same
    stats-blind-spot failure as q74's probe-side broadcast)."""
    from emulating_hadoop_with_mpi_spark.functions.dedup import ppjoin_pairs
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    plan = executed_plan(ppjoin_pairs(load_table(spark, sf_dir, "documents")))
    assert plan.count("ShuffledHashJoin") >= 2, plan
    assert "NestedLoop" not in plan, plan


def test_tfidf_df_join_dispatches_by_corpus_size(spark, sf_dir):
    """q84's df join: broadcast below the corpus boundary (driver data),
    ShuffledHashJoin with NO broadcast of the O(vocab) df table above it
    (forced boundary) — same values either way."""
    import emulating_hadoop_with_mpi_spark.functions.text as tx
    from emulating_hadoop_with_mpi_spark.registry import all_queries

    q = all_queries()["q84_tfidf_top_terms"]
    # key=repr: the bm25 section carries NULL tf/df (round 11), which
    # plain tuple ordering cannot compare against the tfidf ints
    small_rows = sorted(map(tuple, q.fn(spark, sf_dir).collect()), key=repr)
    orig = tx.TFIDF_PARTITIONED_BYTES
    try:
        tx.TFIDF_PARTITIONED_BYTES = 1
        part = q.fn(spark, sf_dir)
        plan = part._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan
        assert sorted(map(tuple, part.collect()), key=repr) == small_rows
    finally:
        tx.TFIDF_PARTITIONED_BYTES = orig


def test_no_cartesian_product_in_any_registered_query(spark, sf_dir):
    """Sweep guardrail over ALL 50 registered queries: no plan may
    contain a CartesianProduct — the one operator shape that cannot
    survive any scale-up.  (Broadcast nested-loop against a 1-row
    aggregate — q84's lazy corpus size — is fine and distinct.)"""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    offenders = []
    for name, q in sorted(REGISTRY.items()):
        try:
            plan = executed_plan(q.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — surface which query broke
            offenders.append(f"{name}: plan build failed: {e}")
            continue
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct in plan")
        # row-at-a-time Python in a query plan is the slow path the whole
        # engine is designed around; Arrow-batched (ArrowEvalPython /
        # MapInPandas — q78's sanctioned decode) stays allowed
        if "BatchEvalPython" in plan:
            offenders.append(f"{name}: row-at-a-time BatchEvalPython in plan")
    spark.catalog.clearCache()
    assert not offenders, offenders


def test_q84_tokenizes_corpus_exactly_once_above_boundary(spark, sf_dir):
    """q84's two sections (tfidf + bm25) share ONE posting frame
    (VERDICT r11 item 1).  In the cluster-scale regime (corpus above
    TFIDF_PARTITIONED_BYTES, forced here) the frame is persisted and
    exactly one parquet scan of documents reads the text column — the
    r11 plan tokenized the corpus three times (tf, df, and bm25's
    postings + stats).  The only other documents scan is bm25's stats
    row count, which reads no columns at all.  (Below the boundary the
    consumers recompute instead — measured faster at toy scale, NOTES
    r12; result equality across regimes is pinned by
    test_tfidf_df_join_dispatches_by_corpus_size.)"""
    import emulating_hadoop_with_mpi_spark.functions.text as tx
    from emulating_hadoop_with_mpi_spark.plans.inspect import formatted_plan

    orig = tx.TFIDF_PARTITIONED_BYTES
    try:
        tx.TFIDF_PARTITIONED_BYTES = 1
        plan = formatted_plan(REGISTRY["q84_tfidf_top_terms"].fn(spark, sf_dir))
    finally:
        tx.TFIDF_PARTITIONED_BYTES = orig
    text_scans = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "text" in ln
    ]
    assert len(text_scans) == 1, (
        f"corpus text scanned {len(text_scans)}x:\n" + "\n".join(text_scans)
    )
    spark.catalog.clearCache()


def test_plan_size_bytes_unknown_stats_is_none(spark):
    """Catalyst substitutes spark.sql.defaultSizeInBytes (Long.MaxValue)
    for stats-less leaves instead of reporting "unknown" — ADVICE r11:
    plan_size_bytes must map that sentinel to None so the documented
    count()/probe fallbacks (q74's sim64 gate, decontaminate) actually
    fire for inline frames."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import plan_size_bytes

    inline = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert plan_size_bytes(inline) is None


def test_q82_reads_corpus_at_most_three_times(spark, sf_dir):
    """q82's five selection signals must not each re-scan the corpus
    (VERDICT r11 item 5): the map-only signals (stopword scores,
    n_bpe_enc) ride ONE staged projection, and the DSIR/LM profile
    frames are persisted, so at action time the text is read at most
    three times — staged, the DSIR bucket profile, the LM bigram
    profile.  The plan may show one more text-reading scan node inside
    the classifier's InMemoryRelation, but that cache was materialized
    during training and never re-executes."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import formatted_plan

    plan = formatted_plan(REGISTRY["q82_lang_id"].fn(spark, sf_dir))
    text_scans = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "text:string" in ln
    ]
    # EXACTLY 4 (code-review r12): <= 4 could not catch a regression
    # reintroducing one extra scan; if a future change legitimately
    # drops to 3 (e.g. the clf cache child disappears), update the pin.
    assert len(text_scans) == 4, (
        f"corpus text scanned {len(text_scans)}x:\n" + "\n".join(text_scans)
    )
    spark.catalog.clearCache()
