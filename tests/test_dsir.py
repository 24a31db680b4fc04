"""DSIR importance scoring (functions/dsir.py, round 10): the
hashed-bigram log-likelihood-ratio selection score of Xie et al.
(arXiv:2302.03169).  Exact values are pinned by q82's DuckDB oracle
(test_oracle_parity); these tests pin the SEMANTICS (the score actually
separates target-like documents) and the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.dsir import dsir_scores
from emulating_hadoop_with_mpi_spark.sources.tables import load_table


def _mean_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    sc = dsir_scores(docs, is_target=F.col("lang") == "en")
    rows = (
        docs.join(sc, "doc_id")
        .groupBy("lang")
        .agg(F.avg("dsir").alias("m"))
        .collect()
    )
    return {r.lang: r.m for r in rows}


def test_dsir_separates_target_language(spark, sf_dir):
    """Docs from the target distribution (lang='en') must score CLEARLY
    above every non-target language on average — the property the
    selection pass thresholds on.  (Absolute sign is not asserted: with
    K=4096 buckets and a small target corpus, Laplace smoothing shifts
    all scores by a corpus-dependent constant; only the ORDERING is the
    selection signal.)"""
    means = _mean_by_lang(spark, sf_dir)
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] >= m + 2.0, means


def test_dsir_persist_flag_is_pure_optimization(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tgt = F.col("lang") == "en"
    a = sorted(map(tuple, dsir_scores(docs, tgt).collect()))
    b = sorted(map(tuple, dsir_scores(docs, tgt, persist=True).collect()))
    spark.catalog.clearCache()
    assert a == b and len(a) > 0


def test_dsir_plan_broadcasts_weights_only(spark, sf_dir):
    """The K-row weight table must broadcast; nothing may cartesian or
    fall to Python.  (The 1-row totals frame also broadcasts — both are
    bounded by construction, never corpus-sized.)"""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    plan = executed_plan(dsir_scores(docs, is_target=F.col("lang") == "en"))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan
