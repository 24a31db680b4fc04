"""functions/classifier.py — distributed full-batch-GD logistic regression.

Cross-checks: (1) the Spark training loop reproduces a NumPy reference
GD on the identical feature matrix to float-noise tolerance (the
distributed gradient aggregate is the only thing that differs);
(2) the registered quality-gate demo generalizes — trained on even
doc_ids, it beats the majority-class baseline on held-out odd doc_ids;
(3) inference is map-only (weights are plan literals — no join, no
Exchange, no Python).  The q82 clf_quality column's cross-engine hash
(training arithmetic replayed in DuckDB CTEs) is covered by
test_oracle_parity.py's registry sweep.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.classifier import (
    CLF_ITERS,
    CLF_LR,
    CLF_QUALITY_GATE,
    logreg_prob,
    quality_feature_frame,
    train_logreg,
)
from emulating_hadoop_with_mpi_spark.functions.text import quality_scores
from emulating_hadoop_with_mpi_spark.sources.tables import load_table

X_COLS = ["x0", "x1", "x2", "x3", "x4", "x5"]


def _numpy_gd(X: np.ndarray, y: np.ndarray, iters: int, lr: float) -> np.ndarray:
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y) / len(y))
    return w


def _feature_matrix(feats_rows):
    X = np.array([[r[x] for x in X_COLS] for r in feats_rows], dtype=float)
    y = np.array([r["y"] for r in feats_rows], dtype=float)
    return X, y


def test_train_logreg_matches_numpy(spark, sf_dir):
    """The distributed gradient aggregate == the NumPy reference on the
    identical (already-rounded) feature matrix: only partial-sum order
    differs, so weights agree to ~1e-12."""
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(quality_scores(docs.select("doc_id", "text"))).persist()
    try:
        w_spark = train_logreg(feats, y_col="y", x_cols=X_COLS)
        X, y = _feature_matrix(feats.collect())
        w_np = _numpy_gd(X, y, CLF_ITERS, CLF_LR)
        assert np.abs(np.array(w_spark) - w_np).max() < 1e-9, (w_spark, w_np)
    finally:
        feats.unpersist()


def test_clf_holdout_beats_majority(spark):
    """Trained on even doc_ids at sf0.01, the classifier must beat the
    majority-class baseline on the held-out odd doc_ids — i.e. the
    trainer actually learns the (near-linear) quality boundary instead
    of memorizing the prior.  sf0.01 is pinned (500 docs; the sf0.001
    split is too small for a stable holdout read)."""
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    feats = quality_feature_frame(quality_scores(docs.select("doc_id", "text"))).persist()
    try:
        train = feats.filter(F.col("doc_id") % 2 == 0)
        w = train_logreg(train, y_col="y", x_cols=X_COLS)
        held = feats.filter(F.col("doc_id") % 2 == 1).select(
            "y", (logreg_prob(w, X_COLS) > 0.5).cast("double").alias("pred")
        )
        agg = held.agg(
            F.avg((F.col("pred") == F.col("y")).cast("double")).alias("acc"),
            F.avg("y").alias("pos_rate"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        majority = max(agg["pos_rate"], 1.0 - agg["pos_rate"])
        assert agg["n"] > 200
        assert agg["acc"] > majority + 0.03, (agg["acc"], majority)
    finally:
        feats.unpersist()


def test_scoring_is_map_only(spark, sf_dir):
    """Inference bakes the weights into the plan as literals: scoring a
    feature frame must add NO Exchange and NO Python evaluation — the
    100 TB contract (score 1 B docs = one projection pass)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(quality_scores(docs.select("doc_id", "text")))
    scored = feats.select("doc_id", F.round(logreg_prob([0.1] * 6, X_COLS), 6).alias("s"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_quality_gate_balance(spark, sf_dir):
    """The registered label must stay non-degenerate on the driver's
    check corpus family: both classes present (a one-class label would
    make the oracle check vacuous)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_feature_frame(quality_scores(docs.select("doc_id", "text")))
    rates = feats.agg(F.avg("y").alias("p")).collect()[0]["p"]
    assert 0.05 < rates < 0.95, rates


def test_gate_constant_pinned():
    """The oracle SQL embeds the gate via repr — pin the value so a
    drive-by edit can't silently diverge the two engines."""
    assert CLF_QUALITY_GATE == 0.62
    assert CLF_ITERS == 16 and CLF_LR == 10.0
