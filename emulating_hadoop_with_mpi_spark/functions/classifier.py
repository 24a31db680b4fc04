"""Distributed linear quality-classifier training (logistic regression).

The selection pass every large-scale pretraining pipeline runs after the
cheap heuristics: train a small linear classifier over document features
and keep what scores high (the fastText-style quality/CCNet filter of
LLaMA/GPT-3-era data work; public knowledge — Joulin et al. 2016,
Brown et al. 2020 appendix A).  No reference-repo analogue (the
reference is a matrix-multiply engine, `program.c`); this belongs to the
LLM-pipeline operator family SURVEY.md scopes on top of it.

Training is full-batch gradient descent, expressed Spark-first:

    w ← w − lr · (Σ_i (σ(w·x_i) − y_i) · x_i) / N

Each iteration is ONE job over a cached narrow feature frame — a
map-side-combined aggregate that returns d+1 doubles to the driver (the
DataFrame-API analogue of MLlib's treeAggregate gradient step).  The
driver-side loop holds only the weight vector; nothing corpus-sized ever
reaches the driver (the `.collect()` is one row of d+1 doubles per
iteration, same bounded-collect class as the k-means centroid sync in
functions/similarity.py).

Scoring is map-only: the learned weights are baked into the plan as
literals, so inference is a single projection — no join, no broadcast,
no shuffle.

Scale shape (100 TB): feature extraction is one pass over the text
(quality_scores in functions/text.py is map-only); the feature frame is
~50 bytes/doc — cluster-cacheable at billions of docs — and GD reads the
cache ITERS times.  Wall-clock is ITERS × (cache scan + one-row
shuffle); the text is read once.

Float determinism (oracle contract): features are ROUND(·,6)-ed ratios
of exact integer counts — bit-identical across engines.  With w₀ = 0 the
first sigmoid is exactly 0.5 in both engines; thereafter exp() differs
by ≤ 1 ulp between libm and the JVM and partial-sum order differs
between engines, so weights drift ~1e-15/iteration relatively — ~1e-13
absolute after 16 iterations against a 0.5e-6 rounding boundary at
ROUND(·, 6).  Same accepted risk class as the ln-ratio sums in
functions/dsir.py (module docstring there).  Every arithmetic step pins
parenthesization identically in the Spark expressions, the driver-side
Python update, and the generated oracle SQL: the margin is the
left-associated sum b0·x0 + b1·x1 + …, the sigmoid is
1.0/(1.0 + EXP(−margin)), and the update is b_j − lr · (SUM(...) /
COUNT(*)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Registered configuration (q82's clf_quality column): LR/ITERS measured
# on the sf0.01 corpus — lr=10, 16 iterations reaches 0.872 holdout
# accuracy vs a 0.79 majority-class baseline (tests/test_classifier.py
# re-checks the holdout split every run); larger lr oscillates
# (full-batch GD on near-separable ratios), more iterations buy < 0.005.
CLF_LR = 10.0
CLF_ITERS = 16
# Label for the registered demo: the synthetic corpus carries no organic
# "keep/drop" labels (lang and source are independent of the text — the
# stopword probe in NOTES.md round 10), so the registered check trains
# against the integer-exact quality gate as a reproducible, learnable
# label.  The gate value splits sf0.01 79/21.  The trainer API itself is
# label-agnostic — pass any 0.0/1.0 column.
CLF_QUALITY_GATE = 0.62
# Feature columns over functions/text.quality_scores output: intercept,
# the quality-driving ratios, and the length gate.  digit_ratio and
# top_bigram_frac are omitted (constant / non-predictive on this
# corpus — measured, NOTES round 10).
CLF_FEATURES = (
    "alpha_ratio",
    "stopword_ratio",
    "tok20",
    "max_word_frac",
    "dup_trigram_frac",
)


def logreg_margin(weights: list[float], x_cols) -> Column:
    """Left-associated  b0·x0 + b1·x1 + …  with the weights as literals —
    parenthesization matches the generated oracle SQL exactly."""
    acc: Column | None = None
    for w, x in zip(weights, x_cols):
        term = F.lit(float(w)) * F.col(x)
        acc = term if acc is None else acc + term
    assert acc is not None
    return acc


def logreg_prob(weights: list[float], x_cols) -> Column:
    """σ(w·x) = 1.0 / (1.0 + exp(−margin)) — pinned form."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logreg_margin(weights, x_cols)))


def train_logreg(
    feats: DataFrame,
    y_col: str = "y",
    x_cols=None,
    iters: int = CLF_ITERS,
    lr: float = CLF_LR,
) -> list[float]:
    """Full-batch GD over ``feats`` (one row per example; ``y_col`` is
    0.0/1.0; ``x_cols`` are double feature columns, intercept included by
    the caller as a literal column).  Returns the learned weights.

    The caller should persist() ``feats`` — every iteration scans it.
    Each iteration collects ONE row of len(x_cols)+1 doubles (bounded
    driver transfer; see module docstring)."""
    x_cols = list(x_cols or ("x0",) + tuple(f"x{i+1}" for i in range(len(CLF_FEATURES))))
    w = [0.0] * len(x_cols)
    for _ in range(iters):
        p = logreg_prob(w, x_cols)
        err = p - F.col(y_col)
        row = feats.agg(
            *[F.sum(err * F.col(x)).alias(f"g{j}") for j, x in enumerate(x_cols)],
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = row["n"]
        # pinned update order: b_j − lr · (g_j / n)  (matches oracle SQL)
        w = [w[j] - lr * (row[f"g{j}"] / n) for j in range(len(x_cols))]
    return w


def quality_feature_frame(quality_scored: DataFrame) -> DataFrame:
    """(doc_id, y, x0..x5) over a functions/text.quality_scores output
    frame — the registered feature/label extraction (see CLF_* above)."""
    return quality_scored.select(
        "doc_id",
        F.when(F.col("quality") >= CLF_QUALITY_GATE, 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        F.col("alpha_ratio").alias("x1"),
        F.col("stopword_ratio").alias("x2"),
        F.when(F.col("n_tokens") >= 20, 1.0).otherwise(0.0).alias("x3"),
        F.col("max_word_frac").alias("x4"),
        F.col("dup_trigram_frac").alias("x5"),
    )


def quality_clf_scores(
    quality_scored: DataFrame,
    iters: int = CLF_ITERS,
    lr: float = CLF_LR,
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, clf_quality): train the registered quality classifier on
    a quality_scores frame and score every document with the learned
    weights (map-only projection).

    Cache contract (same as q74's sketch persist): the feature frame
    stays persisted after training because the returned scoring frame
    still reads it lazily; the builder cannot unpersist what the caller
    hasn't materialized.  Callers that loop call
    ``spark.catalog.clearCache()`` between iterations (bench.py does)."""
    feats = quality_feature_frame(quality_scored).persist()
    x_cols = [f"x{j}" for j in range(len(CLF_FEATURES) + 1)]
    w = train_logreg(feats, y_col="y", x_cols=x_cols, iters=iters, lr=lr)
    return feats.select(
        "doc_id", F.round(logreg_prob(w, x_cols), round_to).alias("clf_quality")
    )


def logreg_oracle_ctes(
    feats_cte: str,
    label_sql: str,
    feature_sqls,
    iters: int = CLF_ITERS,
    lr: float = CLF_LR,
    out_col: str = "clf_quality",
    round_to: int = 6,
) -> str:
    """DuckDB CTE block re-deriving train_logreg + scoring for the
    driver oracle (appended inside a WITH list).  Produces relations
    ``clf_feats(doc_id, y, x0..)``, ``clf_w{t}`` per iteration, and
    ``clf_sc(doc_id, {out_col})``.  Arithmetic parenthesization matches
    the Spark expressions term for term (module docstring)."""
    d = len(feature_sqls)
    xs = [f"x{j}" for j in range(d)]
    feat_cols = ",\n               ".join(
        f"{sql} AS {x}" for sql, x in zip(feature_sqls, xs)
    )
    margin = " + ".join(f"b{j} * {x}" for j, x in enumerate(xs))
    sig = f"1.0 / (1.0 + EXP(-({margin})))"
    ctes = [
        f"""clf_feats AS (
        SELECT doc_id, {label_sql} AS y,
               {feat_cols}
        FROM {feats_cte}
    )""",
        "clf_w0 AS (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS b{j}" for j in range(d))
        + ")",
    ]
    for t in range(1, iters + 1):
        updates = ",\n               ".join(
            f"b{j} - {lr!r} * (SUM(({sig} - y) * {x}) / COUNT(*)) AS b{j}"
            for j, x in enumerate(xs)
        )
        group = ", ".join(f"b{j}" for j in range(d))
        ctes.append(
            f"""clf_w{t} AS (
        SELECT {updates}
        FROM clf_feats, clf_w{t - 1}
        GROUP BY {group}
    )"""
        )
    ctes.append(
        f"""clf_sc AS (
        SELECT doc_id, ROUND({sig}, {round_to}) AS {out_col}
        FROM clf_feats, clf_w{iters}
    )"""
    )
    return ",\n    ".join(ctes)
