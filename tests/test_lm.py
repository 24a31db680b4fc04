"""functions/lm.py — bigram-LM cross-entropy (CCNet-style perplexity).

Cross-checks the Spark implementation against a pure-Python bigram LM
on constructed corpora (exact to ROUND 6), pins the ranking property
the filter exists for (repetitive/typical text scores LOWER than
one-off token soup), and the short-doc edge.  The cross-engine hash of
q82's lm_xent column is covered by test_oracle_parity.py's sweep.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.lm import bigram_lm_xent


def _py_xent(texts: dict[int, str]) -> dict[int, float]:
    bi: Counter = Counter()
    un: Counter = Counter()
    toks_by = {}
    for did, text in texts.items():
        toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
        toks_by[did] = toks
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
            un[a] += 1
    V = len(un)
    out = {}
    for did, toks in toks_by.items():
        ps = [math.log((bi[(a, b)] + 1) / (un[a] + V)) for a, b in zip(toks, toks[1:])]
        if ps:
            out[did] = round(-sum(ps) / len(ps), 6)
    return out


def test_lm_xent_matches_python_reference(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the mat again",
        3: "zebra quark flux nebula ostrich",
        4: "the the the the the",
        5: "one-token",
        6: "",
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {r.doc_id: r.lm_xent for r in bigram_lm_xent(docs).collect()}
    exp = _py_xent(texts)
    assert set(got) == set(exp)  # docs 5 and 6 have no bigrams -> absent
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-9, (d, got[d], exp[d])


def test_lm_ranks_typical_below_one_off(spark):
    """The filter's reason to exist: text made of corpus-frequent
    transitions must score strictly lower cross-entropy than text whose
    transitions appear nowhere else."""
    rows = [(i, "alpha beta gamma delta alpha beta gamma delta") for i in range(10)]
    rows.append((99, "qat zork mulp vree xinth wubba"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sc = {r.doc_id: r.lm_xent for r in bigram_lm_xent(docs).collect()}
    typical = max(v for k, v in sc.items() if k != 99)
    assert sc[99] > typical + 0.5, sc


def test_lm_xent_on_testdata_matches_reference(spark, sf_dir):
    """End-to-end over the real documents table: exact equality with the
    pure-Python LM at ROUND 6 (the md5 hashing layer must be lossless in
    effect — no collision, no precision drift)."""
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    exp = _py_xent(texts)
    got = {r.doc_id: r.lm_xent for r in bigram_lm_xent(docs).collect()}
    assert set(got) == set(exp)
    worst = max(abs(got[d] - exp[d]) for d in exp)
    assert worst < 1e-9, worst


def test_lm_plan_is_hash_keyed_no_python(spark, sf_dir):
    """Scale contract: every join/agg key in the plan is the 60-bit hash
    (longs through the shuffles, never gram strings) and nothing drops
    to Python evaluation."""
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = bigram_lm_xent(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
