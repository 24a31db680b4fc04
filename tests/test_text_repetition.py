"""q81's repetition features (round 9) cross-checked against a pure-Python
re-computation — independent of both Spark's aggregate-lambda run-length
trick and the DuckDB oracle's GROUP BY re-derivation (which
test_oracle_parity already compares).  Edge cases the sf corpus never
hits: empty text, single token, all-identical tokens, no trigrams.
"""

from __future__ import annotations

from collections import Counter

import pytest

from emulating_hadoop_with_mpi_spark.functions.text import quality_scores

DOCS = [
    (1, "en", "a b a b a b c"),          # heavy bigram repetition
    (2, "en", "x x x x"),                # all-identical tokens
    (3, "en", "one two"),                # bigram exists, no trigram
    (4, "en", "solo"),                   # single token: no n-grams at all
    (5, "en", ""),                       # empty text
    (6, "en", "  Mixed   CASE  mixed "), # lowercasing + whitespace runs
    (7, "en", "p q r p q r p q r"),      # repeated trigram phrase
]


def _expected(text: str) -> dict:
    toks = [t for t in text.lower().strip().split() if t]
    g2 = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    g3 = [f"{a} {b} {c}" for a, b, c in zip(toks, toks[1:], toks[2:])]

    def frac(num, den):
        return round(num / den, 6) if den else 0.0

    return {
        "n_tokens": len(toks),
        "max_word_frac": frac(max(Counter(toks).values(), default=0), len(toks)),
        "top_bigram_frac": frac(max(Counter(g2).values(), default=0), len(g2)),
        "dup_trigram_frac": frac(len(g3) - len(set(g3)), len(g3)),
    }


def test_repetition_features_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    rows = {r.doc_id: r for r in quality_scores(df).collect()}
    assert set(rows) == {d[0] for d in DOCS}
    for doc_id, _, text in DOCS:
        exp = _expected(text)
        got = rows[doc_id]
        for k, v in exp.items():
            assert getattr(got, k) == pytest.approx(v, abs=1e-9), (
                f"doc {doc_id} ({text!r}): {k} = {getattr(got, k)} want {v}"
            )


def test_repetition_features_are_shuffle_free(spark):
    """The scale claim itself: the whole quality_scores plan must contain
    no Exchange — every feature (including the most-frequent-n-gram
    counts) is a per-row expression behind the Generate barrier."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    plan = executed_plan(quality_scores(df))
    assert "Exchange" not in plan, plan


def test_tokenize_runs_bounded_per_row(spark):
    """The explode(array(...)) barrier must survive optimization: at most
    two splits of the text column in the optimized plan (one for the
    string tokens, one feeding the fingerprint array) — CollapseProject
    inlining the split per REFERENCE was a measured 4× blowup."""
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    optimized = quality_scores(df)._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("split(") <= 2, optimized


def test_quality_gate_scores_matches_full_scorer(spark):
    """quality_gate_scores is the (n_tokens, quality) SUBSET of
    quality_scores — bit-identical values on every doc (the curation
    pipeline's gate/budget stages consume the lean twin; a formula
    drift between the two would silently change the curate hash)."""
    from emulating_hadoop_with_mpi_spark.functions.text import quality_gate_scores

    df = spark.createDataFrame(
        DOCS + [(99, "xx", ""), (100, "xx", "   "), (101, "en", "one")],
        "doc_id long, lang string, text string",
    )
    full = {
        r.doc_id: (r.n_tokens, r.quality) for r in quality_scores(df).collect()
    }
    lean = {
        r.doc_id: (r.n_tokens, r.quality)
        for r in quality_gate_scores(df).collect()
    }
    assert lean == full
    # keep_text passes the input text through unchanged
    with_text = {r.doc_id: r.text for r in quality_gate_scores(df, keep_text=True).collect()}
    assert with_text == {r.doc_id: r.text for r in df.collect()}
    # and the lean plan stays Exchange-free like the full one
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    assert "Exchange" not in executed_plan(quality_gate_scores(df))
