"""BM25 ranked retrieval (functions/search.py, round 10): full local
DuckDB parity (the same rows+schema+values gate as test_oracle_parity —
the op is off the driver registry only because the 50-entry cap is
full), plus ranking-semantics and plan-shape pins.
"""

from __future__ import annotations

import duckdb

from emulating_hadoop_with_mpi_spark.functions.search import (
    bm25_oracle_sql,
    bm25_topk,
)
from emulating_hadoop_with_mpi_spark.sources.tables import load_table

QUERIES = ["spark hash join", "table scan fast", "window sort"]


def test_bm25_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in bm25_topk(docs, QUERIES, k=10).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.sql(bm25_oracle_sql(QUERIES, k=10)).fetchall()))
    assert len(got) == len(want) > 0
    assert got == want, (got[:3], want[:3])


def test_bm25_ranks_term_rich_docs_first(spark):
    """A doc saturated with the query terms must outrank one that only
    mentions them once, which outranks one without them at all (absent
    entirely from the result)."""
    docs = spark.createDataFrame(
        [
            (1, "needle needle needle haystack needle thread needle"),
            (2, "one needle in a big haystack of other words entirely"),
            (3, "nothing relevant here at all just filler words ok"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["needle"], k=10).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert ranked == [1, 2]


def test_bm25_plan_broadcasts_query_side(spark, sf_dir):
    """The query vocabulary and the 1-row stats frame broadcast; the
    corpus postings are semi-joined down BEFORE aggregation; nothing
    falls to Python or a CartesianProduct."""
    from emulating_hadoop_with_mpi_spark.plans.inspect import executed_plan

    docs = load_table(spark, sf_dir, "documents")
    plan = executed_plan(bm25_topk(docs, QUERIES, k=5))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_bm25_injected_postings_equals_standalone(spark, sf_dir):
    """The postings= injection path (q84's shared-frame contract, round
    12) must reproduce the standalone path exactly — same candidates,
    same df, same N/avgdl stats, same ranks — including the empty-doc
    contribution to N (empty docs carry no postings but DO count in N)."""
    from emulating_hadoop_with_mpi_spark.functions.search import corpus_postings

    docs = load_table(spark, sf_dir, "documents")
    standalone = sorted(
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in bm25_topk(docs, QUERIES, k=10).collect()
    )
    postings = corpus_postings(docs)
    injected = sorted(
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in bm25_topk(docs, QUERIES, k=10, postings=postings).collect()
    )
    assert len(standalone) > 0
    assert injected == standalone


def test_bm25_injected_postings_counts_empty_docs_in_n(spark):
    """N/avgdl derivation from the injected frame: a corpus with an
    empty document must produce the SAME stats as the standalone path
    (N includes the empty doc; its dl contributes 0 to avgdl)."""
    from emulating_hadoop_with_mpi_spark.functions.search import corpus_postings

    docs = spark.createDataFrame(
        [
            (1, "needle in a haystack"),
            (2, "needle needle sharp needle"),
            (3, "   "),  # tokenizes to zero tokens
            (4, ""),
        ],
        "doc_id long, text string",
    )
    postings = corpus_postings(docs)
    standalone = sorted(map(tuple, bm25_topk(docs, ["needle"], k=10).collect()))
    injected = sorted(
        map(tuple, bm25_topk(docs, ["needle"], k=10, postings=postings).collect())
    )
    assert injected == standalone
    assert len(injected) == 2
