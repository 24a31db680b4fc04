"""Round-18 pin: shingles_df's row-local dedup (array_distinct before
the explode) emits exactly the rows the former explode + .distinct()
formulation did — the .distinct() was a full shuffle of the shingle
STRING stream to dedupe a key (doc_id, shingle) whose members all live
in one row (guide §2.4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.functions.dedup import shingles_df
from emulating_hadoop_with_mpi_spark.functions.text import tokens_col

# repeated n-grams inside a doc (the dedup case), exactly n tokens,
# < n tokens (dropped), shared n-grams ACROSS docs (must be kept — the
# dedup is per doc), whitespace/case variety
_DOCS = [
    (1, "a b c a b c a b c"),
    (2, "one two three"),
    (3, "too short"),
    (4, "a b c d e"),
    (5, "a b c d e"),
    (6, "  X  y\tz x Y z "),
]


def _old_shingles(docs, n=3):
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + off) for off in range(n)]),
    )
    return (
        docs.select("doc_id", tokens_col().alias("toks"))
        .filter(F.size(toks) >= n)
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def test_rowlocal_dedup_equals_distinct(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    for n in (2, 3, 8):
        got = sorted(tuple(r) for r in shingles_df(docs, n=n).collect())
        exp = sorted(tuple(r) for r in _old_shingles(docs, n=n).collect())
        assert got == exp, n
    # per-doc dedup really happened (doc 1 has 3 distinct trigram values)
    got3 = [t for t in sorted(tuple(r) for r in shingles_df(docs).collect()) if t[0] == 1]
    assert len(got3) == 3
    # cross-doc duplicates are preserved (docs 4 and 5 are twins)
    rows = sorted(tuple(r) for r in shingles_df(docs).collect())
    assert sorted(t[1] for t in rows if t[0] == 4) == sorted(
        t[1] for t in rows if t[0] == 5
    )


def test_no_exchange_in_shingle_plan(spark):
    """The shingle frame itself must be exchange-free (scan → project →
    filter → generate): the former .distinct() exchange is the shuffle
    this round removed."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = shingles_df(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
