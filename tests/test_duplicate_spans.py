"""Cross-document duplicated-span detection (functions/dedup.py
duplicate_spans, round 9) vs a pure-Python sliding-window oracle —
planted shared boilerplate across unique docs, within-doc repetition,
boundary-length docs, and the no-duplicates corpus.
"""

from __future__ import annotations

from collections import Counter

from emulating_hadoop_with_mpi_spark.functions.dedup import (
    duplicate_spans,
    flag_span_duplicated_docs,
    remove_duplicate_spans,
)

HEADER = "this software is provided as is without warranty of any kind"  # 11 toks
DOCS = [
    # two otherwise-unrelated docs sharing the HEADER boilerplate
    (1, HEADER + " alpha beta gamma delta epsilon"),
    (2, "zeta eta theta " + HEADER + " iota kappa"),
    # within-doc repetition: the same 6-token phrase twice in one doc
    (3, "one two three four five six filler one two three four five six"),
    # exactly n tokens (single window), unique
    (4, "u1 u2 u3 u4 u5 u6"),
    # shorter than n: contributes no spans at all
    (5, "tiny doc"),
    # unique doc, no duplicated spans
    (6, "completely unrelated text with no repeated windows anywhere at all"),
]
N = 6


def _python_spans(n=N, min_count=2):
    spans = []
    for doc_id, text in DOCS:
        toks = text.lower().split()
        for pos in range(len(toks) - n + 1):
            spans.append((doc_id, pos, " ".join(toks[pos : pos + n])))
    counts = Counter(s for _, _, s in spans)
    return {
        (doc_id, pos): counts[s]
        for doc_id, pos, s in spans
        if counts[s] >= min_count
    }


def test_duplicate_spans_match_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.span_count
        for r in duplicate_spans(df, n=N).collect()
    }
    expected = _python_spans()
    assert got == expected
    # sanity on the scenario itself: the shared header spans ARE found
    assert any(d == 1 for d, _ in got) and any(d == 2 for d, _ in got)
    # and the within-doc repeat too
    assert (3, 0) in got and got[(3, 0)] == 2
    # doc 4's single unique window and docs 5/6 contribute nothing
    assert not any(d in (4, 5, 6) for d, _ in got)


def test_flag_span_duplicated_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    flags = {r.doc_id: r for r in flag_span_duplicated_docs(df, n=N).collect()}
    expected = _python_spans()
    per_doc = Counter(d for d, _ in expected)
    assert set(flags) == set(per_doc)
    for doc_id, cnt in per_doc.items():
        assert flags[doc_id].n_dup_spans == cnt
        assert flags[doc_id].max_span_count == max(
            v for (d, _), v in expected.items() if d == doc_id
        )


def test_no_false_positives_on_unique_corpus(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string",
    )
    assert duplicate_spans(df, n=8).count() == 0


def test_remove_duplicate_spans_keep_first(spark):
    from emulating_hadoop_with_mpi_spark.functions.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.doc_id: r.text for r in remove_duplicate_spans(df, n=N).collect()}
    # doc 1 holds the globally-first occurrence of every header span →
    # untouched, original text byte-for-byte
    assert out[1] == DOCS[0][1]
    # doc 2's header copy is cut (spans at pos 3..8 cover tokens 3..13)
    assert out[2] == "zeta eta theta iota kappa"
    # doc 3 keeps the first occurrence of its repeated phrase, loses the second
    assert out[3] == "one two three four five six filler"
    # untouched docs pass through unchanged
    for d in (4, 5, 6):
        assert out[d] == DOCS[d - 1][1]


def test_remove_duplicate_spans_cut_all(spark):
    from emulating_hadoop_with_mpi_spark.functions.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(df, n=N, keep_first=False).collect()
    }
    # every occurrence cut: both header copies vanish, doc 3 keeps only filler
    assert out[1] == "alpha beta gamma delta epsilon"
    assert out[2] == "zeta eta theta iota kappa"
    assert out[3] == "filler"


def test_remove_duplicate_spans_mixed_case_and_whitespace(spark):
    """ADVICE r9: cut positions are computed over LOWERCASED tokens but
    the rewrite runs over case-preserved raw tokens, relying on lower()
    never changing whitespace structure.  Pin that alignment on a corpus
    with mixed case, tabs, and newlines: the span match is
    case-insensitive, the cut lands on the right raw tokens, survivors
    keep their original casing, and untouched docs keep their text
    byte-for-byte (tabs included)."""
    docs = spark.createDataFrame(
        [
            (1, "KEEP This Phrase Repeated Here\tand MORE unique words"),
            (2, "other START\n this  phrase REPEATED here\tEnd tail"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in remove_duplicate_spans(docs, n=4).collect()}
    # doc 1 held the first occurrence: untouched, byte-for-byte
    assert out[1] == "KEEP This Phrase Repeated Here\tand MORE unique words"
    # doc 2's case-varied copy is cut at the right raw-token positions,
    # surrounding tokens keep their case (whitespace runs collapse —
    # the documented rewrite contract for flagged docs)
    assert out[2] == "other START End tail", repr(out[2])
