"""functions/bpe.py — distributed BPE training + encoding.

Exact-parity tests against a pure-Python reference learn_bpe/encode
(the Sennrich ACL-2016 algorithm with the repo's pinned tie-break:
count desc, pair lexicographic asc).  BPE is off the driver registry —
iterative data-dependent argmax is not SQL-expressible and the 50-entry
cap is full — so these local parity checks ARE its correctness gate
(the BM25 precedent).
"""

from __future__ import annotations

import re
from collections import Counter

from emulating_hadoop_with_mpi_spark.functions.bpe import (
    CAND_FACTOR,
    EOW,
    bpe_encode,
    bpe_train,
)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def _py_learn_bpe(texts, num_merges, min_pair_count=2, batch_k=1):
    """Pure-Python reference of the BATCHED schedule (batch_k=1 is
    classic Sennrich BPE): per round, sort all pairs by (count desc,
    pair lex asc), scan the top CAND_FACTOR*batch_k candidates, and
    greedily accept pairwise-disjoint merges — identical selection rule
    to bpe.py's _select_disjoint."""
    words = Counter()
    for t in texts:
        words.update(_tokens(t))
    vocab = {tuple(w) + (EOW,): c for w, c in words.items()}
    merges = []
    while len(merges) < num_merges:
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # pinned tie-break: count desc, then pair lexicographic asc
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        used: set = set()
        batch = []
        for (a, b), n in ranked[: CAND_FACTOR * batch_k]:
            if len(batch) >= min(batch_k, num_merges - len(merges)):
                break
            if n < min_pair_count:
                break
            if a in used or b in used or (a + b) in used:
                continue
            batch.append((a, b))
            used |= {a, b, a + b}
        if not batch:
            break
        merges.extend(batch)
        for a, b in batch:
            vocab = {_py_apply(syms, a, b): c for syms, c in vocab.items()}
    return merges


def _py_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_encode(text, merges):
    out = []
    for w in _tokens(text):
        syms = tuple(w) + (EOW,)
        for a, b in merges:
            syms = _py_apply(syms, a, b)
        out.extend(syms)
    return out


SENNRICH = (
    "low low low low low lower lower newest newest newest "
    "newest newest newest widest widest widest"
)


def test_train_matches_reference_sennrich(spark):
    docs = spark.createDataFrame([(1, SENNRICH)], ["doc_id", "text"])
    got = bpe_train(docs, num_merges=10, batch_k=1)
    exp = _py_learn_bpe([SENNRICH], 10)
    assert got == exp, (got, exp)


def test_train_matches_reference_adversarial(spark):
    """Repetition inside words (overlapping pair counting + non-overlap
    merging), ties, multi-char growth, digits/punct symbols — classic
    one-merge-per-round schedule."""
    texts = [
        "aaa aaaa aa a banana bandana",
        "ab ab abab abab abab ba",
        "x.y x.y x,y 1234 12 34 1234",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = bpe_train(docs, num_merges=25, batch_k=1)
    exp = _py_learn_bpe(texts, 25)
    assert got == exp, (got, exp)


def test_batched_train_matches_batched_reference(spark):
    """The round-11 batched schedule (greedy disjoint top-k per round)
    is pinned against the same schedule in pure Python, including the
    conflict-skip path (overlapping symbol pairs forced by repetition)
    and the bounded candidate scan."""
    texts = [
        "aaa aaaa aa a banana bandana",
        "ab ab abab abab abab ba",
        SENNRICH,
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for k in (2, 4, 8):
        got = bpe_train(docs, num_merges=20, batch_k=k)
        exp = _py_learn_bpe(texts, 20, batch_k=k)
        assert got == exp, (k, got, exp)


def test_batched_selection_is_disjoint_and_budgeted(spark):
    """No symbol (or produced symbol) repeats inside one batch, and the
    total never exceeds num_merges even when batch_k doesn't divide it."""
    docs = spark.createDataFrame([(1, SENNRICH)], ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=7, batch_k=4, min_pair_count=1)
    assert len(merges) <= 7


def test_train_and_encode_match_reference_on_testdata(spark, sf_dir):
    """End-to-end on the real documents table with the batched OPT-IN
    schedule (k=8, what bench.py runs; the default is classic k=1 since
    ADVICE r11): identical merge list AND identical segmentation for
    every document."""
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got_merges = bpe_train(docs, num_merges=40, batch_k=8)
    exp_merges = _py_learn_bpe(texts.values(), 40, batch_k=8)
    assert got_merges == exp_merges
    enc = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(docs, got_merges).collect()}
    for did, text in texts.items():
        assert enc[did] == _py_encode(text, got_merges), did


def test_encode_empty_doc_is_empty(spark):
    """A zero-token document must encode to []/0 — the ADVICE r10 case:
    it wraps to the 2-char string '\\x1f\\x1f', which the <= 2 guard
    maps to an empty array instead of a phantom '' token."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "low low")], ["doc_id", "text"]
    )
    enc = {r.doc_id: (list(r.bpe_tokens), r.n_bpe)
           for r in bpe_encode(docs, [("l", "o"), ("lo", "w")]).collect()}
    assert enc[1] == ([], 0)
    assert enc[2] == ([], 0)
    assert enc[3][1] > 0 and enc[3][0] == _py_encode("low low", [("l", "o"), ("lo", "w")])


def test_encode_is_lossless(spark):
    """Segmentation must preserve content: stripping the word markers
    and concatenating reconstructs the normalized token stream."""
    docs = spark.createDataFrame(
        [(1, "The  Quick   brown FOX"), (2, SENNRICH), (3, "")], ["doc_id", "text"]
    )
    merges = bpe_train(docs, num_merges=15, min_pair_count=1)
    enc = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(docs, merges).collect()}
    for did, text in [(1, "The  Quick   brown FOX"), (2, SENNRICH), (3, "")]:
        rebuilt = "".join(enc[did]).replace(EOW, " ").strip()
        assert rebuilt == " ".join(_tokens(text)), (did, rebuilt)


def test_encode_plan_is_map_only_jvm(spark):
    """Encode compiles to nested native replace() calls: no Python
    evaluation, no shuffle, no join — the 100 TB contract (segment 1 B
    docs = one projection pass)."""
    docs = spark.createDataFrame([(1, SENNRICH)], ["doc_id", "text"])
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    plan = bpe_encode(docs, merges)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan, plan


def test_early_stop_on_min_pair_count(spark):
    """Every pair unique -> nothing reaches min_pair_count=2."""
    docs = spark.createDataFrame([(1, "abc def")], ["doc_id", "text"])
    assert bpe_train(docs, num_merges=5) == []


def test_default_schedule_is_classic_sennrich(spark):
    """ADVICE r11: the batched schedule diverges materially from classic
    one-merge-per-round BPE (prefix agreement of ONE merge on this very
    corpus at k=8), so batching must be an explicit opt-in -- the DEFAULT
    bpe_train call reproduces classic Sennrich output exactly."""
    docs = spark.createDataFrame([(1, SENNRICH)], ["doc_id", "text"])
    got = bpe_train(docs, num_merges=10)  # no batch_k: the default
    exp = _py_learn_bpe([SENNRICH], 10, batch_k=1)
    assert got == exp, (got, exp)
    # and the divergence window stays characterized: at k=8 the batched
    # schedule departs from classic immediately after the first merge
    batched = _py_learn_bpe([SENNRICH], 10, batch_k=8)
    assert batched != exp and batched[0] == exp[0]


def test_wrap_handles_line_terminators(spark):
    """ADVICE r11: U+2028/U+2029/U+0085 are NOT collapsed by \\s+ in
    either engine, so the char wrap must include them like any other
    char.  Without (?s) Java's '.' skipped them -- 'a\u2028b' encoded to
    2 symbols instead of 4 and diverged from the DuckDB twin (whose
    string_split(w, '') wraps every char)."""
    import duckdb
    import pandas as pd

    from emulating_hadoop_with_mpi_spark.functions.text import (
        _SQL_TOKENS,
        _bpe_enc_oracle_expr,
        BPE_SECTION_MERGES,
    )

    texts = ["a\u2028b", "x\u2029y z", "p\u0085q", "low lower newest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = list(BPE_SECTION_MERGES)
    got = {
        r.doc_id: (r.n_bpe, list(r.bpe_tokens))
        for r in bpe_encode(docs, merges).collect()
    }
    assert got[0][0] == 4 and got[0][1] == ["a", "\u2028", "b", EOW], got[0]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    wd = _bpe_enc_oracle_expr(_SQL_TOKENS)
    rows = con.sql(
        f"""
        SELECT doc_id,
               CASE WHEN length(wd) <= 2 THEN []
                    ELSE string_split(substring(wd, 2, length(wd) - 2), e'\\x1F\\x1F')
               END AS toks
        FROM (SELECT doc_id, {wd} AS wd FROM documents)
        """
    ).fetchall()
    want = {doc_id: (len(toks), list(toks)) for doc_id, toks in rows}
    assert got == want, (got, want)
