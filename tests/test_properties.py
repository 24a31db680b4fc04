"""Property-based tests (hypothesis): the engine's core equivalences hold
for arbitrary inputs, not just the planted fixtures (SURVEY §5 upgrade over
the reference's single hand-checked oracle run)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from emulating_hadoop_with_mpi_spark.mapreduce import (
    map_reduce,
    map_reduce_by_key,
    matmul_block,
    matmul_coo,
)
from emulating_hadoop_with_mpi_spark.sources.matrix import coo_to_numpy, matrix_coo_from_numpy

# session-scoped spark fixture comes from conftest; hypothesis drives data
shapes = st.tuples(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)


@settings(max_examples=8, deadline=None)
@given(shape=shapes, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_matmul_coo_equals_numpy_any_shape(spark, shape, seed):
    l, m, n = shape
    rng = np.random.RandomState(seed)
    a = rng.randint(-9, 10, size=(l, m)).astype(np.int32)  # negatives too
    b = rng.randint(-9, 10, size=(m, n)).astype(np.int32)
    c = matmul_coo(matrix_coo_from_numpy(spark, a), matrix_coo_from_numpy(spark, b))
    np.testing.assert_array_equal(coo_to_numpy(c, l, n), a.astype(np.int64) @ b)


@settings(max_examples=4, deadline=None)
@given(shape=shapes, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_matmul_block_equals_coo(spark, shape, seed):
    """The 100 TB block formulation is plan-equivalent to the COO join."""
    l, m, n = shape
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 10, size=(l, m)).astype(np.int32)
    b = rng.randint(0, 10, size=(m, n)).astype(np.int32)
    da, db = matrix_coo_from_numpy(spark, a), matrix_coo_from_numpy(spark, b)
    dense_coo = coo_to_numpy(matmul_coo(da, db), l, n)
    dense_blk = coo_to_numpy(matmul_block(da, db, block=4), l, n)
    np.testing.assert_array_equal(dense_blk, dense_coo)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("abc XYZ 019 .,!\t\n"),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_text_kernels_equal_python_reference(spark, texts):
    """tokens_col and the rolling-hash fingerprint match a plain-Python
    reimplementation on arbitrary text (whitespace runs, punctuation,
    empties, mixed case)."""
    import re

    from pyspark.sql import functions as F

    from emulating_hadoop_with_mpi_spark.functions.text import (
        FINGERPRINT_PREFIX,
        FP_MOD,
        tokens_col,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    chars = F.filter(F.split(F.substring("text", 1, FINGERPRINT_PREFIX), ""), lambda c: c != "")
    fp = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % FP_MOD,
    )
    rows = df.select("doc_id", tokens_col().alias("toks"), fp.alias("fp")).collect()
    for r in rows:
        text = texts[r.doc_id]
        expect_toks = [w for w in re.split(r"\s+", text.strip().lower()) if w != ""]
        assert list(r.toks) == expect_toks, (text, list(r.toks), expect_toks)
        h = 0
        for ch in text[:FINGERPRINT_PREFIX]:
            h = (h * 31 + ord(ch)) % FP_MOD
        assert r.fp == h, (text, r.fp, h)


@settings(max_examples=8, deadline=None)
@given(
    words=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_map_reduce_wordcount_equals_python(spark, words):
    """map_reduce == a plain Python dict fold, for arbitrary corpora, and
    the combiner/reduceByKey paths agree with the grouped path."""
    lines = [" ".join(ws) for ws in words]
    expect: dict[str, int] = {}
    for ws in words:
        for w in ws:
            expect[w] = expect.get(w, 0) + 1

    rdd = spark.sparkContext.parallelize(lines, 3)

    def mapper(line):
        return [(w, 1) for w in line.split()]

    def reducer(k, values):
        yield (k, sum(values))

    grouped = dict(map_reduce(rdd, mapper, reducer).collect())
    combined = dict(map_reduce(rdd, mapper, reducer, combiner=reducer).collect())
    by_key = dict(map_reduce_by_key(rdd, mapper, lambda a, b: a + b).collect())
    assert grouped == expect == combined == by_key


@settings(max_examples=6, deadline=None)
@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=70),
        st.integers(min_value=1, max_value=70),
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_dat_reader_roundtrip_any_shape(spark, tmp_path_factory, shape, seed):
    """The vectorized byte-range .dat reader reproduces ANY matrix exactly
    (incl. shapes that don't divide evenly into row splits, single-row,
    single-column, and negative values)."""
    import tempfile

    from emulating_hadoop_with_mpi_spark.sources.matrix import (
        read_matrix_coo,
        write_matrix_dat,
    )

    rows, cols = shape
    rng = np.random.RandomState(seed)
    arr = rng.randint(-1000, 1000, size=(rows, cols)).astype(np.int32)
    with tempfile.TemporaryDirectory() as d:
        path = write_matrix_dat(arr, d, seed % 1000)
        got = np.zeros((rows, cols), dtype=np.int64)
        rows_out = read_matrix_coo(spark, path).collect()
        assert len(rows_out) == rows * cols
        for r in rows_out:
            got[r["i"], r["j"]] = r["v"]
    assert (got == arr).all()


@settings(max_examples=6, deadline=None)
@given(
    pts=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=20),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=-30, max_value=60),  # negative => empty interval
        ),
        min_size=1,
        max_size=12,
    ),
    width=st.integers(min_value=1, max_value=50),
)
def test_range_join_equals_python_any_input(spark, pts, ivs, width):
    """Bucketized range join == a plain Python double loop for arbitrary
    points, intervals (including empty/negative-length), and widths —
    negative coordinates exercise floor-division bucketing of `div`."""
    from pyspark.sql import functions as F

    from emulating_hadoop_with_mpi_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(i, int(p)) for i, p in enumerate(pts)], "pid int, p long"
    )
    intervals = spark.createDataFrame(
        [(j, int(s), int(s + d)) for j, (s, d) in enumerate(ivs)],
        "iv_id int, start long, end long",
    )
    got = {
        (r.pid, r.iv_id)
        for r in range_join(
            points, intervals, "p", "start", "end", bucket_width=width
        ).collect()
    }
    expect = {
        (i, j)
        for i, p in enumerate(pts)
        for j, (s, d) in enumerate(ivs)
        if s <= p < s + d
    }
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    docs=st.dictionaries(
        st.integers(min_value=0, max_value=5000),  # sparse ids across ranges
        st.integers(min_value=0, max_value=12),  # zero-token docs drop out
        min_size=1,
        max_size=25,
    ),
    budget=st.integers(min_value=1, max_value=40),
)
def test_pack_sequences_equals_python_any_input(spark, docs, budget):
    """Distributed prefix-sum packing == sequential Python end-aligned
    binning for arbitrary doc-id/length sets and budgets (sparse and
    clustered id sets exercise the percentile-boundary range keying)."""
    from emulating_hadoop_with_mpi_spark.functions.text import pack_sequences

    rows = [(d, " ".join(["w"] * n)) for d, n in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.bin_id, r.bin_fill)
        for r in pack_sequences(df, budget=budget).collect()
    }
    cum, fills, expect = 0, {}, set()
    for d in sorted(docs):
        n = docs[d]
        if n == 0:
            continue
        cum += n
        b = (cum - 1) // budget
        fills[b] = fills.get(b, 0) + n
        expect.add((d, b, fills[b]))
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_equals_union_find(spark, edges):
    """Arbitrary small graphs (self-loops, duplicates, multi-component):
    the distributed pointer-jumping labels == a Python union-find."""
    from emulating_hadoop_with_mpi_spark.operators.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src long, dst long")
    # local_max_edges=0 forces the DISTRIBUTED pointer-jumping path —
    # these graphs are all below the local-regime boundary, and the
    # local path is a union-find itself (pinned vs this one in
    # test_pipeline_ops._run_cc's both-regimes sweep)
    got = {
        r["node"]: r["lab"]
        for r in connected_components(df, local_max_edges=0).collect()
    }
    assert got == want


# --- duplicate-span detection vs a pure-Python sliding-window oracle ------

_span_words = st.sampled_from(["aa", "bb", "cc", "dd"])  # tiny vocab → collisions
_span_doc = st.lists(_span_words, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_span_doc, min_size=1, max_size=8),
    n=st.integers(min_value=2, max_value=4),
)
def test_duplicate_spans_any_corpus(spark, texts, n):
    """duplicate_spans == the brute-force sliding-window count for
    arbitrary corpora over a tiny vocabulary (dense hash collisions in
    the BUCKET sense — many genuinely repeated spans, within and across
    docs, including the all-identical-tokens degenerate case)."""
    from collections import Counter

    from emulating_hadoop_with_mpi_spark.functions.dedup import duplicate_spans

    docs = list(enumerate(texts))
    expected_spans = []
    for doc_id, text in docs:
        toks = text.lower().split()
        for pos in range(len(toks) - n + 1):
            expected_spans.append((doc_id, pos, " ".join(toks[pos : pos + n])))
    counts = Counter(s for _, _, s in expected_spans)
    expected = {
        (d, p): counts[s] for d, p, s in expected_spans if counts[s] >= 2
    }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.span_count
        for r in duplicate_spans(df, n=n).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(_span_doc, min_size=1, max_size=6),
    n=st.integers(min_value=2, max_value=3),
)
def test_remove_duplicate_spans_any_corpus(spark, texts, n):
    """Cut semantics for arbitrary corpora: token i of doc d survives iff
    no flagged span (duplicated corpus-wide, not the globally-first
    occurrence of its hash) covers it — re-derived in pure Python."""
    from collections import Counter

    from emulating_hadoop_with_mpi_spark.functions.dedup import (
        remove_duplicate_spans,
    )

    docs = list(enumerate(texts))
    spans = []
    for doc_id, text in docs:
        toks = text.lower().split()
        for pos in range(len(toks) - n + 1):
            spans.append((doc_id, pos, " ".join(toks[pos : pos + n])))
    counts = Counter(s for _, _, s in spans)
    dup = [(d, p, s) for d, p, s in spans if counts[s] >= 2]
    first = {}
    for d, p, s in sorted(dup):
        first.setdefault(s, (d, p))
    cut_starts = {}
    for d, p, s in dup:
        if first[s] != (d, p):
            cut_starts.setdefault(d, set()).add(p)
    expected = {}
    for doc_id, text in docs:
        toks = text.split()  # case-preserving reconstruction
        starts = cut_starts.get(doc_id)
        if not starts:
            expected[doc_id] = text
        else:
            kept = [
                t for i, t in enumerate(toks)
                if not any(p <= i < p + n for p in starts)
            ]
            expected[doc_id] = " ".join(kept)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text for r in remove_duplicate_spans(df, n=n).collect()}
    assert got == expected
