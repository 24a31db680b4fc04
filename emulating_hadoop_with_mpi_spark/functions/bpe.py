"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The tokenizer-training stage of a pretraining data pipeline: learn a
byte-pair-encoding merge table from the corpus, then segment documents
with it (public knowledge — Sennrich/Haddow/Birch ACL 2016 `learn_bpe`,
the GPT-2/fastText-family subword scheme).  No reference-repo analogue;
part of the LLM-pipeline operator family SURVEY.md scopes.

Algorithm (classic): word frequency table → represent each word as a
character sequence + an end-of-word marker → repeat N times { count all
adjacent symbol pairs weighted by word count; merge the most frequent
pair everywhere }.  Ties break deterministically (count desc, then pair
lexicographic asc) so the merge list is reproducible across runs and
engines.

Spark-first shape (100 TB):
- ONE corpus pass builds the word table (token explode + groupBy —
  map-side combined, the only corpus-sized shuffle).  Everything after
  runs on the VOCABULARY (≪ corpus, e.g. ~10⁶ rows for 10¹¹ tokens),
  kept in executor storage via periodic localCheckpoint (lineage
  truncation every ``checkpoint_every`` merges — the
  connected-components pattern, operators/graph.py).
- each merge round is one vocab-sized job: split → adjacent-pair
  explode → groupBy(a, b) with map-side combine → driver argmax of ONE
  row (bounded collect, the k-means-sync class).
- SYMBOL SEQUENCES ARE WRAPPED STRINGS, NOT ARRAYS: a word's symbols
  [s1, s2, s3] are stored as the single string  ␟s1␟␟s2␟␟s3␟
  (US control char U+001F, double separator between symbols, single at
  the edges).  Applying merge (a, b) is then ONE native literal
  replace("␟a␟␟b␟" → "␟ab␟") — whole-stage-codegen JVM string scan,
  left-to-right non-overlapping, which is exactly BPE's merge
  semantics.  The double separator keeps adjacent disjoint matches
  from sharing a boundary character (with single ␟, [a,b,a,b] would
  merge only the first pair because the match consumes the shared
  separator), and symbols can never contain ␟, so every match aligns
  to symbol boundaries.  An interpreted fold over symbol arrays
  (aggregate() lambda) was the alternative; HOF lambdas have lost
  every measured A/B in this repo (NOTES r9/r10), and replace() keeps
  the whole training loop and the entire encode path JVM-native.
- ENCODING IS A PURE PROJECTION: replaying the merge list IN TRAINING
  ORDER, once each, equals the standard greedy lowest-rank-first
  encode — a merge's output symbol did not exist when any earlier
  merge was learned, so later merges can never enable earlier ones.
  Encode therefore compiles to N nested replace() calls over the
  wrapped doc string — map-only, no Python, no shuffle; the merge
  table rides the plan as literals (same broadcast-free trick as the
  classifier weights).  Cross-word merges cannot fire even though the
  doc is one wrapped string: any pair whose left symbol ends in the
  word marker was never adjacent-in-word during training, so it is
  never in the merge table.

Driver-check status: BPE training is an iterative data-dependent-argmax
loop — not SQL-expressible (DuckDB recursive CTEs forbid aggregates
over the recursive relation), and the 50-entry registry is full, so
like BM25 this ships with full LOCAL exact-parity tests instead: the
learned merge list and the encoded output are pinned EQUAL to a
pure-Python reference `learn_bpe`/encode on both constructed corpora
and the real sf0.001 documents table (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.operators.graph import _unpersist_checkpoint

SEP = "\x1f"
EOW = "</w>"  # end-of-word marker symbol (Sennrich's convention)


def _wrap_word(word: Column) -> Column:
    """word → its initial wrapped symbol string ␟c1␟␟c2␟…␟</w>␟."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )
    syms = F.concat(chars, F.array(F.lit(EOW)))
    return F.concat(F.lit(SEP), F.array_join(syms, SEP + SEP), F.lit(SEP))


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(wstr, cnt): corpus word-frequency table in wrapped-symbol form —
    the single corpus-sized pass of BPE training."""
    from emulating_hadoop_with_mpi_spark.functions.text import tokens_col

    return (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_wrap_word(F.col("w")).alias("wstr"), "cnt")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-symbol pair counts over the word table,
    weighted by word frequency.  Overlapping occurrences count (the
    classic learn_bpe counting: zip(syms, syms[1:]))."""
    syms = F.split(
        F.expr("substring(wstr, 2, length(wstr) - 2)"), SEP + SEP
    )
    staged = words.select("cnt", syms.alias("s"))
    pairs = F.zip_with(
        F.slice(F.col("s"), 1, F.greatest(F.size("s") - 1, F.lit(0))),
        F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        staged.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_expr(col: Column, a: str, b: str) -> Column:
    """Apply merge (a, b) to a wrapped symbol string — one native
    literal replace (module docstring: boundary-safe by construction)."""
    return F.replace(
        col,
        F.lit(SEP + a + SEP + SEP + b + SEP),
        F.lit(SEP + a + b + SEP),
    )


# candidate rows scanned per training round = CAND_FACTOR * batch_k.
# Part of the pinned algorithm spec (the pure-Python test reference scans
# the same bounded prefix), so the greedy disjoint selection is
# deterministic and engine-independent even when conflicts force skips.
CAND_FACTOR = 4


def _select_disjoint(
    candidates: list[tuple[str, str, int]],
    batch_k: int,
    budget: int,
    min_pair_count: int,
) -> list[tuple[str, str]]:
    """Greedy pairwise-disjoint batch selection over count-ordered
    candidates — the fastBPE batching rule, pinned identically in the
    pure-Python test reference.  A pair is accepted iff neither member
    NOR its concatenation collides with an already-accepted pair's
    members or output symbol: disjoint merges commute and their
    pre-round counts stay exact after applying the earlier accepted
    merges, so the batch equals ``batch_k`` classic rounds whenever no
    newly-creatable pair would have out-ranked the later picks."""
    used: set[str] = set()
    batch: list[tuple[str, str]] = []
    for a, b, n in candidates:
        if len(batch) >= min(batch_k, budget):
            break
        if n < min_pair_count:
            break
        if a in used or b in used or (a + b) in used:
            continue
        batch.append((a, b))
        used |= {a, b, a + b}
    return batch


def bpe_train(
    docs: DataFrame,
    num_merges: int = 64,
    min_pair_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 8,
    batch_k: int = 1,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from ``docs``.  Returns the
    merge list in training order (the tokenizer artifact).  Stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times.

    ``batch_k`` (round 11, the fastBPE batching trick): each driver
    round collects the top ``CAND_FACTOR * batch_k`` pair counts ONCE
    and accepts up to ``batch_k`` pairwise-disjoint merges from them in
    count order (``_select_disjoint``) — disjoint merges commute and
    leave each other's counts exact, so one vocab-sized job + one
    bounded collect buys ~batch_k merges instead of 1.  The schedule
    can differ from classic one-merge-per-round BPE only when a merge
    would have created a pair out-ranking a later same-batch pick; the
    test reference implements the identical batched schedule, and
    ``batch_k=1`` IS classic BPE exactly.  48 merges at sf0.1 measured
    7.3 s single-merge → the batched rounds cut the driver round-trips
    ~6×.

    The DEFAULT is ``batch_k=1`` — classic Sennrich output (ADVICE r11:
    the schedules diverge materially in practice; the characterization
    test shows prefix agreement of just 1 merge on the Sennrich corpus
    at k=8).  Batching is a measured throughput OPT-IN for callers that
    want "a good tokenizer, fast" rather than bit-faithful classic BPE
    (bench.py passes batch_k=8; so did the BPE_SECTION_MERGES artifact,
    whose provenance note records it).

    The word table localCheckpoints every ``checkpoint_every`` merges
    (lineage truncation; previous blocks freed — the graph.py pattern).
    Between checkpoints the pending merges ride as nested narrow
    replace() projections on top of the last checkpoint —
    re-executing them inside the next pair-count job costs microseconds
    on the vocab-sized table, while checkpointing EVERY round was one
    extra materialization job per merge (measured round 10 at 48 merges
    on sf0.1: every-round 15.9 s, every-4 8.6 s, every-8 7.3 s)."""
    batch_k = max(1, int(batch_k))
    words = word_table(docs, text_col).localCheckpoint()
    last_ckpt = words
    pending = 0
    merges: list[tuple[str, str]] = []
    try:
        while len(merges) < num_merges:
            top = (
                _pair_counts(words)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(CAND_FACTOR * batch_k)
                .collect()
            )
            batch = _select_disjoint(
                [(r["a"], r["b"], r["n"]) for r in top],
                batch_k,
                num_merges - len(merges),
                min_pair_count,
            )
            if not batch:
                break
            merges.extend(batch)
            col = F.col("wstr")
            for a, b in batch:
                col = _merge_expr(col, a, b)
            words = words.select(col.alias("wstr"), "cnt")
            pending += len(batch)
            if pending >= max(1, checkpoint_every):
                words = words.localCheckpoint()
                _unpersist_checkpoint(last_ckpt)
                last_ckpt = words
                pending = 0
    finally:
        _unpersist_checkpoint(last_ckpt)
    return merges


def bpe_wrapped_doc_col(
    merges: list[tuple[str, str]] | tuple = (), text_col: str = "text"
) -> Column:
    """The whole encode chain as ONE Column expression: wrap the doc's
    token stream into the ␟-separated symbol string and replay ``merges``
    as nested native replaces.  Callers MUST stage the result as a
    column (one select) before referencing it more than once — Catalyst
    does not CSE a repeated expression tree, and this one holds
    len(merges) string scans.

    Construction (round 11): THREE whole-string regex/replace passes
    instead of a per-character transform() loop — collapse whitespace
    runs to single spaces, wrap every character as ␟c␟ (adjacent chars
    then meet at the double separator by construction), turn each
    inter-word ␟·␟ space cell into the ␟</w>␟ marker, and append the
    final word's marker.  Equivalent to the per-char form (pinned by
    the bpe parity tests) and measured 0.66 s vs 1.03 s for the
    construction alone at sf0.1."""
    base = F.regexp_replace(F.lower(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)), r"\s+", " ")
    # (?s) so '.' also matches line terminators (ADVICE r11): Java's
    # default '.' skips U+2028/U+2029/U+0085, which '\s+' does NOT
    # collapse (in either engine), so without DOTALL those chars stayed
    # UNWRAPPED and corrupted the symbol string — and diverged from the
    # DuckDB twin, whose string_split(w, '') wraps every char.
    chars = F.regexp_replace(base, "(?s)(.)", SEP + "$1" + SEP)
    wdoc = F.when(base == "", F.lit(SEP + SEP)).otherwise(
        F.concat(
            F.replace(chars, F.lit(SEP + " " + SEP), F.lit(SEP + EOW + SEP)),
            F.lit(SEP + EOW + SEP),
        )
    )
    for a, b in merges:
        wdoc = _merge_expr(wdoc, a, b)
    return wdoc


def bpe_count_col(wd: Column) -> Column:
    """BPE token count of a STAGED wrapped-doc column (int; 0 for the
    2-separator-char wrapped empty doc — the ADVICE r10 guard)."""
    return (
        F.when(F.length(wd) <= 2, F.lit(0))
        .otherwise(F.size(F.split(F.substring(wd, F.lit(2), F.length(wd) - 2), SEP + SEP)))
        .cast("int")
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bpe_tokens array<string>, n_bpe bigint): segment every
    document with a learned merge list — a single map-only projection
    (ordered-replay encode; module docstring proves equivalence to the
    greedy rank-based encode).  Merges ride the plan as literals."""
    wdoc = bpe_wrapped_doc_col(merges, text_col)
    toks = F.split(F.expr("substring(wd, 2, length(wd) - 2)"), SEP + SEP)
    out = docs.select(id_col, wdoc.alias("wd")).select(
        id_col,
        F.when(F.length("wd") <= 2, F.expr("CAST(array() AS array<string>)"))
        .otherwise(toks)
        .alias("bpe_tokens"),
    )
    return out.select(
        id_col, "bpe_tokens", F.size("bpe_tokens").cast("bigint").alias("n_bpe")
    )
