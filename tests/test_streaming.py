"""Structured Streaming: replay the events table as time-ordered
micro-batches and check the streaming results against their batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emulating_hadoop_with_mpi_spark.operators.events import q50_time_buckets
from emulating_hadoop_with_mpi_spark.sources.tables import load_table
from emulating_hadoop_with_mpi_spark.streaming import (
    dedup_stream,
    events_stream,
    run_to_memory,
    running_user_totals,
    sessionized,
    split_events_for_replay,
    windowed_counts,
)


@pytest.fixture(scope="module")
def replay_dir(sf_dir, tmp_path_factory):
    return split_events_for_replay(sf_dir, str(tmp_path_factory.mktemp("events_replay")))


def test_windowed_counts_match_batch(spark, sf_dir, replay_dir):
    """Append-mode windowed aggregate over the full replay == batch q50 for
    every CLOSED window.  The final window(s) never emit: append mode
    requires the watermark to pass the window end, and the watermark can't
    advance past end-of-input — correct streaming semantics, not a bug."""
    stream = events_stream(spark, replay_dir)
    out = run_to_memory(windowed_counts(stream), "wc_out").collect()
    got = {(r.bucket_start, r.event_type): r.n_events for r in out}
    expect = {
        (r.bucket_start, r.event_type): r.n_events
        for r in q50_time_buckets(spark, sf_dir).collect()
    }
    for k, v in got.items():
        assert expect[k] == v
    missing = set(expect) - set(got)
    last_bucket = max(b for b, _ in expect)
    assert all(b == last_bucket for b, _ in missing), f"non-final windows missing: {missing}"


def test_sessionized_matches_batch_gaps_and_islands(spark, sf_dir, replay_dir):
    """session_window streaming results == the batch gaps-and-islands
    sessionization (q51) on (user, session_start, n_events)."""
    from emulating_hadoop_with_mpi_spark.operators.events import q51_sessionize

    stream = events_stream(spark, replay_dir)
    out = run_to_memory(sessionized(stream), "sess_out").collect()
    got = {(r.user_id, r.session_start): r.n_events for r in out}
    expect = {
        (r.user_id, r.session_start): r.n_events
        for r in q51_sessionize(spark, sf_dir).collect()
    }
    for k, v in got.items():
        assert expect[k] == v
    # sessions still open at end-of-input never emit (append semantics);
    # they must all sit inside the final watermark horizon (2h + gap 30m)
    missing = set(expect) - set(got)
    max_start = max(s for (_, s) in expect)
    horizon = max_start - (2 * 3600 + 30 * 60 + 6 * 3600)  # watermark + gap + slack
    assert all(s >= horizon for (_, s) in missing), f"old sessions missing: {missing}"
    assert len(got) >= 0.9 * len(expect)


def test_dedup_stream_drops_replayed_duplicates(spark, sf_dir, replay_dir, tmp_path):
    """Feed the same batch twice: dropDuplicatesWithinWatermark keeps one
    copy of each event_id (state within the watermark horizon)."""
    import shutil
    import glob
    import time

    dup_dir = tmp_path / "dup_replay"
    dup_dir.mkdir()
    first = sorted(glob.glob(f"{replay_dir}/batch_0.parquet"))[0]
    shutil.copy(first, dup_dir / "a.parquet")
    time.sleep(1.1)
    shutil.copy(first, dup_dir / "b.parquet")
    stream = events_stream(spark, str(dup_dir))
    out = run_to_memory(dedup_stream(stream), "dedup_out").collect()
    ids = [r.event_id for r in out]
    assert len(ids) == len(set(ids))
    base = spark.read.parquet(first).count()
    assert len(ids) == base


def test_late_data_dropped_by_watermark(spark, sf_dir, tmp_path):
    """Watermark semantics under out-of-order replay (observed Spark 4.1
    behavior, pinned here): a late row targeting a window that was ALREADY
    finalized is dropped (numRowsDroppedByWatermark > 0), and append mode
    never emits the same window twice.  (A late row whose old window was
    never seen before is aggregated and finalized immediately — Spark does
    not drop first-sight old windows.)"""
    import time as _t

    import duckdb

    late_dir = tmp_path / "late_replay"
    late_dir.mkdir()
    con = duckdb.connect()
    base = (
        "SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value, props "
        f"FROM '{sf_dir}/events.parquet'"
    )
    # batch 0: the LAST day; batch 1: first 12h (late, first sight);
    # batch 2: another slice of the SAME early windows (late, re-delivery)
    con.sql(
        f"""COPY ({base} WHERE ts >= (SELECT max(ts) - INTERVAL 1 DAY
                                      FROM '{sf_dir}/events.parquet'))
            TO '{late_dir}/a.parquet' (FORMAT PARQUET)"""
    )
    _t.sleep(1.1)
    con.sql(
        f"""COPY ({base} WHERE ts < (SELECT min(ts) + INTERVAL 12 HOUR
                                     FROM '{sf_dir}/events.parquet'))
            TO '{late_dir}/b.parquet' (FORMAT PARQUET)"""
    )
    _t.sleep(1.1)
    con.sql(
        f"""COPY ({base} WHERE ts >= (SELECT min(ts) + INTERVAL 2 HOUR
                                      FROM '{sf_dir}/events.parquet')
                       AND ts < (SELECT min(ts) + INTERVAL 10 HOUR
                                 FROM '{sf_dir}/events.parquet'))
            TO '{late_dir}/c.parquet' (FORMAT PARQUET)"""
    )
    stream = events_stream(spark, str(late_dir))
    q = (
        windowed_counts(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped > 0, "re-delivered late rows must be dropped by the watermark"
    out = spark.sql("SELECT * FROM late_out").collect()
    keys = [(r.bucket_start, r.event_type) for r in out]
    assert len(keys) == len(set(keys)), "append mode must finalize each window exactly once"


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, replay_dir):
    """Stream-stream self-join (purchases × clicks within 1h, watermarked)
    over the ordered replay == the batch inner join with the same interval
    predicate."""
    from emulating_hadoop_with_mpi_spark.streaming.events import purchase_click_join

    stream = events_stream(spark, replay_dir)
    got = {
        (r.purchase_id, r.click_id)
        for r in run_to_memory(purchase_click_join(stream), "ssj_out").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    expect = {
        (r.purchase_id, r.click_id)
        for r in purchases.join(
            clicks,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert expect, "replay should contain purchase-after-click pairs"
    assert got == expect


def test_foreach_batch_exactly_once_sink(spark, sf_dir, replay_dir, tmp_path):
    """foreachBatch as the exactly-once sink pattern: each micro-batch is
    written idempotently (overwrite by batch id); the union of batch
    outputs equals the batch-mode aggregate of the whole table."""
    out = str(tmp_path / "fb_out")

    def write_batch(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            f"{out}/batch={batch_id}"
        )

    stream = events_stream(spark, replay_dir)
    q = (
        stream.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import glob

    last = max(glob.glob(f"{out}/batch=*"), key=lambda p: int(p.rsplit("=", 1)[1]))
    got = {r.event_type: r.n for r in spark.read.parquet(last).collect()}
    expect = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_running_user_totals_stateful(spark, sf_dir, replay_dir):
    """applyInPandasWithState: final per-user running totals equal the
    batch aggregate (update mode — last emit per user wins)."""
    stream = events_stream(spark, replay_dir)
    out = run_to_memory(running_user_totals(stream), "state_out", output_mode="update").collect()
    # keep the final (max n_events) emit per user across micro-batches
    final = {}
    for r in out:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert {u: v[0] for u, v in final.items()} == {u: v[0] for u, v in batch.items()}
    for u in batch:
        assert abs(final[u][1] - batch[u][1]) < 1e-6


def test_incremental_minhash_equals_batch(spark, sf_dir, tmp_path):
    """foreachBatch incremental dedup (streaming/dedup.py): after replaying
    the documents table in 4 micro-batches, the accumulated signature
    store equals the batch MinHash signatures, and the union of per-batch
    candidate emissions equals the batch LSH candidate set (VERDICT r2
    item 5)."""
    from emulating_hadoop_with_mpi_spark.functions.dedup import (
        lsh_candidates,
        minhash_signatures,
        shingles_df,
    )
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table
    from emulating_hadoop_with_mpi_spark.streaming.dedup import (
        run_incremental_dedup,
        split_documents_for_replay,
    )

    replay = split_documents_for_replay(sf_dir, str(tmp_path / "docs_replay"))
    inc = run_incremental_dedup(spark, replay, str(tmp_path / "state"))

    docs = load_table(spark, sf_dir, "documents")
    batch_sigs = minhash_signatures(shingles_df(docs))
    inc_sigs = inc.signatures(spark)

    sig_cols = batch_sigs.columns
    batch_rows = sorted(tuple(r) for r in batch_sigs.collect())
    inc_rows = sorted(tuple(r) for r in inc_sigs.select(*sig_cols).collect())
    assert inc_rows == batch_rows, "incremental signatures != batch signatures"

    batch_cands = sorted(
        (r.doc_a, r.doc_b) for r in lsh_candidates(batch_sigs).collect()
    )
    inc_cands = sorted((r.doc_a, r.doc_b) for r in inc.candidates(spark).collect())
    assert inc_cands == batch_cands, "incremental candidate union != batch candidates"


def test_incremental_minhash_first_appearance_wins(spark, tmp_path):
    """ADVICE r3 (streaming/dedup.py): a doc_id that reappears in a later
    micro-batch with DIFFERENT text must be a no-op — signatures, band
    buckets, and candidates all keep the first-appearance text, mutually
    consistent."""
    from emulating_hadoop_with_mpi_spark.functions.dedup import (
        lsh_candidates,
        minhash_signatures,
        shingles_df,
    )
    from emulating_hadoop_with_mpi_spark.streaming.dedup import run_incremental_dedup

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_mut = "completely different replacement payload with no shared trigrams here"
    text_a_near = "the quick brown fox jumps over the lazy dog again and again today"
    replay = tmp_path / "replay"
    replay.mkdir()
    b0 = spark.createDataFrame(
        [(1, text_a, "en", "s", 10), (2, "unrelated filler words apple pear plum", "en", "s", 10)],
        schema,
    )
    b1 = spark.createDataFrame(
        [(1, text_mut, "en", "s", 10), (3, text_a_near, "en", "s", 10)], schema
    )
    b0.coalesce(1).write.parquet(str(replay / "b0"))
    b1.coalesce(1).write.parquet(str(replay / "b1"))
    # flatten to ordered files so the file stream replays b0 before b1
    import glob as _glob
    import os as _os
    import shutil as _shutil

    for i, d in enumerate(("b0", "b1")):
        src = _glob.glob(str(replay / d / "*.parquet"))[0]
        dst = str(replay / f"part-{i:03d}.parquet")
        _shutil.move(src, dst)
        _os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
        _shutil.rmtree(str(replay / d))

    inc = run_incremental_dedup(spark, str(replay), str(tmp_path / "state"))

    # expected corpus under first-appearance semantics: doc1 keeps text_a
    expected_docs = spark.createDataFrame(
        [(1, text_a), (2, "unrelated filler words apple pear plum"), (3, text_a_near)],
        "doc_id long, text string",
    )
    exp_sigs = minhash_signatures(shingles_df(expected_docs))
    got_sigs = inc.signatures(spark)
    assert sorted(map(tuple, got_sigs.select(*exp_sigs.columns).collect())) == sorted(
        map(tuple, exp_sigs.collect())
    )
    # (1,3) is a near-dup under text_a but NOT under the mutated text —
    # its presence proves first-appearance text drives the buckets
    cands = sorted((r.doc_a, r.doc_b) for r in inc.candidates(spark).collect())
    exp_cands = sorted(
        (r.doc_a, r.doc_b) for r in lsh_candidates(exp_sigs).collect()
    )
    assert cands == exp_cands
    assert (1, 3) in cands


def test_stateless_curation_ops_compose_with_streams(spark, sf_dir, tmp_path):
    """The curation projections (PII redaction, quality/repetition
    scoring) are stateless map-only plans, so they lift onto Structured
    Streaming unchanged: a parquet file stream through redact_pii +
    quality_scores yields exactly the batch result."""
    import shutil

    from emulating_hadoop_with_mpi_spark.functions.pipeline import redact_pii
    from emulating_hadoop_with_mpi_spark.functions.text import quality_scores
    from emulating_hadoop_with_mpi_spark.sources.tables import load_table
    from emulating_hadoop_with_mpi_spark.streaming.events import run_to_memory

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    docs.limit(50).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    batch_docs = spark.read.schema("doc_id long, text string").parquet(src)

    got_redact = {
        r.doc_id: r.text
        for r in run_to_memory(redact_pii(stream), "pii_stream_out").collect()
    }
    want_redact = {r.doc_id: r.text for r in redact_pii(batch_docs).collect()}
    assert got_redact == want_redact

    got_q = sorted(
        map(tuple, run_to_memory(quality_scores(stream), "q_stream_out").collect())
    )
    want_q = sorted(map(tuple, quality_scores(batch_docs).collect()))
    assert got_q == want_q


def test_incremental_dedup_matches_duckdb_oracle(spark, sf_dir, tmp_path):
    """Cross-engine check of the REPLAYED foreachBatch MinHash pipeline
    (VERDICT r12 item 6) — the q90/q91 treatment, emission rule encoded
    in SQL.  After replaying the documents table in 4 doc_id-ordered
    micro-batches through streaming/dedup.IncrementalMinHash:

    - the exact-Jaccard-verified union of per-batch candidate emissions
      must equal DuckDB's exact-pairs SQL over the same parquet (the q73
      oracle argument: verification makes the result independent of the
      hash family, modulo LSH recall — equality pinned, not assumed);
    - each pair's EMISSION BATCH must be max(batch(a), batch(b)) under
      the doc_id-range replay split — the "pairs between two old
      documents were already emitted" rule, re-derived in SQL via a
      ROW_NUMBER range assignment.  This pins the incremental upsert's
      new⋈all dataflow itself, not just its final candidate set."""
    import duckdb

    from emulating_hadoop_with_mpi_spark.functions.dedup import (
        _EXACT_JACCARD_ORACLE,
        JACCARD_THRESHOLD_NUM,
        shingles_df,
    )
    from emulating_hadoop_with_mpi_spark.streaming.dedup import (
        run_incremental_dedup,
        split_documents_for_replay,
    )

    n_files = 4
    replay = split_documents_for_replay(
        sf_dir, str(tmp_path / "docs_replay"), n_files=n_files
    )
    inc = run_incremental_dedup(spark, replay, str(tmp_path / "state"))

    # Spark side: verify the accumulated incremental candidates with the
    # exact Jaccard over shingle sets (candidate-bounded joins).
    docs = load_table(spark, sf_dir, "documents")
    sets_df = (
        shingles_df(docs)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("s"))
    )
    cands = (
        spark.read.parquet(inc.cand_dir)
        .select("doc_a", "doc_b", "batch_id")
        .distinct()
    )
    ver = (
        cands.join(sets_df.selectExpr("doc_id AS doc_a", "s AS sa"), "doc_a")
        .join(sets_df.selectExpr("doc_id AS doc_b", "s AS sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "batch_id",
            F.size(F.array_intersect("sa", "sb")).alias("n_common"),
            F.size("sa").alias("n_a"),
            F.size("sb").alias("n_b"),
        )
        .filter(
            JACCARD_THRESHOLD_NUM * F.col("n_common")
            >= F.col("n_a") + F.col("n_b")
        )
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.batch_id, r.n_common, r.n_a, r.n_b)
        for r in ver.collect()
    )

    # DuckDB side: exact pairs + the emission rule from a ROW_NUMBER
    # range split (the same ORDER BY doc_id LIMIT/OFFSET carve
    # split_documents_for_replay wrote).
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    total = con.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    per = (total + n_files - 1) // n_files
    exp = con.sql(
        f"""
        WITH verified AS ({_EXACT_JACCARD_ORACLE}),
        batches AS (
            SELECT doc_id,
                   CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // {per}
                        AS BIGINT) AS batch
            FROM documents
        )
        SELECT v.doc_a, v.doc_b,
               GREATEST(ba.batch, bb.batch) AS batch_id,
               v.n_common, v.n_a, v.n_b
        FROM verified v
        JOIN batches ba ON v.doc_a = ba.doc_id
        JOIN batches bb ON v.doc_b = bb.doc_id
        ORDER BY v.doc_a, v.doc_b
        """
    ).fetchall()
    want = [tuple(r) for r in exp]
    assert got == want, (
        f"incremental verified pairs+emission batches != oracle "
        f"({len(got)} vs {len(want)} rows)"
    )
    assert len(got) > 0, "vacuous check: no verified near-dup pairs at this SF"
