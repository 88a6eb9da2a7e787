"""Structured Streaming surface: change feed + event-stream operators.

Streams are driven from static parquet directories with
``processAllAvailable`` into memory sinks, then compared against the
equivalent batch computation on the same files — the streaming result
must equal batch for append-only sources once every file is processed.
"""

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _run_to_memory(sdf, name, complete=True, mode=None):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode or ("complete" if complete else "append"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # copy the single-parquet events table into a directory source
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(
        os.path.join(SF_DIR, "events.parquet"), os.path.join(d, "part-0.parquet")
    )
    return str(d)


def test_windowed_event_counts_matches_batch(spark, events_dir):
    from fluxgraph_spark.streaming import read_event_stream, windowed_event_counts

    name = f"wec_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, events_dir)
    assert stream.isStreaming
    _run_to_memory(windowed_event_counts(stream, "1 hour"), name)
    got = spark.table(name)

    from fluxgraph_spark.sources.tpch import read_events

    batch = (
        read_events(spark, events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()


def test_sessionize_stream_total_events(spark, events_dir):
    from fluxgraph_spark.streaming import read_event_stream, sessionize_stream

    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_to_memory(sessionize_stream(read_event_stream(spark, events_dir)), name)
    got = spark.table(name)
    total = spark.read.parquet(events_dir).count()
    # every event lands in exactly one session
    assert got.agg(F.sum("n_events")).first()[0] == total
    # session invariant: start <= end, gap-merged
    assert got.where(F.col("session_start") > F.col("session_end")).count() == 0


def test_streaming_dedupe(spark, events_dir, tmp_path):
    from fluxgraph_spark.streaming import read_event_stream, streaming_dedupe

    # duplicate every event into a second file: dedupe must halve it
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    shutil.copy(os.path.join(events_dir, "part-0.parquet"),
                os.path.join(dup_dir, "a.parquet"))
    shutil.copy(os.path.join(events_dir, "part-0.parquet"),
                os.path.join(dup_dir, "b.parquet"))
    name = f"dd_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        streaming_dedupe(read_event_stream(spark, dup_dir)), name, complete=False
    )
    n_unique = spark.read.parquet(events_dir).count()
    assert spark.table(name).count() == n_unique


def test_stateful_running_user_stats(spark, events_dir):
    from fluxgraph_spark.sources.tpch import read_events
    from fluxgraph_spark.streaming import read_event_stream, running_user_stats

    name = f"rs_{uuid.uuid4().hex[:8]}"
    _run_to_memory(
        running_user_stats(read_event_stream(spark, events_dir)),
        name,
        mode="update",
    )
    got = spark.table(name)
    # single micro-batch => one row per user, totals == batch counts
    batch = (
        read_events(spark, events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events_total"),
            F.sum("value").alias("value_total"),
            F.max("value").alias("max_value_seen"),
        )
    )
    assert got.count() == batch.count()
    j = got.join(batch.withColumnRenamed("n_events_total", "n_b"), "user_id")
    assert j.where(F.col("n_events_total") != F.col("n_b")).count() == 0
    assert j.where(F.col("batch_events") != F.col("n_b")).count() == 0


def test_tx_log_changefeed(spark, tmp_path):
    from fluxgraph_spark import TemporalGraph
    from fluxgraph_spark.sources.parquet_io import save_graph_parquet
    from fluxgraph_spark.streaming import element_change_counts, tx_log_stream

    g = TemporalGraph.create(spark)
    a = g.add_vertex()
    b = g.add_vertex()
    a.set_property("name", "x")
    g.add_edge(None, a, b, "knows")
    path = str(tmp_path / "graph")
    save_graph_parquet(g, path)

    name = f"cf_{uuid.uuid4().hex[:8]}"
    log = tx_log_stream(spark, os.path.join(path, "tx_log"))
    assert log.isStreaming
    _run_to_memory(element_change_counts(log, "1 hour"), name)
    got = spark.table(name)
    batch_total = spark.read.parquet(os.path.join(path, "tx_log")).count()
    assert got.agg(F.sum("n_changes")).first()[0] == batch_total
    assert set(r["kind"] for r in got.collect()) <= {"vertex", "edge"}


def test_scd2_streaming_ingest_equals_batch_rebuild(spark, tmp_path):
    """Microbatched SCD2 ingest (foreachBatch + scd2_upsert) converges
    to the same table as a batch rebuild over all events — the
    streaming and batch write paths share one merge implementation."""
    import glob

    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP
    from fluxgraph_spark.sources.tpch import read_events
    from fluxgraph_spark.streaming import read_event_stream, scd2_streaming_sink

    # split the events table into 3 chunk files so availableNow+
    # maxFilesPerTrigger=1 yields multiple microbatches
    src = str(tmp_path / "stream_src")
    ev = read_events(spark, os.path.join(SF_DIR, "events.parquet"))
    ev.withColumn(
        "__c", F.col("event_id") % 3
    ).repartition(3, "__c").drop("__c").write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) >= 2

    target = str(tmp_path / "scd2_table")
    q = scd2_streaming_sink(
        read_event_stream(spark, src, max_files_per_trigger=1),
        target,
        ["user_id"],
        "ts",
        ["event_type", "value"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(target).select(
        "user_id", "valid_from", "event_type", "value",
        "valid_to", "version_idx", "is_current",
    )
    want = TP.scd2_from_change_events(
        ev.select("user_id", "ts", "event_type", "value"), ["user_id"], "ts"
    ).select(
        "user_id", F.col("ts").alias("valid_from"), "event_type", "value",
        "valid_to", "version_idx", "is_current",
    )
    key = lambda t: (t[0], t[1])
    assert sorted(map(tuple, got.collect()), key=key) == \
           sorted(map(tuple, want.collect()), key=key)


def test_scd2_streaming_table_sink_durable_commits(spark, tmp_path):
    """Streaming ingest through the durable Scd2ParquetTable: each
    microbatch is one audited bucket-level commit; the final table
    equals the batch rebuild and the commit log has one row per
    microbatch."""
    import glob

    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP
    from fluxgraph_spark.sources.scd2_table import Scd2ParquetTable
    from fluxgraph_spark.sources.tpch import read_events
    from fluxgraph_spark.streaming import read_event_stream
    from fluxgraph_spark.streaming.scd2_ingest import scd2_streaming_table_sink

    src = str(tmp_path / "stream_src")
    ev = read_events(spark, os.path.join(SF_DIR, "events.parquet"))
    ev.withColumn(
        "__c", F.col("event_id") % 3
    ).repartition(3, "__c").drop("__c").write.parquet(src)
    n_files = len(glob.glob(src + "/part-*.parquet"))
    assert n_files >= 2

    tbl = Scd2ParquetTable(
        spark, str(tmp_path / "tbl"), ["user_id"], n_buckets=8
    )
    q = scd2_streaming_table_sink(
        read_event_stream(spark, src, max_files_per_trigger=1),
        tbl,
        "ts",
        ["event_type", "value"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    cols = [
        "user_id", "valid_from", "event_type", "value",
        "valid_to", "version_idx", "is_current",
    ]
    got = tbl.read().select(*cols)
    want = TP.scd2_from_change_events(
        ev.select("user_id", "ts", "event_type", "value"), ["user_id"], "ts"
    ).select(
        "user_id", F.col("ts").alias("valid_from"), "event_type", "value",
        "valid_to", "version_idx", "is_current",
    )
    key = lambda t: (t[0], t[1])
    assert sorted(map(tuple, got.collect()), key=key) == \
           sorted(map(tuple, want.collect()), key=key)
    # one commit per microbatch; availableNow may coalesce file batches,
    # so pin "incremental" (>= 2 commits) and conservation of changes
    hist = tbl.history()
    assert hist.count() >= 2
    assert hist.agg(F.sum("n_changes")).collect()[0][0] == ev.count()


def test_scd2_streaming_sink_schema_evolution_across_queries(spark, tmp_path):
    """r8: a stream's schema is fixed per query, so additive evolution
    happens across QUERY GENERATIONS — the restarted sink passes
    evolve_schema=True once and committed history widens with typed
    NULLs; without the flag the widened restart refuses (the ingest
    contract), leaving the committed state untouched."""
    from pyspark.sql import functions as F

    from fluxgraph_spark.sources.scd2_table import Scd2ParquetTable
    from fluxgraph_spark.streaming.scd2_ingest import scd2_streaming_table_sink

    src1 = str(tmp_path / "gen1")
    spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b")], "user_id long, ts long, state string"
    ).write.parquet(src1)
    tbl = Scd2ParquetTable(spark, str(tmp_path / "tbl"), ["user_id"],
                           ts_col="ts", n_buckets=4)
    s1 = spark.readStream.schema("user_id long, ts long, state string").parquet(src1)
    scd2_streaming_table_sink(
        s1, tbl, "ts", ["state"], checkpoint_dir=str(tmp_path / "ck1")
    ).awaitTermination(120)
    assert "score" not in tbl.read().columns

    # generation 2: the source gained a column
    src2 = str(tmp_path / "gen2")
    spark.createDataFrame(
        [(1, 20, "a2", 7)], "user_id long, ts long, state string, score long"
    ).write.parquet(src2)
    wide = "user_id long, ts long, state string, score long"

    # refused without the flag — the stream query surfaces the error
    import pytest as _pt
    from pyspark.errors import StreamingQueryException

    s2 = spark.readStream.schema(wide).parquet(src2)
    q = scd2_streaming_table_sink(
        s2, tbl, "ts", ["state", "score"], checkpoint_dir=str(tmp_path / "ck2")
    )
    with _pt.raises(StreamingQueryException, match="evolve_schema"):
        q.awaitTermination(120)
    assert "score" not in tbl.read().columns  # nothing committed

    s3 = spark.readStream.schema(wide).parquet(src2)
    scd2_streaming_table_sink(
        s3, tbl, "ts", ["state", "score"],
        checkpoint_dir=str(tmp_path / "ck3"), evolve_schema=True,
    ).awaitTermination(120)
    got = {(r["user_id"], r["ts"]): r for r in tbl.read().collect()}
    assert got[(1, 20)]["score"] == 7 and got[(1, 20)]["is_current"]
    assert got[(1, 10)]["score"] is None  # widened history
    assert got[(2, 11)]["score"] is None  # untouched-bucket key conformed


def test_interval_stream_join_matches_batch(spark, events_dir):
    from fluxgraph_spark.sources.tpch import read_events
    from fluxgraph_spark.streaming import interval_stream_join, read_event_stream

    def split(df):
        p = df.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", F.col("ts").alias("p_ts")
        )
        c = df.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("click_value")
        )
        return p, c

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    sp, sc = split(read_event_stream(spark, events_dir))
    _run_to_memory(
        interval_stream_join(sp, sc, ["user_id"], "p_ts", "c_ts"),
        name, complete=False,
    )
    got = spark.table(name)

    bp, bc = split(read_events(spark, events_dir))
    batch = bp.join(
        bc,
        (bp.user_id == bc.user_id)
        & (bc.c_ts <= bp.p_ts)
        & (bc.c_ts >= bp.p_ts - F.expr("INTERVAL 30 MINUTES")),
    ).drop(bc.user_id)
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()


def test_dedup_streaming_ingest_matches_sequential_batches(spark, tmp_path):
    """Streaming crawl ingest through the persistent bucketed dedup
    index: two microbatches (mtime-ordered files) produce exactly the
    survivors of the equivalent sequential dedupe_incremental calls,
    and each batch's decisions see the previous batch's survivors."""
    import glob
    import time

    from fluxgraph_spark.functions import dedup
    from fluxgraph_spark.sources import bucketed
    from fluxgraph_spark.sources.tpch import read_tables
    from fluxgraph_spark.streaming.dedup_ingest import (
        dedup_streaming_sink, seed_corpus,
    )

    docs = read_tables(spark, SF_DIR)["documents"]
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch_a = docs.where(F.col("doc_id") % 10 == 0)
    batch_b = docs.where(F.col("doc_id") % 10 == 5)

    # stage the stream: one file per batch, mtimes force A before B
    src = str(tmp_path / "doc_stream")
    os.makedirs(src)
    for name, b, age in (("a", batch_a, 200), ("b", batch_b, 0)):
        d = str(tmp_path / f"stage_{name}")
        b.coalesce(1).write.parquet(d)
        (part,) = glob.glob(d + "/part-*.parquet")
        dst = os.path.join(src, f"{name}.parquet")
        shutil.copy(part, dst)
        t = time.time() - age
        os.utime(dst, (t, t))

    db = "flux_stream_idx"
    bucketed.ensure_database(spark, db, str(tmp_path / "wh"))
    try:
        idx = bucketed.DedupIndex.build(
            corpus, "doc_id", "text", f"{db}.corpus",
            n=3, num_hashes=8, bands=4, n_buckets=4,
        )
        corpus_dir = str(tmp_path / "corpus")
        surv_dir = str(tmp_path / "survivors")
        seed_corpus(corpus, corpus_dir)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = dedup_streaming_sink(
            stream, idx, corpus_dir, surv_dir,
            "doc_id", "text", str(tmp_path / "ckpt"), threshold=0.5,
        )
        q.awaitTermination(180)

        k1 = dedup.dedupe_incremental(
            batch_a, corpus, "doc_id", "text", n=3, num_hashes=8, bands=4,
            threshold=0.5,
        )
        k2 = dedup.dedupe_incremental(
            batch_b, corpus.unionByName(k1), "doc_id", "text",
            n=3, num_hashes=8, bands=4, threshold=0.5,
        )
        want1 = sorted(r["doc_id"] for r in k1.collect())
        want2 = sorted(r["doc_id"] for r in k2.collect())

        surv = spark.read.option("basePath", surv_dir).parquet(surv_dir)
        got1 = sorted(
            r["doc_id"] for r in surv.where(F.col("batch_id") == 0).collect()
        )
        got2 = sorted(
            r["doc_id"] for r in surv.where(F.col("batch_id") == 1).collect()
        )
        assert got1 == want1
        assert got2 == want2
        # cross-batch dependency really fired: batch B lost at least one
        # doc to an A survivor beyond what the seed corpus alone explains
        k2_vs_corpus_only = dedup.dedupe_incremental(
            batch_b, corpus, "doc_id", "text", n=3, num_hashes=8, bands=4,
            threshold=0.5,
        )
        assert len(want2) < k2_vs_corpus_only.count()
        # the corpus dir now replays as seed + both survivor sets
        grown = spark.read.option("basePath", corpus_dir).parquet(corpus_dir)
        assert grown.count() == corpus.count() + len(want1) + len(want2)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_dedup_ingest_rejects_reserved_batch_id_column(spark, tmp_path):
    """A doc schema that already carries batch_id would silently shadow
    the sink's partition/replay bookkeeping column — rejected at the
    boundary (ADVICE r4)."""
    from fluxgraph_spark.streaming.dedup_ingest import seed_corpus

    bad = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit("text").alias("text"),
        F.lit(7).alias("batch_id"),
    )
    with pytest.raises(ValueError, match="batch_id"):
        seed_corpus(bad, str(tmp_path / "corpus"))


def test_changefeed_touch_counts_crash_replay(spark, tmp_path):
    """element_touch_counts (r9): the exact changefeed rollup survives a
    stop/restart — leg 1 drains the first two tx batch files and stops
    (the crash analog), a third file lands while the query is down, and
    leg 2 resumes from the SAME checkpoint processing ONLY the new file;
    the settled complete-mode state still equals the batch rollup over
    every file (state carried across the restart, no reprocessing)."""
    import glob

    from fluxgraph_spark.sources.tpch import read_events
    from fluxgraph_spark.streaming import element_touch_counts, tx_log_stream

    ev = read_events(spark, os.path.join(SF_DIR, "events.parquet"))
    tx = ev.select(
        F.col("event_id").alias("tx_id"),
        F.col("ts").alias("tx_time"),
        F.col("user_id").alias("element_id"),
        F.lit(0).cast("long").alias("prev_tx_id"),
        F.col("event_type").alias("kind"),
    ).persist()
    src = str(tmp_path / "txlog")
    staging = str(tmp_path / "staging")
    tx.where(F.col("tx_id") % 3 < 2).repartition(2).write.parquet(src)
    tx.where(F.col("tx_id") % 3 == 2).coalesce(1).write.parquet(staging)
    ckpt = str(tmp_path / "ckpt")
    name = f"cf_{uuid.uuid4().hex[:8]}"

    def start():
        sdf = element_touch_counts(
            tx_log_stream(spark, src, max_files_per_trigger=1), "1 hour"
        )
        return (
            sdf.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # leg 1: drain the first two files, then "crash"
    q1 = start()
    q1.awaitTermination()
    n_leg1 = spark.table(name).count()
    assert n_leg1 > 0
    # a new tx batch lands while the consumer is down
    new_file = glob.glob(staging + "/part-*.parquet")[0]
    shutil.copy(new_file, os.path.join(src, "part-late.parquet"))
    # leg 2: resume from the checkpoint — only the new file is read,
    # but complete mode re-emits the FULL carried-over state
    q2 = start()
    q2.awaitTermination()
    assert len(q2.recentProgress) >= 1   # the resume actually ran a batch
    got = spark.table(name)

    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.window("tx_time", "1 hour").alias("win"), "kind", "element_id"
        )
        .agg(F.count("*").alias("n_changes"))
    )
    tx.unpersist()
    assert got.count() == batch.count()
    assert got.count() > n_leg1          # leg 2 added the late file's keys
    j = got.join(
        batch.select(
            F.col("win.start").alias("win_start"), "kind", "element_id",
            F.col("n_changes").alias("n_b"),
        ),
        ["win_start", "kind", "element_id"],
    )
    assert j.count() == got.count()
    assert j.where(F.col("n_changes") != F.col("n_b")).count() == 0


def test_registry_changefeed_two_level_equals_complete_drain(spark):
    """The gated query q_st_changefeed re-pointed through the two-level
    append feed (r12) must return EXACTLY what the r9-r11 complete-mode
    drain returned on the same staged tx_log — the oracle is unchanged,
    so this pins that the re-point changed the execution shape, not the
    decision.  (The staged sentinel advances the watermark past every
    real window; its own window never finalizes and its kind is
    filtered, so it reaches no output.)"""
    import __spark_entry__ as em
    from fluxgraph_spark.streaming import element_touch_counts, tx_log_stream

    two_level = sorted(
        map(tuple, em.queries()["st_changefeed"](spark, SF_DIR).collect())
    )
    # the pre-r12 shape: complete-mode drain + batch rollup
    log = tx_log_stream(spark, em._stage_txlog(spark, SF_DIR)).where(
        F.col("kind") != em._TXLOG_SENTINEL_KIND
    )
    res = em._drain_stream(element_touch_counts(log, "1 hour"), "complete")
    complete = sorted(
        map(
            tuple,
            res.groupBy(
                F.unix_micros(F.col("win_start")).alias("win_us"), "kind"
            )
            .agg(
                F.sum("n_changes").cast("long").alias("n_changes"),
                F.count(F.lit(1)).cast("long").alias("n_elements"),
            )
            .collect(),
        )
    )
    assert two_level == complete and len(two_level) > 0


def test_changefeed_two_level_append_feed(spark, tmp_path):
    """The scale shape of the changefeed rollup (r10): level 1 streams
    element_touch_counts in APPEND mode to files — a (window, kind,
    element) key is emitted EXACTLY ONCE when the watermark passes its
    window end, and its state row evicts (complete mode re-emits the
    whole history every trigger — the unbounded piece on an infinite
    feed); level 2 (touch_rollup) batch-merges the feed with an exact
    distinct-elements count.  Leg 1 drains the real tx batch: nothing
    finalizes (the watermark never passes the last window while data
    is still arriving inside it).  A far-future sentinel then advances
    the watermark; leg 2 resumes from the same checkpoint and the feed
    must contain EVERY leg-1 key exactly once with batch-exact counts,
    and the rollup must equal the batch ground truth."""
    from fluxgraph_spark.sources.tpch import read_events
    from fluxgraph_spark.streaming import (
        element_touch_counts,
        element_touch_feed,
        touch_rollup,
        tx_log_stream,
    )

    ev = read_events(spark, os.path.join(SF_DIR, "events.parquet"))
    tx = ev.select(
        F.col("event_id").alias("tx_id"),
        F.col("ts").alias("tx_time"),
        F.col("user_id").alias("element_id"),
        F.lit(0).cast("long").alias("prev_tx_id"),
        F.col("event_type").alias("kind"),
    ).persist()
    src = str(tmp_path / "txlog")
    tx.coalesce(1).write.parquet(src)
    out = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")

    def leg():
        touches = element_touch_counts(
            tx_log_stream(spark, src), "1 hour", watermark="2 hours"
        )
        q = element_touch_feed(touches, out, ckpt)
        q.awaitTermination()

    leg()
    emitted_leg1 = spark.read.parquet(out).count()
    # a sentinel far past every real event advances the watermark
    max_ts = tx.agg(F.max("tx_time")).collect()[0][0]
    spark.createDataFrame(
        [(10**9, max_ts, 0, 0, "sentinel")],
        "tx_id long, tx_time timestamp, element_id long, "
        "prev_tx_id long, kind string",
    ).withColumn(
        "tx_time", F.col("tx_time") + F.expr("INTERVAL 10 DAYS")
    ).coalesce(1).write.mode("append").parquet(src)
    leg()

    got = spark.read.parquet(out)
    truth = (
        tx.groupBy(
            F.window("tx_time", "1 hour").alias("win"), "kind", "element_id"
        )
        .agg(F.count("*").alias("n_changes"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "kind", "element_id", "n_changes",
        )
    )
    n_truth = truth.count()
    # every real key finalized exactly once (the sentinel's own window
    # is still live — watermark never passed it — so it is NOT emitted)
    assert got.count() == n_truth > emitted_leg1
    assert got.groupBy("win_start", "kind", "element_id").count().where(
        F.col("count") > 1
    ).count() == 0
    j = got.join(
        truth.withColumnRenamed("n_changes", "n_b"),
        ["win_start", "win_end", "kind", "element_id"],
    )
    assert j.count() == n_truth
    assert j.where(F.col("n_changes") != F.col("n_b")).count() == 0
    # level 2: the batch merge — exact distinct elements by construction
    roll = {
        (r["win_start"], r["kind"]): (r["n_changes"], r["n_elements"])
        for r in touch_rollup(got).collect()
    }
    batch = {
        (r["win_start"], r["kind"]): (r["n_changes"], r["n_elements"])
        for r in truth.groupBy("win_start", "win_end", "kind").agg(
            F.sum("n_changes").cast("long").alias("n_changes"),
            F.countDistinct("element_id").cast("long").alias("n_elements"),
        ).collect()
    }
    tx.unpersist()
    assert roll == batch
