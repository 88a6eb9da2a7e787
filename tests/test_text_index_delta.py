"""DeltaInvertedIndex: replay-safe streaming BM25 appends, probe-time
df recombination, batch commit markers, and the crash-atomic fold.
Every probe must be BIT-IDENTICAL to retrieval.bm25_topk over the full
base ∪ committed corpus (df/dl/tf and corpus stats are exact, nothing
frozen or approximated).
"""

import os

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.functions import retrieval
from fluxgraph_spark.sources import ann_index as AI
from fluxgraph_spark.sources.text_index import DeltaInvertedIndex, InvertedIndex

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lazy summer days and lazy summer nights"),
    (4, "a dog and a fox walk into a bar"),
    (5, "completely unrelated text about spark joins"),
    (6, "fox fox fox fox"),
    (7, "streams of lazy joins over windows"),
    (8, "the bar serves the dog and the fox"),
    (9, ""),  # empty doc: counts toward n_docs / avgdl, posts nothing
    (10, "quick joins beat lazy scans"),
]

QUERIES = [(1, "fox"), (1, "lazy"), (2, "joins"), (2, "the"), (3, "quick")]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(QUERIES, ["query_id", "term"])


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _expect(spark, docs_df, queries_df, pred=None):
    d = docs_df if pred is None else docs_df.where(pred)
    return _rows(retrieval.bm25_topk(d, queries_df, k=10))


def _mk(spark, docs_df, tmp_path, name="didx", n_buckets=8):
    base = docs_df.where(F.col("doc_id") % 3 != 0)
    d = str(tmp_path / name)
    DeltaInvertedIndex.build(base, d, n_buckets=n_buckets)
    return DeltaInvertedIndex(spark, d), base


def test_append_matches_full_rebuild(spark, docs_df, queries_df, tmp_path):
    """base + two appended batches == ad-hoc BM25 over ALL docs: df is
    recombined across base and delta, stats include every batch."""
    idx, base = _mk(spark, docs_df, tmp_path)
    # before any append: probe == bm25 over the base slice only
    assert _rows(idx.topk(queries_df, k=10)) == _expect(
        spark, docs_df, queries_df, F.col("doc_id") % 3 != 0
    )
    idx.append_batch(docs_df.where(F.col("doc_id") % 3 == 0).where(F.col("doc_id") <= 5), 0)
    idx.append_batch(docs_df.where(F.col("doc_id") % 3 == 0).where(F.col("doc_id") > 5), 1)
    assert _rows(idx.topk(queries_df, k=10)) == _expect(spark, docs_df, queries_df)


def test_replay_same_batch_id_is_idempotent(spark, docs_df, queries_df, tmp_path):
    idx, _ = _mk(spark, docs_df, tmp_path, "didx_replay")
    batch = docs_df.where(F.col("doc_id") % 3 == 0)
    idx.append_batch(batch, 0)
    want = _rows(idx.topk(queries_df, k=10))
    idx.append_batch(batch, 0)  # at-least-once replay rewrites, not doubles
    assert _rows(idx.topk(queries_df, k=10)) == want
    assert _rows(idx.topk(queries_df, k=10)) == _expect(spark, docs_df, queries_df)


def test_stats_row_is_the_commit_marker(spark, docs_df, queries_df, tmp_path, monkeypatch):
    """A crash AFTER the postings write but BEFORE the stats write
    leaves the batch INVISIBLE (probes unchanged); the replay commits
    it."""
    idx, _ = _mk(spark, docs_df, tmp_path, "didx_crash")
    before = _rows(idx.topk(queries_df, k=10))
    batch = docs_df.where(F.col("doc_id") % 3 == 0)

    real_agg = type(batch).agg

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before stats commit")

    # the stats write is the only .agg() in append_batch
    monkeypatch.setattr(type(batch), "agg", boom)
    with pytest.raises(RuntimeError, match="injected"):
        idx.append_batch(batch, 0)
    monkeypatch.setattr(type(batch), "agg", real_agg)

    # postings subtree exists, but no stats row -> not committed
    assert os.path.isdir(os.path.join(idx.delta_dir, "batch_id=0"))
    assert idx._committed()[0] == []
    assert _rows(idx.topk(queries_df, k=10)) == before

    idx.append_batch(batch, 0)  # replay commits
    assert _rows(idx.topk(queries_df, k=10)) == _expect(spark, docs_df, queries_df)


def test_empty_document_batch_counts_toward_stats(spark, queries_df, tmp_path):
    """A committed batch of only EMPTY documents posts nothing but
    still depresses avgdl (n_docs grows) — exactly as the full rebuild
    sees it."""
    docs = spark.createDataFrame(
        [(1, "fox and dog"), (2, "fox fox"), (3, ""), (4, "")],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "didx_empty")
    DeltaInvertedIndex.build(docs.where(F.col("doc_id") <= 2), d, n_buckets=4)
    idx = DeltaInvertedIndex(spark, d)
    idx.append_batch(docs.where(F.col("doc_id") >= 3), 0)
    q = spark.createDataFrame([(1, "fox")], ["query_id", "term"])
    assert _rows(idx.topk(q, k=10)) == _rows(retrieval.bm25_topk(docs, q, k=10))
    assert idx._committed() == ([0], 2, 0)


def test_merge_delta_folds_and_is_crash_atomic(
    spark, docs_df, queries_df, tmp_path, monkeypatch
):
    idx, _ = _mk(spark, docs_df, tmp_path, "didx_merge")
    idx.append_batch(docs_df.where(F.col("doc_id") % 3 == 0), 0)
    want = _expect(spark, docs_df, queries_df)
    assert _rows(idx.topk(queries_df, k=10)) == want
    d = idx.index_dir

    # crash 1: after staging, BEFORE the manifest publish
    def boom(*a, **k):
        raise RuntimeError("injected crash before publish")

    monkeypatch.setattr(AI, "_publish_index_manifest", boom)
    with pytest.raises(RuntimeError, match="injected"):
        idx.merge_delta()
    monkeypatch.undo()
    assert _rows(idx.topk(queries_df, k=10)) == want  # base+delta still live

    # crash 2: after the publish, BEFORE garbage collection
    monkeypatch.setattr(
        DeltaInvertedIndex,
        "_sweep_folded",
        lambda self: (_ for _ in ()).throw(RuntimeError("injected crash after publish")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        idx.merge_delta()
    monkeypatch.undo()
    # folded base is live; leftover delta subtrees are invisible
    assert os.path.isdir(os.path.join(d, "delta_postings"))
    assert _rows(idx.topk(queries_df, k=10)) == want
    assert idx._committed()[0] == []

    # a replayed sink rewrite of the folded batch stays invisible
    idx.append_batch(docs_df.where(F.col("doc_id") % 3 == 0), 0)
    assert _rows(idx.topk(queries_df, k=10)) == want
    # retry converges and reclaims the orphans
    idx.merge_delta()
    assert not os.path.isdir(os.path.join(d, "delta_postings"))
    assert not os.path.isdir(os.path.join(d, "delta_stats"))
    assert _rows(idx.topk(queries_df, k=10)) == want

    # the folded base is a valid SNAPSHOT index too: stored df/meta
    # resolve through the manifest (stats merged, postings repointed)
    snap = InvertedIndex(spark, d)
    assert snap.n_docs == len(DOCS)
    assert _rows(snap.topk(queries_df, k=10)) == want


def test_append_rejects_max_df_base(spark, docs_df, tmp_path):
    d = str(tmp_path / "didx_maxdf")
    DeltaInvertedIndex.build(docs_df, d, n_buckets=4, max_df=2)
    idx = DeltaInvertedIndex(spark, d)
    with pytest.raises(ValueError, match="max_df"):
        idx.append_batch(docs_df.limit(1), 0)


def test_merge_with_nothing_unfolded_is_a_noop_sweep(spark, docs_df, queries_df, tmp_path):
    idx, _ = _mk(spark, docs_df, tmp_path, "didx_noop")
    idx.merge_delta()  # no delta at all
    assert _rows(idx.topk(queries_df, k=10)) == _expect(
        spark, docs_df, queries_df, F.col("doc_id") % 3 != 0
    )


def test_streaming_sink_end_to_end(spark, docs_df, queries_df, tmp_path):
    """availableNow stream of two files -> sink -> probe == full
    rebuild; reserved columns rejected at the boundary."""
    import glob
    import shutil

    from fluxgraph_spark.streaming.text_ingest import bm25_streaming_sink

    base = docs_df.where(F.col("doc_id") % 3 != 0)
    rest = docs_df.where(F.col("doc_id") % 3 == 0)
    d = str(tmp_path / "didx_stream")
    DeltaInvertedIndex.build(base, d, n_buckets=4)
    idx = DeltaInvertedIndex(spark, d)

    src = str(tmp_path / "src")
    os.makedirs(src)
    for name, pred in (("a", F.col("doc_id") <= 5), ("b", F.col("doc_id") > 5)):
        stage = str(tmp_path / f"stage_{name}")
        rest.where(pred).coalesce(1).write.parquet(stage)
        (part,) = glob.glob(stage + "/part-*.parquet")
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    bm25_streaming_sink(stream, idx, str(tmp_path / "ckpt")).awaitTermination()
    assert _rows(idx.topk(queries_df, k=10)) == _expect(spark, docs_df, queries_df)

    bad = rest.withColumn("pbucket", F.lit(1))
    with pytest.raises(ValueError, match="pbucket"):
        bm25_streaming_sink(bad, idx, str(tmp_path / "ckpt2"))


def test_auto_merge_ratio_self_folds(spark, docs_df, queries_df, tmp_path):
    """VERDICT r6 item 9: sustained ingest with auto_merge_ratio crosses
    the size threshold mid-stream, folds at least once WITHOUT stopping
    the stream, and probes stay bit-identical to the manual (no-fold)
    run and to the full rebuild."""
    import glob
    import shutil

    from fluxgraph_spark.streaming.text_ingest import bm25_streaming_sink

    base = docs_df.where(F.col("doc_id") % 3 != 0)
    rest = docs_df.where(F.col("doc_id") % 3 == 0)
    d = str(tmp_path / "didx_auto")
    DeltaInvertedIndex.build(base, d, n_buckets=4)
    idx = DeltaInvertedIndex(spark, d)

    src = str(tmp_path / "src_auto")
    os.makedirs(src)
    for name, pred in (("a", F.col("doc_id") <= 5), ("b", F.col("doc_id") > 5)):
        stage = str(tmp_path / f"stage_auto_{name}")
        rest.where(pred).coalesce(1).write.parquet(stage)
        (part,) = glob.glob(stage + "/part-*.parquet")
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # ratio tiny vs the 7-doc base: every 1-2 doc batch crosses it
    bm25_streaming_sink(
        stream, idx, str(tmp_path / "ckpt_auto"), auto_merge_ratio=0.01
    ).awaitTermination()
    m = idx._manifest()
    assert m is not None and m["version"] >= 1       # folded at least once
    assert len(m["folded_batches"]) >= 1
    # probe identical to the full rebuild (and hence to the manual run)
    assert _rows(idx.topk(queries_df, k=10)) == _expect(spark, docs_df, queries_df)
    # a ratio the delta never crosses: no fold happens
    d2 = str(tmp_path / "didx_noauto")
    DeltaInvertedIndex.build(base, d2, n_buckets=4)
    idx2 = DeltaInvertedIndex(spark, d2)
    idx2.append_batch(rest, 0)
    assert idx2.maybe_merge(ratio=1000.0) is False
    assert (idx2._manifest() or {"version": 0})["version"] == 0
    assert idx2.maybe_merge(ratio=0.01) is True      # now it binds
    assert _rows(idx2.topk(queries_df, k=10)) == _expect(spark, docs_df, queries_df)
    with pytest.raises(ValueError, match="ratio"):
        idx2.maybe_merge(ratio=0)
