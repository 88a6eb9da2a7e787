"""Streaming corpus ingest through the persistent dedup index.

The steady-state shape of a growing training corpus: crawl batches
arrive as a document stream, each microbatch dedupes against EVERYTHING
ingested so far (exact + verified-near tiers), survivors are appended
to the corpus and their fingerprints to the bucketed index
(sources/bucketed.py ``DedupIndex``) — so the next batch's decisions see
them, and per-batch cost stays O(batch x collisions) no matter how
large the corpus grows.  The reference has no streaming surface at all
(SURVEY §2.8); this extends the engine's Structured-Streaming family
(events, changefeed, SCD2 ingest) to the pipeline's dedup tier.

Crash/replay semantics (at-least-once foreachBatch): survivors and
corpus documents land in ``batch_id=N`` subdirectories written with
overwrite, so a replayed microbatch rewrites its own partition instead
of double-appending; the replay DECIDES identically because (a) the
per-batch corpus read filters to ``batch_id < N`` (the crashed attempt
may already have written its own partition) and (b) the index probes
exclude same-id rows (the crashed attempt may already have appended the
batch's fingerprints — without the exclusion every replayed doc would
self-match and vanish).  The index append itself is NOT deduplicated on
replay — deliberately: with same-id rows excluded from probes,
duplicate fingerprints cannot change any later decision (candidate
pairs are de-duplicated before the verify), they only add index bytes,
and a bytes-exact repair is one ``DedupIndex.build`` from the corpus
directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.bucketed import DedupIndex


def seed_corpus(docs: DataFrame, corpus_dir: str) -> None:
    """Write the initial corpus (the documents the index was built from)
    under ``corpus_dir`` in the same ``batch_id=N`` partition layout the
    streaming sink appends to (seed takes ``batch_id=-1``, below any
    stream batch id)."""
    _reject_batch_id_column(docs)
    docs.write.mode("overwrite").parquet(os.path.join(corpus_dir, "batch_id=-1"))


def _reject_batch_id_column(df: DataFrame) -> None:
    """``batch_id`` is this sink's partition/replay bookkeeping column; a
    document schema that already carries one would silently shadow it —
    the per-batch ``batch_id < N`` corpus filter and the
    ``select(batch_df.columns)`` projection would bind to the DATA column
    and corrupt replay filtering.  Fail loudly at the boundary instead."""
    if "batch_id" in df.columns:
        raise ValueError(
            "document schema must not contain a 'batch_id' column — it is "
            "reserved for the ingest sink's partition layout; rename the "
            "input column before streaming it through dedup_streaming_sink"
        )


def dedup_streaming_sink(
    doc_stream: DataFrame,
    index: DedupIndex,
    corpus_dir: str,
    survivors_dir: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
):
    """Start an available-now ``foreachBatch`` query that dedupes each
    microbatch of ``doc_stream`` against ``corpus_dir`` + the index,
    appends survivors to both, and records them under ``survivors_dir``.

    ``corpus_dir`` must be seeded via :func:`seed_corpus` with the
    initial corpus the index was built from; the per-batch read
    partition-discovers every ``batch_id=N`` directory (seed + all
    earlier survivors).

    Returns the StreamingQuery; callers ``awaitTermination()``.
    """
    _reject_batch_id_column(doc_stream)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # replay safety: a crashed batch N may have already written its
        # own corpus/batch_id=N partition — a replay must dedupe against
        # strictly EARLIER state, or its docs self-match and vanish.
        # (The index probes exclude same-id rows for the same reason —
        # sources/bucketed.py dedupe_batch.)
        corpus = (
            spark.read.option("basePath", corpus_dir)
            .parquet(corpus_dir)
            .where(F.col("batch_id") < batch_id)
            .select(batch_df.columns)
        )
        kept = index.dedupe_batch(
            batch_df, corpus, id_col, text_col, threshold=threshold
        )
        # pin the decision set BEFORE the index/corpus mutate beneath it
        kept = kept.localCheckpoint(eager=True)
        kept.write.mode("overwrite").parquet(
            os.path.join(survivors_dir, f"batch_id={batch_id}")
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch_id={batch_id}")
        )
        index.append(kept, id_col, text_col)

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
