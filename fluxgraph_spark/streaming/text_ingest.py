"""Streaming document ingest into a persisted BM25 inverted index.

The text-retrieval member of the streaming-ingest family (dedup_ingest,
ann_ingest, scd2_ingest): document batches arrive as a stream, each
microbatch tokenizes and lands in the index's replay-safe delta area
(sources/text_index.py :class:`~..sources.text_index.DeltaInvertedIndex`),
so queries issued after any drained batch rank over base + everything
streamed so far.  The reference era served text lookups through key
indexes (FluxIndex.java); a continuously-fed postings index is the
corpus-scale form a crawl pipeline needs.

Crash/replay semantics (at-least-once foreachBatch): each microbatch
OVERWRITES its own ``delta_postings/batch_id=N`` subtree and then
commits it by overwriting its one-row ``delta_stats/batch_id=N`` —
the stats row is the commit marker, so a replayed or half-written
batch can never double-count postings OR corpus statistics.  Probes
recompute df from the matched postings, so results are bit-identical
to a full rebuild over base ∪ streamed docs at every point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.text_index import DeltaInvertedIndex


def _reject_reserved_columns(df: DataFrame) -> None:
    """``batch_id`` and ``pbucket`` are the delta layout's partition
    columns; an input schema carrying either would shadow the partition
    discovery column and corrupt replay filtering / probe pruning.
    Fail loudly at the boundary instead."""
    for col in ("batch_id", "pbucket"):
        if col in df.columns:
            raise ValueError(
                f"document schema must not contain a {col!r} column — it "
                "is reserved for the index's partition layout; rename the "
                "input column before streaming it through bm25_streaming_sink"
            )


def bm25_streaming_sink(
    doc_stream: DataFrame,
    index: DeltaInvertedIndex,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    auto_merge_ratio: "float | None" = None,
):
    """Start an available-now ``foreachBatch`` query that appends each
    microbatch of ``doc_stream`` into ``index``'s delta area
    (replay-idempotent per batch id).  Returns the StreamingQuery;
    callers ``awaitTermination()`` and then query ``index.topk`` as
    usual — probes union the base and committed delta scans, both
    pruned to the query terms' buckets.

    ``auto_merge_ratio`` self-folds the delta whenever its committed
    document count exceeds ratio × the base generation's (see
    ``DeltaInvertedIndex.maybe_merge`` / ann_ingest's sink for the
    policy and replay-safety argument); rankings are bit-identical
    across folds since probes recompute df over base ∪ delta either
    way.  None (default) keeps maintenance manual."""
    _reject_reserved_columns(doc_stream)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.append_batch(batch_df, batch_id, id_col, text_col)
        if auto_merge_ratio is not None:
            index.maybe_merge(auto_merge_ratio)

    return (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
