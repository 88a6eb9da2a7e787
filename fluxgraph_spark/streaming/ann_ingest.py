"""Streaming embedding ingest into a persisted IVF ANN index.

The similarity-search twin of the dedup tier's streaming ingest
(streaming/dedup_ingest.py): embedding batches arrive as a stream, each
microbatch assigns against the index's FROZEN seed centroids and lands
in the index's replay-safe delta area
(sources/ann_index.py :class:`~..sources.ann_index.DeltaIvfIndex`), so
queries issued after any drained batch see seed + everything streamed
so far.  The reference has no streaming surface at all (SURVEY §2.8);
this extends the engine's Structured-Streaming family (events,
changefeed, SCD2 ingest, dedup ingest) to the ANN tier.

Crash/replay semantics (at-least-once foreachBatch): each microbatch
OVERWRITES its own ``delta_lists/batch_id=N`` subtree, so a replayed
batch rewrites its partition instead of double-appending — duplicate
vector rows would otherwise surface directly as duplicate candidates in
top-k results.  Centroids never move (frozen at seed build), so replay
re-derives byte-identical assignments and the final index equals the
sequential no-crash run.  Fold the accumulated delta into the base
partitions offline with ``DeltaIvfIndex.merge_delta()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.ann_index import DeltaIvfIndex, DeltaIvfPqIndex


def _reject_reserved_columns(df: DataFrame) -> None:
    """``batch_id`` and ``centroid_id`` are the delta layout's partition
    columns; an input schema carrying either would shadow the partition
    discovery column and corrupt replay filtering / probe pruning.
    Fail loudly at the boundary instead."""
    for col in ("batch_id", "centroid_id"):
        if col in df.columns:
            raise ValueError(
                f"embedding schema must not contain a {col!r} column — it "
                "is reserved for the index's partition layout; rename the "
                "input column before streaming it through ann_streaming_sink"
            )


def ann_streaming_sink(
    vec_stream: DataFrame,
    index: "DeltaIvfIndex | DeltaIvfPqIndex",
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    auto_merge_ratio: "float | None" = None,
):
    """Start an available-now ``foreachBatch`` query that appends each
    microbatch of ``vec_stream`` into ``index``'s delta area
    (replay-idempotent per batch id).  Works for both the raw-vector
    :class:`DeltaIvfIndex` and the compressed :class:`DeltaIvfPqIndex`
    (frozen codebooks encode each batch).  Returns the StreamingQuery;
    callers ``awaitTermination()`` and then query ``index.topk`` as
    usual — probes union the base and delta scans, both pruned to the
    probed lists.

    ``auto_merge_ratio`` makes a LONG-RUNNING ingest self-maintaining:
    after each appended batch the sink folds the delta into the base
    (``index.maybe_merge``) whenever unfolded delta rows exceed the
    ratio × base rows — probes stay bit-identical across folds, and
    the rewrite cost amortizes logarithmically (the LSM compaction
    policy).  Microbatches are serial inside foreachBatch, so the fold
    never races an append; a crash between the fold's publish and the
    stream checkpoint replays the batch into an orphan subtree the next
    fold's GC sweep reclaims.  None (default) keeps maintenance fully
    manual (``merge_delta`` offline)."""
    _reject_reserved_columns(vec_stream)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.append_batch(batch_df, batch_id, id_col, vec_col)
        if auto_merge_ratio is not None:
            index.maybe_merge(auto_merge_ratio)

    return (
        vec_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
