"""Streaming SCD2 ingest: a change-event stream continuously merged
into a versioned (SCD2) table — the Structured-Streaming twin of the
reference's per-mutation write path (FluxGraph.java:325-340 commits one
transaction per mutation; here each microbatch is one atomic merge).

Built on ``foreachBatch`` + :func:`..operators.temporal.scd2_upsert`, so
the streaming path and the batch path share ONE merge implementation and
one invariant: at any point, the table equals a batch rebuild from every
event ingested so far (test-pinned).

Scale notes (100 TB): the per-batch work is two shuffles (anti-join
passthrough + per-affected-key window rebuild) regardless of batch size.
The parquet overwrite-and-swap below is the format-agnostic commit this
container supports; on a lakehouse table format (Delta/Iceberg) the same
``foreachBatch`` body becomes a MERGE INTO and the swap disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.temporal import scd2_from_change_events, scd2_upsert
from ..sources import fsutil


def scd2_streaming_sink(
    stream: DataFrame,
    target_dir: str,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    checkpoint_dir: str,
):
    """Start a ``foreachBatch`` query that maintains an SCD2 table at
    ``target_dir`` from an append-only change-event stream.

    Returns the StreamingQuery (caller stops it / processAllAvailable).
    """
    meta = {"valid_to", "version_idx", "is_current"}

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        changes = batch_df.select(
            *key_cols, F.col(ts_col).alias("valid_from"), *value_cols
        )
        staging = target_dir + ".staging"
        if fsutil.is_dir(spark, target_dir):
            current = spark.read.parquet(target_dir)
            merged = scd2_upsert(current, changes, key_cols, "valid_from")
        else:
            merged = scd2_from_change_events(changes, key_cols, "valid_from")
            merged = merged.select(
                *key_cols, "valid_from", *value_cols, *sorted(meta)
            )
        # materialize into staging (reads the old table), then swap —
        # the poor-man's atomic commit; MERGE INTO on Delta/Iceberg
        # replaces this dance
        merged.write.mode("overwrite").parquet(staging)
        if fsutil.is_dir(spark, target_dir):
            fsutil.delete(spark, target_dir)
        fsutil.rename(spark, staging, target_dir)

    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def scd2_streaming_table_sink(
    stream: DataFrame,
    table,
    ts_col: str,
    value_cols: list[str],
    checkpoint_dir: str,
    evolve_schema: bool = False,
):
    """Streaming ingest into a durable :class:`..sources.scd2_table.
    Scd2ParquetTable`: each microbatch becomes one audited bucket-level
    copy-on-write commit (write-audit-publish), so the streaming path
    rewrites only the buckets the batch touches instead of swapping the
    whole table — the scale-correct replacement for
    :func:`scd2_streaming_sink`'s full-table overwrite.  The streaming
    epoch id is recorded in the table manifest and replayed microbatches
    (restart after a commit but before the streaming checkpoint) are
    SKIPPED, so history is exactly-once-visible rather than
    at-least-once.  The skip high-water mark is keyed by the CHECKPOINT
    DIRECTORY (the query's durable identity, Delta's (appId, version)
    txn pattern): a brand-new query with a fresh checkpoint — whose
    epoch ids restart at 0 — gets its own counter instead of having
    every batch silently swallowed by a previous query's mark.

    ``evolve_schema``: passed through to :meth:`ingest` — a stream's
    schema is fixed for a query's lifetime, so additive evolution
    happens across QUERY GENERATIONS (stop, restart reading the widened
    source with the new column in ``value_cols``); the restarted query
    passes ``evolve_schema=True`` once and committed history widens
    with typed NULLs.  Default False keeps the refuse-by-default
    contract (a misconfigured new column is data the writer didn't mean
    to commit).
    """

    def _ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.ingest(
            batch_df.select(
                *table.key_cols,
                F.col(ts_col).alias(table.ts_col),
                *value_cols,
            ),
            batch_id=batch_id,
            writer_id=checkpoint_dir,
            evolve_schema=evolve_schema,
        )

    return (
        stream.writeStream.foreachBatch(_ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
