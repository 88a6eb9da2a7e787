"""tx_log as a change-data feed.

The reference's transaction log is an append-only sequence of
(tx, element, prev-tx) facts maintained by the ``:add-transaction-info``
db function (reference FluxGraph.java:443-476).  A parquet directory of
tx_log batches is therefore a natural Structured Streaming source: new
files appear append-only, exactly like Datomic's log.

At scale: the tx_log stream is tiny relative to the element tables
(fixed-width rows, no payloads), so a single stream consumer keeps up
with arbitrarily large graphs; downstream aggregations shuffle on
element_id/kind with watermark-bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import model as M

TX_LOG_SCHEMA = T.StructType(
    [
        T.StructField(M.TX_ID, T.LongType()),
        T.StructField(M.TX_TIME, T.TimestampType()),
        T.StructField(M.ELEMENT_ID, T.LongType()),
        T.StructField(M.PREV_TX_ID, T.LongType()),
        T.StructField(M.KIND, T.StringType()),
    ]
)


def tx_log_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """``readStream`` over a tx_log parquet directory (e.g. written by
    ``save_graph_parquet``): each new file is a batch of committed
    transactions — a change-data feed for the graph.
    ``max_files_per_trigger`` bounds each microbatch's file intake
    (back-pressure for catch-up reads after downtime)."""
    return (
        spark.readStream.schema(TX_LOG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def element_touch_counts(
    log: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Exact per-(window, kind, element) mutation counts — the
    hash-gateable changefeed rollup.  :func:`element_change_counts`'s
    ``n_elements`` uses ``approx_count_distinct`` (exact distinct
    aggregation is unsupported in streaming), which no external engine
    replays; this keyed one-level aggregation is exact instead, and an
    exact distinct-elements count falls out of a trivial batch rollup
    over the settled result (one row per live key).

    State-size bound (the watermark eviction math): state holds one
    fixed-width row per LIVE (window, kind, element) key, and a window
    is live only until the watermark passes its end — so live windows
    per key number at most ceil(watermark/window) + 1 (= 3 at the
    1h/2h defaults), and total state is

        rows <= (ceil(watermark/window) + 1)
                x |distinct (kind, element) touched within the horizon|

    — proportional to the HOT element set per watermark horizon, not
    to history and not to the corpus.  The rows hash-partition by key
    across ``spark.sql.shuffle.partitions`` state stores, so per-store
    state is that total divided by the partition count — raise the
    partition count to scale out, exactly like any keyed shuffle.
    Eviction only happens in append/update output modes; COMPLETE mode
    additionally re-emits the entire accumulated result table every
    trigger, which is fine for finite drains (the gated query) but is
    the piece that grows without bound on an infinite feed — for that,
    run this feed two-level: append-mode finalized rows to files via
    ``writeStream`` (each key emitted exactly once when the watermark
    passes its window), then :func:`touch_rollup` as the batch merge.
    """
    return (
        log.withWatermark(M.TX_TIME, watermark)
        .groupBy(F.window(M.TX_TIME, window).alias("win"), M.KIND, M.ELEMENT_ID)
        .agg(F.count("*").alias("n_changes"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            M.KIND,
            M.ELEMENT_ID,
            "n_changes",
        )
    )


def element_touch_feed(
    touches: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    """Level 1 of the two-level changefeed rollup at scale: write
    :func:`element_touch_counts` rows to ``path`` in APPEND mode — a
    (window, kind, element) row is emitted EXACTLY ONCE, when the
    watermark passes its window end, and its state row evicts in the
    same move.  Nothing accumulates: state is the live-window bound
    documented on element_touch_counts, the sink is an append-only
    file feed, and the driver never materializes the result table
    (the complete-mode drain does — right for finite gates, wrong for
    an infinite 100 TB feed).  Returns the StreamingQuery; callers
    await it (availableNow) or manage it (continuous).

    Exactly-once per key comes from append semantics (finalized keys
    never update again) + the file sink's checkpointed _spark_metadata
    manifest — which is a SPARK-READER contract: a batch replayed
    after a crash writes a second set of uniquely-named part files and
    only the manifest records which set is committed.  Read the feed
    back with ``spark.read.parquet(path)`` (manifest-aware: sees each
    key exactly once, so :func:`touch_rollup`'s count(*)-is-distinct
    premise holds); a non-Spark reader globbing the raw directory
    (e.g. a DuckDB oracle over ``path/*.parquet``) may see replayed
    duplicates and must dedup on the key first."""
    w = (
        touches.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def touch_rollup(settled: DataFrame) -> DataFrame:
    """Level 2 of the two-level changefeed rollup: the batch merge over
    the append-mode feed (:func:`element_touch_feed`'s files, or a
    complete-mode drain's settled table) — per (window, kind) total
    mutation counts with an EXACT distinct-elements count.  Exactness
    is structural: the feed holds exactly one row per finalized
    (window, kind, element) key, so ``count(*)`` IS the distinct count
    — no state, no sketch, one ordinary shuffle whose input is already
    the aggregated feed (tiny next to the tx volume it summarizes)."""
    return settled.groupBy("win_start", "win_end", M.KIND).agg(
        F.sum("n_changes").cast("long").alias("n_changes"),
        F.count(F.lit(1)).cast("long").alias("n_elements"),
    )


def element_change_counts(
    log: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per (kind, window) mutation counts with late-data handling: the
    watermark bounds streaming state, so this runs forever at any scale."""
    return (
        log.withWatermark(M.TX_TIME, watermark)
        .groupBy(F.window(M.TX_TIME, window).alias("win"), M.KIND)
        .agg(
            F.count("*").alias("n_changes"),
            F.approx_count_distinct(M.ELEMENT_ID).alias("n_elements"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            M.KIND,
            "n_changes",
            "n_elements",
        )
    )
