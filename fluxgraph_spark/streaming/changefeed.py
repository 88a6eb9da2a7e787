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
    over the settled result (one row per live key).  Scale: ONE
    stateful aggregation whose state is bounded by live (window, kind,
    element) keys — with the watermark, expired windows evict in
    append/update modes; complete mode is for finite drains."""
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
