"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §2.8) — its closest analog is
the append-only Datomic transaction log.  This package exposes that
analog Spark-natively: the engine's ``tx_log`` table as a change-data
feed (``readStream``), plus the event-stream operators a training-data
pipeline needs (watermarked windowed aggregation, session windows,
streaming dedup) — all expressed with built-in Structured Streaming
operators so state management, late data, and exactly-once sinks come
from Spark, not custom code.
"""

from .ann_ingest import ann_streaming_sink
from .changefeed import (
    element_change_counts,
    element_touch_counts,
    element_touch_feed,
    touch_rollup,
    tx_log_stream,
)
from .dedup_ingest import dedup_streaming_sink, seed_corpus
from .events import (
    read_event_stream,
    windowed_event_counts,
    sessionize_stream,
    streaming_dedupe,
    interval_stream_join,
)
from .scd2_ingest import scd2_streaming_sink
from .stateful import running_user_stats
from .text_ingest import bm25_streaming_sink

__all__ = [
    "ann_streaming_sink",
    "bm25_streaming_sink",
    "dedup_streaming_sink",
    "seed_corpus",
    "running_user_stats",
    "scd2_streaming_sink",
    "tx_log_stream",
    "element_change_counts",
    "element_touch_counts",
    "element_touch_feed",
    "touch_rollup",
    "read_event_stream",
    "windowed_event_counts",
    "sessionize_stream",
    "streaming_dedupe",
    "interval_stream_join",
]
