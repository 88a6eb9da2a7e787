"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so bytes stream executor-side in columnar
batches — never through the driver.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``decoder="real"`` raises NotImplementedError
with the dependency it needs; ``decoder="fake"`` produces deterministic
md5-derived features so the Spark-side plumbing (schema, batching,
partitioning) is fully testable.  Swapping in a real codec touches ONLY
the inner ``_decode_bytes`` function — the operator shape is final.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Demo media table: documents' text bytes as opaque blobs with fake
    image metadata (deterministic).  Stands in for a real binary column
    scan off parquet."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            (F.length("text") % 640 + 1).cast("int").alias("width"),
            (F.length("text") % 480 + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("image/fake").alias("mime"),
        ).alias("meta"),
    )


def _make_decoder(decoder: str):
    """Returns a self-contained decode kernel.

    Defined as a closure (not a module-level reference) on purpose:
    cloudpickle then ships it BY VALUE inside the mapInPandas closure, so
    executors do not need fluxgraph_spark importable on their own
    PYTHONPATH — important when the package is driver-side only.  A real
    deployment would instead ship the package via spark.submit.pyFiles."""

    def _decode_bytes(content: bytes, media_type: str) -> list[float]:
        import hashlib as _hashlib

        if decoder == "real":
            raise NotImplementedError(
                "real media decode needs PIL/ffmpeg/librosa — not available "
                "in this container; plug the codec in here"
            )
        # deterministic fake: 8 floats derived from md5 of the bytes
        digest = _hashlib.md5(content or b"").digest()
        return [b / 255.0 for b in digest[:8]]

    return _decode_bytes


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_note_col: bool = False
) -> DataFrame:
    """media table -> (media_id, media_type, feature array<double>, n_bytes).

    Arrow-batched mapInPandas: each batch decodes executor-side; the
    output schema is fixed so downstream (similarity search over the
    feature column) composes with the embedding operators."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        ]
    )

    decode = _make_decoder(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        batches, schema=out_schema
    )


def resize_images(media: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Resize plumbing: same mapInPandas shape; fake decoder passes bytes
    through and rewrites meta (a real codec would re-encode)."""
    out_schema = MEDIA_SCHEMA

    decode = _make_decoder(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                decode(b"", "image")  # raises with guidance
            metas = [
                {"width": width, "height": height, "duration_ms": None, "mime": m or "image/fake"}
                for m in (x["mime"] if isinstance(x, dict) else None for x in pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": pdf["content"],
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    frame (deterministic count from meta.duration_ms; fake decoder emits
    md5-offset features per frame)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_feature", T.ArrayType(T.DoubleType()), False),
        ]
    )
    decode = _make_decoder(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, feats = [], [], []
            for _, row in pdf.iterrows():
                dur = (row["meta"] or {}).get("duration_ms") or 0
                n_frames = max(1, int(dur // every_ms))
                for i in range(n_frames):
                    if decoder == "real":
                        decode(b"", "video")
                    digest = hashlib.md5((row["content"] or b"") + bytes([i % 256])).digest()
                    ids.append(row["media_id"])
                    idxs.append(i)
                    feats.append([b / 255.0 for b in digest[:8]])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_feature": feats}
            )

    return media.mapInPandas(batches, schema=out_schema)
