"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The Spark-side contract is real and tested — schemas, batch iteration,
partition sizing — while the actual codecs are stubbed (the image/audio
libraries are not in this container).  A production deployment swaps
``_decode_image_stub`` for PIL/libvips inside the same iterator; the
plan shape does not change.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` should be sized to keep a
partition's decoded batch in executor memory; `mapInPandas` streams
Arrow batches, so per-batch peak memory is
``batch_rows × decoded_size``, controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # png/jpeg/wav/…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, payload_hash string,"
    " feature array<double>"
)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB decode: deterministic fake feature from the raw bytes.
    Replace with a real codec (PIL → resize → channel means) in
    production; the surrounding plumbing is identical."""
    if payload is None:
        return []
    # 8-bucket byte histogram, normalized — deterministic and cheap
    hist = [0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1
    total = sum(hist) or 1
    return [h / total for h in hist]


def extract_features(df: DataFrame) -> DataFrame:
    """Binary payloads → feature vectors via Arrow-batched pandas
    iteration.  One map-side pass; no shuffle."""
    import hashlib

    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "payload_hash": pdf["payload"].map(
                        lambda p: hashlib.md5(p).hexdigest() if p is not None else None
                    ),
                    "feature": pdf["payload"].map(_decode_image_stub),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — plumbing only; the codec is not in this
    container, so the operator raises at execution time with a clear
    message while keeping a real, analyzable plan shape."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "swap in PIL/libvips inside resize_images.op"
        )
        yield  # pragma: no cover

    schema = "media_id long, payload binary, width int, height int"
    return df.mapInPandas(op, schema=schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — metadata-level plan (sample timestamps per
    row); the decoder hook is stubbed like resize_images."""
    return df.withColumn(
        "sample_ts_ms",
        F.when(
            F.col("duration_ms").isNotNull(),
            F.sequence(
                F.lit(0).cast("long"),
                F.col("duration_ms"),
                F.lit(every_ms).cast("long"),
            ),
        ),
    )
