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


def _decode_raw(payload: bytes, width: int, height: int):
    """Raw-grayscale "codec": the first ``width*height`` payload bytes
    as a row-major uint8 matrix, zero-padded when short.  Deterministic
    and dependency-free — the seam where PIL/libvips decode slots in."""
    import numpy as np

    need = width * height
    buf = (payload or b"")[:need]
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size < need:
        arr = np.concatenate([arr, np.zeros(need - arr.size, dtype=np.uint8)])
    return arr.reshape(height, width)


def _resize_nn(img, out_w: int, out_h: int):
    """Nearest-neighbor resample with floor index mapping:
    ``src_r = (r * H) // out_h`` — integer math, so any engine (or SQL
    oracle) reproduces the exact output bytes."""
    import numpy as np

    h, w = img.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def resize_images(
    df: DataFrame, width: int, height: int, codec: str = "raw"
) -> DataFrame:
    """Image resize over Arrow-batched ``mapInPandas``.  The ``raw``
    codec (8-bit grayscale, dims from the row's width/height metadata)
    is implemented end-to-end; real image formats raise the documented
    NotImplementedError until a PIL/libvips decode is slotted into the
    same iterator — the plan shape, schema, and batching are identical
    either way.  Rows with NULL payload or non-positive dims yield a
    NULL payload (codec failure isolation, not task failure)."""
    import pandas as pd

    if codec != "raw":
        # Real-format payloads decode through PIL when it is installed
        # (same mapInPandas iterator, same schema/batching); without
        # PIL the documented NotImplementedError gate stands.  Output
        # payload is the nearest-neighbor-resized 8-bit-grayscale RAW
        # bytes (same _resize_nn as the raw codec) — pinning re-ENCODED
        # bytes would couple tests to the encoder build, pixels don't.
        def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            try:
                from PIL import Image  # noqa: PLC0415
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    f"image codec {codec!r} needs PIL, which is not "
                    "available in this environment; the raw codec is "
                    "the supported path here"
                ) from exc
            import io

            for pdf in batches:
                out = []
                for p in pdf["payload"]:
                    if p is None:
                        out.append(None)
                        continue
                    try:
                        img = Image.open(io.BytesIO(bytes(p)))
                        img.load()
                    except Exception:  # codec failure isolation
                        out.append(None)
                        continue
                    arr = np.asarray(img.convert("L"), dtype=np.uint8)
                    out.append(_resize_nn(arr, width, height).tobytes())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": out,
                        "width": width,
                        "height": height,
                    }
                )
    else:
        def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                out = []
                n = len(pdf)
                wcol = pdf["width"] if "width" in pdf.columns else [None] * n
                hcol = pdf["height"] if "height" in pdf.columns else [None] * n
                for p, w, h in zip(pdf["payload"], wcol, hcol):
                    # NULL ints arrive as NaN through Arrow→pandas, so
                    # pd.isna is the real null check; int(NaN) would
                    # kill the task otherwise
                    if (
                        p is None
                        or w is None
                        or h is None
                        or pd.isna(w)
                        or pd.isna(h)
                        or w <= 0
                        or h <= 0
                    ):
                        out.append(None)
                        continue
                    img = _decode_raw(bytes(p), int(w), int(h))
                    out.append(_resize_nn(img, width, height).tobytes())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": out,
                        "width": width,
                        "height": height,
                    }
                )

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


def frame_energy(df: DataFrame, frame_len: int = 256) -> DataFrame:
    """Audio framing: the payload interpreted as unsigned 8-bit PCM,
    split into frames of ``frame_len`` samples; per media the frame
    count, total energy and loudest-frame energy (Σ(s−128)² — exact
    integers, so an external oracle can re-derive every value from the
    raw bytes).  Same Arrow-batched ``mapInPandas`` shape as
    ``extract_features`` — a production deployment swaps the u8-PCM
    interpretation for a real audio decode (soundfile/ffmpeg) inside
    the same iterator; framing, schema and batch flow are unchanged.
    Map-side only: no shuffle at any corpus size."""
    import numpy as np
    import pandas as pd

    out_schema = (
        "media_id long, n_frames long, total_energy long,"
        " max_frame_energy long"
    )

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    rows.append((mid, 0, 0, 0))
                    continue
                s = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                sq = (s - 128) ** 2
                n_frames = -(-len(sq) // frame_len)
                energies = [
                    int(sq[i * frame_len : (i + 1) * frame_len].sum())
                    for i in range(n_frames)
                ]
                rows.append((mid, n_frames, int(sq.sum()), max(energies)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "total_energy",
                    "max_frame_energy",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def perceptual_ahash(
    df: DataFrame, hash_w: int = 8, hash_h: int = 7
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints: resize to a
    ``hash_w × hash_h`` thumbnail (the raw codec — PIL slots into the
    same seam), then one bit per pixel, set when the pixel exceeds the
    thumbnail MEAN — evaluated in the cross-multiplied integer form
    ``px·n > Σpx`` so no mean ever rounds.  Bits pack big-endian into
    one long; the default 8×7 = 56 bits stays clear of the sign bit,
    so the packed value is identical in any engine's signed 64-bit
    arithmetic.

    This is the standard cheap image near-dup key (aHash/dHash
    family): re-encodes, minor crops, and brightness shifts move few
    bits, so Hamming distance over the packed longs finds visual
    dupes that byte-hash equality misses.

    Output: ``media_id, ahash`` (NULL payload → NULL hash).
    """
    import pandas as pd

    thumbs = resize_images(df, hash_w, hash_h)
    n = hash_w * hash_h

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                bs = bytes(p)
                total = sum(bs)
                sig = 0
                for i, v in enumerate(bs):
                    if v * n > total:
                        sig |= 1 << (n - 1 - i)
                out.append(sig)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "ahash": out}
            )

    return thumbs.mapInPandas(op, schema="media_id long, ahash long")


def ahash_near_pairs(
    sigs: DataFrame,
    bits: int = 56,
    max_hamming: int = 2,
    id_col: str = "media_id",
    sig_col: str = "ahash",
) -> DataFrame:
    """Hamming-≤ ``max_hamming`` pairs over packed perceptual hashes
    with GUARANTEED recall: split the ``bits`` into ``max_hamming+1``
    blocks — a pair within distance d must agree on at least one
    block (pigeonhole), so candidates are the union of
    block-value equi-joins and the exact ``bit_count(xor)`` verify
    touches candidates only.  Never an all-pairs scan.  (Boilerplate
    floods that collapse to one hash value make that block's bucket
    hot — cap with ``cap_hot_buckets`` upstream if the corpus has
    them; exact-duplicate hashes are the pairs you WANT here.)

    Output: ``id_a < id_b, hamming``.
    """
    if not (0 <= max_hamming < bits):
        raise ValueError("need 0 <= max_hamming < bits")
    nb = max_hamming + 1
    base, extra = divmod(bits, nb)
    widths = [base + (1 if i < extra else 0) for i in range(nb)]
    s = sigs.select(
        F.col(id_col).alias("id"), F.col(sig_col).alias("sig")
    ).filter(F.col("sig").isNotNull())
    keyed = []
    lo = bits
    for j, w in enumerate(widths):
        lo -= w
        block = F.shiftright(F.col("sig"), lo).bitwiseAND(
            F.lit((1 << w) - 1)
        )
        keyed.append(
            s.select(
                "id", "sig", F.lit(j).alias("tbl"), block.alias("blk")
            )
        )
    u = keyed[0]
    for k in keyed[1:]:
        u = u.unionByName(k)
    a, b = u.alias("a"), u.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
