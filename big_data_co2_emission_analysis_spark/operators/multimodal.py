"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas).

The decode step itself is STUBBED: the image/audio libraries are not in
this environment, so ``decode_image_batch`` raises NotImplementedError
unless ``fake=True``, which produces a deterministic fake feature
vector from the bytes.  Everything around the stub -- schema, batch
shape, partition sizing, UDF signature -- is real and tested
(tests/test_multimodal.py), so dropping in a real decoder is a
one-function change.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs decode parallelism, and
feature extraction must stream per-batch (mapInPandas iterator) rather
than collecting a partition into memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every opaque media payload.
MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("feat_norm", T.DoubleType()),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: derive an opaque binary payload + metadata
    struct from a text corpus so the multimodal plumbing is exercisable
    without real media files.  In production this column comes straight
    from the source (parquet BINARY / object-store pointers)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("media_bytes"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(payload).cast("long").alias("size_bytes"),
        ).alias("media_meta"),
    )


def decode_image_batch(payloads, fake: bool = False):
    """Decode a batch of image payloads -> list of FEATURE_DIM feature
    vectors.

    STUB: real decoding needs PIL/opencv (absent here).  ``fake=True``
    derives a deterministic pseudo-feature vector from the raw bytes
    (rolling byte sums), preserving shapes and determinism for tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv, not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    import numpy as np

    out = []
    for p in payloads:
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        if len(b) == 0:
            out.append(np.zeros(FEATURE_DIM, dtype=np.float32))
            continue
        pad = (-len(b)) % FEATURE_DIM
        chunks = np.pad(b, (0, pad)).reshape(-1, FEATURE_DIM).astype(np.float32)
        out.append(chunks.mean(axis=0) / 255.0)
    return out


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_bytes): the
    real Arrow-batched pipeline shape.  Batches stream through the
    iterator; nothing accumulates per-partition."""

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = decode_image_batch(pdf["media_bytes"], fake=fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [f.tolist() for f in feats],
                    "feat_norm": [float(np.linalg.norm(f)) for f in feats],
                }
            )

    return df.select("doc_id", "media_bytes").mapInPandas(_extract, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("media_meta", MEDIA_METADATA_TYPE),
    ]
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """mapInPandas image resize: payload in, re-encoded payload +
    updated metadata out -- the schema/batch plumbing of a real resize
    stage.  STUB decode/encode (PIL absent): ``fake=True``
    deterministically truncates/pads the byte payload to width*height
    so downstream stages see size-consistent binaries; a real
    implementation swaps only the inner ``_resize_one``.
    """
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv, not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    target = width * height

    def _resize(batches):
        import pandas as pd

        def _resize_one(p) -> bytes:
            b = bytes(p)
            return (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target

        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["media_bytes"] = pdf["media_bytes"].map(_resize_one)
            out["media_meta"] = [
                {
                    "media_type": "image",
                    "format": "fake",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "size_bytes": target,
                }
                for _ in range(len(pdf))
            ]
            yield out

    return df.select("doc_id", "media_bytes").mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode each payload
    into ``n_frames`` (frame_idx, frame_bytes) rows -- the stub slices
    the byte payload evenly, standing in for keyframe extraction.  The
    explode keeps rows JVM-side; only the decoder (above) is a stub."""
    payload = F.col("media_bytes")
    size = F.length(payload)
    frame = lambda i: F.expr(  # noqa: E731
        f"substring(media_bytes, cast({i} * length(media_bytes) / {n_frames} as int) + 1, "
        f"cast(length(media_bytes) / {n_frames} as int))"
    )
    frames = F.array(*[F.struct(F.lit(i).alias("frame_idx"), frame(i).alias("frame_bytes")) for i in range(n_frames)])
    return (
        df.filter(size >= n_frames)
        .select(F.col(id_col), F.explode(frames).alias("f"))
        .select(id_col, F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame_bytes").alias("frame_bytes"))
    )
