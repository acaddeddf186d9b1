"""Multimodal columns (Tier X, SURVEY.md §2.3): image/audio/video as opaque
``binary`` payloads with typed metadata, plus decode / feature-extract /
resize / frame-sample operators as Arrow-batched pandas transforms.

The media codec libraries are not available in this environment, so the
*decode* step is stubbed (deterministic fake features derived from the
payload bytes, or ``NotImplementedError`` when ``strict=True``). Everything
Spark-side — schema, batching, partitioning, UDF signatures — is real and
tested; swapping the stub for PIL/torchaudio/ffmpeg is a one-function change.

Scale: payloads stay opaque binaries end-to-end (parquet keeps them
compressed, column pruning keeps them unread unless asked for); decode runs
in ``mapInPandas`` over Arrow record batches so each Python worker handles
a batch of payloads at a time, and ``repartition`` by content-hash spreads
large media evenly across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frame import SparkFrame

#: metadata struct carried alongside every media payload.
MEDIA_METADATA_TYPE = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", MEDIA_METADATA_TYPE, True),
])


def attach_media_column(frame_or_df, payload_col: str, media_type: str,
                        fmt: str | None = None) -> SparkFrame:
    """Wrap an existing binary column with the typed metadata struct."""
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) else frame_or_df
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return SparkFrame(sdf.withColumn("meta", meta))


def content_hash(col) -> F.Column:
    """Content-addressing for payload dedup: sha2 of the raw bytes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def dedup_media(frame_or_df, payload_col: str = "payload",
                id_col: str = "media_id") -> SparkFrame:
    """Exact payload dedup by content hash: keep min id per digest."""
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) else frame_or_df
    hashed = sdf.withColumn("__digest__", content_hash(payload_col))
    keep = hashed.groupBy("__digest__").agg(F.min(id_col).alias(id_col))
    out = keep.join(hashed, on=[id_col, "__digest__"]).drop("__digest__")
    return SparkFrame(out)


def _fake_decode(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features are a stable
    function of the payload bytes (byte histogram moments), so tests are
    reproducible. Replace with a real codec to productionize."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_features, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float32)
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


def extract_features(frame_or_df, payload_col: str = "payload",
                     id_col: str = "media_id", n_features: int = 32,
                     strict: bool = False) -> SparkFrame:
    """Decode + feature-extract each payload -> array<float> feature column.

    ``mapInPandas`` over Arrow batches: the worker receives a pandas batch
    of payloads, vectorizes the decode, emits (id, features). With
    ``strict=True`` raises NotImplementedError where a real codec would run.
    """
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) else frame_or_df
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg) "
                    "not present in this environment")
            feats = [
                _fake_decode(p, n_features).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    out = sdf.select(id_col, payload_col).mapInPandas(_extract, schema=schema)
    return SparkFrame(out)


def frame_sample(frame_or_df, payload_col: str = "payload",
                 id_col: str = "media_id", every_n_bytes: int = 1024,
                 frame_bytes: int = 64, max_frames: int = 16) -> SparkFrame:
    """'Frame sampling' plumbing: slice the payload into evenly spaced
    binary chunks (stand-in for video keyframe extraction). Pure
    expressions over binary -> array<binary>; the real decoder would
    replace the substring slicing with codec seeks."""
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) else frame_or_df
    n = F.least(
        F.greatest((F.length(payload_col) / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames))
    frames = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.substring(F.col(payload_col).cast("binary"),
                              (i * every_n_bytes + 1).cast("int"), frame_bytes))
    out = sdf.select(id_col, frames.alias("frames"),
                     F.size(frames).alias("n_frames"))
    return SparkFrame(out)


def resize_stub(*_args, **_kwargs):
    """Image resize requires a codec library not present here."""
    raise NotImplementedError(
        "resize requires an image library (PIL/opencv) not present in this "
        "environment; the Spark-side plumbing is extract_features/frame_sample")
