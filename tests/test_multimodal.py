"""Multimodal column plumbing (Tier X): typed metadata struct, content-hash
dedup, Arrow-batched feature extraction (deterministic stub decode), frame
sampling, and the strict-mode codec guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cl_data_frame_spark.frame import SparkFrame
from cl_data_frame_spark.operators import multimodal as MM


@pytest.fixture()
def media(spark):
    rows = [
        (0, b"aaaa-payload-one" * 100),
        (1, b"bbbb-payload-two" * 100),
        (2, b"aaaa-payload-one" * 100),   # duplicate of 0
        (3, b""),
        (4, None),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_media_column_schema(media):
    fr = MM.attach_media_column(media, "payload", "image", fmt="png")
    meta_type = dict((f.name, f.dataType)
                     for f in fr.spark_df.schema)["meta"]
    # compare names + types; nullability of literal-built structs differs
    assert [(f.name, f.dataType) for f in meta_type.fields] == \
        [(f.name, f.dataType) for f in MM.MEDIA_METADATA_TYPE.fields]
    row = fr.spark_df.filter(F.col("media_id") == 0).collect()[0]
    assert row["meta"]["media_type"] == "image"
    assert row["meta"]["format"] == "png"


def test_dedup_media_keeps_min_id(media):
    out = MM.dedup_media(media.filter(F.col("payload").isNotNull()))
    ids = sorted(r["media_id"] for r in out.spark_df.collect())
    assert ids == [0, 1, 3]  # 2 deduped against 0


def test_extract_features_deterministic(media):
    out = MM.extract_features(media, n_features=8)
    rows = {r["media_id"]: r["features"] for r in out.spark_df.collect()}
    assert len(rows) == 5
    assert rows[0] == rows[2]          # same payload -> same features
    assert rows[0] != rows[1]
    assert rows[3] == [0.0] * 8        # empty payload -> zero vector
    assert rows[4] == [0.0] * 8        # null payload -> zero vector
    assert all(len(v) == 8 for v in rows.values())


def test_extract_features_strict_raises(media):
    out = MM.extract_features(media, n_features=8, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.spark_df.collect()


def test_frame_sample_counts(media):
    out = MM.frame_sample(media.filter(F.col("payload").isNotNull()),
                          every_n_bytes=256, frame_bytes=32, max_frames=4)
    rows = {r["media_id"]: r for r in out.spark_df.collect()}
    # 1600-byte payloads -> 1600/256 = 6 -> capped at 4 frames
    assert rows[0]["n_frames"] == 4
    assert all(len(fr) == 32 for fr in rows[0]["frames"])
    # empty payload -> 1 (degenerate) frame slot
    assert rows[3]["n_frames"] == 1


def test_resize_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.resize_stub()
