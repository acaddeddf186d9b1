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


def _make_wav(freq=440.0, sr=8000, seconds=0.5, amp=0.5):
    import io
    import math
    import struct
    import wave
    buf = io.BytesIO()
    n = int(sr * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack("<h", int(amp * 32767
                                  * math.sin(2 * math.pi * freq * t / sr)))
            for t in range(n))
        w.writeframes(frames)
    return buf.getvalue()


def _make_ppm(w=4, h=2, rgb=(255, 0, 0)):
    header = f"P6\n# comment\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def _make_bmp(w=3, h=2, rgb=(0, 0, 255)):
    import struct
    row = bytes(rgb[::-1]) * w
    row += b"\x00" * ((4 - len(row) % 4) % 4)
    data = row * h
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(data), 2835, 2835, 0, 0))
    return hdr + data


def test_real_decoders_wav_ppm_bmp(spark):
    """WAV/PPM/BMP decode for REAL (stdlib + numpy — no codec libs):
    metadata and features come from the actual samples/pixels."""
    import math
    from cl_data_frame_spark.operators.multimodal import \
        extract_features_real
    rows = [(1, _make_wav()), (2, _make_ppm()), (3, _make_bmp()),
            (4, b"\xff\xd8\xff\xe0\x00\x10JFIFnotdecodable")]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in
           extract_features_real(df, n_features=16).spark_df.collect()}
    wav = out[1]
    assert wav.decoded and wav.meta.media_type == "audio"
    assert wav.meta.sample_rate == 8000 and wav.meta.duration_ms == 500
    # 0.5-amplitude sine has RMS ~ 0.5/sqrt(2)
    assert abs(wav.features[2] - 0.5 / math.sqrt(2)) < 0.01
    ppm = out[2]
    assert ppm.decoded and ppm.meta.width == 4 and ppm.meta.height == 2
    # pure red: meanR=1, meanG=meanB=0
    assert abs(ppm.features[2] - 1.0) < 1e-6
    assert ppm.features[3] == 0.0 and ppm.features[4] == 0.0
    bmp = out[3]
    assert bmp.decoded and bmp.meta.width == 3 and bmp.meta.height == 2
    # pure blue: meanB=1
    assert abs(bmp.features[4] - 1.0) < 1e-6
    assert bmp.features[2] == 0.0
    # unknown format (JPEG magic): falls back to the deterministic fake
    jpg = out[4]
    assert not jpg.decoded and jpg.meta is None
    assert len(jpg.features) == 16
    # strict mode raises for formats with no stdlib decoder
    import pytest
    with pytest.raises(Exception, match="no stdlib decoder"):
        extract_features_real(
            spark.createDataFrame([(9, b"\x89PNGxxxx")],
                                  "media_id bigint, payload binary"),
            strict=True).spark_df.collect()


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def _make_png(px, ctype: int, filters) -> bytes:
    """Encode a pixel array as PNG, applying the REQUESTED per-row
    filter types (exercises every unfilter branch of the decoder)."""
    import struct
    import zlib

    import numpy as np
    h, w = px.shape[:2]
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    flat = px.reshape(h, w * ch).astype(np.int32)
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for r, f in zip(range(h), filters):
        line = flat[r]
        left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - (left + prev) // 2
        elif f == 4:
            upleft = np.concatenate([np.zeros(ch, np.int32),
                                     prev[:-ch]])
            enc = np.zeros_like(line)
            for i in range(len(line)):
                a, b, c = int(left[i]), int(prev[i]), int(upleft[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[i] = line[i] - pred
        raw += bytes([f]) + bytes((enc & 0xFF).astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def test_real_decoder_png_golden_pixels(spark):
    """PNG decodes for REAL with stdlib zlib: every filter type
    (None/Sub/Up/Average/Paeth) round-trips to the exact golden
    pixels' features, for RGB, grayscale, and RGBA payloads."""
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import (
        _image_features, extract_features_real)
    rng = np.random.RandomState(8)
    rgb = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(3, 6, 1), dtype=np.uint8)
    rgba = np.dstack([rgb, np.full((5, 4), 77, np.uint8)])
    rows = [
        (1, _make_png(rgb, 2, [0, 1, 2, 3, 4])),   # all five filters
        (2, _make_png(gray, 0, [4, 3, 1])),
        (3, _make_png(rgba, 6, [2, 4, 0, 1, 3])),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in
           extract_features_real(df, n_features=13).spark_df.collect()}
    golden = {
        1: _image_features(rgb, 4, 5, "png"),
        2: _image_features(np.repeat(gray, 3, axis=2), 6, 3, "png"),
        3: _image_features(rgb, 4, 5, "png"),      # alpha dropped
    }
    for mid, (gmeta, gfeats) in golden.items():
        got = out[mid]
        assert got.decoded and got.meta.format == "png"
        assert got.meta.width == gmeta["width"]
        assert got.meta.height == gmeta["height"]
        assert np.allclose(got.features, gfeats[:13], atol=1e-6), mid
