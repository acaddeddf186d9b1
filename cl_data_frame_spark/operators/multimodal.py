"""Multimodal columns (Tier X, SURVEY.md §2.3): image/audio/video as opaque
``binary`` payloads with typed metadata, plus decode / feature-extract /
resize / frame-sample operators as Arrow-batched pandas transforms.

Formats a stdlib parser can handle decode FOR REAL: WAV (``wave``),
PPM (P6), 24-bit BMP, 8-bit PNG (``zlib`` inflate + RFC 2083
scanline unfiltering), baseline JPEG (full ITU-T T.81 SOF0: huffman
entropy decode, dequantize, 8x8 IDCT, chroma upsampling, YCbCr->RGB —
round 9), GIF 87a/89a (LZW), and MJPEG-in-AVI VIDEO (round 10: RIFF
walk + per-frame JPEG decode — real frame sampling via
``video_frames_real``). Only H.264/H.265-class bitstreams — whose
codec libraries are not in this environment — fall back to a stub
(deterministic fake features derived from the payload bytes, or
``NotImplementedError`` when ``strict=True``). Everything Spark-side —
schema, batching, partitioning, UDF signatures — is real and tested;
swapping the stub for torchaudio/ffmpeg is a one-function change.

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


def _decode_image_pixels(payload: bytes) -> tuple[np.ndarray, str]:
    """RGB uint8 pixels for any format with a real stdlib decoder
    (magic-byte sniffed); raises ValueError for everything else."""
    payload = bytes(payload)
    if payload[:2] == b"P6":
        return _decode_ppm_pixels(payload), "ppm"
    if payload[:2] == b"BM":
        return _decode_bmp_pixels(payload), "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png_pixels(payload), "png"
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg_pixels(payload), "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif_pixels(payload), "gif"
    raise ValueError("no stdlib pixel decoder for this payload")


def _resize_pixels(px: np.ndarray, tw: int, th: int,
                   method: str = "bilinear") -> np.ndarray:
    """Pure-numpy image resize: 'nearest' index mapping or separable
    'bilinear' interpolation (the public algorithms, no PIL/opencv).
    Sampling uses the standard half-pixel-center convention."""
    h, w = px.shape[:2]
    src = px.astype(np.float64)
    if method == "nearest":
        ys = np.clip(((np.arange(th) + 0.5) * h / th).astype(int),
                     0, h - 1)
        xs = np.clip(((np.arange(tw) + 0.5) * w / tw).astype(int),
                     0, w - 1)
        return px[ys][:, xs]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = (np.arange(th) + 0.5) * h / th - 0.5
    fx = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _encode_ppm(px: np.ndarray) -> bytes:
    """Re-encode RGB uint8 pixels as binary PPM (P6) — the lossless
    stdlib-writable output container for resized images."""
    h, w = px.shape[:2]
    return (f"P6\n{w} {h}\n255\n".encode("ascii")
            + px.astype(np.uint8).tobytes())


def resize_images_real(frame_or_df, target_w: int, target_h: int,
                       payload_col: str = "payload",
                       id_col: str = "media_id",
                       method: str = "bilinear",
                       strict: bool = False) -> SparkFrame:
    """REAL image resize (round 10): decode any stdlib-decodable
    payload (PPM/BMP/PNG/JPEG/GIF), resample to (target_w, target_h)
    with pure-numpy nearest/bilinear, and emit the result as a
    lossless P6 PPM payload plus source metadata — the
    thumbnail/normalize pass of a multimodal training pipeline,
    ``mapInPandas`` so payloads never leave the executor. Undecodable
    payloads pass through with ``resized=false`` (``strict=True``
    raises instead)."""
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) \
        else frame_or_df
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("src_format", T.StringType(), True),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("resized", T.BooleanType(), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px, fmt = _decode_image_pixels(bytes(p))
                    h, w = px.shape[:2]
                    out = _resize_pixels(px, target_w, target_h,
                                         method)
                    rows.append((int(mid), bytearray(_encode_ppm(out)),
                                 fmt, int(w), int(h), True))
                except Exception:
                    if strict:
                        raise
                    rows.append((int(mid),
                                 bytearray(bytes(p or b"")), None,
                                 None, None, False))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in schema])

    out = sdf.select(id_col, payload_col).mapInPandas(gen,
                                                      schema=schema)
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# REAL decoders for formats the Python stdlib + numpy can parse (round 7):
# WAV audio (stdlib `wave`), binary PPM (P6) and uncompressed 24-bit BMP
# images. These need NO external codec library, so for these formats the
# decode/feature path below is genuinely real end to end — the fake/stub
# path now covers only compressed codecs (JPEG/PNG/MP3/MP4...).
# ---------------------------------------------------------------------------

def _decode_wav(payload: bytes):
    """Parse a RIFF/WAVE payload: (meta dict, feature list).

    Features: [duration_s, sample_rate/1e4, rms, zero_crossing_rate]
    over the channel-averaged normalized signal.
    """
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {sw}")
    arr = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        arr -= 128.0
    arr /= float(2 ** (8 * sw - 1))
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    dur_ms = int(round(n / sr * 1000)) if sr else 0
    rms = float(np.sqrt(np.mean(arr ** 2))) if arr.size else 0.0
    zcr = (float(np.mean(np.abs(np.diff(np.signbit(arr)
                                        .astype(np.int8)))))
           if arr.size > 1 else 0.0)
    meta = {"media_type": "audio", "format": "wav", "width": None,
            "height": None, "duration_ms": dur_ms, "sample_rate": sr}
    return meta, [dur_ms / 1000.0, sr / 1e4, rms, zcr]


def _image_features(px: np.ndarray, w: int, h: int, fmt: str):
    """Shared image feature vector: [w/1e3, h/1e3, meanR, meanG, meanB]
    + 8-bin normalized luminance histogram (13 values)."""
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    lum = px.reshape(-1, 3).astype(np.float64) @ [0.299, 0.587, 0.114]
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 255.0))
    hist = hist.astype(np.float64)
    tot = hist.sum()
    if tot > 0:
        hist /= tot
    meta = {"media_type": "image", "format": fmt, "width": int(w),
            "height": int(h), "duration_ms": None, "sample_rate": None}
    return meta, ([w / 1e3, h / 1e3, *means.tolist()]
                  + hist.tolist())


def _decode_ppm(payload: bytes):
    """Parse a binary PPM (P6, maxval <= 255)."""
    px = _decode_ppm_pixels(payload)
    h, w = px.shape[:2]
    return _image_features(px, w, h, "ppm")


def _decode_ppm_pixels(payload: bytes) -> np.ndarray:
    pos = [0]

    def token():
        # skip whitespace and '#' comments
        while True:
            while pos[0] < len(payload) and payload[pos[0]:pos[0] + 1] \
                    .isspace():
                pos[0] += 1
            if payload[pos[0]:pos[0] + 1] == b"#":
                while pos[0] < len(payload) \
                        and payload[pos[0]] != 0x0A:
                    pos[0] += 1
                continue
            break
        start = pos[0]
        while pos[0] < len(payload) and not payload[pos[0]:pos[0] + 1] \
                .isspace():
            pos[0] += 1
        return payload[start:pos[0]]

    magic = token()
    if magic != b"P6":
        raise ValueError(f"not a binary PPM: magic {magic!r}")
    w, h, maxval = int(token()), int(token()), int(token())
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos[0] += 1                      # single whitespace after maxval
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                       offset=pos[0]).reshape(h, w, 3)
    return px


def _decode_bmp(payload: bytes):
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)."""
    px = _decode_bmp_pixels(payload)
    h, w = px.shape[:2]
    return _image_features(px, w, h, "bmp")


def _decode_bmp_pixels(payload: bytes) -> np.ndarray:
    import struct
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported "
                         f"(bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3,
                            offset=off).reshape(w, 3)
        rows.append(row[:, ::-1])     # BGR -> RGB
    px = np.stack(rows[::-1] if flipped else rows)
    return px


def _decode_png(payload: bytes):
    """Parse an 8-bit non-interlaced PNG (gray / RGB / RGBA) with
    nothing but stdlib ``zlib``: concatenate the IDAT chunks, inflate,
    and undo the per-scanline filters (None/Sub/Up/Average/Paeth —
    RFC 2083 §6). Palette, 16-bit, and interlaced PNGs raise (they
    need more machinery than a feature probe justifies); alpha is
    dropped, gray is replicated to RGB for the shared feature vector.
    """
    px = _decode_png_pixels(payload)
    h, w = px.shape[:2]
    return _image_features(px, w, h, "png")


def _decode_png_pixels(payload: bytes) -> np.ndarray:
    import struct
    import zlib
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise ValueError(
            f"only 8-bit non-interlaced gray/RGB/RGBA PNG supported "
            f"(depth={depth}, color_type={ctype}, "
            f"interlace={interlace})")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride,
                             r * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:                              # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):                      # Sub/Average/Paeth
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    if ctype == 0:
        px = np.repeat(out.reshape(h, w, 1), 3, axis=2)
    elif ctype == 2:
        px = out.reshape(h, w, 3)
    else:
        px = out.reshape(h, w, 4)[:, :, :3]
    return px


def _make_zigzag():
    """Stream-order -> natural-order index map for the 8x8 zigzag
    (ITU-T T.81 Figure 5 — generated, not transcribed)."""
    out = []
    for s in range(15):
        diag = [(s - q) * 8 + q
                for q in range(max(0, s - 7), min(s, 7) + 1)]
        out.extend(diag if s % 2 == 0 else diag[::-1])
    return out


_JPEG_ZZ = _make_zigzag()

#: orthonormal 1-D DCT-II basis: pixels = M.T @ coefs @ M
_IDCT_M = np.array(
    [[(np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
      * np.cos((2 * x + 1) * u * np.pi / 16)
      for x in range(8)] for u in range(8)])


class _JpegBits:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self._d, self._n = data, len(data)
        self._pos, self._cnt, self._cur = 0, 0, 0

    def bit(self) -> int:
        if self._cnt == 0:
            if self._pos >= self._n:
                raise ValueError("truncated JPEG scan data")
            self._cur = self._d[self._pos]
            self._pos += 1
            self._cnt = 8
        self._cnt -= 1
        return (self._cur >> self._cnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huffdec(br: _JpegBits, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s low bits back to a signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _decode_jpeg(payload: bytes):
    """Feature-vector wrapper over ``_decode_jpeg_pixels`` (same
    (meta, features) contract as the other image decoders)."""
    px = _decode_jpeg_pixels(payload)
    h, w = px.shape[:2]
    return _image_features(px, w, h, "jpeg")


def _decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0) decoder with nothing but
    stdlib + numpy — the public ITU-T T.81 spec end to end: marker
    parse (DQT 8/16-bit, multi-table DHT, DRI), per-MCU huffman
    entropy decode with byte-unstuffing and restart-marker handling,
    dequantize + de-zigzag, orthonormal 8x8 IDCT, chroma upsampling
    for any (Hi, Vi) sampling (4:4:4 / 4:2:2 / 4:2:0), and the JFIF
    YCbCr->RGB transform. Grayscale (1 component) replicates to RGB
    for the shared feature vector.

    Progressive (SOF2), arithmetic-coded, hierarchical, and 12-bit
    frames raise ValueError — baseline covers the overwhelming
    majority of wild JPEGs and everything a camera/`libjpeg` default
    emits. The per-bit Python loop makes this a correctness-grade
    decoder (fixtures, spot checks, small thumbnails): a production
    hot path would batch through a vectorized codec, but the Spark
    plumbing around it (Arrow batches, schema, partitioning) is
    identical either way."""
    import struct
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, qt, huff, frame, ri = 2, {}, {}, None, 0
    smap, scan_start = None, None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them so a padded-but-valid file still decodes
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        m = payload[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:                                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    tbl = struct.unpack_from(">64H", seg, i)
                    i += 128
                else:
                    tbl = tuple(seg[i:i + 64])
                    i += 64
                qt[tq] = np.array(tbl, dtype=np.float64)
        elif m == 0xC4:                                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = seg[i + 1:i + 17]
                i += 17
                total = sum(bits)
                vals = seg[i:i + total]
                i += total
                code, k, table = 0, 0, {}
                for lng in range(1, 17):
                    for _ in range(bits[lng - 1]):
                        table[(lng, code)] = vals[k]
                        k += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif m in (0xC0, 0xC1):                         # SOF0/1
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG (progressive/arithmetic/"
                "hierarchical) not supported — SOF0 baseline only")
        elif m == 0xDD:                                 # DRI
            ri = struct.unpack(">H", seg)[0]
        elif m == 0xDA:                                 # SOS
            ns = seg[0]
            smap = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                     seg[2 + 2 * c] & 15) for c in range(ns)]
            scan_start = pos
            break                  # entropy-coded data follows
        # APPn/COM/others: skipped
    if frame is None or smap is None:
        raise ValueError("JPEG missing SOF0/SOS")
    # split the entropy stream into restart segments, unstuffing FF00
    segs, cur, i = [], bytearray(), scan_start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break                  # next real marker (EOI, usually)
    segs.append(bytes(cur))
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps}
    preds = {c["id"]: 0 for c in comps}
    seg_i, br = 0, _JpegBits(segs[0])
    zz, M = _JPEG_ZZ, _IDCT_M
    for mcu in range(mcux * mcuy):
        if ri and mcu and mcu % ri == 0:    # restart: next segment,
            seg_i += 1                      # reset DC predictors
            br = _JpegBits(segs[seg_i])
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for cid, td, ta in smap:
            comp = by_id[cid]
            dct, act = huff[(0, td)], huff[(1, ta)]
            q = qt[comp["tq"]]
            for byy in range(comp["v"]):
                for bxx in range(comp["h"]):
                    coef = np.zeros(64)
                    s = _jpeg_huffdec(br, dct)
                    diff = _jpeg_extend(br.bits(s), s) if s else 0
                    preds[cid] += diff
                    coef[0] = preds[cid] * q[0]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huffdec(br, act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                       # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[zz[k]] = _jpeg_extend(br.bits(s), s) * q[k]
                        k += 1
                    px = M.T @ coef.reshape(8, 8) @ M + 128.0
                    r0 = (my * comp["v"] + byy) * 8
                    c0 = (mx * comp["h"] + bxx) * 8
                    planes[cid][r0:r0 + 8, c0:c0 + 8] = px
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        px = np.repeat(g.reshape(h, w, 1), 3, axis=2)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        px = np.clip(np.rint(np.stack([r, g, b], axis=2)),
                     0, 255).astype(np.uint8)
    else:
        raise ValueError(f"{len(full)}-component JPEG not supported")
    return px


def _detect_decode(payload: bytes, n_features: int, strict: bool):
    """Sniff the payload's magic bytes and run the REAL decoder when
    one exists; otherwise the deterministic fake (or raise under
    ``strict=True``). Returns (meta dict | None, feature list)."""
    decoder = None
    if payload:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            decoder = _decode_wav
        elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            decoder = _decode_avi
        elif payload[:2] == b"P6":
            decoder = _decode_ppm
        elif payload[:2] == b"BM":
            decoder = _decode_bmp
        elif payload[:8] == b"\x89PNG\r\n\x1a\n":
            decoder = _decode_png
        elif payload[:2] == b"\xff\xd8":
            decoder = _decode_jpeg
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            decoder = _decode_gif
        elif strict:
            raise NotImplementedError(
                "no stdlib decoder for this format (MP4/H.264-class "
                "codecs need ffmpeg, absent here); formats decoded "
                "for real: WAV, PPM (P6), BMP (24-bit), PNG (8-bit "
                "gray/RGB/RGBA), JPEG (baseline SOF0), GIF (87a/89a "
                "LZW), AVI (MJPEG video)")
    if decoder is None:
        return None, _fake_decode(bytes(payload or b""),
                                  n_features).tolist()
    try:
        meta, feats = decoder(bytes(payload))
    except Exception:
        # a recognized container with an unsupported sub-format
        # (progressive JPEG, 16-bit PNG, RLE BMP) or a truncated/
        # corrupt payload: strict surfaces the error, the default
        # falls back to the deterministic stub instead of failing the
        # whole Spark task over one bad row — a 100 TB corpus ALWAYS
        # contains malformed media
        if strict:
            raise
        return None, _fake_decode(bytes(payload), n_features).tolist()
    feats = feats[:n_features] + [0.0] * max(0, n_features - len(feats))
    return meta, [float(x) for x in feats]


def extract_features_real(frame_or_df, payload_col: str = "payload",
                          id_col: str = "media_id",
                          n_features: int = 32,
                          strict: bool = False) -> SparkFrame:
    """Decode + feature-extract with REAL stdlib decoders where the
    format allows (WAV / PPM / 24-bit BMP — magic-byte sniffed), the
    deterministic fake elsewhere (``strict=True`` raises instead).
    Emits the decoded metadata struct alongside the feature vector,
    so this is also the real ``media_info`` pass.

    Same Arrow plumbing as ``extract_features``: ``mapInPandas`` over
    record batches, payloads never leave the executor.
    """
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) \
        else frame_or_df
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("meta", MEDIA_METADATA_TYPE, True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decoded", T.BooleanType(), False)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats, decoded = [], [], []
            for p in pdf[payload_col]:
                m, f = _detect_decode(p, n_features, strict)
                metas.append(m)
                feats.append(f)
                decoded.append(m is not None)
            yield pd.DataFrame({id_col: pdf[id_col], "meta": metas,
                                "features": feats, "decoded": decoded})

    out = sdf.select(id_col, payload_col).mapInPandas(_extract,
                                                      schema=schema)
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# audio spectral features (framewise FFT over REAL decoded WAV samples)
# ---------------------------------------------------------------------------

def _spectral_summary(arr: np.ndarray, sr: int, n_fft: int = 2048,
                      hop: int = 512):
    """Framewise magnitude-spectrum summary of a mono signal — the
    standard audio-curation signals (centroid/bandwidth/rolloff/
    flatness, e.g. Peeters' CUIDADO feature set): Hann-windowed frames,
    ``numpy.fft.rfft``, power-weighted moments averaged over frames.
    Returns (n_frames, centroid_hz, bandwidth_hz, rolloff85_hz,
    flatness, rms)."""
    if arr.size == 0 or sr <= 0:
        return 0, None, None, None, None, None
    if arr.size < n_fft:
        arr = np.pad(arr, (0, n_fft - arr.size))
    n_frames = 1 + (arr.size - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = arr[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    psum = power.sum(axis=1)
    live = psum > 0
    if not live.any():
        return int(n_frames), None, None, None, None, 0.0
    p, ps = power[live], psum[live]
    centroid = (p @ freqs) / ps
    bandwidth = np.sqrt(
        (p * (freqs[None, :] - centroid[:, None]) ** 2).sum(axis=1)
        / ps)
    cum = np.cumsum(p, axis=1)
    roll_idx = (cum >= 0.85 * ps[:, None]).argmax(axis=1)
    rolloff = freqs[roll_idx]
    # spectral flatness: geometric / arithmetic mean of the power
    # spectrum (exp-mean-log with a tiny floor for silent bins)
    floor = np.maximum(p, 1e-30)
    flat = np.exp(np.mean(np.log(floor), axis=1)) / (ps / p.shape[1])
    rms = float(np.sqrt(np.mean(arr ** 2)))
    return (int(n_frames), float(centroid.mean()),
            float(bandwidth.mean()), float(rolloff.mean()),
            float(flat.mean()), rms)


def audio_spectral_features(frame_or_df, payload_col: str = "payload",
                            id_col: str = "media_id",
                            n_fft: int = 2048,
                            hop: int = 512) -> SparkFrame:
    """Audio feature extraction over a BINARY WAV column: decode with
    the real stdlib WAV reader, then framewise-FFT spectral summary —
    the signals an audio-corpus quality filter keys on (a hum/tone is
    low-flatness + stable centroid; clipped noise is high-flatness;
    silence is zero RMS). Non-WAV payloads pass through undecoded
    (``decoded = false``, NULL features) so the operator is safe on a
    mixed media table.

    100 TB posture: one ``mapInPandas`` pass — payloads never leave
    the executors, features are a few floats per file; the FFT is
    numpy-vectorized per Arrow batch. No shuffle at all.
    """
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) \
        else frame_or_df
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("centroid_hz", T.DoubleType(), True),
        T.StructField("bandwidth_hz", T.DoubleType(), True),
        T.StructField("rolloff85_hz", T.DoubleType(), True),
        T.StructField("flatness", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("decoded", T.BooleanType(), False)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if not (isinstance(p, (bytes, bytearray))
                            and p[:4] == b"RIFF"):
                        raise ValueError("not WAV")
                    meta, _ = _decode_wav(bytes(p))
                    import io
                    import wave
                    with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        sw = w.getsampwidth()
                        raw = w.readframes(w.getnframes())
                    dtype = {1: np.uint8, 2: np.dtype("<i2"),
                             4: np.dtype("<i4")}[sw]
                    arr = np.frombuffer(raw, dtype=dtype) \
                        .astype(np.float64)
                    if sw == 1:
                        arr -= 128.0
                    arr /= float(2 ** (8 * sw - 1))
                    if nch > 1:
                        arr = arr.reshape(-1, nch).mean(axis=1)
                    nfr, cen, bw, roll, flat, rms = _spectral_summary(
                        arr, sr, n_fft, hop)
                    rows.append((mid, sr, meta["duration_ms"], nfr,
                                 cen, bw, roll, flat, rms, True))
                except Exception:
                    rows.append((mid, None, None, None, None, None,
                                 None, None, None, False))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    out = sdf.select(id_col, payload_col).mapInPandas(_extract,
                                                      schema=schema)
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF container METADATA (real box parse; frame decode is
# the honest NotImplementedError — H.264/H.265 bitstreams need ffmpeg)
# ---------------------------------------------------------------------------

def _parse_mp4_boxes(data: bytes, start: int, end: int):
    """Iterate (box_type, payload_start, payload_end) over a box range
    of an ISO/IEC 14496-12 file. Handles 32-bit sizes, size==1
    (64-bit largesize) and size==0 (to end-of-enclosure)."""
    import struct
    off = start
    while off + 8 <= end:
        size = struct.unpack(">I", data[off:off + 4])[0]
        btype = data[off + 4:off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                break
            size = struct.unpack(">Q", data[off + 8:off + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            break
        yield btype, off + hdr, off + size
        off += size


def _decode_mp4_meta(payload: bytes):
    """REAL MP4/ISO-BMFF container metadata from the box structure —
    no codec work: brand (ftyp), movie duration/timescale (mvhd),
    per-track dimensions (tkhd) and sample-description codec fourccs
    (stsd). This is the metadata pass a video-corpus curation step
    needs (dedup by duration+dims+codec, drop non-video tracks);
    decoding actual FRAMES needs ffmpeg and stays NotImplementedError.
    """
    import struct
    n = len(payload)
    brand = None
    duration_ms = None
    width = height = None
    codecs: list[str] = []
    n_tracks = 0
    for btype, s, e in _parse_mp4_boxes(payload, 0, n):
        if btype == b"ftyp" and e - s >= 4:
            brand = payload[s:s + 4].decode("latin-1").strip()
        elif btype == b"moov":
            for t2, s2, e2 in _parse_mp4_boxes(payload, s, e):
                if t2 == b"mvhd" and e2 - s2 >= 20:
                    ver = payload[s2]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", payload[s2 + 20:s2 + 32])
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[s2 + 12:s2 + 20])
                    if ts:
                        duration_ms = int(round(dur / ts * 1000))
                elif t2 == b"trak":
                    n_tracks += 1
                    for t3, s3, e3 in _parse_mp4_boxes(payload, s2, e2):
                        if t3 == b"tkhd":
                            # width/height are the LAST 8 body bytes
                            # (16.16 fixed), after the 36-byte matrix:
                            # body offset 76 (v0) / 88 (v1)
                            ver = payload[s3]
                            base = s3 + (88 if ver == 1 else 76)
                            if base + 8 <= e3:
                                w16, h16 = struct.unpack(
                                    ">II", payload[base:base + 8])
                                w, h = w16 >> 16, h16 >> 16
                                if w and h:
                                    width, height = w, h
                        elif t3 == b"mdia":
                            for t4, s4, e4 in _parse_mp4_boxes(
                                    payload, s3, e3):
                                if t4 != b"minf":
                                    continue
                                for t5, s5, e5 in _parse_mp4_boxes(
                                        payload, s4, e4):
                                    if t5 != b"stbl":
                                        continue
                                    for t6, s6, e6 in _parse_mp4_boxes(
                                            payload, s5, e5):
                                        if t6 == b"stsd" and \
                                                e6 - s6 >= 16:
                                            codecs.append(
                                                payload[s6 + 12:s6 + 16]
                                                .decode("latin-1")
                                                .strip())
    if brand is None and duration_ms is None and not n_tracks:
        raise ValueError("not an ISO-BMFF payload")
    return {"media_type": "video", "format": brand or "mp4",
            "width": width, "height": height,
            "duration_ms": duration_ms, "sample_rate": None,
            "n_tracks": n_tracks, "codecs": codecs}


def video_container_meta(frame_or_df, payload_col: str = "payload",
                         id_col: str = "media_id") -> SparkFrame:
    """Video-corpus metadata pass: parse each BINARY payload's
    ISO-BMFF box structure (ftyp/moov/mvhd/tkhd/stsd) into
    (brand, duration_ms, width, height, n_tracks, codecs) — the keys a
    curation step dedups/filters on — without touching a codec. One
    ``mapInPandas`` scan, zero shuffle; malformed payloads surface
    ``parsed = false`` instead of failing the task."""
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) \
        else frame_or_df
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("brand", T.StringType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("codecs", T.ArrayType(T.StringType()), True),
        T.StructField("parsed", T.BooleanType(), False)])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = _decode_mp4_meta(bytes(p))
                    rows.append((mid, m["format"], m["duration_ms"],
                                 m["width"], m["height"],
                                 m["n_tracks"], m["codecs"], True))
                except Exception:
                    rows.append((mid, None, None, None, None, None,
                                 None, False))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    out = sdf.select(id_col, payload_col).mapInPandas(_extract,
                                                      schema=schema)
    return SparkFrame(out)


# ---------------------------------------------------------------------------
# GIF decoder (pure stdlib: GIF87a/89a LZW per the public GIF spec)
# ---------------------------------------------------------------------------

def _gif_lzw_decode(min_code_size: int, data: bytes,
                    n_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size + 1``, LSB-first bit packing, CLEAR resets the
    dictionary, width grows after the dictionary fills, capped at 12
    bits."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset():
        return ({i: (i,) for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, width = reset()
    out: list[int] = []
    acc = nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, next_code, width = reset()
                prev = None
                continue
            if code == eoi:
                return out[:n_pixels]
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)   # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out[:n_pixels]


def _deinterlace_gif(rows: list, h: int) -> list:
    """GIF 4-pass interlace: rows appear in passes starting at
    0/4/2/1 with strides 8/8/4/2."""
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    out = [None] * h
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def _decode_gif(payload: bytes):
    """Decode the FIRST frame of a GIF87a/89a payload to RGB pixels
    via pure-stdlib LZW (public GIF specification), honoring global/
    local color tables and the 4-pass interlace; emits the shared
    image feature vector."""
    px = _decode_gif_pixels(payload)
    h, w = px.shape[:2]
    return _image_features(px.astype(np.float64), w, h, "gif")


def _decode_gif_pixels(payload: bytes) -> np.ndarray:
    import struct
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[off:off + 3 * n]
        off += 3 * n
    while off < len(payload):
        b = payload[off]
        if b == 0x21:                       # extension: skip sub-blocks
            off += 2
            while payload[off] != 0:
                off += 1 + payload[off]
            off += 1
        elif b == 0x2C:                     # image descriptor
            _lx, _ty, w, h, ip = struct.unpack("<HHHHB",
                                               payload[off + 1:off + 10])
            off += 10
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                pal = payload[off:off + 3 * n]
                off += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            mcs = payload[off]
            off += 1
            chunks = []
            while payload[off] != 0:
                ln = payload[off]
                chunks.append(payload[off + 1:off + 1 + ln])
                off += 1 + ln
            idx = _gif_lzw_decode(mcs, b"".join(chunks), w * h)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            rows = [idx[r * w:(r + 1) * w] for r in range(h)]
            if ip & 0x40:
                rows = _deinterlace_gif(rows, h)
            flat = [i for row in rows for i in row]
            px = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[
                np.asarray(flat, dtype=np.int64)].reshape(h, w, 3)
            return px
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF payload holds no image frame")


# ---------------------------------------------------------------------------
# REAL video decode (round 10): MJPEG inside an AVI/RIFF container —
# the RIFF walk is pure stdlib and the frame chunks are baseline JPEGs
# our own decoder handles, so for this codec the video path is genuinely
# real end to end. H.264/H.265 bitstreams still need ffmpeg (absent
# here) and keep the honest strict-mode error.
# ---------------------------------------------------------------------------

def _parse_avi_frames(payload: bytes):
    """Walk a RIFF/'AVI ' container (public MS RIFF/AVI spec): returns
    the ``avih`` main header fields and the video frame chunks
    ('##dc'/'##db' entries of the movi LIST, in file order). Chunks
    pad to even offsets; truncated tails stop the walk cleanly."""
    import struct
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' missing)")
    avih: dict | None = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal avih
        pos = start
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            sz = struct.unpack_from("<I", payload, pos + 4)[0]
            body_s, body_e = pos + 8, pos + 8 + sz
            if body_e > end:
                break                          # truncated chunk
            if cid == b"LIST":
                walk(body_s + 4, body_e)       # skip the list type id
            elif cid == b"avih" and sz >= 40:
                (uspf, _mbps, _pad, _flags, total, _init, _streams,
                 _bufsz, w, h) = struct.unpack_from("<10I", payload,
                                                    body_s)
                avih = {"us_per_frame": uspf, "total_frames": total,
                        "width": w, "height": h}
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(payload[body_s:body_e])
            pos = body_e + (sz & 1)            # even alignment
    walk(12, len(payload))
    if avih is None:
        raise ValueError("AVI: missing avih main header")
    return avih, frames


def _decode_avi(payload: bytes):
    """MJPEG-in-AVI video decode: meta from the main header (width/
    height/duration), features = the FIRST frame's shared image
    features + [n_frames/1e3, fps/1e2]. A non-MJPEG stream raises
    (H.264-class codecs need ffmpeg)."""
    avih, frames = _parse_avi_frames(payload)
    if not frames:
        raise ValueError("AVI: no video frame chunks")
    if frames[0][:2] != b"\xff\xd8":
        raise ValueError(
            "AVI: non-MJPEG video stream (needs ffmpeg, absent here)")
    px = _decode_jpeg_pixels(frames[0])
    h, w = px.shape[:2]
    meta, feats = _image_features(px.astype(np.float64), w, h,
                                  "avi-mjpeg")
    us = int(avih.get("us_per_frame") or 0)
    meta = {**meta, "media_type": "video",
            "duration_ms": (len(frames) * us) // 1000 if us else None}
    return meta, feats + [len(frames) / 1e3,
                          (1e6 / us) / 1e2 if us else 0.0]


def video_frames_real(frame_or_df, payload_col: str = "payload",
                      id_col: str = "media_id", every_n: int = 1,
                      max_frames: int = 8,
                      strict: bool = False) -> SparkFrame:
    """REAL video frame sampling for MJPEG AVIs: decode every
    *every_n*-th frame chunk (at most *max_frames* per video) and emit
    one row per decoded frame with its index, dimensions, and mean
    RGB — the codec-seek path ``frame_sample`` stubs with byte
    slicing. ``mapInPandas`` over Arrow batches; payloads never leave
    the executor. Non-AVI / non-MJPEG payloads yield no rows by
    default (``strict=True`` raises instead — a 100 TB corpus always
    contains malformed media)."""
    sdf = frame_or_df.spark_df if isinstance(frame_or_df, SparkFrame) \
        else frame_or_df
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (id_col, "frame_index", "width",
                                    "height", "mean_r", "mean_g",
                                    "mean_b")}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _avih, frames = _parse_avi_frames(bytes(p))
                    picks = list(enumerate(frames))[::max(1, every_n)]
                    for idx, fr in picks[:max_frames]:
                        px = _decode_jpeg_pixels(fr).astype(np.float64)
                        h, w = px.shape[:2]
                        means = px.reshape(-1, 3).mean(axis=0)
                        rows[id_col].append(int(mid))
                        rows["frame_index"].append(int(idx))
                        rows["width"].append(int(w))
                        rows["height"].append(int(h))
                        rows["mean_r"].append(float(means[0]))
                        rows["mean_g"].append(float(means[1]))
                        rows["mean_b"].append(float(means[2]))
                except Exception:
                    if strict:
                        raise
            yield pd.DataFrame(rows)

    out = sdf.select(id_col, payload_col).mapInPandas(gen,
                                                      schema=schema)
    return SparkFrame(out)
