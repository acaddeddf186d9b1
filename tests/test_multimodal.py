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


def test_resize_is_real_now():
    # round 10 replaced the resize stub with the pure-numpy
    # resize_images_real operator (see TestRealResize); the stub and
    # its NotImplementedError are gone
    assert not hasattr(MM, "resize_stub")
    assert callable(MM.resize_images_real)


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
            (4, b"\x00UNKNOWNMAGICnotdecodable")]
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
    # unknown format: falls back to the deterministic fake
    unk = out[4]
    assert not unk.decoded and unk.meta is None
    assert len(unk.features) == 16
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


# ---------------------------------------------------------------------------
# baseline JPEG decode (round 9): a minimal VALID encoder lives here in
# the tests (flat quant=1 so coding is near-lossless; simple canonical
# huffman tables — 12x4-bit DC codes, 255x9-bit + 1x10-bit AC codes —
# a legal T.81 table set that is NOT the decoder's code path), plus
# analytic constant-image checks that pin the IDCT scaling
# independently of the encoder.
# ---------------------------------------------------------------------------

def _jpeg_codes(bits, vals):
    code, k, out = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return out


_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_AC_VALS = list(range(256))


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)     # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _cat(v):
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_jpeg(px, subsample=False, restart_interval=0):
    """Encode an RGB uint8 array as baseline JPEG: flat quant=1,
    4:4:4 or 4:2:0 (2x2-mean chroma), optional restart markers."""
    import struct

    import numpy as np
    from cl_data_frame_spark.operators.multimodal import _IDCT_M, _JPEG_ZZ
    h, w = px.shape[:2]
    rgb = px.astype(np.float64)
    y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
         + 0.114 * rgb[:, :, 2])
    cb = (128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
          + 0.5 * rgb[:, :, 2])
    cr = (128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
          - 0.081312 * rgb[:, :, 2])
    if subsample:
        assert h % 2 == 0 and w % 2 == 0
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax, vmax = max(s[0] for s in samp), max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def padded(p, sh, sv):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        out = np.zeros((th, tw))
        ph, pw = p.shape
        out[:ph, :pw] = p
        out[ph:, :pw] = p[-1:, :]             # edge replicate
        out[:, pw:] = out[:, pw - 1:pw]
        return out

    planes = [padded(p, s[0], s[1]) for p, s in zip(planes, samp)]
    dc_codes = _jpeg_codes(_DC_BITS, _DC_VALS)
    ac_codes = _jpeg_codes(_AC_BITS, _AC_VALS)
    M = _IDCT_M

    bw = _JpegBitWriter()
    preds = [0, 0, 0]
    scan = bytearray()
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad()
            scan += bw.buf
            bw = _JpegBitWriter()
            scan += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            preds = [0, 0, 0]
        my, mx = divmod(mcu, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
            for by in range(sv):
                for bx in range(sh):
                    r0 = (my * sv + by) * 8
                    c0 = (mx * sh + bx) * 8
                    blk = p[r0:r0 + 8, c0:c0 + 8] - 128.0
                    coef = M @ blk @ M.T
                    q = np.rint(coef).astype(int).reshape(64)
                    zz = [q[i] for i in _JPEG_ZZ]
                    diff = zz[0] - preds[ci]
                    preds[ci] = zz[0]
                    s = _cat(diff)
                    ln, code = dc_codes[s]
                    bw.put(code, ln)
                    if s:
                        v = diff if diff >= 0 else diff + (1 << s) - 1
                        bw.put(v, s)
                    run = 0
                    for k in range(1, 64):
                        v = zz[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[0xF0]     # ZRL
                            bw.put(code, ln)
                            run -= 16
                        s = _cat(v)
                        ln, code = ac_codes[(run << 4) | s]
                        bw.put(code, ln)
                        vv = v if v >= 0 else v + (1 << s) - 1
                        bw.put(vv, s)
                        run = 0
                    if run:
                        ln, code = ac_codes[0x00]          # EOB
                        bw.put(code, ln)
    bw.pad()
    scan += bw.buf

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + b"".join(
        bytes([i + 1, (s[0] << 4) | s[1], 0])
        for i, s in enumerate(samp)))
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
              + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = seg(0xDA, bytes([3]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(3)) + bytes([0, 63, 0]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(scan)
            + b"\xff\xd9")


def _test_pattern(h, w, seed=7):
    import numpy as np
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = rng.randint(0, 256, (h, w), dtype=np.uint8)
    return np.stack([r, g, b], axis=2)


def test_jpeg_constant_images_decode_exactly():
    """Analytic golden pixels independent of the encoder's DCT: a
    constant image has ONLY a DC coefficient (8*(v-128) at quant=1),
    so any IDCT scaling error shows up as a wrong constant."""
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import \
        _decode_jpeg_pixels
    for v in (0, 1, 127, 128, 200, 255):
        px = np.full((8, 8, 3), v, dtype=np.uint8)
        got = _decode_jpeg_pixels(_encode_jpeg(px))
        assert got.shape == (8, 8, 3)
        assert int(np.max(np.abs(got.astype(int) - int(v)))) <= 1, v


def test_jpeg_roundtrip_444_gradient():
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import \
        _decode_jpeg_pixels
    px = _test_pattern(16, 24)
    got = _decode_jpeg_pixels(_encode_jpeg(px))
    assert got.shape == px.shape
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4          # flat quant=1: rounding noise only


def test_jpeg_roundtrip_420_subsampled_and_restarts():
    """4:2:0 chroma subsampling with constant chroma (exactly
    recoverable) + restart markers every 2 MCUs."""
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import \
        _decode_jpeg_pixels
    h, w = 16, 48                 # 1x3 MCUs at 4:2:0
    yy, xx = np.mgrid[0:h, 0:w]
    lum = (xx * 4 + yy * 2).astype(np.uint8)
    px = np.stack([lum, lum, lum], axis=2)   # gray -> constant chroma
    got = _decode_jpeg_pixels(_encode_jpeg(px, subsample=True,
                                           restart_interval=2))
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.max() <= 4
    # odd-size crop: 4:4:4 at non-multiple-of-8 dims decodes cropped
    px2 = _test_pattern(10, 13)
    got2 = _decode_jpeg_pixels(_encode_jpeg(px2))
    assert got2.shape == (10, 13, 3)
    assert np.abs(got2.astype(int) - px2.astype(int)).max() <= 4


def test_jpeg_rejects_progressive_and_detect_integration(spark):
    import numpy as np
    import pytest
    from cl_data_frame_spark.operators import multimodal as MM
    payload = _encode_jpeg(_test_pattern(8, 8))
    prog = bytearray(payload)
    i = payload.index(b"\xff\xc0")
    prog[i + 1] = 0xC2            # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        MM._decode_jpeg_pixels(bytes(prog))
    # strict detect path now decodes JPEG for real
    media = spark.createDataFrame([(1, bytearray(payload))],
                                  "media_id bigint, payload binary")
    out = MM.extract_features_real(media, strict=True).spark_df.collect()
    assert len(out) == 1 and out[0]["decoded"]
    assert out[0]["meta"]["format"] == "jpeg"
    assert out[0]["meta"]["width"] == 8
    feats = out[0]["features"]
    assert abs(feats[0] - 0.008) < 1e-6      # w/1e3


def test_detect_decode_nonstrict_falls_back_on_bad_payload(spark):
    """A recognized container with an unsupported sub-format or a
    truncated payload must NOT fail the Spark task under the default
    (non-strict) path — it falls back to the deterministic stub."""
    from cl_data_frame_spark.operators import multimodal as MM
    payload = _encode_jpeg(_test_pattern(8, 8))
    prog = bytearray(payload)
    i = payload.index(b"\xff\xc0")
    prog[i + 1] = 0xC2                    # progressive SOF2
    rows = [(1, bytes(prog)),             # unsupported sub-format
            (2, payload[:40]),            # truncated JPEG
            (3, b"\x89PNG\r\n\x1a\nxx")]  # truncated PNG
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in
           MM.extract_features_real(df, n_features=8)
           .spark_df.collect()}
    assert all(not out[k].decoded for k in (1, 2, 3))
    assert all(len(out[k].features) == 8 for k in (1, 2, 3))
    # strict still surfaces the real error
    import pytest
    with pytest.raises(Exception, match="baseline"):
        MM.extract_features_real(
            spark.createDataFrame([(9, bytes(prog))],
                                  "media_id bigint, payload binary"),
            strict=True).spark_df.collect()


def test_jpeg_roundtrip_fuzz():
    """Property fuzz over the encoder/decoder pair: random dims
    (including non-multiples of 8), random content, 4:4:4 vs 4:2:0,
    with and without restart intervals — decode must round-trip
    within flat-quant rounding error everywhere."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import \
        _decode_jpeg_pixels

    @given(h=st.integers(6, 26), w=st.integers(6, 26),
           sub=st.booleans(), ri=st.integers(0, 3),
           seed=st.integers(0, 1000))
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[
                  HealthCheck.function_scoped_fixture])
    def check(h, w, sub, ri, seed):
        if sub:
            h, w = (h + 1) // 2 * 2, (w + 1) // 2 * 2  # even dims
        rng = np.random.RandomState(seed)
        if sub:
            # constant chroma (gray) so 2x2 subsampling is exact
            lum = rng.randint(0, 256, (h, w), dtype=np.uint8)
            px = np.stack([lum, lum, lum], axis=2)
        else:
            px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        got = _decode_jpeg_pixels(_encode_jpeg(px, subsample=sub,
                                               restart_interval=ri))
        assert got.shape == px.shape
        err = np.abs(got.astype(int) - px.astype(int)).max()
        assert err <= 4, (h, w, sub, ri, seed, err)

    check()


class TestAudioSpectralFeatures:
    """Framewise-FFT spectral summary over real decoded WAV samples."""

    def test_pure_tone_centroid_matches_frequency(self, spark):
        wav = _make_wav(freq=1000.0, sr=8000, seconds=0.5)
        df = spark.createDataFrame([(1, wav)],
                                   "media_id long, payload binary")
        row = MM.audio_spectral_features(df).spark_df.collect()[0]
        assert row["decoded"] is True
        assert row["sample_rate"] == 8000
        # a pure 1 kHz sine concentrates its power at 1 kHz: the
        # centroid lands within one FFT bin (8000/2048 ~ 3.9 Hz plus
        # window leakage)
        assert abs(row["centroid_hz"] - 1000.0) < 25.0
        assert row["bandwidth_hz"] < 100.0        # narrowband
        assert abs(row["rolloff85_hz"] - 1000.0) < 30.0
        assert row["flatness"] < 0.01             # tonal, not noisy
        assert abs(row["rms"] - 0.5 / 2 ** 0.5) < 0.01  # sine RMS

    def test_two_tone_centroid_between_and_noise_flatness(self, spark):
        import io
        import struct
        import wave

        import numpy as np
        # deterministic "noise": a dense multitone from a fixed lcg
        sr, n = 8000, 8000
        state, vals = 12345, []
        for _ in range(n):
            state = (1103515245 * state + 12345) % (1 << 31)
            vals.append(state / float(1 << 31) - 0.5)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(b"".join(
                struct.pack("<h", int(v * 32767)) for v in vals))
        noise = buf.getvalue()
        lo = _make_wav(freq=500.0, sr=8000, seconds=0.5)
        hi = _make_wav(freq=2000.0, sr=8000, seconds=0.5)
        df = spark.createDataFrame(
            [(1, lo), (2, hi), (3, noise), (4, b"not a wav")],
            "media_id long, payload binary")
        out = {r["media_id"]: r for r in
               MM.audio_spectral_features(df).spark_df.collect()}
        assert out[1]["centroid_hz"] < out[2]["centroid_hz"]
        # broadband "noise" is far flatter and wider than any tone
        assert out[3]["flatness"] > 10 * out[2]["flatness"]
        assert out[3]["bandwidth_hz"] > 5 * out[2]["bandwidth_hz"]
        # non-WAV payloads pass through undecoded, not crashing
        assert out[4]["decoded"] is False
        assert out[4]["centroid_hz"] is None

    def test_spectral_summary_numpy_matches_parseval(self):
        import numpy as np
        sr = 8000
        t = np.arange(4096) / sr
        arr = 0.25 * np.sin(2 * np.pi * 1234.0 * t)
        nfr, cen, bw, roll, flat, rms = MM._spectral_summary(arr, sr)
        assert nfr == 1 + (4096 - 2048) // 512
        assert abs(cen - 1234.0) < 25.0
        assert abs(rms - 0.25 / 2 ** 0.5) < 1e-3
        # silence: frames exist but no live power
        z = np.zeros(4096)
        nfr0, cen0, *_rest, rms0 = MM._spectral_summary(z, sr)
        assert cen0 is None and rms0 == 0.0


def _make_mp4(timescale=1000, duration=5000, w=640, h=360,
              codec=b"avc1", brand=b"isom"):
    """Minimal ISO-BMFF container: ftyp + moov{mvhd, trak{tkhd,
    mdia{minf{stbl{stsd(codec)}}}}} — structurally valid boxes, no
    media data."""
    import struct

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd = box(b"mvhd", bytes(4)                      # version/flags
               + bytes(8)                             # ctime/mtime
               + struct.pack(">II", timescale, duration)
               + bytes(80))
    tkhd = box(b"tkhd", bytes(76)                     # v0 body pre-dims
               + struct.pack(">II", w << 16, h << 16))
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1)
               + box(codec, bytes(70)))
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


class TestVideoContainerMeta:
    def test_parses_brand_duration_dims_codec(self, spark):
        mp4 = _make_mp4()
        df = spark.createDataFrame(
            [(1, mp4), (2, b"garbage"), (3, _make_wav())],
            "media_id long, payload binary")
        out = {r["media_id"]: r for r in
               MM.video_container_meta(df).spark_df.collect()}
        r = out[1]
        assert r["parsed"] is True
        assert r["brand"] == "isom"
        assert r["duration_ms"] == 5000
        assert (r["width"], r["height"]) == (640, 360)
        assert r["n_tracks"] == 1
        assert r["codecs"] == ["avc1"]
        # non-BMFF payloads surface parsed=false, not a task failure
        assert out[2]["parsed"] is False
        assert out[3]["parsed"] is False

    def test_64bit_size_and_v1_mvhd(self):
        import struct

        def box64(t, payload):
            return (struct.pack(">I", 1) + t
                    + struct.pack(">Q", 16 + len(payload)) + payload)

        body = (bytes([1]) + bytes(3)          # version=1
                + bytes(16)                    # 64-bit ctime/mtime
                + struct.pack(">IQ", 48000, 96000)   # ts, dur (2 s)
                + bytes(80))
        mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
        moov = box64(b"moov", mvhd)
        meta = MM._decode_mp4_meta(
            struct.pack(">I", 16) + b"ftyp" + b"mp42" + bytes(4)
            + moov)
        assert meta["duration_ms"] == 2000
        assert meta["format"] == "mp42"


def _lzw_pack(codes, width_start):
    """LSB-first bit packing at FIXED width (valid when every code is
    preceded by a clear, which pins the width)."""
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width_start
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _make_gif(pixels, w, h, palette, interlace=False):
    """Hand-built GIF89a: 2-bit-min global color table, each pixel code
    preceded by a CLEAR (keeps the LZW width fixed — valid, just
    uncompressed)."""
    import struct
    mcs = 2
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pal = bytearray()
    for rgb in palette:
        pal.extend(rgb)
    while len(pal) < 3 * 4:
        pal.extend((0, 0, 0))
    codes = []
    for p in pixels:
        codes += [clear, p]
    codes.append(eoi)
    data = _lzw_pack(codes, mcs + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # GCT, 4 ent
    out += pal[:12]
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(mcs)
    out += bytes([len(data)]) + data + b"\x00"
    out += b"\x3B"
    return bytes(out)


class TestGifDecoder:
    PALETTE = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]

    def test_golden_pixels_2x2(self):
        gif = _make_gif([0, 1, 2, 3], 2, 2, self.PALETTE)
        meta, feats = MM._decode_gif(gif)
        assert (meta["width"], meta["height"]) == (2, 2)
        assert meta["format"] == "gif"
        # mean channel values over [red, green, blue, white] pixels:
        # R: (255+0+0+255)/4/255, G: same, B: same = 0.5 each
        assert feats[2:5] == [0.5, 0.5, 0.5]

    def test_interlaced_rows_reordered(self):
        # 1x4 column, final rows must read [0,1,2,3]; interlaced file
        # order for h=4 is [0,2,1,3]
        gif = _make_gif([0, 2, 1, 3], 1, 4, self.PALETTE,
                        interlace=True)
        import numpy as np
        meta, feats = MM._decode_gif(gif)
        assert (meta["width"], meta["height"]) == (1, 4)
        plain = _make_gif([0, 1, 2, 3], 1, 4, self.PALETTE)
        assert MM._decode_gif(plain)[1] == feats  # same image

    def test_lzw_kwkwk_case(self):
        # stream [clear, 1, next_code, EOI] at mcs=2 exercises the
        # cScSc corner: code == next_code -> prev + prev[0]
        packed = _lzw_pack([4, 1, 6, 5], 3)
        assert MM._gif_lzw_decode(2, packed, 3) == [1, 1, 1]

    def test_real_extract_routes_gif(self, spark):
        gif = _make_gif([0, 0, 3, 3], 2, 2, self.PALETTE)
        df = spark.createDataFrame([(1, gif)],
                                   "media_id long, payload binary")
        row = MM.extract_features_real(df).spark_df.collect()[0]
        assert row["decoded"] is True
        assert row["meta"]["format"] == "gif"
        assert row["meta"]["width"] == 2


def test_gif_roundtrip_fuzz():
    """Property: any small indexed image round-trips bit-exactly
    through the literal-code GIF encoder and _decode_gif (channel
    means computed from the exact palette entries)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 6),
           st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255),
                              st.integers(0, 255)),
                    min_size=4, max_size=4),
           st.data())
    def check(w, h, palette, data):
        pixels = [data.draw(st.integers(0, 3)) for _ in range(w * h)]
        gif = _make_gif(pixels, w, h, palette)
        meta, feats = MM._decode_gif(gif)
        assert (meta["width"], meta["height"]) == (w, h)
        px = np.array([palette[p] for p in pixels], dtype=np.float64)
        want = px.mean(axis=0) / 255.0
        assert np.allclose(feats[2:5], want)

    check()


def test_jpeg_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker; a padded-but-valid file must still really decode instead
    of silently degrading to stub features (round-10 advisor find)."""
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import \
        _decode_jpeg_pixels
    px = np.full((8, 8, 3), 200, dtype=np.uint8)
    enc = _encode_jpeg(px)
    # inject fill bytes after SOI (before the next marker's 0xFF) and
    # again before the EOI marker at the end of the stream
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    padded = (b"\xff\xd8" + b"\xff" * 3 + enc[2:-2]
              + b"\xff" * 2 + b"\xff\xd9")
    got = _decode_jpeg_pixels(padded)
    assert got.shape == (8, 8, 3)
    assert int(np.max(np.abs(got.astype(int) - 200))) <= 1


# --- MJPEG-in-AVI video (round 10): a minimal VALID RIFF/AVI writer
# lives here in the tests so the decoder is checked against an
# independent construction (same pattern as the JPEG encoder above)

def _encode_avi(frames_px, us_per_frame=40_000):
    """Pack RGB uint8 arrays as an MJPEG AVI: RIFF('AVI ') -> LIST
    hdrl(avih) + LIST movi('00dc' JPEG chunks), even-padded."""
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    h, w = frames_px[0].shape[:2]
    avih = struct.pack("<10I", us_per_frame, 0, 0, 0,
                       len(frames_px), 0, 1, 0, w, h) + b"\x00" * 16
    hdrl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"avih", avih))) + b"hdrl" \
        + chunk(b"avih", avih)
    movi_body = b"".join(chunk(b"00dc", _encode_jpeg(px))
                         for px in frames_px)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" \
        + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_decodes_for_real():
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import _decode_avi
    frames = [np.full((8, 16, 3), v, dtype=np.uint8)
              for v in (40, 120, 200)]
    meta, feats = _decode_avi(_encode_avi(frames))
    assert meta["media_type"] == "video"
    assert meta["format"] == "avi-mjpeg"
    assert (meta["width"], meta["height"]) == (16, 8)
    assert meta["duration_ms"] == 120          # 3 frames x 40ms
    # first-frame means: constant 40 -> ~40/255
    assert abs(feats[2] - 40 / 255.0) < 0.01
    assert feats[-2] == 3 / 1e3                # n_frames
    assert abs(feats[-1] - 25 / 1e2) < 1e-9    # fps


def test_avi_strict_errors_and_fallback():
    import struct
    import pytest
    from cl_data_frame_spark.operators.multimodal import (
        _decode_avi, _parse_avi_frames)
    with pytest.raises(ValueError, match="not an AVI"):
        _decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # a non-MJPEG stream raises instead of fake-decoding garbage
    import numpy as np
    fake = _encode_avi([np.zeros((8, 8, 3), dtype=np.uint8)])
    # corrupt the frame chunk to a non-JPEG payload, keeping sizes
    bad = fake.replace(b"\xff\xd8", b"\x00\x01", 1)
    with pytest.raises(ValueError, match="non-MJPEG"):
        _decode_avi(bad)
    # truncated tail: the walk stops cleanly, header still parses
    avih, frames = _parse_avi_frames(fake[:len(fake) - 7])
    assert avih["width"] == 8


def test_video_frames_real_samples_frames(spark):
    import numpy as np
    from cl_data_frame_spark.operators.multimodal import (
        video_frames_real)
    vals = [30, 90, 150, 210]
    avi = _encode_avi([np.full((8, 8, 3), v, dtype=np.uint8)
                       for v in vals])
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not media"))],
        "media_id long, payload binary")
    got = sorted(video_frames_real(df, every_n=2).spark_df.collect(),
                 key=lambda r: r.frame_index)
    # every 2nd frame of video 1; the junk payload yields no rows
    assert [(r.media_id, r.frame_index) for r in got] == [(1, 0),
                                                          (1, 2)]
    for r, v in zip(got, (30, 150)):
        assert (r.width, r.height) == (8, 8)
        assert abs(r.mean_r - v) <= 1.0
    # strict surfaces the junk payload instead of skipping it
    import pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401
    with pytest.raises(Exception):
        video_frames_real(df, strict=True).spark_df.collect()


class TestRealResize:
    """Round 10: pure-numpy image resize over the stdlib decoders —
    the former resize stub is now a real thumbnail/normalize pass."""

    def test_nearest_downscale_solid_blocks_exact(self):
        import numpy as np
        from cl_data_frame_spark.operators.multimodal import (
            _decode_ppm_pixels, _encode_ppm, _resize_pixels)
        # a 4x4 quadrant image downsampled 2x with nearest picks one
        # pixel per quadrant — exact values, no interpolation
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        px[:2, :2] = 10
        px[:2, 2:] = 60
        px[2:, :2] = 110
        px[2:, 2:] = 160
        out = _resize_pixels(px, 2, 2, "nearest")
        assert out.tolist() == [[[10] * 3, [60] * 3],
                                [[110] * 3, [160] * 3]]
        # PPM round-trip is lossless
        rt = _decode_ppm_pixels(_encode_ppm(out))
        assert (rt == out).all()

    def test_bilinear_constant_image_stays_constant(self):
        import numpy as np
        from cl_data_frame_spark.operators.multimodal import (
            _resize_pixels)
        px = np.full((5, 7, 3), 123, dtype=np.uint8)
        for tw, th in ((14, 10), (3, 2), (7, 5)):
            out = _resize_pixels(px, tw, th, "bilinear")
            assert out.shape == (th, tw, 3)
            assert (out == 123).all()
        # 2x upscale of a ramp stays monotone within rows
        ramp = np.tile(np.arange(0, 80, 10, dtype=np.uint8)
                       .reshape(1, 8, 1), (4, 1, 3))
        up = _resize_pixels(ramp, 16, 8, "bilinear")
        for row in up[:, :, 0]:
            assert all(a <= b for a, b in zip(row, row[1:]))

    def test_resize_operator_all_formats_and_fallback(self, spark):
        import numpy as np
        from cl_data_frame_spark.operators.multimodal import (
            _decode_ppm_pixels, _encode_ppm, resize_images_real)
        px = np.full((8, 8, 3), 200, dtype=np.uint8)
        payloads = [
            (1, bytearray(_encode_ppm(px))),          # ppm
            (2, bytearray(_encode_jpeg(px))),          # jpeg
            (3, bytearray(b"junk-not-an-image")),      # fallback
        ]
        df = spark.createDataFrame(payloads,
                                   "media_id long, payload binary")
        got = {r.media_id: r for r in
               resize_images_real(df, 4, 4).spark_df.collect()}
        for mid, fmt in ((1, "ppm"), (2, "jpeg")):
            r = got[mid]
            assert r.resized and r.src_format == fmt
            assert (r.src_width, r.src_height) == (8, 8)
            out = _decode_ppm_pixels(bytes(r.payload))
            assert out.shape == (4, 4, 3)
            assert int(np.abs(out.astype(int) - 200).max()) <= 1
        assert not got[3].resized
        assert bytes(got[3].payload) == b"junk-not-an-image"
        import pytest
        with pytest.raises(Exception):
            resize_images_real(df, 4, 4, strict=True) \
                .spark_df.collect()
