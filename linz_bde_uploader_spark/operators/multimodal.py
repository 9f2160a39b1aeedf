"""Multimodal column operators: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The decode step is REAL: pure-Python/numpy codecs for three open
formats that need no external libraries —

- ``image/bmp``   24-bit uncompressed Windows BMP (BITMAPINFOHEADER,
                  BGR byte order, bottom-up rows, 4-byte row padding;
                  top-down negative-height variant accepted)
- ``image/x-ppm`` binary PPM (P6, maxval 255)
- ``audio/wav``   RIFF/WAVE PCM 16-bit (mono or interleaved)
- ``video/x-fvid`` a minimal length-prefixed container of BMP frames
                  (stand-in for a demuxer: real frame *offsets*, real
                  per-frame image decode)

Payloads whose mime none of the codecs claim fall back to byte-level
statistics — graceful, never an exception, so a heterogeneous media
table flows through in one pass. A production deployment would
register richer codecs (libjpeg/ffmpeg) in ``_DECODERS``; every
Spark-side piece — schema, batching, partitioning, UDF signatures —
is unchanged by that swap.

Scale notes: payloads are large -> never groupBy/shuffle raw bytes.
Decode + feature extraction are mapInPandas (no shuffle, Arrow
batches); downstream joins use media_id + features only.
spark.sql.execution.arrow.maxRecordsPerBatch bounds Arrow memory for
big payloads.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("mime", T.StringType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload_sha256", T.StringType()),
    T.StructField("payload_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_payload", T.BinaryType()),
])

DECODE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_units", T.LongType()),
    T.StructField("mean_a", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("mean_c", T.DoubleType()),
])


# ------------------------------------------------------------- codecs
# Pure-Python encoders/decoders. Format references are the public
# specs (Windows BMP file format, Netpbm P6, RIFF/WAVE); no external
# codec library is involved.


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    # BMP stores rows bottom-up in BGR order
    bgr = pixels[::-1, :, ::-1]
    body = bytearray()
    zeros = b"\x00" * pad
    for r in bgr:
        body += r.tobytes() + zeros
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB array from a 24-bit uncompressed BMP
    (bottom-up or top-down)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    size, w, h_signed, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    h = abs(h_signed)
    row = w * 3
    stride = row + ((-row) % 4)
    rows = []
    for r in range(h):
        start = offset + r * stride
        rows.append(np.frombuffer(data, np.uint8, row, start).reshape(w, 3))
    arr = np.stack(rows)
    if h_signed > 0:  # bottom-up: first stored row is the bottom
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def decode_ppm(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a binary PPM (P6, maxval 255)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end:end + 1].isspace():
            end += 1
        fields.append(int(data[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    return np.frombuffer(data, np.uint8, w * h * 3, pos).reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """RIFF/WAVE PCM16 mono from an int16 array."""
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(int16 sample array, sample_rate) from RIFF/WAVE PCM16."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, rate, samples = 12, 0, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, _ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + clen + (clen % 2)
    if samples is None:
        raise ValueError("WAV without data chunk")
    return samples, rate


FVID_MAGIC = b"FVID"


def encode_fvid(frames: list[bytes]) -> bytes:
    """Minimal video container: magic, frame count, per-frame length
    table, then the frame payloads (each an encoded image)."""
    head = FVID_MAGIC + struct.pack("<I", len(frames))
    table = b"".join(struct.pack("<I", len(f)) for f in frames)
    return head + table + b"".join(frames)


def decode_fvid(data: bytes) -> list[bytes]:
    if data[:4] != FVID_MAGIC:
        raise ValueError("not an FVID payload")
    (n,) = struct.unpack_from("<I", data, 4)
    lens = struct.unpack_from(f"<{n}I", data, 8)
    out, pos = [], 8 + 4 * n
    for ln in lens:
        out.append(data[pos:pos + ln])
        pos += ln
    return out


def _decode_image(data: bytes) -> np.ndarray:
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError("unknown image format")


# ---------------------------------------------------- synthetic media


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic REAL-format media table: payload bytes are valid
    BMP / WAV / FVID derived from the id, so decode results have
    closed forms an independent engine can verify (the
    multimodal_features oracle):

    - image i:  w=16+i%16, h=12+i%8, pixel(y,x) = RGB(base+x+y, x, y)
                with base = i%90  (all channels < 256 by construction)
    - audio i:  256*(1+i%4) PCM16 samples, sample j = ((j*37)%256)-128
                (full 256-cycles -> mean=-0.5, mean|.|=64 exactly)
    - video i:  F=2+i%3 BMP frames, w=16+i%8, h=12+i%4, frame f uses
                base = i%90 + f
    """
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h, base = 16 + i % 16, 12 + i % 8, i % 90
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack([base + x + y, x, y], axis=-1).astype(np.uint8)
            rows.append((i, kind, bytearray(encode_bmp(px)),
                         (w, h, None, None, "image/bmp")))
        elif kind == "audio":
            ns, rate = 256 * (1 + i % 4), 16000
            j = np.arange(ns)
            samples = ((j * 37) % 256 - 128).astype(np.int16)
            rows.append((i, kind, bytearray(encode_wav(samples, rate)),
                         (None, None, rate, None, "audio/wav")))
        else:
            nf, w, h, base = 2 + i % 3, 16 + i % 8, 12 + i % 4, i % 90
            y, x = np.mgrid[0:h, 0:w]
            frames = [encode_bmp(np.stack(
                [base + f + x + y, x, y], axis=-1).astype(np.uint8))
                for f in range(nf)]
            rows.append((i, kind, bytearray(encode_fvid(frames)),
                         (w, h, None, nf, "video/x-fvid")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------- operators


def _feature_vector(payload: bytes, mime: str) -> list[float]:
    """FEATURE_DIM floats in [0, 1] from a REAL decode of the payload
    (byte-level statistics for mimes no codec claims)."""
    try:
        if mime == "image/bmp" or mime == "image/x-ppm":
            px = _decode_image(payload).astype(np.float64)
            h, w = px.shape[:2]
            return [min(w, 4095) / 4096.0, min(h, 4095) / 4096.0,
                    float(px[..., 0].mean()) / 255.0,
                    float(px[..., 1].mean()) / 255.0,
                    float(px[..., 2].mean()) / 255.0,
                    float(px[..., 0].max()) / 255.0,
                    float(px[..., 1].min()) / 255.0,
                    min(w * h, 2 ** 20 - 1) / 2.0 ** 20]
        if mime == "audio/wav":
            s, rate = decode_wav(payload)
            sf = s.astype(np.float64)
            return [min(len(s), 2 ** 20 - 1) / 2.0 ** 20,
                    min(rate, 192000) / 192000.0,
                    float(np.abs(sf).mean()) / 32768.0,
                    float(np.sqrt((sf ** 2).mean())) / 32768.0,
                    (float(sf.mean()) + 32768.0) / 65536.0,
                    (float(sf.max()) + 32768.0) / 65536.0,
                    (float(sf.min()) + 32768.0) / 65536.0, 0.0]
        if mime == "video/x-fvid":
            frames = [_decode_image(f).astype(np.float64)
                      for f in decode_fvid(payload)]
            h, w = frames[0].shape[:2]
            means = np.array([[f[..., c].mean() for c in range(3)]
                              for f in frames])
            return [min(len(frames), 4095) / 4096.0,
                    min(w, 4095) / 4096.0, min(h, 4095) / 4096.0,
                    float(means[:, 0].mean()) / 255.0,
                    float(means[:, 1].mean()) / 255.0,
                    float(means[:, 2].mean()) / 255.0,
                    float(means[:, 0].max()) / 255.0, 0.0]
    except ValueError:
        pass
    # fallback: byte statistics — graceful for unknown formats
    b = np.frombuffer(payload, np.uint8).astype(np.float64)
    if len(b) == 0:
        return [0.0] * FEATURE_DIM
    return [min(len(b), 2 ** 24 - 1) / 2.0 ** 24,
            float(b.mean()) / 255.0, float(b.std()) / 255.0,
            float(b.min()) / 255.0, float(b.max()) / 255.0,
            float(np.median(b)) / 255.0,
            float((b == 0).mean()), 1.0]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas: one Arrow batch in,
    one feature row per media item out. No shuffle; payload bytes
    never leave the scan partition."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mimes = pdf["meta"].map(
                lambda m: (m or {}).get("mime") or "")
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload_sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "payload_bytes": pdf["payload"].map(len).astype("int64"),
                "features": [
                    _feature_vector(bytes(p), m)
                    for p, m in zip(pdf["payload"], mimes)],
            })
            yield out

    return media.mapInPandas(run, FEATURES_SCHEMA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Raw (un-normalized) decode statistics per media row — the
    differential-testing surface: every value has a closed form for
    :func:`synthetic_media` payloads, so a SQL oracle can verify the
    codecs bit-for-bit (row order, padding, BGR channel order, PCM
    framing) without being able to decode a single byte itself.

    Columns: (width, height) image/frame dims (NULL for audio),
    n_units = pixels / samples / frames,
    (mean_a, mean_b, mean_c) = per-channel pixel means for images,
    (mean|s|, rms, mean) for audio, frame-averaged channel means for
    video."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                mime = (row["meta"] or {}).get("mime") or ""
                mid, kind = row["media_id"], row["kind"]
                if mime in ("image/bmp", "image/x-ppm"):
                    px = _decode_image(payload).astype(np.float64)
                    h, w = px.shape[:2]
                    recs.append((mid, kind, w, h, w * h,
                                 px[..., 0].mean(), px[..., 1].mean(),
                                 px[..., 2].mean()))
                elif mime == "audio/wav":
                    s, _rate = decode_wav(payload)
                    sf = s.astype(np.float64)
                    recs.append((mid, kind, None, None, len(s),
                                 float(np.abs(sf).mean()),
                                 float(np.sqrt((sf ** 2).mean())),
                                 float(sf.mean())))
                elif mime == "video/x-fvid":
                    frames = [_decode_image(f).astype(np.float64)
                              for f in decode_fvid(payload)]
                    h, w = frames[0].shape[:2]
                    means = np.array([[f[..., c].mean() for c in range(3)]
                                      for f in frames])
                    recs.append((mid, kind, w, h, len(frames),
                                 means[:, 0].mean(), means[:, 1].mean(),
                                 means[:, 2].mean()))
                else:
                    b = np.frombuffer(payload, np.uint8).astype(np.float64)
                    recs.append((mid, kind, None, None, len(b),
                                 float(b.mean()) if len(b) else 0.0,
                                 float(b.std()) if len(b) else 0.0, 0.0))
            out = pd.DataFrame.from_records(
                recs, columns=[f.name for f in DECODE_STATS_SCHEMA.fields])
            # audio rows carry NULL dims: pandas nullable Int32 keeps
            # them integers through Arrow (float NaN would not cast)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.mapInPandas(run, DECODE_STATS_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize: decode (BMP/PPM), nearest-neighbor resample
    with numpy index arithmetic, re-encode as BMP. Meta dims updated;
    non-image rows are filtered out before the UDF ever sees a
    payload."""

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()

            def one(b: bytes) -> bytes:
                px = _decode_image(bytes(b))
                h, w = px.shape[:2]
                ys = (np.arange(height) * h // height)
                xs = (np.arange(width) * w // width)
                return encode_bmp(px[np.ix_(ys, xs)])

            pdf["payload"] = pdf["payload"].map(one)
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(dict(m) if m is not None else {}),
                           "width": width, "height": height,
                           "mime": "image/bmp"})
            yield pdf

    return media.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Real video frame sampling: demux the FVID container (true
    frame offsets from its length table) and emit every ``every_n``-th
    frame as its own decodable image payload. Output fan-out happens
    inside the Arrow batch — no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                frames = decode_fvid(bytes(row["payload"]))
                for fi in range(0, len(frames), every_n):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    payloads.append(frames[fi])
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_index": pd.Series(idxs, dtype="int32"),
                                "frame_payload": payloads})

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no payload movement): per kind,
    count + total/avg payload bytes."""
    return (
        media.select("kind", F.length("payload").alias("nbytes"))
        .groupBy("kind")
        .agg(F.count("*").alias("n"),
             F.sum("nbytes").alias("total_bytes"),
             F.avg("nbytes").alias("avg_bytes"))
    )


SPECTRAL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sum_amp", T.LongType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("band_energy", T.ArrayType(T.DoubleType())),
    T.StructField("dominant_band", T.IntegerType()),
    T.StructField("spectral_centroid_hz", T.DoubleType()),
])


def audio_spectral_features(media: DataFrame,
                            n_bands: int = 8) -> DataFrame:
    """Real signal-level audio features via Arrow-batched mapInPandas:
    decode PCM, rfft power spectrum, energy split into ``n_bands``
    equal frequency bands (fractions summing to 1), the dominant band
    index, and the spectral centroid in Hz. ``sum_amp``/``sum_sq``
    are the exact integer time-domain sample sums (computed on the
    int16 samples, so they are decode-proving invariants with closed
    forms an oracle can reproduce without an FFT). The FFT runs per
    clip inside the batch — no shuffle, payloads never leave the scan
    partition; this is the shape any librosa-style extractor plugs
    into (the heavy codec stays an executor-local library call)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                samples, rate = decode_wav(bytes(row["payload"]))
                x = samples.astype(np.float64)
                spec = np.abs(np.fft.rfft(x)) ** 2
                spec[0] = 0.0  # drop DC so silence doesn't dominate
                total = float(spec.sum()) or 1.0
                edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
                bands = [float(spec[edges[i]:edges[i + 1]].sum()) / total
                         for i in range(n_bands)]
                freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                centroid = float((freqs * spec).sum() / total)
                s64 = samples.astype(np.int64)
                rows.append((int(row["media_id"]), int(rate), len(x),
                             int(s64.sum()), int((s64 * s64).sum()),
                             bands, int(np.argmax(bands)), centroid))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples", "sum_amp",
                "sum_sq", "band_energy", "dominant_band",
                "spectral_centroid_hz"])

    return media.filter(F.col("kind") == "audio") \
        .mapInPandas(run, SPECTRAL_SCHEMA)


MOTION_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_pixels", T.LongType()),
    T.StructField("sum_abs_delta", T.LongType()),
    T.StructField("mean_motion", T.DoubleType()),
    T.StructField("max_motion", T.DoubleType()),
    T.StructField("static_transitions", T.IntegerType()),
])


def video_motion_stats(media: DataFrame) -> DataFrame:
    """Real inter-frame motion energy via Arrow-batched mapInPandas:
    demux the FVID container, decode consecutive frames, and emit the
    mean/max absolute pixel delta between neighbors plus the count of
    exactly-static transitions (duplicate frames — the standard
    cheap signal for slideshow/static video filtering in corpus
    prep). ``frame_pixels`` (w*h of the decoded frames) and
    ``sum_abs_delta`` (exact integer sum of |delta| over every
    transition, pixel, and channel, computed on the uint8 frames
    widened to int64) are decode-proving invariants with closed
    forms an oracle can reproduce. Single-frame clips emit zero
    motion."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = [_decode_image(f).astype(np.int64)
                       for f in decode_fvid(bytes(row["payload"]))]
                frames = [a.astype(np.float64) for a in raw]
                diffs = [float(np.abs(b - a).mean())
                         for a, b in zip(frames, frames[1:])]
                sum_abs = sum(int(np.abs(b - a).sum())
                              for a, b in zip(raw, raw[1:]))
                wh = raw[0].shape[0] * raw[0].shape[1] if raw else 0
                rows.append((
                    int(row["media_id"]), len(frames), int(wh),
                    int(sum_abs),
                    float(np.mean(diffs)) if diffs else 0.0,
                    float(np.max(diffs)) if diffs else 0.0,
                    int(sum(1 for d in diffs if d == 0.0))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_frames", "frame_pixels", "sum_abs_delta",
                "mean_motion", "max_motion", "static_transitions"])

    return media.filter(F.col("kind") == "video") \
        .mapInPandas(run, MOTION_SCHEMA)


def synthetic_images(spark: SparkSession, n: int = 24) -> DataFrame:
    """Image fixture for perceptual-hash testing: reflected linear
    gradients with varying brightness. Image i:

    - w = 16 + (i % 4) * 2, h = 12 + i % 4
    - orient = (i // 4) % 4: bit 0 mirrors x, bit 1 mirrors y
    - base = (i * 17) % 60 (pure brightness offset)
    - pixel(y, x) = RGB(base + u + v, u, v) with u = x or w-1-x,
      v = y or h-1-y per orient (all channels < 256 by construction)

    (geometry, orient) repeats with period 16, base does not — so
    ids i and i+16 are brightness-shifted copies of the same image:
    exactly the near-duplicate class an average hash must collapse,
    while reflections of the same geometry must NOT collapse."""
    rows = []
    for i in range(n):
        w, h = 16 + (i % 4) * 2, 12 + i % 4
        base, orient = (i * 17) % 60, (i // 4) % 4
        y, x = np.mgrid[0:h, 0:w]
        u = x if orient & 1 == 0 else (w - 1 - x)
        v = y if orient & 2 == 0 else (h - 1 - y)
        px = np.stack([base + u + v, u, v], axis=-1).astype(np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(px)),
                     (w, h, None, None, "image/bmp")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image: the
    grid x grid block-mean-vs-global-mean bit matrix, hex-encoded —
    the standard cheap near-duplicate signal for images (brightness
    /contrast-shift tolerant where a byte hash is not).

    Integer-exact by construction: luminance is the integer ITU
    weighting 299R + 587G + 114B (x1000), and each bit compares
    block_sum * n_total_pixels > total_sum * n_block_pixels — pure
    integer cross-multiplication, no float mean ever computed. A
    constant brightness offset adds base * 1000 * n_block * n_total
    to BOTH sides, so shifted copies hash identically (exactly, not
    approximately). This is what lets an independent engine verify
    the hash from closed forms when pixel content is symbolic
    (multimodal_ahash_groups oracle) — and what makes the operator a
    DEDUP key: groupBy(ahash) buckets near-copies without any
    pairwise image comparison, the same one-shuffle shape as text
    exact-dedup. Arrow-batched mapInPandas, no shuffle itself."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                mime = (row["meta"] or {}).get("mime") or ""
                if mime not in ("image/bmp", "image/x-ppm"):
                    continue
                px = _decode_image(bytes(row["payload"])).astype(np.int64)
                h, w = px.shape[:2]
                L = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                tot, n_tot = int(L.sum()), w * h
                bits = []
                for by in range(grid):
                    y0, y1 = by * h // grid, (by + 1) * h // grid
                    for bx in range(grid):
                        x0, x1 = bx * w // grid, (bx + 1) * w // grid
                        s = int(L[y0:y1, x0:x1].sum())
                        n_blk = (y1 - y0) * (x1 - x0)
                        bits.append(1 if s * n_tot > tot * n_blk else 0)
                hexd = "0123456789abcdef"
                ahash = "".join(
                    hexd[bits[4 * k] * 8 + bits[4 * k + 1] * 4
                         + bits[4 * k + 2] * 2 + bits[4 * k + 3]]
                    for k in range(grid * grid // 4))
                recs.append((int(row["media_id"]), ahash))
            yield pd.DataFrame(recs, columns=["media_id", "ahash"])

    return media.mapInPandas(run, "media_id long, ahash string")
