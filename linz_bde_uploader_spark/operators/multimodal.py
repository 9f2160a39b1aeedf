"""Multimodal column operators: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (``decode_stub=True`` produces deterministic fake
features; ``decode_stub=False`` raises NotImplementedError where a
real libjpeg/ffmpeg call would go). Everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested.

Schema convention:

  media(media_id bigint, kind string, payload binary,
        meta struct<width:int, height:int, sample_rate:int,
                    n_frames:int, mime:string>)

Scale notes: payloads are large -> never groupBy/shuffle raw bytes.
Feature extraction is mapInPandas (no shuffle, Arrow batches);
downstream joins use media_id + features only. maxRecordsPerBatch
bounds Arrow memory for big payloads.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

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


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derive
    from the id, so every stage is reproducible."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
        rows.append((i, kind, bytearray(payload),
                     (64 + i % 32, 48 + i % 16, 16000, 10 + i % 20,
                      f"application/x-fake-{kind}")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """STUB for the real decoder. Deterministic features from payload
    bytes. A real deployment replaces this with PIL/libsndfile/ffmpeg
    calls — the surrounding Spark plumbing is unchanged."""
    h = hashlib.sha256(payload).digest()
    return [struct.unpack("<I", h[4 * j:4 * j + 4])[0] / 2**32
            for j in range(FEATURE_DIM)]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas: one Arrow batch in,
    one feature row per media item out. No shuffle; payload bytes
    never leave the scan partition."""

    def run(batches: "Iterator") -> "Iterator":
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires image/audio codecs not "
                    "present in this environment; use decode_stub=True")
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload_sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "payload_bytes": pdf["payload"].map(len).astype("int64"),
                "features": pdf.apply(
                    lambda r: _fake_decode(bytes(r["payload"]), r["kind"]), axis=1),
            })
            yield out

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """Image resize plumbing: filters kind='image', rewrites payload +
    meta. Stub transform = payload truncation to width*height bytes
    (deterministic); real impl would be PIL resize."""

    def run(batches: "Iterator") -> "Iterator":
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize needs an image codec")
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(
                lambda b: bytes(b)[: width * height] or bytes(b))
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(dict(m) if m is not None else {}),
                           "width": width, "height": height})
            yield pdf

    return media.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_index, frame_payload). Stub frames are byte
    slices of the payload; a real impl demuxes with ffmpeg. Output
    fan-out happens inside the Arrow batch — no shuffle."""

    def run(batches: "Iterator") -> "Iterator":
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling needs ffmpeg")
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                n_frames = (row["meta"]["n_frames"]
                            if row["meta"] is not None else 0) or 0
                raw = bytes(row["payload"])
                for fi in range(0, n_frames, every_n):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    chunk = max(1, len(raw) // max(n_frames, 1))
                    payloads.append(raw[fi * chunk:(fi + 1) * chunk])
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
