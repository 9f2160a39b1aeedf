"""Structured Streaming operators.

The reference is strictly batch (SURVEY.md §2.8) — its "incremental"
mode is batch CDC gated by watermark columns. Two streaming surfaces
are still natural re-expressions:

1. ``stream_repository`` — the poll-run loop over the BDE repository
   as a file stream with the ``availableNow`` trigger: each trigger
   processes any dataset directories that appeared since the last
   checkpoint, which is exactly the reference's
   last_upload_dataset watermark semantics, with exactly-once
   bookkeeping handled by the checkpoint instead of bde_control.

2. event-stream analytics used by the pipeline suite, expressed over
   any streaming DataFrame with event-time watermarks:
   - ``windowed_counts``: tumbling-window count/sum with late-data
     tolerance (maps to the batch events_window_agg query);
   - ``sessionize``: session windows with a gap timeout
     (F.session_window — Spark's native stateful session operator;
     maps to the batch events_sessionize query).

Scale notes: windowed aggregations are stateful — state lives in the
state store keyed by (window, group); watermarks bound state size.
``session_window`` merges per-key sessions in the state store without
a Python round-trip. maxFilesPerTrigger bounds per-batch work on the
file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_repository(spark: SparkSession, root: str, level: int,
                      schema: T.StructType, file_tag: str = "*",
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File stream over ``<root>/level_<n>/<dataset>/<tag>.crs`` text
    lines, tagged with their dataset id via input_file_name().

    S1/S2 as a stream: new dataset dirs are discovered per trigger;
    the checkpoint replaces the ledger watermark. ``file_tag`` scopes
    the stream to ONE table's file (a dataset directory mixes files of
    different schemas — e.g. the xaud changeset next to pab1 data — so
    an unscoped stream must parse per-file, not with one schema)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(f"{root}/level_{level}/*/{file_tag}.crs")
    dataset = F.regexp_extract(F.input_file_name(), r"/(\d{14})/[^/]+$", 1)
    return lines.withColumn("dataset", dataset)


def parse_crs_stream(lines: DataFrame, schema: T.StructType) -> DataFrame:
    """Streaming variant of the .crs data parse: data rows carry a
    trailing '|'; header lines are dropped by the same predicate used
    in the batch reader (sources/crs.py)."""
    ncols = len(schema.fields)
    parts = F.split(F.col("value"), r"\|", -1)
    data = lines.filter(F.col("value").endswith("|")) \
                .filter(F.size(parts) == ncols + 1)
    exprs = []
    for i, field in enumerate(schema.fields):
        raw = F.element_at(parts, i + 1)
        # try_cast: a malformed row must not kill a long-running
        # stream (the batch reader enforces the error budget instead)
        val = F.when(raw == "", F.lit(None)).otherwise(raw) \
               .try_cast(field.dataType)
        exprs.append(val.alias(field.name))
    return data.select("dataset", *exprs)


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    group_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window aggregate with late-data watermark.

    State is bounded: windows older than the watermark are finalized
    and evicted. Works identically on a batch DataFrame (watermark is
    a no-op there), which is how the oracle checks it."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(group_col))
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                group_col, "n", "sum_value")
    )


def sessionize(events: DataFrame, ts_col: str = "ts",
               key_col: str = "user_id", gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Session windows per key with an inactivity gap — Spark's native
    stateful session operator (state-store merge, no Python UDF)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(key_col,
                F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
                "n_events")
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str,
                      output_mode: str = "append") -> None:
    """Drain everything currently available, then stop — the streaming
    equivalent of one reference upload run."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
