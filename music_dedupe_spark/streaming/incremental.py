"""Incremental / streaming ingest (SURVEY §2.9).

The reference emulates streaming three ways: per-100-row batch flushes
during a scan (T1, core.py:655-663), a 0.5 s progress push loop (T2),
and cron-scheduled re-scans (T3). None of it handles late data or
resumes (T5). Here:

- ``incremental_scan_and_group`` — Structured Streaming file source
  over the corpus directory with ``Trigger.AvailableNow`` semantics
  (``processAllAvailable`` locally): each micro-batch runs the ingest
  projection and appends to a snapshot table; the checkpointLocation
  makes re-runs resume from the last committed offset (T5 fixed).
- ``progress_metrics_stream`` — event-time windowed counts over the
  ``events`` table with a watermark: the watermark/window machinery the
  reference lacks, used for the per-partition metrics feed (north rule
  lineage+metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from music_dedupe_spark.pipeline import ingest

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> "pyspark.sql.streaming.StreamingQuery":
    """Micro-batch ingest: parquet file-source -> derive columns ->
    parquet append sink with exactly-once offsets (the scalable
    replacement of the reference's scan thread + batch_save loop,
    EP1 steps 1-2)."""
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    derived = ingest(stream)
    return (
        derived.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_event_metrics(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Event-time windowed counters with a 10-minute watermark — the
    late-data-correct version of the reference's polled progress
    counters (T2, main.py:340-365). Works on both batch and streaming
    DataFrames."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            "n",
            "total_value",
        )
    )


def streaming_dedupe(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming exact-dedup: keep the first arrival per content sha
    within the watermark horizon (``dropDuplicatesWithinWatermark`` —
    bounded state, the streaming analog of the exact-dedup channel).
    Late duplicates beyond the watermark age out of state; at 100 TB/day
    the state stays O(distinct shas per horizon), not O(history)."""
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    derived = ingest(stream).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    deduped = derived.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_sha256"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_event_metrics(
    spark: SparkSession, source_dir: str, queryName: str = "event_metrics"
) -> "pyspark.sql.streaming.StreamingQuery":
    """Streaming variant over a parquet directory of events."""
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(source_dir)
    # events ts is TIMESTAMP_NTZ in the driver parquet; watermark needs TIMESTAMP
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_event_metrics(stream)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )
