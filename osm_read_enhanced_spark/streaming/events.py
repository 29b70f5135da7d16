"""Structured Streaming over the events table (SURVEY.md §2.10).

The reference is a bounded-stream file processor (chunked state machine
+ pause/resume backpressure, reference Core_Read.js:332-367,
pbfParser.js:273-287); its Spark analogue is the file micro-batch
source with built-in backpressure (maxFilesPerTrigger) and watermarks
for late data. These builders return streaming DataFrames; tests drive
them with trigger(availableNow=True) into a memory sink, and the same
transformations applied to a batch DataFrame give the DuckDB-checkable
semantics (stream-batch unification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``dir_path`` must be a DIRECTORY of parquet files (Spark file
    stream source contract) — new files appearing there become
    micro-batches."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(dir_path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts with a watermark for late data.
    Works identically on a batch DataFrame (drop the watermark no-op)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user (gap-based) — batch formulation with the
    classic lag/cumsum window pattern; streaming formulation would use
    F.session_window (same semantics)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.lag("ts").over(w)
    new_sess = (
        F.when(gap.isNull(), F.lit(1))
        .when(F.col("ts") > gap + F.expr(f"INTERVAL {gap_minutes} MINUTES"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        events.withColumn("_new", new_sess)
        .withColumn("session_id", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .drop("_new")
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_s: int = 120
) -> None:
    """Drive a streaming DF to completion with availableNow (test/demo
    harness; checkpoint-free memory sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
