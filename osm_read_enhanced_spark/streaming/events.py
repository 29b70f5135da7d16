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


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"  # epoch micros


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (SURVEY §2.10/§2.11):
    per-user session assembly via ``applyInPandasWithState`` with
    event-time timeout.

    Semantics: a session CLOSES (one output row: user_id, session_start,
    session_end, n_events) when a later event arrives more than
    ``gap_minutes`` after the session's last event, or when the event
    -time watermark passes session_end + gap (GroupState timeout). This
    is the arbitrary-state surface the built-in session_window cannot
    express when per-session custom state (counters, payloads,
    model state) is needed — the graft's stateful-stream analogue of the
    reference's chunked state machine (Core_Read.js:332-367).

    Works on a streaming DF with a watermark on ``ts``; the batch
    equivalence oracle is ``sessionize`` (lag/cumsum) restricted to
    closed sessions — pinned by test.
    """
    import pandas as pd  # noqa: F401

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def assemble(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        closed = []  # (start_us, end_us, n)
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((s, last, n))
                state.remove()
        else:
            ts_us = []
            for pdf in pdf_iter:
                ns = pd.to_datetime(pdf["ts"]).values.astype("datetime64[ns]").astype("int64")
                ts_us.extend(int(t) // 1000 for t in ns)
            ts_us.sort()
            if state.exists:
                s, last, n = state.get
            else:
                s = last = None
                n = 0
            for t in ts_us:
                if s is None:
                    s, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((s, last, n))
                    s, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            if s is not None:
                state.update((s, last, n))
                # timeout must sit strictly beyond the current watermark
                timeout_ms = max(
                    (last + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
                )
                state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    src = events.withWatermark("ts", f"{gap_minutes} minutes")
    return src.groupBy("user_id").applyInPandasWithState(
        assemble,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def closed_sessions_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch oracle for sessionize_stateful: gap-sessionize, aggregate
    per session, and keep every session (a bounded input closes all)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("session_id")


class ProgressTicker:
    """StreamingQueryListener capturing per-micro-batch progress — the
    Spark analogue of the reference's progress ticker
    (Core_Read.js:389-411). ``records`` accumulates
    (query_name, batch_id, numInputRows) tuples."""

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        records = []

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                records.append((p.name, p.batchId, p.numInputRows))

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.records = records
        self.listener = _L()

    def attach(self, spark) -> "ProgressTicker":
        spark.streams.addListener(self.listener)
        return self

    def detach(self, spark) -> None:
        spark.streams.removeListener(self.listener)


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
