"""Structured Streaming over the events table: file source +
availableNow trigger + windowed agg; batch/stream result unification."""

from osm_read_enhanced_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    windowed_counts,
)


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    import shutil

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_counts(batch).collect()
    }
    # the file stream source requires a directory
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-000.parquet")
    stream = read_events_stream(spark, str(stream_dir))
    assert stream.isStreaming
    run_stream_to_memory(windowed_counts(stream), "win_counts")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 10),
        (2, base + dt.timedelta(minutes=10), 10),   # same session
        (3, base + dt.timedelta(minutes=50), 10),   # gap > 30m → new session
        (4, base + dt.timedelta(minutes=55), 10),
        (5, base, 20),                              # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = sessionize(df, gap_minutes=30).collect()
    sess = {r.event_id: r.session_id for r in out}
    assert sess[1] == sess[2] == 1
    assert sess[3] == sess[4] == 2
    assert sess[5] == 1
