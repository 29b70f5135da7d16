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


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState custom stateful sessionizer: sessions
    closed by a later-arriving gap event must equal the batch lag/cumsum
    sessionization's non-final sessions (the final session per user
    stays open in state — a bounded availableNow run has no watermark
    advance past it)."""
    import datetime as dt

    from osm_read_enhanced_spark.streaming.events import (
        closed_sessions_batch,
        read_events_stream,
        sessionize_stateful,
    )

    t0 = dt.datetime(2025, 1, 1, 8, 0, 0)

    def ev(eid, minutes, user):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, "click", 1.0, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # batch 1: session A (user 1: 3 events), session B (user 2: 2 events)
    b1 = [ev(1, 0, 1), ev(2, 5, 1), ev(3, 11, 1), ev(4, 2, 2), ev(5, 9, 2)]
    # batch 2: >30-min gaps close A and B; user 1 also opens + closes a
    # second session (C) before a final open one
    b2 = [ev(6, 60, 1), ev(7, 66, 1), ev(8, 120, 1), ev(9, 75, 2)]
    d = tmp_path / "sess_stream"
    d.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(d / "f2"))
    import shutil

    import os
    import time

    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i, sub in enumerate(["f1", "f2"]):
        for f in (d / sub).glob("*.parquet"):
            dest = flat / f"batch-{i}.parquet"
            shutil.copy(f, dest)
            # the file stream source orders micro-batches by modification
            # time — pin it so batch-0 is processed first
            os.utime(dest, (now - 100 + i * 50, now - 100 + i * 50))

    stream = read_events_stream(spark, str(flat), max_files_per_trigger=1)
    out = sessionize_stateful(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    all_events = spark.createDataFrame(b1 + b2, schema)
    batch_sessions = closed_sessions_batch(all_events, gap_minutes=30).collect()
    # drop each user's final (still-open) session from the expectation
    finals = {}
    for r in batch_sessions:
        if r.user_id not in finals or r.session_start > finals[r.user_id].session_start:
            finals[r.user_id] = r
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_sessions
        if (r.session_start, r.user_id) != (finals[r.user_id].session_start, r.user_id)
    }
    assert expected  # sanity: the fixture must close some sessions
    assert got >= expected
    # nothing emitted that the batch oracle doesn't recognise as a session
    all_sessions = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in batch_sessions
    }
    assert got <= all_sessions


def test_progress_ticker_listener(spark, sf_dir, tmp_path):
    """StreamingQueryListener progress capture (the reference's progress
    ticker analogue, Core_Read.js:389-411)."""
    import shutil
    import time

    from osm_read_enhanced_spark.streaming.events import ProgressTicker

    stream_dir = tmp_path / "tick_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-000.parquet")
    ticker = ProgressTicker().attach(spark)
    try:
        stream = read_events_stream(spark, str(stream_dir))
        run_stream_to_memory(windowed_counts(stream), "ticked_counts")
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and not any(
            name == "ticked_counts" and rows > 0
            for name, _, rows in ticker.records
        ):
            time.sleep(0.5)
        assert any(
            name == "ticked_counts" and rows > 0
            for name, _, rows in ticker.records
        ), ticker.records
    finally:
        ticker.detach(spark)


def test_streaming_image_neardup_matches_history_bruteforce(spark, tmp_path):
    """Stateful banded near-dup over a 3-micro-batch image stream must
    flag exactly the images with an EARLIER image within hamming ≤ 6
    (clean-room numpy expectation), with the true min hamming; batch
    mode of the same operator must agree with the stream."""
    import os
    import shutil
    import time

    import numpy as np

    from osm_read_enhanced_spark.functions.codecs import phash64
    from osm_read_enhanced_spark.sources.images import render_image, variant_image
    from osm_read_enhanced_spark.streaming.images import (
        image_neardup_stream,
        neardup_flags_from_band_rows,
    )

    ph = {}
    for idx in range(36):
        ph[f"img_{idx:04d}"] = phash64(render_image(idx))
        if idx % 3 == 0:
            ph[f"var_{idx:04d}"] = phash64(variant_image(idx))
    ids = sorted(ph)
    # clean-room expectation: min hamming vs all EARLIER (smaller-id) images
    expect = {}
    for i, a in enumerate(ids):
        if i == 0:
            expect[a] = (False, None)
            continue
        dists = [bin((ph[a] ^ ph[b]) & (2**64 - 1)).count("1") for b in ids[:i]]
        m = min(dists)
        expect[a] = (m <= 6, m if m <= 6 else None)

    schema = "image_id string, phash long"
    rows = [(i, ph[i]) for i in ids]
    d = tmp_path / "img_stream"
    d.mkdir()
    thirds = [rows[:16], rows[16:32], rows[32:]]
    now = time.time()
    for i, chunk in enumerate(thirds):
        tmp = tmp_path / f"w{i}"
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dest = d / f"batch-{i}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (now - 100 + i * 30, now - 100 + i * 30))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    q = (
        image_neardup_stream(stream, max_hamming=6)
        .writeStream.format("memory")
        .queryName("img_neardup_bands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flags = neardup_flags_from_band_rows(spark.sql("SELECT * FROM img_neardup_bands"))
    got = {r.image_id: (r.is_dup, r.hamming) for r in flags.collect()}
    assert got == expect
    assert sum(1 for v in got.values() if v[0]) >= 10  # the planted variants

    # the batch twin (same core, applyInPandas, empty initial state)
    # must agree
    from osm_read_enhanced_spark.streaming.images import image_neardup_batch

    batch_df = spark.createDataFrame(rows, schema)
    bflags = neardup_flags_from_band_rows(image_neardup_batch(batch_df, max_hamming=6))
    bgot = {r.image_id: (r.is_dup, r.hamming) for r in bflags.collect()}
    assert bgot == expect


def test_streaming_image_neardup_bounded_state_evicts_oldest(spark, tmp_path):
    """max_state_per_band=1 keeps only the most recent entry per band:
    with identical phashes A→B→C across micro-batches, C must match B —
    unbounded mode would match A (argmin picks the FIRST entry), so a
    B-match proves A was evicted."""
    import os
    import shutil
    import time

    from osm_read_enhanced_spark.streaming.images import (
        image_neardup_batch,
        image_neardup_stream,
        neardup_flags_from_band_rows,
    )

    schema = "image_id string, phash long"
    P = 0x123456789ABCDEF
    batches = [[("a", P)], [("b", P)], [("c", P)]]
    d = tmp_path / "bounded"
    d.mkdir()
    now = time.time()
    for i, chunk in enumerate(batches):
        tmp = tmp_path / f"bw{i}"
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dest = d / f"batch-{i}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (now - 100 + i * 30, now - 100 + i * 30))
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    q = (
        image_neardup_stream(stream, max_hamming=6, max_state_per_band=1)
        .writeStream.format("memory")
        .queryName("bounded_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flags = neardup_flags_from_band_rows(spark.sql("SELECT * FROM bounded_neardup"))
    got = {r.image_id: (r.is_dup, r.dup_of) for r in flags.collect()}
    assert got == {"a": (False, None), "b": (True, "a"), "c": (True, "b")}
    # batch twin honors the same cap within one invocation
    bflags = neardup_flags_from_band_rows(
        image_neardup_batch(
            spark.createDataFrame([r for b in batches for r in b], schema),
            max_hamming=6,
        )
    )
    bgot = {r.image_id: r.dup_of for r in bflags.collect()}
    assert bgot == {"a": None, "b": "a", "c": "a"}  # unbounded: argmin → first
