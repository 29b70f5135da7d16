"""Streaming MinHash text dedup (round 5): stream ≡ batch twin,
consistency with incremental_dedup's within-batch rule, and bounded
per-bucket state eviction."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.streaming.text import (
    dup_flags_from_band_rows,
    text_neardup_batch,
    text_neardup_stream,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely unrelated text about spark shuffle partitions and joins"),
    (3, "the quick brown fox jumps over the lazy dog again and again today"),
    (4, "a third document with its own distinctive vocabulary and phrasing"),
    (5, "completely unrelated text about spark shuffle partitions and joins ok"),
    (6, "fresh content that matches nothing else in the little corpus here"),
    (7, "the quick brown fox jumps over the lazy dog again and again now"),
    (8, "a third document with its own distinctive vocabulary and phrasing"),
]
SCHEMA = "doc_id long, text string"


def test_batch_twin_matches_incremental_dedup_rule(spark):
    from osm_read_enhanced_spark.operators.dedup import incremental_dedup

    docs = spark.createDataFrame(DOCS, SCHEMA)
    flags = dup_flags_from_band_rows(text_neardup_batch(docs, threshold=0.5))
    got = {r.doc_id: r.is_dup for r in flags.collect()}
    inc = {
        r.doc_id: r.dup_in_batch
        for r in incremental_dedup(docs, None, threshold=0.5).collect()
    }
    assert got == inc
    assert got[3] and got[8]          # exact copies of earlier docs
    assert not got[1] and not got[2]  # first arrivals


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    d = tmp_path / "txt_stream"
    d.mkdir()
    now = time.time()
    chunks = [DOCS[:3], DOCS[3:6], DOCS[6:]]
    for i, chunk in enumerate(chunks):
        tmp = tmp_path / f"w{i}"
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dest = d / f"batch-{i}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (now - 100 + i * 30, now - 100 + i * 30))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        text_neardup_stream(stream, threshold=0.5)
        .writeStream.format("memory")
        .queryName("txt_neardup_bands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sflags = dup_flags_from_band_rows(spark.sql("SELECT * FROM txt_neardup_bands"))
    sgot = {r.doc_id: (r.is_dup, r.dup_of) for r in sflags.collect()}

    batch = dup_flags_from_band_rows(
        text_neardup_batch(spark.createDataFrame(DOCS, SCHEMA), threshold=0.5)
    )
    bgot = {r.doc_id: (r.is_dup, r.dup_of) for r in batch.collect()}
    assert sgot == bgot
    assert sgot[3] == (True, 1)


def test_bounded_state_evicts_oldest(spark, tmp_path):
    """max_state_per_bucket=1: with identical docs A→B→C in separate
    micro-batches, C must match B (A evicted); unbounded mode would
    match A (ties broken toward the smallest id)."""
    same = "one identical sentence repeated across every single micro batch here"
    rows = [(1, same), (2, same), (3, same)]
    d = tmp_path / "txt_stream_b"
    d.mkdir()
    now = time.time()
    for i, row in enumerate(rows):
        tmp = tmp_path / f"wb{i}"
        spark.createDataFrame([row], SCHEMA).coalesce(1).write.parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dest = d / f"batch-{i}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        text_neardup_stream(stream, threshold=0.5, max_state_per_bucket=1)
        .writeStream.format("memory")
        .queryName("txt_neardup_bounded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flags = dup_flags_from_band_rows(spark.sql("SELECT * FROM txt_neardup_bounded"))
    got = {r.doc_id: (r.is_dup, r.dup_of) for r in flags.collect()}
    assert got[1] == (False, None)
    assert got[2] == (True, 1)
    assert got[3] == (True, 2)  # A evicted — proof the bound is enforced


def test_bucket_fold_superset_and_stream_batch_parity(spark, tmp_path):
    """bucket_bits folds buckets into a bounded key space; flags must be
    a recall-superset of exact-bucket flags and stream must still equal
    the batch twin under the same fold."""
    docs = spark.createDataFrame(DOCS, SCHEMA)
    exact = {
        r.doc_id: r.is_dup
        for r in dup_flags_from_band_rows(
            text_neardup_batch(docs, threshold=0.5)
        ).collect()
    }
    folded = {
        r.doc_id: r.is_dup
        for r in dup_flags_from_band_rows(
            text_neardup_batch(docs, threshold=0.5, bucket_bits=6)
        ).collect()
    }
    assert set(folded) == set(exact)
    for d, dup in exact.items():
        if dup:
            assert folded[d], f"fold lost a confirmed dup for doc {d}"

    # stream with the same fold across micro-batches == folded batch
    d = tmp_path / "txt_stream_f"
    d.mkdir()
    now = time.time()
    for i, chunk in enumerate([DOCS[:4], DOCS[4:]]):
        tmp = tmp_path / f"wf{i}"
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dest = d / f"batch-{i}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (now - 80 + i * 30, now - 80 + i * 30))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        text_neardup_stream(stream, threshold=0.5, bucket_bits=6)
        .writeStream.format("memory")
        .queryName("txt_neardup_folded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sflags = {
        r.doc_id: r.is_dup
        for r in dup_flags_from_band_rows(
            spark.sql("SELECT * FROM txt_neardup_folded")
        ).collect()
    }
    assert sflags == folded
