"""End-to-end training-corpus pipeline (round 5 capstone): HTML →
extract → dedup (exact + near-dup vs committed index) → token budget →
shards → committed export with resume."""

import os

import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.pipelines.corpus import build_corpus, export_corpus

REAL = (
    "substantial real content with plenty of genuinely distinct words "
    "to clear the minimum length bar easily "
)
PAGES = [
    (1, f"<html><body><p>{REAL}alpha beta gamma</p></body></html>"),
    (2, f"<html><body><p>{REAL}alpha beta gamma</p></body></html>"),   # exact dup of 1
    (3, f"<html><body><p>{REAL}alpha beta gamma delta</p></body></html>"),  # near-dup of 1
    (4, "<html><body><nav>" + "<a href='/'>L</a>" * 9 + "</nav><p>tiny</p></body></html>"),  # boilerplate
    (5, f"<html><body><p>completely different vocabulary everywhere — "
        f"nothing shared with the others in any shingle window at all "
        f"one two three four five six seven eight nine ten</p></body></html>"),
]


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_pipeline_filters_and_shards(spark):
    out = build_corpus(_pages(spark, PAGES), n_shards=4, seed=1).collect()
    ids = sorted(r.doc_id for r in out)
    # 2 exact-dup of 1 → dropped; 3 near-dup of 1 → dropped; 4 boilerplate
    assert ids == [1, 5]
    row = {r.doc_id: r for r in out}
    assert row[1].n_bpe_tokens >= row[1].n_words > 0
    assert all(0 <= r.shard < 4 for r in out)


def test_pipeline_with_committed_index_and_export(spark, tmp_path):
    from osm_read_enhanced_spark.operators.dedup import (
        append_minhash_index,
        read_minhash_index,
    )
    from osm_read_enhanced_spark.sources.iceberg_lite import read_table

    idx_path = os.path.join(str(tmp_path), "idx")
    out_path = os.path.join(str(tmp_path), "corpus")

    # run 1: batch-only dedup, export, index survivors
    c1 = build_corpus(_pages(spark, PAGES), n_shards=2, seed=7)
    recs = export_corpus(c1, out_path, run_id="run1")
    assert sum(r["row_count"] for r in recs) == 2
    # re-exporting the SAME run is a per-partition resume no-op
    assert export_corpus(c1, out_path, run_id="run1") == []
    surv1 = c1.select("doc_id", "text")
    append_minhash_index(surv1, idx_path, batch_id="run1", text_col="text")

    # run 2: a page near-duplicating run 1's survivor must be dropped
    # via the COMMITTED index; a novel page survives
    run2 = [
        (10, f"<html><body><p>{REAL}alpha beta gamma epsilon</p></body></html>"),
        (11, "<html><body><p>genuinely novel second-run material with "
             "its own fresh set of tokens for every single shingle</p></body></html>"),
    ]
    idx = read_minhash_index(spark, idx_path)
    c2 = build_corpus(_pages(spark, run2), index=idx, n_shards=2, seed=7)
    ids2 = sorted(r.doc_id for r in c2.collect())
    assert ids2 == [11]

    # export run 2 into the same table under its own run_id: the new
    # partitions APPEND next to run 1's committed shards
    recs2 = export_corpus(c2, out_path, run_id="run2")
    assert sum(r["row_count"] for r in recs2) == 1
    total = read_table(spark, out_path).count()
    assert total == 3  # run-1's 2 rows + run-2's survivor


def test_pipeline_deterministic(spark):
    a = sorted(
        (r.doc_id, r.shard_key, r.shard)
        for r in build_corpus(_pages(spark, PAGES), n_shards=4, seed=3).collect()
    )
    b = sorted(
        (r.doc_id, r.shard_key, r.shard)
        for r in build_corpus(
            _pages(spark, PAGES).repartition(7), n_shards=4, seed=3
        ).collect()
    )
    assert a == b
