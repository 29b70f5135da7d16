"""Incremental dedup against a committed signature index (round 5):
the production loop — index prior corpus, dedup today's batch against
index + itself, fold survivors back in, repeat — with iceberg-lite
commit/resume semantics."""

import os

import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.operators.dedup import (
    append_minhash_index,
    incremental_dedup,
    minhash_index,
    minhash_lsh_pairs,
    read_minhash_index,
)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely unrelated text about spark shuffle partitions and joins"),
    (3, "a third document with its own distinctive vocabulary and phrasing"),
]
BATCH1 = [
    (10, "the quick brown fox jumps over the lazy dog again and again today"),  # dup of 1
    (11, "fresh new content that matches nothing in the corpus at all really"),
    (12, "fresh new content that matches nothing in the corpus at all really"),  # dup of 11
]
BATCH2 = [
    (20, "fresh new content that matches nothing in the corpus at all really"),  # dup of 11 (indexed in batch1)
    (21, "still more genuinely novel words never seen before in any batch"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_flags_and_batch_rule(spark):
    idx = minhash_index(_df(spark, BASE))
    out = {
        r.doc_id: (r.dup_of_corpus, r.dup_in_batch, r.kept)
        for r in incremental_dedup(_df(spark, BATCH1), idx, threshold=0.5).collect()
    }
    assert out[10] == (True, False, False)   # dup of corpus doc 1
    assert out[11] == (False, False, True)   # novel, smallest of its pair
    assert out[12] == (False, True, False)   # dup of smaller batch id 11


def test_production_loop_with_committed_index(spark, tmp_path):
    path = os.path.join(str(tmp_path), "sigidx")
    append_minhash_index(_df(spark, BASE), path, batch_id="base")
    idx = read_minhash_index(spark, path)
    r1 = incremental_dedup(_df(spark, BATCH1), idx, threshold=0.5)
    keep1 = [r.doc_id for r in r1.filter("kept").collect()]
    assert keep1 == [11]
    survivors = _df(spark, [r for r in BATCH1 if r[0] in keep1])
    append_minhash_index(survivors, path, batch_id="b1")

    # batch 2 must see batch 1's survivor as corpus now
    idx2 = read_minhash_index(spark, path)
    out2 = {
        r.doc_id: (r.dup_of_corpus, r.kept)
        for r in incremental_dedup(_df(spark, BATCH2), idx2, threshold=0.5).collect()
    }
    assert out2[20] == (True, False)   # matches indexed batch-1 survivor 11
    assert out2[21] == (False, True)

    # resume semantics: re-appending an already-committed batch is a no-op
    again = append_minhash_index(survivors, path, batch_id="b1")
    assert again == []
    assert read_minhash_index(spark, path).count() == idx2.count()


def test_incremental_agrees_with_batch_pairs(spark):
    """Cross-operator consistency: a doc is flagged iff minhash_lsh_pairs
    finds a qualifying pair with the corresponding side."""
    all_docs = BASE + BATCH1
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(_df(spark, all_docs), threshold=0.5).collect()
    }
    out = {
        r.doc_id: (r.dup_of_corpus, r.dup_in_batch)
        for r in incremental_dedup(
            _df(spark, BATCH1), minhash_index(_df(spark, BASE)), threshold=0.5
        ).collect()
    }
    base_ids = {d for d, _ in BASE}
    new_ids = {d for d, _ in BATCH1}
    for n in new_ids:
        exp_corpus = any(
            (min(n, o), max(n, o)) in pairs for o in base_ids
        )
        exp_batch = any((m, n) in pairs for m in new_ids if m < n)
        assert out[n] == (exp_corpus, exp_batch), (n, out[n])
