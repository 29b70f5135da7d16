"""Deterministic shuffle-shard export (round 5): balance, determinism
under arbitrary input partitioning, and resumable committed export."""

import os

import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.operators.sharding import (
    shuffle_shard,
    shuffle_shard_balanced,
    write_shards,
)


def _docs(spark, n=997):
    return spark.range(n).select((F.col("id") * 13 + 5).alias("doc_id"))


def test_balanced_shards_exactly_equal(spark):
    out = shuffle_shard_balanced(_docs(spark), 8, seed=7)
    sizes = [r["cnt"] for r in out.groupBy("shard").agg(F.count("*").alias("cnt")).collect()]
    assert len(sizes) == 8
    assert max(sizes) - min(sizes) <= 1
    # ranks are a permutation of 0..n-1
    ranks = sorted(r.shard_rank for r in out.select("shard_rank").collect())
    assert ranks == list(range(997))


def test_balanced_invariant_to_input_partitioning(spark):
    base = _docs(spark, 500)
    a = {
        (r.doc_id, r.shard_rank, r.shard)
        for r in shuffle_shard_balanced(base, 5, seed=3).collect()
    }
    b = {
        (r.doc_id, r.shard_rank, r.shard)
        for r in shuffle_shard_balanced(
            base.repartition(17), 5, seed=3, num_partitions=3
        ).collect()
    }
    assert a == b


def test_hash_and_balanced_share_the_key(spark):
    base = _docs(spark, 200)
    h = {r.doc_id: r.shard_key for r in shuffle_shard(base, 4, seed=9).collect()}
    bal = {r.doc_id: r.shard_key for r in shuffle_shard_balanced(base, 4, seed=9).collect()}
    assert h == bal
    # different seed → different permutation
    h2 = {r.doc_id: r.shard_key for r in shuffle_shard(base, 4, seed=10).collect()}
    assert h != h2


def test_write_shards_commits_and_resumes(spark, tmp_path):
    from osm_read_enhanced_spark.sources.iceberg_lite import (
        read_manifest,
        read_table,
    )

    path = os.path.join(str(tmp_path), "shards")
    recs = write_shards(_docs(spark, 300), path, 4, seed=1)
    assert len(recs) == 4
    assert sum(r["row_count"] for r in recs) == 300
    # re-run: all shards committed → resume is a no-op
    again = write_shards(_docs(spark, 300), path, 4, seed=1)
    assert again == []
    man = read_manifest(path)
    assert len(man["partitions"]) == 4
    back = read_table(spark, path)
    assert back.count() == 300
    assert back.select("doc_id").distinct().count() == 300


def test_invalid_shard_count_raises(spark):
    with pytest.raises(ValueError):
        shuffle_shard(_docs(spark, 10), 0)
    with pytest.raises(ValueError):
        shuffle_shard_balanced(_docs(spark, 10), 0)
