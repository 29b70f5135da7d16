"""Round-3 scale-safety tests (VERDICT r2 #2):

The q33 catalog plan must survive a 100× scale-up: beyond a broadcast
cap the EXACT projection-banded bucket equi-join replaces the
whole-table broadcast-array scan. Tests prove (a) the banded operator
is exactly equal to an independent numpy all-pairs computation and to
the broadcast plan, (b) its physical plan contains no broadcast of the
table and no cartesian product, (c) the dispatcher switches strategy
at the cap.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.operators.dedup import (
    embedding_dup_pairs_banded,
    embedding_dup_pairs_broadcast,
    embedding_dup_pairs_exact,
)


def _mk_embeddings(spark, n, d=16, n_dup_clusters=8, seed=5):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, d))
    for c in range(n_dup_clusters):  # planted near-dup clusters
        base = rng.integers(0, n)
        for _ in range(3):
            tgt = rng.integers(0, n)
            M[tgt] = M[base] + rng.normal(scale=0.03, size=d)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in M[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return df, M


def _numpy_pairs(M, threshold):
    norm = np.linalg.norm(M, axis=1)
    C = (M @ M.T) / np.outer(norm, norm)
    return {
        (i, j): C[i, j]
        for i in range(len(M))
        for j in range(i + 1, len(M))
        if C[i, j] >= threshold
    }


def test_banded_equals_numpy_and_broadcast(spark):
    df, M = _mk_embeddings(spark, 400)
    expected = _numpy_pairs(M, 0.9)
    banded = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs_banded(df, threshold=0.9, round_to=6).collect()
    }
    bcast = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs_broadcast(df, threshold=0.9, round_to=6).collect()
    }
    assert set(banded) == set(expected) == set(bcast)
    for k, v in expected.items():
        assert abs(banded[k] - v) < 1e-5


def test_banded_plan_has_no_table_broadcast(spark):
    """The 100×-scale criterion: the banded plan must be an equi-join
    shuffle — no broadcast of the embeddings table (BroadcastNestedLoop
    or ObjectHashAggregate/collect_list), no CartesianProduct."""
    df, _ = _mk_embeddings(spark, 200)
    plan = embedding_dup_pairs_banded(df, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_list" not in plan
    # candidate generation is a real equi-join on the bucket key
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_dispatcher_switches_at_cap(spark):
    """At 10× rows with a cap the broadcast plan would exceed, the
    dispatcher must pick the banded equi-join — and stay exact."""
    df, M = _mk_embeddings(spark, 500)
    # cap chosen so 500·16·8 B = 64 kB exceeds it → banded path
    out = embedding_dup_pairs_exact(
        df, threshold=0.9, broadcast_cap_bytes=32 << 10
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == set(_numpy_pairs(M, 0.9))
    # under the cap → matmul-prefilter broadcast scan (r6 shape:
    # MapInArrow candidates + broadcast-join exact verify; the r5
    # BroadcastNestedLoopJoin array scan is gone)
    small = embedding_dup_pairs_exact(
        df.limit(50), threshold=0.9, broadcast_cap_bytes=64 << 20
    )
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan_small
    assert "CartesianProduct" not in plan_small
