"""Round-4 regression tests for the round-3 ADVICE findings.

1. (high) embedding_dup_pairs_banded dropped a qualifying pair whose
   lower id sat in the HIGHER of two adjacent buckets: the probe side
   explodes only to {b, b+1}, so that pair was generated solely as
   (id_a=higher, id_b=lower) and the pre-canonical id_a < id_b filter
   killed it. Fixed by joining on id_a != id_b and canonicalizing with
   least/greatest before dropDuplicates.
2. (medium) resolve_members_deep silently dropped type-2 members whose
   target relation is absent: the left join + posexplode_outer yielded a
   null-typed row that failed every type filter. Fixed by splitting the
   frontier on target existence and emitting dangling refs unresolved.
3. (low) variant_image drew the patch x coordinate from an h-based
   bound; on non-square images the patch could land out of range (empty
   slice → variant identical to base). Fixed with separate y/x bounds.
4. (low) _dominant_direction crashed on empty / all-zero-norm samples.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.operators import dedup
from osm_read_enhanced_spark.operators.dedup import (
    embedding_dup_pairs_banded,
    embedding_dup_pairs_broadcast,
)
from osm_read_enhanced_spark.operators.relations import (
    resolve_members,
    resolve_members_deep,
)
from osm_read_enhanced_spark.sources.images import (
    VARIANT_PATCH,
    render_image,
    variant_image,
)


def _unit_from_projection(p):
    """2-D unit vector with first coordinate (= projection onto e1) p."""
    return [float(p), float(math.sqrt(max(1.0 - p * p, 0.0)))]


def test_banded_boundary_straddle_both_orientations(spark, monkeypatch):
    """A qualifying pair astride a bucket boundary with the LOWER id in
    the HIGHER bucket must survive (ADVICE r3 high). Both boundary
    orientations are planted; u is pinned to e1 so bucket placement is
    exact and sign-independent."""
    # pin a single projection direction so bucket placement is exact
    # (the operator's multi-direction upgrade keeps the same contract)
    monkeypatch.setattr(dedup, "_projection_directions", lambda *a, **k: [[1.0, 0.0]])
    tau = 0.9
    delta = math.sqrt(2.0 - 2.0 * tau)
    eps = 0.004
    rows = [
        (1, _unit_from_projection(delta + eps)),   # bucket 1  (lower id, HIGHER bucket)
        (2, _unit_from_projection(delta - eps)),   # bucket 0  → pair (1,2) straddles
        (3, _unit_from_projection(delta - eps)),   # bucket 0  (lower id, lower bucket)
        (4, _unit_from_projection(delta + eps)),   # bucket 1  → pair (3,4) straddles
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_banded(df, threshold=tau).collect()
    }
    # all four vectors are nearly identical → every pair qualifies
    expected = {(a, b) for a in range(1, 5) for b in range(a + 1, 5)}
    assert got == expected, f"missing: {expected - got}"
    # and the banded output still equals the broadcast (reference) plan
    bcast = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_broadcast(df, threshold=tau).collect()
    }
    assert got == bcast


def test_banded_randomized_equals_numpy_near_boundaries(spark):
    """Randomized stress with REAL data-derived u: many vectors packed
    near projection-bucket boundaries; banded must equal the exact
    numpy all-pairs set."""
    tau = 0.92
    rng = np.random.default_rng(404)
    M = rng.normal(size=(120, 8))
    M /= np.linalg.norm(M, axis=1)[:, None]
    # plant near-dup pairs with random id orientation
    for _ in range(30):
        i, j = rng.integers(0, 120, 2)
        M[j] = M[i] + rng.normal(scale=0.02, size=8)
        M[j] /= np.linalg.norm(M[j])
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in M[i]]) for i in range(len(M))],
        "vec_id long, embedding array<double>",
    )
    C = M @ M.T
    expected = {
        (a, b)
        for a in range(len(M))
        for b in range(a + 1, len(M))
        if C[a, b] >= tau
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_banded(df, threshold=tau).collect()
    }
    assert got == expected


def test_dominant_direction_degrades_gracefully(spark):
    """Empty or all-zero-norm samples must not crash the banded path
    (ADVICE r3 low #4)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_dup_pairs_banded(empty, threshold=0.9).count() == 0
    zeros = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    # zero-norm vectors have undefined cosine → no pairs, no crash
    assert embedding_dup_pairs_banded(zeros, threshold=0.9).count() == 0


def test_deep_resolve_keeps_dangling_relation_member(spark):
    """A type-2 member whose target relation is absent must keep its
    row with null payload — matching the docstring contract and the
    flat resolver (ADVICE r3 medium)."""
    nodes = spark.createDataFrame(
        [(1, 10.0, 20.0, {"name": "n1"})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [], "id long, refs array<long>, tags map<string,string>"
    )
    relations = spark.createDataFrame(
        [(100, [(1, "admin_centre", 0), (999, "subarea", 2)])],
        "id long, members array<struct<ref:long, role:string, type:int>>",
    )
    flat = resolve_members(relations, nodes, ways).filter(F.col("ref") == 999)
    assert flat.count() == 1
    deep = resolve_members_deep(relations, nodes, ways, max_depth=3)
    dangling = deep.filter(F.col("ref") == 999).collect()
    assert len(dangling) == 1, "dangling type-2 member must not vanish"
    r = dangling[0]
    assert r.member_type == 2 and r.role == "subarea" and r.rel_id == 100
    assert r.node_lat is None and r.way_refs is None
    # total rows: node member + dangling relation member
    assert deep.count() == 2
    # and a dangling ref INSIDE an expanded sub-relation is kept too
    relations2 = spark.createDataFrame(
        [
            (100, [(200, "subarea", 2)]),
            (200, [(1, "admin_centre", 0), (888, "subarea", 2)]),
        ],
        "id long, members array<struct<ref:long, role:string, type:int>>",
    )
    deep2 = resolve_members_deep(relations2, nodes, ways, max_depth=3)
    # ref 888 appears twice: relation 200 is ALSO resolved as its own
    # root (depth 0), plus expanded under root 100 (depth 1)
    inner = {(r.root_rel_id, r.depth) for r in deep2.filter(F.col("ref") == 888).collect()}
    assert inner == {(200, 0), (100, 1)}


@pytest.mark.parametrize("w,h", [(16, 64), (64, 16), (40, 24)])
def test_variant_image_nonsquare_patch_in_bounds(w, h):
    """variant_image on non-square images must perturb a patch INSIDE
    the frame (ADVICE r3 low: the x bound used h, so wide/tall images
    could get an out-of-range → empty patch = no variant at all)."""
    for idx in range(24):
        base = render_image(idx, w=w, h=h).astype(np.int16)
        var = variant_image(idx, w=w, h=h).astype(np.int16)
        diff = np.argwhere((base != var).any(axis=2))
        assert diff.size > 0, f"idx={idx}: variant identical to base"
        ys, xs = diff[:, 0], diff[:, 1]
        assert ys.max() - ys.min() < VARIANT_PATCH
        assert xs.max() - xs.min() < VARIANT_PATCH


def test_variant_image_square_fixture_unchanged():
    """The q46 fixture (32×32) must be byte-identical across the fix:
    two scalar draws with equal bounds consume the PCG64 stream exactly
    like the old size-2 array draw."""
    for idx in (0, 3, 6, 9):
        img = variant_image(idx)  # default 32×32
        rng = np.random.default_rng(5042 + idx)
        y, x = rng.integers(0, 32 - VARIANT_PATCH, 2)
        patch = rng.integers(-8, 9, (VARIANT_PATCH, VARIANT_PATCH, 3))
        expected = render_image(idx).astype(np.int16)
        expected[y : y + VARIANT_PATCH, x : x + VARIANT_PATCH] += patch
        assert (img == np.clip(expected, 0, 255).astype(np.uint8)).all()


def test_banded_multidir_mixed_sign_offsets(spark, monkeypatch):
    """k>1 banding regression: a qualifying pair whose cells differ by
    (+1, −1) across two directions is reachable from NEITHER side under
    the 1-D {0,+1}-and-swap probing — only the symmetric {−1,0,+1}^k
    probe finds it. Directions pinned to the first two axes."""
    monkeypatch.setattr(
        dedup, "_projection_directions",
        lambda *a, **k: [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]],
    )
    tau = 0.9
    delta = math.sqrt(2.0 - 2.0 * tau)
    eps = 0.003

    def vec(p1, p2):
        z = math.sqrt(max(1.0 - p1 * p1 - p2 * p2, 0.0))
        return [p1, p2, z, 0.0]

    rows = [
        (1, vec(delta + eps, delta - eps)),  # cell (1, 0)
        (2, vec(delta - eps, delta + eps)),  # cell (0, 1) → offset (+1, -1)
        (3, vec(delta - eps, delta - eps)),  # cell (0, 0)
        (4, vec(delta + eps, delta + eps)),  # cell (1, 1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_banded(df, threshold=tau).collect()
    }
    expected = {(a, b) for a in range(1, 5) for b in range(a + 1, 5)}
    assert got == expected, f"missing: {expected - got}"
    bcast = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_broadcast(df, threshold=tau).collect()
    }
    assert got == bcast
