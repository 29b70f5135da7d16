"""Round-5 regression (VERDICT r4 #3): the endpoint-keyed O(n) ring
stitcher in operators/polygons.py must select the SAME continuations as
the linear scan it replaced. The pin is a clean-room reference stitcher
(the old O(n²) semantics restated from the ring-assembly contract:
lowest-index open segment matching either endpoint wins, start-match
preferred for direction) run over adversarial segment soups.
"""

import numpy as np
import pytest

from osm_read_enhanced_spark.operators.polygons import relation_multipolygons


def _reference_rings(seg_list):
    """Clean-room restatement of the pre-round-5 scan semantics."""
    open_segs = [(np.asarray(a, float), np.asarray(b, float)) for a, b in seg_list]
    rings = []
    while open_segs:
        la, lo = open_segs.pop(0)
        changed = True
        while changed and not (la[0] == la[-1] and lo[0] == lo[-1]):
            changed = False
            for i, (sla, slo) in enumerate(open_segs):
                if sla[0] == la[-1] and slo[0] == lo[-1]:
                    la = np.concatenate([la, sla[1:]])
                    lo = np.concatenate([lo, slo[1:]])
                elif sla[-1] == la[-1] and slo[-1] == lo[-1]:
                    la = np.concatenate([la, sla[-2::-1]])
                    lo = np.concatenate([lo, slo[-2::-1]])
                else:
                    continue
                open_segs.pop(i)
                changed = True
                break
        if la[0] == la[-1] and lo[0] == lo[-1] and len(la) >= 4:
            rings.append((la[:-1].tolist(), lo[:-1].tolist()))
    return rings


def _split_ring(verts, cuts, rng, reverse_frac=0.4):
    """Closed ring vertex list → segment soup (some reversed)."""
    pts = verts + [verts[0]]
    idx = sorted(set([0] + list(cuts) + [len(pts) - 1]))
    segs = []
    for a, b in zip(idx, idx[1:]):
        seg = pts[a : b + 1]
        if rng.random() < reverse_frac:
            seg = seg[::-1]
        segs.append(([p[0] for p in seg], [p[1] for p in seg]))
    rng.shuffle(segs)
    return segs


def _run_spark_stitch(spark, seg_list, roles=None):
    roles = roles or ["outer"] * len(seg_list)
    way_rows = [
        (1000 + i, list(map(float, la)), list(map(float, lo)))
        for i, (la, lo) in enumerate(seg_list)
    ]
    ways = spark.createDataFrame(
        way_rows, "way_id long, lats array<double>, lons array<double>"
    )
    members = [
        {"type": 1, "ref": 1000 + i, "role": roles[i]} for i in range(len(seg_list))
    ]
    rels = spark.createDataFrame(
        [(900, {"type": "multipolygon"}, members)],
        "id long, tags map<string,string>, "
        "members array<struct<type:int,ref:long,role:string>>",
    )
    return relation_multipolygons(rels, ways).collect()


def _canon(rings):
    """Order-independent ring fingerprint: sorted vertex multiset."""
    return sorted(tuple(sorted(zip(la, lo))) for la, lo in rings)


def test_stitch_equals_reference_on_fragmented_rings(spark):
    rng = np.random.default_rng(7)
    n = 60
    ring1 = [(float(np.cos(2 * np.pi * i / n)), float(np.sin(2 * np.pi * i / n))) for i in range(n)]
    ring2 = [(5.0 + dx, 5.0 + dy) for dx, dy in [(0, 0), (0, 1), (1, 1), (1, 0)]]
    segs = _split_ring(ring1, rng.choice(range(1, n), 9, replace=False), rng)
    segs += _split_ring(ring2, [2], rng)
    # a dangling unclosed chain that must be consumed but not emitted
    segs.append(([9.0, 9.5], [9.0, 9.5]))
    order = list(range(len(segs)))
    rng.shuffle(order)
    segs = [segs[i] for i in order]

    expected = _canon(_reference_rings(segs))
    got = _run_spark_stitch(spark, segs)
    assert _canon([(r.lats, r.lons) for r in got]) == expected
    assert len(expected) == 2


def test_stitch_equals_reference_with_shared_endpoints(spark):
    # figure-8: two rings touching at the origin — multiple open
    # segments share an endpoint, exercising candidate-choice order
    segs = [
        ([0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),   # 3/4 of ring A
        ([0.0, 0.0], [1.0, 0.0]),                        # closes A at origin
        ([0.0, -1.0, -1.0, 0.0], [0.0, 0.0, -1.0, -1.0]),
        ([0.0, 0.0], [-1.0, 0.0]),                       # closes B at origin
    ]
    expected = _canon(_reference_rings(segs))
    got = _run_spark_stitch(spark, segs)
    assert _canon([(r.lats, r.lons) for r in got]) == expected
    assert len(expected) == 2


def test_stitch_large_relation_linear_time(spark):
    # coastline-class relation: one ring split into 1200 segments.
    # The old scan was O(n²) here; the dict version must both match the
    # reference semantics and finish promptly.
    rng = np.random.default_rng(11)
    n = 2400
    ring = [
        (float(np.cos(2 * np.pi * i / n)) * 10, float(np.sin(2 * np.pi * i / n)) * 10)
        for i in range(n)
    ]
    cuts = rng.choice(range(1, n), 1199, replace=False)
    segs = _split_ring(ring, cuts, rng)
    got = _run_spark_stitch(spark, segs)
    assert len(got) == 1
    assert sorted(zip(got[0].lats, got[0].lons)) == sorted(ring)


def test_stitch_inner_role_rings(spark):
    segs = [
        ([0.0, 0.0, 4.0, 4.0, 0.0], [0.0, 4.0, 4.0, 0.0, 0.0]),  # outer closed
        ([1.0, 1.0, 2.0], [1.0, 2.0, 2.0]),
        ([2.0, 2.0, 1.0], [2.0, 1.0, 1.0]),  # inner split in two
    ]
    got = _run_spark_stitch(spark, segs, roles=["outer", "inner", "inner"])
    by_role = {}
    for r in got:
        by_role.setdefault(r.role, []).append(r)
    assert len(by_role["outer"]) == 1 and len(by_role["inner"]) == 1
    assert sorted(zip(by_role["inner"][0].lats, by_role["inner"][0].lons)) == [
        (1.0, 1.0),
        (1.0, 2.0),
        (2.0, 1.0),
        (2.0, 2.0),
    ]
