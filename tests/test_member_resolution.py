"""Relation member resolution (SURVEY §2.5 J3) + fast element counts
(§2.6 A2)."""

from pyspark.sql import functions as F

from osm_read_enhanced_spark.fixtures import build_pitcairn_like
from osm_read_enhanced_spark.operators.relations import resolve_members
from osm_read_enhanced_spark.sources.pbf import read_pbf
from osm_read_enhanced_spark.sources.pbf.reader import count_elements


def test_resolve_members_typed_joins(spark):
    nodes = spark.createDataFrame(
        [(1, 10.0, 20.0, {"amenity": "cafe"})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(100, [1, 2, 3], {"highway": "a"})],
        "id long, refs array<long>, tags map<string,string>",
    )
    rels = spark.createDataFrame(
        [
            (
                900,
                {"type": "route"},
                [(1, "stop", 0), (100, "", 1), (901, "sub", 2), (77, "missing", 0)],
            )
        ],
        "id long, tags map<string,string>, members array<struct<ref:long,role:string,type:int>>",
    )
    rows = {
        (r.morder): r for r in resolve_members(rels, nodes, ways).collect()
    }
    assert len(rows) == 4
    assert rows[0].node_lat == 10.0 and rows[0].role == "stop"
    assert rows[1].way_refs == [1, 2, 3] and rows[1].member_type == 1
    assert rows[2].member_type == 2 and rows[2].node_lat is None
    assert rows[3].node_lat is None  # unresolved ref kept with nulls


def test_count_elements_matches_full_decode(spark, tmp_path):
    path = str(tmp_path / "p.pbf")
    build_pitcairn_like(path)
    counts = count_elements(spark, path).orderBy("block_id").collect()
    assert [(c.block_id, c.n_nodes, c.n_ways, c.n_relations) for c in counts] == [
        (1, 400, 0, 0),
        (2, 400, 0, 0),
        (3, 0, 16, 0),
        (4, 0, 0, 1),
    ]
    dfs = read_pbf(spark, path)
    assert sum(c.n_nodes for c in counts) == dfs["nodes"].count()
    assert sum(c.n_ways for c in counts) == dfs["ways"].count()


def test_resolve_members_deep_nested_relations(spark):
    """Relation-of-relations (nested admin boundary shape): the deep
    resolver must emit leaf node/way payloads with root lineage, cut
    cycles by emitting the cyclic ref unresolved, and leave refs beyond
    max_depth unresolved (VERDICT r2 missing #3)."""
    from osm_read_enhanced_spark.operators.relations import resolve_members_deep

    nodes = spark.createDataFrame(
        [(1, 10.0, 20.0, {"name": "n1"}), (2, 11.0, 21.0, {})],
        "id long, lat double, lon double, tags map<string,string>",
    )
    ways = spark.createDataFrame(
        [(50, [1, 2], {"highway": "primary"})],
        "id long, refs array<long>, tags map<string,string>",
    )
    member = "array<struct<ref:long, role:string, type:int>>"
    relations = spark.createDataFrame(
        [
            # 100 = super-relation: node 1 + sub-relation 200
            (100, [(1, "admin_centre", 0), (200, "subarea", 2)]),
            # 200 = way 50 + sub-sub-relation 300 (depth 2)
            (200, [(50, "outer", 1), (300, "subarea", 2)]),
            # 300 = node 2 + a CYCLE back to 100
            (300, [(2, "admin_centre", 0), (100, "loop", 2)]),
        ],
        f"id long, members {member}",
    )
    out = resolve_members_deep(relations, nodes, ways, max_depth=3)
    rows = out.filter(F.col("root_rel_id") == 100).orderBy("depth", "morder").collect()
    # depth 0: node 1 resolved directly
    d0 = [r for r in rows if r.depth == 0 and r.member_type == 0]
    assert len(d0) == 1 and d0[0].node_lat == 10.0
    # depth 1: way 50 resolved through sub-relation 200
    d1w = [r for r in rows if r.depth == 1 and r.member_type == 1]
    assert len(d1w) == 1 and d1w[0].way_refs == [1, 2] and d1w[0].rel_id == 200
    assert d1w[0].path == [100]
    # depth 2: node 2 resolved through 200 → 300
    d2n = [r for r in rows if r.depth == 2 and r.member_type == 0]
    assert len(d2n) == 1 and d2n[0].node_lon == 21.0 and d2n[0].path == [100, 200]
    # the cycle 300 → 100 is emitted UNRESOLVED, never re-entered
    cyc = [r for r in rows if r.member_type == 2 and r.ref == 100]
    assert len(cyc) == 1 and cyc[0].node_lat is None
    assert not [r for r in rows if r.depth > 2 and r.member_type != 2]
    # depth cap: with max_depth=1 the 300-ref stays an unresolved leaf
    shallow = resolve_members_deep(relations, nodes, ways, max_depth=1)
    srows = shallow.filter(
        (F.col("root_rel_id") == 100) & (F.col("member_type") == 2) & (F.col("ref") == 300)
    ).collect()
    assert len(srows) == 1 and srows[0].way_refs is None
