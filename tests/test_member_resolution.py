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
