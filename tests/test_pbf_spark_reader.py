"""Spark-side PBF reader tests: block-index DF + mapInPandas decode."""

import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.fixtures import build_pitcairn_like
from osm_read_enhanced_spark.sources.pbf import pbf_block_index, read_pbf

TEST_PBF = "/root/reference/test/test.pbf"
MANY_NODES_PBF = "/root/reference/test/manyNodes.pbf"


def test_block_index_df(spark):
    idx = pbf_block_index(spark, TEST_PBF).orderBy("block_id").collect()
    assert [r.block_type for r in idx] == ["OSMHeader", "OSMData"]
    assert idx[1].size == 476


def test_read_pbf_entities(spark):
    dfs = read_pbf(spark, TEST_PBF)
    nodes = dfs["nodes"].orderBy("lat").collect()
    assert len(nodes) == 6
    by_id = {r.id: r for r in nodes}
    assert abs(by_id[275452090].lat - 51.5075933) < 5e-8
    assert by_id[275452090].tags == {"name": "Jam's Sandwich Bar", "amenity": "cafe"}
    ways = dfs["ways"].collect()
    assert len(ways) == 1
    assert ways[0].refs == [304994979, 319408587, 319408586, 304994980, 304994981]
    assert ways[0].tags["name"] == "üßé€"
    rels = dfs["relations"].collect()
    assert len(rels) == 1
    assert [(m.ref, m.role, m.type) for m in rels[0].members] == [
        (319408586, "", 0),
        (27776903, "", 1),
    ]


def test_read_pbf_many_nodes_count(spark):
    dfs = read_pbf(spark, MANY_NODES_PBF, kinds=("node",))
    agg = dfs["nodes"].agg(
        F.count("*").alias("n"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
        F.countDistinct("id").alias("d"),
    ).collect()[0]
    assert (agg.n, agg.lo, agg.hi, agg.d) == (3000, 1, 3000, 3000)


def test_read_pbf_multi_block_distribution(spark, tmp_path):
    """Blocks decode independently across partitions; block-local delta
    chains never span partitions (block = Arrow batch)."""
    path = str(tmp_path / "pitcairn-like.pbf")
    build_pitcairn_like(path)
    dfs = read_pbf(spark, path, partitions=4)
    n_nodes = dfs["nodes"].count()
    assert n_nodes == 800
    per_block = {r.block_id: r["count"] for r in dfs["nodes"].groupBy("block_id").count().collect()}
    assert per_block == {1: 400, 2: 400}
    way_refs = dfs["ways"].select(F.size("refs").alias("n")).agg(F.min("n"), F.max("n")).collect()[0]
    assert way_refs[0] > 0
    rel = dfs["relations"].collect()[0]
    roles = {m.role for m in rel.members}
    assert {"outer", "label", "admin_centre"} <= roles


def test_compat_mode_spark(spark):
    dfs = read_pbf(spark, TEST_PBF, kinds=("node", "way"), mode="osm-read-compat")
    tags = {r.id: r.tags for r in dfs["nodes"].collect()}
    assert tags[275452090] == {"Matt": "private", "jamicu": "gate"}
    assert dfs["ways"].collect()[0].tags == {}
