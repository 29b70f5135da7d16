"""Full-pipeline integration: PBF decode → way assembly → multipolygon →
polygon layer → PIP join of synthetic geotagged images → tile rollup —
the north-star flow, plus reader budget limits (reference F2/F4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.fixtures import build_pitcairn_like
from osm_read_enhanced_spark.operators.polygons import (
    assemble_way_geometries,
    build_polygon_layer,
    relation_multipolygons,
)
from osm_read_enhanced_spark.operators.spatial_join import (
    pip_join_broadcast,
    pip_join_cells,
)
from osm_read_enhanced_spark.operators.tiles import assign_tiles, tile_stats
from osm_read_enhanced_spark.sources.pbf import read_pbf


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    pbf = str(tmp_path_factory.mktemp("e2e") / "pitcairn-like.pbf")
    build_pitcairn_like(pbf)
    dfs = read_pbf(spark, pbf)
    geoms = assemble_way_geometries(dfs["ways"], dfs["nodes"], broadcast_nodes=True).cache()
    rings = relation_multipolygons(dfs["relations"], geoms)
    layer = build_polygon_layer(
        rings.select("polygon_id", "tags", "lats", "lons"), cover_res=7
    ).cache()
    rng = np.random.default_rng(7)
    pts = [
        (int(i), float(-25.066 + rng.uniform(-0.04, 0.04)),
         float(-130.1015 + rng.uniform(-0.04, 0.04)))
        for i in range(800)
    ]
    images = spark.createDataFrame(pts, "point_id long, lat double, lon double").cache()
    return pbf, layer, images


def test_admin_polygon_assembled_from_relation(pipeline):
    _, layer, _ = pipeline
    rows = layer.collect()
    assert len(rows) == 1
    p = rows[0]
    assert p.kind == "admin"
    assert p.tags["boundary"] == "administrative"
    assert len(p.covering_cells) > 0
    assert p.minlat < -25.066 < p.maxlat


def test_pip_strategies_agree_end_to_end(pipeline):
    _, layer, images = pipeline
    b = {(r.point_id, r.polygon_id) for r in pip_join_broadcast(images, layer).collect()}
    c = {(r.point_id, r.polygon_id) for r in pip_join_cells(images, layer, res=7).collect()}
    assert b == c
    assert 0 < len(b) < 800  # island polygon contains some but not all


def test_tile_rollup(pipeline):
    _, layer, images = pipeline
    pip = pip_join_broadcast(images, layer)
    tiled = assign_tiles(images, zooms=(12,))
    out = (
        pip.join(tiled, "point_id")
        .groupBy("polygon_id", "z", "x", "y")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sum(r.n for r in out) == pip.count()
    assert all(r.z == 12 for r in out)


def test_reader_budgets(spark, pipeline):
    pbf, _, _ = pipeline
    # maxBlobLimit (F2): only the first data block
    one = read_pbf(spark, pbf, kinds=("node",), max_blocks=1)
    assert one["nodes"].select("block_id").distinct().count() == 1
    # read_threshold (F4): tiny byte budget keeps only leading blocks
    full = read_pbf(spark, pbf, kinds=("node",))
    n_full = full["nodes"].count()
    capped = read_pbf(spark, pbf, kinds=("node",), byte_budget=3000)
    n_capped = capped["nodes"].count()
    assert 0 < n_capped < n_full
