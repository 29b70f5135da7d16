"""North-rule pipeline composition: image+caption table → cell encode →
PIP → tiles → resumable iceberg-lite commit with observed lineage."""

import os

from pyspark.sql import functions as F

from osm_read_enhanced_spark.pipelines.north_star import (
    enrich_images,
    run_north_star,
)
from osm_read_enhanced_spark.sources import iceberg_lite as il
from osm_read_enhanced_spark.sources.images import build_images_df


def _polygons(spark):
    # the deterministic admin squares (q21/q22 geometry) + one box over
    # the image-cluster geotag (sources.images CLUSTER_LAT/LON ≈ 51.5,
    # -0.11) so the dense cluster exercises the PIP match path
    r = spark.range(5).select(F.col("id").alias("k"))
    squares = r.select(
        F.col("k").cast("long").alias("polygon_id"),
        F.array(
            (-60.0 + F.col("k") * 25.0),
            (-60.0 + F.col("k") * 25.0),
            (-60.0 + F.col("k") * 25.0 + 20.0),
            (-60.0 + F.col("k") * 25.0 + 20.0),
        ).alias("lats"),
        F.array(
            (-150.0 + F.col("k") * 55.0),
            (-150.0 + F.col("k") * 55.0 + 45.0),
            (-150.0 + F.col("k") * 55.0 + 45.0),
            (-150.0 + F.col("k") * 55.0),
        ).alias("lons"),
    )
    cluster = spark.createDataFrame(
        [(99, [45.0, 45.0, 58.0, 58.0], [-10.0, 10.0, 10.0, -10.0])],
        "polygon_id long, lats array<double>, lons array<double>",
    )
    return squares.unionByName(cluster)


def test_enrich_keeps_every_image(spark):
    imgs = build_images_df(spark, n=48, partitions=4)
    out = enrich_images(imgs, _polygons(spark)).cache()
    assert out.count() == 48
    row = out.first()
    assert row.hex_cell is not None and row.s2_cell is not None
    assert 0 <= row.tile_x < 2**12 and 0 <= row.tile_y < 2**12
    # polygon membership is a left join: in + out both present
    assert out.filter("polygon_id IS NULL").count() > 0
    assert out.filter("polygon_id IS NOT NULL").count() > 0
    # caption/payload columns survive the enrichment untouched
    assert {"image_id", "bytes", "caption", "phash"} <= set(out.columns)


def test_north_star_commit_and_resume(spark, tmp_path):
    imgs = build_images_df(spark, n=48, partitions=4)
    table = str(tmp_path / "north")
    recs = run_north_star(spark, imgs, _polygons(spark), table)
    assert recs, "first run must commit partitions"
    total = sum(r["row_count"] for r in recs)
    assert total == 48
    # observed lineage == files on disk, per partition
    assert all(r["observed_rows"] == r["row_count"] for r in recs)
    # full re-run: everything already committed → nothing new
    again = run_north_star(spark, imgs, _polygons(spark), table)
    assert again == []
    # kill/rerun: drop one partition's commit record → exactly it re-commits
    manifest = il.read_manifest(table)
    victim = sorted(manifest["partitions"])[0]
    del manifest["partitions"][victim]
    il._write_manifest_atomic(table, manifest)
    redo = run_north_star(spark, imgs, _polygons(spark), table)
    assert [r["partition"] for r in redo] == [victim]
    # table reads back complete
    assert il.read_table(spark, table).count() == 48
    assert os.path.exists(os.path.join(table, f"part={victim}"))


def test_partition_key_is_coarse_tile(spark):
    imgs = build_images_df(spark, n=16, partitions=2)
    from osm_read_enhanced_spark.pipelines.north_star import partition_key_col

    out = enrich_images(imgs).withColumn("part_key", partition_key_col(12, 6))
    for r in out.select("tile_x", "tile_y", "part_key").collect():
        assert r.part_key == f"z6-{r.tile_x >> 6}-{r.tile_y >> 6}"


def test_low_zoom_tile_payloads_simplify_bounded_error(spark):
    """The DP simplifier wired into the tiling path (VERDICT r3 next
    #6): at z<8 wiggly way geometries shed most of their payload bytes;
    every dropped point stays within the zoom-derived eps of the
    simplified chain (the DP guarantee = sub-pixel at that zoom); at
    high zoom (tiny eps) the same ways keep nearly all points."""
    import numpy as np

    from osm_read_enhanced_spark.functions.simplify import dp_simplify
    from osm_read_enhanced_spark.operators.tiles import (
        low_zoom_tile_payloads,
        zoom_eps_deg,
    )

    # wiggly ways: 1-degree-long lines with ~0.01-degree noise — dense
    # at z12 scale, pure clutter at z4
    rng = np.random.default_rng(7)
    rows = []
    for wid in range(6):
        n = 200
        base_lat, base_lon = 10.0 + wid, 20.0 + wid * 2
        lats = base_lat + np.linspace(0, 1, n) + rng.normal(0, 0.01, n)
        lons = base_lon + np.linspace(0, 0.5, n) + rng.normal(0, 0.01, n)
        rows.append((wid, lats.tolist(), lons.tolist()))
    ways = spark.createDataFrame(
        rows, "way_id long, lats array<double>, lons array<double>"
    )
    stats = low_zoom_tile_payloads(ways, zooms=(4, 12)).collect()
    by_zoom: dict[int, list] = {}
    for r in stats:
        by_zoom.setdefault(r.z, []).append(r)
    # z4: eps ≈ 0.088° ≫ the 0.01° wiggle → payloads collapse
    z4_raw = sum(r.payload_bytes for r in by_zoom[4])
    z4_simp = sum(r.simplified_bytes for r in by_zoom[4])
    assert z4_simp < 0.1 * z4_raw, (z4_raw, z4_simp)
    assert all(r.bytes_saved_ratio > 0.8 for r in by_zoom[4])
    # z12: eps ≈ 0.00034° ≪ the wiggle → almost nothing dropped
    z12_raw = sum(r.payload_bytes for r in by_zoom[12])
    z12_simp = sum(r.simplified_bytes for r in by_zoom[12])
    assert z12_simp > 0.9 * z12_raw, (z12_raw, z12_simp)
    # DP guarantee, checked numerically: every original point is within
    # eps of the simplified chain at z4
    eps = zoom_eps_deg(4)
    for wid, lats, lons in rows:
        la = np.array(lats)
        lo = np.array(lons)
        sla, slo = dp_simplify(la, lo, eps)
        # distance from each original point to the simplified polyline
        dmin = np.full(len(la), np.inf)
        for i in range(len(sla) - 1):
            p0 = np.array([sla[i], slo[i]])
            p1 = np.array([sla[i + 1], slo[i + 1]])
            seg = p1 - p0
            L2 = seg @ seg
            pts = np.stack([la, lo], axis=1)
            t = np.clip(((pts - p0) @ seg) / max(L2, 1e-300), 0, 1)
            proj = p0 + t[:, None] * seg
            dmin = np.minimum(dmin, np.linalg.norm(pts - proj, axis=1))
        assert dmin.max() <= eps + 1e-12, (wid, dmin.max(), eps)
