"""Raster-tile assignment (SURVEY.md §2.5 J6): pure projection — slippy
z/x/y as JVM-side Column math (whole-stage codegen, no Python), then
groupBy/joins on the tile key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import tile_key_col, tile_x_col, tile_y_col


def assign_tiles(
    points: DataFrame,
    zooms: tuple[int, ...] = (12, 15),
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """→ one row per (point × zoom): point cols + z, x, y, tile_key."""
    parts = []
    for z in zooms:
        parts.append(
            points.select(
                "*",
                F.lit(z).alias("z"),
                tile_x_col(F.col(lon_col), z).alias("x"),
                tile_y_col(F.col(lat_col), z).alias("y"),
                tile_key_col(F.col(lat_col), F.col(lon_col), z).alias("tile_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tile_stats(tiled: DataFrame, payload_size_col: str | None = None) -> DataFrame:
    """Per-tile aggregation (counts + optional payload bytes) — the
    map-side-combinable agg Catalyst partials automatically."""
    aggs = [F.count("*").alias("n_points")]
    if payload_size_col:
        aggs += [
            F.sum(payload_size_col).alias("payload_bytes"),
            F.avg(payload_size_col).alias("avg_payload_bytes"),
        ]
    return tiled.groupBy("z", "x", "y").agg(*aggs)
