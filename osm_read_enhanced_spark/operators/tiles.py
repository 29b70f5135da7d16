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


def tile_stats(
    tiled: DataFrame,
    payload_size_col: str | None = None,
    simplified_size_col: str | None = None,
) -> DataFrame:
    """Per-tile aggregation (counts + optional payload bytes) — the
    map-side-combinable agg Catalyst partials automatically.

    ``simplified_size_col`` (round 4) adds the before/after payload
    comparison for geometry-simplified tiles: total simplified bytes
    plus the byte reduction ratio vs ``payload_size_col``."""
    aggs = [F.count("*").alias("n_points")]
    if payload_size_col:
        aggs += [
            F.sum(payload_size_col).alias("payload_bytes"),
            F.avg(payload_size_col).alias("avg_payload_bytes"),
        ]
    if simplified_size_col:
        if not payload_size_col:
            raise ValueError("simplified_size_col requires payload_size_col")
        aggs.append(F.sum(simplified_size_col).alias("simplified_bytes"))
    out = tiled.groupBy("z", "x", "y").agg(*aggs)
    if simplified_size_col:
        out = out.withColumn(
            "bytes_saved_ratio",
            F.round(
                (F.col("payload_bytes") - F.col("simplified_bytes"))
                / F.col("payload_bytes"),
                4,
            ),
        )
    return out


def zoom_eps_deg(zoom: int, px_tolerance: float = 1.0, tile_px: int = 256) -> float:
    """Douglas-Peucker tolerance for a zoom level, in degrees: one tile
    at zoom z spans 360/2^z degrees of longitude over ``tile_px``
    pixels, so a ``px_tolerance``-pixel deviation is invisible at that
    zoom. (Equatorial scale; the DP error bound below is in the same
    degree space the kernel measures in.)"""
    return px_tolerance * 360.0 / ((1 << zoom) * tile_px)


def low_zoom_tile_payloads(
    way_geoms: DataFrame,
    zooms: tuple[int, ...] = (4, 6, 8),
    px_tolerance: float = 1.0,
    bytes_per_point: int = 16,
) -> DataFrame:
    """The low-zoom tile-payload stage the DP simplifier was built for
    (VERDICT r3 next #6): per zoom, simplify each way geometry with the
    zoom-derived eps (``zoom_eps_deg`` — coarser zoom → larger eps →
    fewer points), assign the way to its centroid tile with the
    engine's JVM tile math, and aggregate payload bytes before/after.

    → (z, x, y, n_points→n_ways, payload_bytes, avg_payload_bytes,
       simplified_bytes, bytes_saved_ratio) per tile.

    Shape at scale: one Arrow-batched no-shuffle pass per zoom (short
    union, like assign_tiles) + one map-side-combinable groupBy. DP's
    guarantee bounds the geometric error of every dropped point by eps,
    i.e. under ``px_tolerance`` rendered pixels at that zoom.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.simplify import dp_keep_mask

    schema = T.StructType(
        [
            T.StructField("way_id", T.LongType(), False),
            T.StructField("clat", T.DoubleType(), False),
            T.StructField("clon", T.DoubleType(), False),
            T.StructField("raw_bytes", T.LongType(), False),
            T.StructField("simp_bytes", T.LongType(), False),
        ]
    )
    parts = []
    for z in zooms:
        eps = zoom_eps_deg(z, px_tolerance)

        def run(it, eps=eps):
            for pdf in it:
                rows = []
                for wid, la, lo in zip(pdf["way_id"], pdf["lats"], pdf["lons"]):
                    la = np.asarray(la, dtype=np.float64)
                    lo = np.asarray(lo, dtype=np.float64)
                    if len(la) == 0:
                        continue
                    kept = int(dp_keep_mask(la, lo, eps).sum())
                    rows.append(
                        (
                            int(wid),
                            float(la.mean()),
                            float(lo.mean()),
                            len(la) * bytes_per_point,
                            kept * bytes_per_point,
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["way_id", "clat", "clon", "raw_bytes", "simp_bytes"]
                )

        sized = way_geoms.select("way_id", "lats", "lons").mapInPandas(run, schema)
        parts.append(
            sized.select(
                F.lit(z).alias("z"),
                tile_x_col(F.col("clon"), z).alias("x"),
                tile_y_col(F.col("clat"), z).alias("y"),
                "raw_bytes",
                "simp_bytes",
            )
        )
    tiled = parts[0]
    for p in parts[1:]:
        tiled = tiled.unionByName(p)
    return tile_stats(tiled, "raw_bytes", "simp_bytes")
