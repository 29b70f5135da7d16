"""Distributed point-in-polygon joins (SURVEY.md §2.5 J4).

Two physical strategies, chosen by polygon-layer size:

- ``pip_join_broadcast`` — the north-star pattern: the polygon layer
  (rings + bboxes) is broadcast once; every task lazily bulk-loads a
  shared STR R-tree and probes it per Arrow batch, ray-casting only the
  bbox candidates. Zero shuffle on the fact side; scales to any number
  of points. Right choice while polygons ≤ a few hundred MB.
- ``pip_join_cells`` — for huge polygon layers: polygons explode their
  hex covering cells, points compute their cell, equi-join on the cell
  (shuffle, AQE-skew-aware), then exact ray-cast refine per matched
  pair. Shuffles scale with candidate pairs, not |points| × |polygons|.

Both refine with the same vectorized kernel; results are identical.
"""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import hexgrid
from ..functions.pip import points_in_ring
from .rtree import STRtree

# Per-worker cache of broadcast-built R-trees, keyed by a driver-generated
# uuid captured in the probe closure (NOT id(bc): the CPython address of
# the per-task deserialized Broadcast differs per task — no sharing — and
# can be reused by a later broadcast after GC — stale-tree risk).
# LRU-bounded so long-lived reused Python workers don't grow unboundedly.
_TREE_CACHE: dict = {}
_TREE_CACHE_MAX = 4


def _tree_cache_get(token: str, build):
    cached = _TREE_CACHE.get(token)
    if cached is None:
        cached = build()
        while len(_TREE_CACHE) >= _TREE_CACHE_MAX:
            _TREE_CACHE.pop(next(iter(_TREE_CACHE)))
        _TREE_CACHE[token] = cached
    return cached


def _collect_polygon_layer(polygons: DataFrame):
    """Driver-side: polygon layer → (ids, rings, boxes) plain arrays for
    broadcast. Layer must be 'small' (admin/landuse scale)."""
    rows = polygons.select("polygon_id", "lats", "lons").collect()
    ids = np.array([r.polygon_id for r in rows], dtype=np.int64)
    rings = [
        (np.asarray(r.lats, dtype=np.float64), np.asarray(r.lons, dtype=np.float64))
        for r in rows
    ]
    boxes = np.array(
        [[lo.min(), la.min(), lo.max(), la.max()] for la, lo in rings], dtype=np.float64
    )
    return ids, rings, boxes


def pip_join_broadcast(
    points: DataFrame,
    polygons: DataFrame,
    point_id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    keep_cols: tuple = (),
) -> DataFrame:
    """→ (point_id[, keep_cols...], polygon_id) exact containment pairs.

    ``keep_cols`` pass extra (narrow!) point columns through the Python
    probe stage so downstream stages need no join back on point_id —
    e.g. precomputed JVM tile coordinates ride along instead of costing
    a 10^12-row shuffle join afterwards. Keep heavy columns (image
    bytes) OUT and join those by id instead."""
    from ..session import python_parallelism

    spark = points.sparkSession
    layer = _collect_polygon_layer(polygons)
    bc = spark.sparkContext.broadcast(layer)
    token = uuid.uuid4().hex  # driver-side identity of this polygon layer
    n_parts = python_parallelism(spark)

    keep_cols = tuple(keep_cols)
    schema = T.StructType(
        [
            points.schema[point_id_col],
            *[points.schema[c] for c in keep_cols],
            T.StructField("polygon_id", T.LongType(), False),
        ]
    )
    in_cols = [point_id_col, *keep_cols, lat_col, lon_col]
    i_lat, i_lon = in_cols.index(lat_col), in_cols.index(lon_col)
    out_idx = list(range(len(in_cols) - 2))  # id + keep_cols positions

    def probe(it):
        import pyarrow as pa

        def build():
            ids, rings, boxes = bc.value
            return ids, rings, STRtree(boxes)

        ids, rings, tree = _tree_cache_get(token, build)
        for rb in it:
            xs = np.asarray(rb.column(i_lon).to_numpy(zero_copy_only=False),
                            dtype=np.float64)
            ys = np.asarray(rb.column(i_lat).to_numpy(zero_copy_only=False),
                            dtype=np.float64)
            pi, bi = tree.query_points(xs, ys)
            if len(pi) == 0:
                continue
            keep_p, keep_poly = [], []
            # refine per candidate polygon (vectorize across its points)
            order = np.argsort(bi, kind="stable")
            pi, bi = pi[order], bi[order]
            bounds = np.flatnonzero(np.r_[True, bi[1:] != bi[:-1], True])
            for a, b in zip(bounds[:-1], bounds[1:]):
                poly = bi[a]
                la, lo = rings[poly]
                sel = pi[a:b]
                m = points_in_ring(ys[sel], xs[sel], la, lo)
                if m.any():
                    keep_p.append(sel[m])
                    keep_poly.append(np.full(int(m.sum()), ids[poly], dtype=np.int64))
            if keep_p:
                kp = pa.array(np.concatenate(keep_p))
                arrays = [rb.column(j).take(kp) for j in out_idx]
                arrays.append(pa.array(np.concatenate(keep_poly)))
                yield pa.RecordBatch.from_arrays(
                    arrays, names=[*in_cols[:-2], "polygon_id"]
                )

    # distribute the probe over the Python-stage width WITHOUT a
    # round-robin shuffle when the scan is already wide enough:
    # coalesce is narrow (merges scan splits in-stage); only a
    # too-narrow input (1-2 parquet splits at small SF) pays the
    # repartition exchange. (guide §2.4: remove shuffles outright)
    proj = points.select(*in_cols)
    n_in = proj.rdd.getNumPartitions()
    if n_in < n_parts:
        proj = proj.repartition(n_parts)
    elif n_in > n_parts:
        proj = proj.coalesce(n_parts)
    # Arrow-native probe: no pandas materialization on either side —
    # inputs are read as numpy views, outputs are pyarrow takes over
    # the input batch (guide §4.2)
    return proj.mapInArrow(probe, schema)


def pip_join_cells(
    points: DataFrame,
    polygon_layer: DataFrame,
    res: int = 7,
    point_id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    salt_buckets: int = 0,
) -> DataFrame:
    """Cell-coarse equi-join + exact refine → (point_id, polygon_id).

    ``polygon_layer`` needs covering_cells (see build_polygon_layer).
    ``salt_buckets`` > 0 adds an explicit salt on the cell key for
    pathologically hot cells (dense-city skew) on top of AQE skew-join.
    """
    cell_schema = T.StructType(
        [*points.select(point_id_col, lat_col, lon_col).schema.fields,
         T.StructField("cell", T.LongType(), False)]
    )

    def add_cell(it):
        for pdf in it:
            cells = hexgrid.hex_cell(
                pdf[lat_col].to_numpy(dtype=np.float64),
                pdf[lon_col].to_numpy(dtype=np.float64),
                res,
            )
            yield pdf.assign(cell=cells)

    from ..session import python_parallelism

    pts = (
        points.select(point_id_col, lat_col, lon_col)
        .repartition(python_parallelism(points.sparkSession))
        .mapInPandas(add_cell, cell_schema)
    )
    poly_cells = polygon_layer.select(
        "polygon_id", "lats", "lons", F.explode("covering_cells").alias("cell")
    )
    if salt_buckets > 0:
        # replicate polygon side per salt; points pick one salt
        pts = pts.withColumn(
            "_salt", (F.pmod(F.hash(F.col(point_id_col)), F.lit(salt_buckets))).cast("int")
        )
        poly_cells = poly_cells.crossJoin(
            pts.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
        )
        cand = pts.join(poly_cells, ["cell", "_salt"], "inner")
    else:
        cand = pts.join(poly_cells, "cell", "inner")

    refine_schema = T.StructType(
        [points.schema[point_id_col], T.StructField("polygon_id", T.LongType(), False)]
    )

    def refine(it):
        for pdf in it:
            if pdf.empty:
                continue
            ys = pdf[lat_col].to_numpy(dtype=np.float64)
            xs = pdf[lon_col].to_numpy(dtype=np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            for poly_id, grp in pdf.groupby("polygon_id", sort=False):
                idx = grp.index.to_numpy()
                loc = pdf.index.get_indexer(idx)
                la = np.asarray(grp["lats"].iloc[0], dtype=np.float64)
                lo = np.asarray(grp["lons"].iloc[0], dtype=np.float64)
                keep[loc] = points_in_ring(ys[loc], xs[loc], la, lo)
            out = pdf.loc[keep, [point_id_col, "polygon_id"]]
            if len(out):
                yield out

    return cand.mapInPandas(refine, refine_schema).dropDuplicates([point_id_col, "polygon_id"])


def pip_join_with_holes(
    points: DataFrame,
    outer_layer: DataFrame,
    inner_layer: DataFrame | None,
    strategy=None,
    **kw,
) -> DataFrame:
    """Hole-aware containment → (point_id, polygon_id): inside some
    outer ring of the polygon and NOT inside any of its inner rings
    (multipolygon even-odd semantics for one nesting level — the OSM
    relation outer/inner model, reference pbfParser relation roles).

    Pure DataFrame composition: ``strategy`` (default
    ``pip_join_broadcast``) runs once per ring layer, then a
    ``left_anti`` on (point_id, polygon_id) subtracts hole hits — no
    new refine kernel, both legs keep their plan shape (broadcast
    R-tree or cell equi-join + AQE), and the anti-join shuffles only
    O(|matches|) narrow rows. Build the layers by role:
    ``build_polygon_layer(rings.filter(role == 'outer'))`` /
    ``...('inner')`` from ``relation_multipolygons`` output.
    """
    if strategy is None:
        strategy = pip_join_broadcast
    point_id_col = kw.get("point_id_col", "point_id")
    outer_hits = strategy(points, outer_layer, **kw)
    if inner_layer is None:
        return outer_hits
    inner_hits = strategy(points, inner_layer, **kw)
    return outer_hits.join(
        inner_hits, [point_id_col, "polygon_id"], "left_anti"
    )
