"""OSM-derived polygon layer assembly (SURVEY.md §7 Phase 3).

Way-geometry assembly is the distributed version of the reference's
node-ref resolution (refs produced at reference lib/pbfParser.js:645,
lib/OSM_Blob.js:1346-1356; BASELINE north_star: "landuse ways assembled
from the reference parser's node-ref resolution"): explode refs with
position, equi-join nodes on the int64 id (sort-merge/shuffle-hash at
scale; broadcast when the node table is small), then re-assemble
ordered coordinate arrays via array_sort(collect_list(struct(pos,…))).
All JVM-side; only polyfill (covering-cell computation) runs in a
pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import hexgrid
from ..functions.pip import ring_area_deg2


def assemble_way_geometries(
    ways: DataFrame, nodes: DataFrame, broadcast_nodes: bool = False
) -> DataFrame:
    """ways(id, refs, tags) × nodes(id, lat, lon) → way_id, tags,
    lats:array<double>, lons:array<double> in ref order.

    The join key is the int64 node id — an equi-join Catalyst plans as
    sort-merge/shuffle-hash; pass ``broadcast_nodes=True`` for small
    extracts to collapse the shuffle.

    When not broadcasting, the node side is pinned to a shuffle join
    with a ``merge`` hint: the 4.2 GB decode soak showed AQE's runtime
    broadcast conversion picking the node side off *compressed* map
    output stats (delta-friendly coordinates compress ~10×), then
    hauling >1 GB of shuffle blocks through the driver to build the
    broadcast — `spark.driver.maxResultSize` aborts the job at exactly
    the scale where the conversion is most wrong. At planet scale the
    node side is 10⁹⁺ rows and never broadcastable; callers who know
    better opt in via ``broadcast_nodes``.
    """
    refs = ways.select(
        F.col("id").alias("way_id"),
        F.col("tags").alias("way_tags"),
        F.posexplode("refs").alias("pos", "ref"),
    )
    node_side = nodes.select(F.col("id").alias("ref"), "lat", "lon")
    if broadcast_nodes:
        node_side = F.broadcast(node_side)
    else:
        node_side = node_side.hint("merge")
    joined = refs.join(node_side, "ref", "inner")
    return (
        joined.groupBy("way_id")
        .agg(
            F.first("way_tags").alias("tags"),
            F.array_sort(F.collect_list(F.struct("pos", "lat", "lon"))).alias("_pts"),
        )
        .select(
            "way_id",
            "tags",
            F.transform("_pts", lambda p: p.lat).alias("lats"),
            F.transform("_pts", lambda p: p.lon).alias("lons"),
        )
    )


def closed_way_polygons(way_geoms: DataFrame, kinds: list[str] | None = None) -> DataFrame:
    """Closed ways (first ref == last ref) → polygon rows.

    ``kinds``: keep ways whose tags contain any of these keys (e.g.
    ["landuse", "building", "natural"]); None keeps all closed ways.
    """
    df = way_geoms.filter(
        (F.size("lats") >= 4)
        & (F.element_at("lats", 1) == F.element_at("lats", -1))
        & (F.element_at("lons", 1) == F.element_at("lons", -1))
    )
    if kinds:
        cond = None
        for k in kinds:
            c = F.map_contains_key("tags", F.lit(k))
            cond = c if cond is None else (cond | c)
        df = df.filter(cond)
    # drop the duplicated closing vertex; ring convention is open
    return df.select(
        F.col("way_id").alias("polygon_id"),
        "tags",
        F.slice("lats", 1, F.size("lats") - 1).alias("lats"),
        F.slice("lons", 1, F.size("lons") - 1).alias("lons"),
    )


POLYGON_LAYER_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("lats", T.ArrayType(T.DoubleType()), False),
        T.StructField("lons", T.ArrayType(T.DoubleType()), False),
        T.StructField("minlat", T.DoubleType(), False),
        T.StructField("minlon", T.DoubleType(), False),
        T.StructField("maxlat", T.DoubleType(), False),
        T.StructField("maxlon", T.DoubleType(), False),
        T.StructField("covering_cells", T.ArrayType(T.LongType()), False),
    ]
)


def build_polygon_layer(polygons: DataFrame, kind_expr=None, cover_res: int = 7) -> DataFrame:
    """polygon rows (polygon_id, tags, lats, lons) → the broadcastable
    layer with bbox + hex covering cells (coarse-join key set).

    bbox is column math; covering cells (polyfill) runs vectorized in a
    pandas batch per polygon.
    """
    if kind_expr is None:
        kind_expr = F.coalesce(
            F.when(F.map_contains_key("tags", F.lit("admin_level")), F.lit("admin")),
            F.when(F.map_contains_key("tags", F.lit("landuse")), F.lit("landuse")),
            F.lit("other"),
        )
    with_bbox = polygons.select(
        "polygon_id",
        kind_expr.alias("kind"),
        "tags",
        "lats",
        "lons",
        F.array_min("lats").alias("minlat"),
        F.array_min("lons").alias("minlon"),
        F.array_max("lats").alias("maxlat"),
        F.array_max("lons").alias("maxlon"),
    )

    def add_cover(it):
        for pdf in it:
            covers = [
                hexgrid.polyfill(
                    np.asarray(la, dtype=np.float64), np.asarray(lo, dtype=np.float64), cover_res
                ).tolist()
                for la, lo in zip(pdf["lats"], pdf["lons"])
            ]
            pdf = pdf.assign(covering_cells=covers)
            yield pdf

    return with_bbox.mapInPandas(add_cover, POLYGON_LAYER_SCHEMA)


def relation_multipolygons(
    relations: DataFrame, way_geoms: DataFrame
) -> DataFrame:
    """Relation multipolygon assembly: outer/inner member ways stitched
    into rings (admin boundaries).

    Distributed shape: explode members → join way geometries → group by
    relation → stitch segments in a grouped pandas batch (ring stitching
    is inherently sequential per relation, so it runs per-group inside
    applyInPandas — never a driver loop).
    Emits one row per outer ring: (polygon_id = relation id, tags, ring).
    """
    members = relations.select(
        F.col("id").alias("rel_id"),
        F.col("tags").alias("rel_tags"),
        F.posexplode("members").alias("morder", "m"),
    ).filter((F.col("m.type") == 1) & F.col("m.role").isin("outer", "inner", ""))
    joined = members.join(
        way_geoms.select(F.col("way_id").alias("ref_way"), "lats", "lons"),
        members["m.ref"] == F.col("ref_way"),
        "inner",
    ).select(
        "rel_id",
        "rel_tags",
        "morder",
        F.col("m.role").alias("role"),
        "lats",
        "lons",
    )

    out_schema = T.StructType(
        [
            T.StructField("polygon_id", T.LongType(), False),
            T.StructField("ring_index", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("lats", T.ArrayType(T.DoubleType()), False),
            T.StructField("lons", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(pdf["rel_id"].iloc[0])
        tags = pdf["rel_tags"].iloc[0]
        rows = []
        for role_name in ("outer", "inner"):
            segs = pdf[(pdf["role"] == role_name) | ((pdf["role"] == "") & (role_name == "outer"))]
            segs = segs.sort_values("morder")
            seg_list = [
                (np.asarray(r.lats, dtype=np.float64), np.asarray(r.lons, dtype=np.float64))
                for r in segs.itertuples()
            ]
            # Endpoint-keyed continuation lookup (round 5 — VERDICT r4
            # #3): the old linear scan of open segments per extension
            # was O(segments²) per relation, which crawls on monster
            # coastline-class relations. Keying both endpoints in dicts
            # makes each extension O(1) while preserving the EXACT
            # selection order of the scan it replaces: the chosen
            # continuation is the lowest-index open segment matching
            # either endpoint, start-match preferred for direction
            # (equivalence pinned against a clean-room copy of the old
            # scan in tests/test_polygons_stitch.py).
            alive: dict[int, tuple[np.ndarray, np.ndarray]] = dict(
                enumerate(seg_list)
            )
            start_at: dict[tuple[float, float], set[int]] = {}
            end_at: dict[tuple[float, float], set[int]] = {}
            for i, (sla, slo) in alive.items():
                start_at.setdefault((sla[0], slo[0]), set()).add(i)
                end_at.setdefault((sla[-1], slo[-1]), set()).add(i)

            def _drop(i, sla, slo):
                start_at[(sla[0], slo[0])].discard(i)
                end_at[(sla[-1], slo[-1])].discard(i)

            ring_idx = 0
            seed = 0
            while alive:
                while seed not in alive:  # indices only ever die
                    seed += 1
                la, lo = alive.pop(seed)
                _drop(seed, la, lo)
                # extend until closed or no continuation found
                while not (la[0] == la[-1] and lo[0] == lo[-1]):
                    tail = (la[-1], lo[-1])
                    cands = start_at.get(tail, set()) | end_at.get(tail, set())
                    if not cands:
                        break
                    j = min(cands)
                    sla, slo = alive.pop(j)
                    _drop(j, sla, slo)
                    if sla[0] == la[-1] and slo[0] == lo[-1]:
                        la = np.concatenate([la, sla[1:]])
                        lo = np.concatenate([lo, slo[1:]])
                    else:
                        la = np.concatenate([la, sla[-2::-1]])
                        lo = np.concatenate([lo, slo[-2::-1]])
                closed = la[0] == la[-1] and lo[0] == lo[-1] and len(la) >= 4
                if closed:
                    rows.append(
                        dict(
                            polygon_id=rel_id,
                            ring_index=ring_idx,
                            role=role_name,
                            tags=tags,
                            lats=la[:-1].tolist(),
                            lons=lo[:-1].tolist(),
                        )
                    )
                    ring_idx += 1
        return pd.DataFrame(
            rows, columns=["polygon_id", "ring_index", "role", "tags", "lats", "lons"]
        )

    return joined.groupBy("rel_id").applyInPandas(stitch, out_schema)


def simplify_geometries(way_geoms: DataFrame, eps: float) -> DataFrame:
    """Douglas-Peucker simplification of assembled way geometries
    (functions/simplify.py): per-row numpy kernel inside Arrow batches —
    embarrassingly parallel, no shuffle, output rows ≤ input rows.
    Adds n_points_in / n_points_out next to the simplified arrays."""
    from ..functions.simplify import dp_keep_mask

    schema = T.StructType(
        [
            T.StructField("way_id", T.LongType(), False),
            T.StructField("lats", T.ArrayType(T.DoubleType()), False),
            T.StructField("lons", T.ArrayType(T.DoubleType()), False),
            T.StructField("n_points_in", T.IntegerType(), False),
            T.StructField("n_points_out", T.IntegerType(), False),
        ]
    )

    def run(it):
        for pdf in it:
            rows = []
            for wid, la, lo in zip(pdf["way_id"], pdf["lats"], pdf["lons"]):
                la = np.asarray(la, dtype=np.float64)
                lo = np.asarray(lo, dtype=np.float64)
                m = dp_keep_mask(la, lo, eps)
                rows.append(
                    (int(wid), la[m].tolist(), lo[m].tolist(), len(la), int(m.sum()))
                )
            yield pd.DataFrame(
                rows, columns=["way_id", "lats", "lons", "n_points_in", "n_points_out"]
            )

    return way_geoms.select("way_id", "lats", "lons").mapInPandas(run, schema)
