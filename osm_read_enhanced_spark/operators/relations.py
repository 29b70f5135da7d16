"""Relation member resolution (SURVEY.md §2.5 J3): explode members →
typed equi-joins against the node/way tables. The distributed version
of the reference's member index resolution (reference
lib/pbfParser.js:665-676), preserving wire member order (reference
ChangeLog:1-27 guarantee) via the ``morder`` position column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_members(
    relations: DataFrame, nodes: DataFrame, ways: DataFrame
) -> DataFrame:
    """Relation member resolution (SURVEY.md §2.5 J3): explode members →
    typed equi-joins against nodes/ways. One row per member with the
    resolved entity's payload; member order preserved via ``morder``
    (reference guarantee, ChangeLog:1-27).

    Missing targets (cross-extract references) keep the member row with
    nulls (left join) — the reference also emits unresolved refs as-is.
    """
    m = relations.select(
        F.col("id").alias("rel_id"),
        F.posexplode("members").alias("morder", "m"),
    ).select(
        "rel_id",
        "morder",
        F.col("m.ref").alias("ref"),
        F.col("m.role").alias("role"),
        F.col("m.type").alias("member_type"),
    )
    n = nodes.select(
        F.col("id").alias("ref"),
        F.col("lat").alias("node_lat"),
        F.col("lon").alias("node_lon"),
        F.col("tags").alias("node_tags"),
    )
    w = ways.select(
        F.col("id").alias("ref"),
        F.col("refs").alias("way_refs"),
        F.col("tags").alias("way_tags"),
    )
    node_members = m.filter(F.col("member_type") == 0).join(n, "ref", "left")
    way_members = m.filter(F.col("member_type") == 1).join(w, "ref", "left")
    rel_members = m.filter(F.col("member_type") == 2)
    out_cols = [
        "rel_id",
        "morder",
        "ref",
        "role",
        "member_type",
        "node_lat",
        "node_lon",
        "node_tags",
        "way_refs",
        "way_tags",
    ]
    for col in ("way_refs", "way_tags"):
        node_members = node_members.withColumn(col, F.lit(None))
    for col in ("node_lat", "node_lon", "node_tags"):
        way_members = way_members.withColumn(col, F.lit(None))
    for col in ("node_lat", "node_lon", "node_tags", "way_refs", "way_tags"):
        rel_members = rel_members.withColumn(col, F.lit(None))
    return (
        node_members.select(out_cols)
        .unionByName(way_members.select(out_cols))
        .unionByName(rel_members.select(out_cols))
    )
