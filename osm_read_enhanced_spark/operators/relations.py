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


def resolve_members_deep(
    relations: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    max_depth: int = 3,
) -> DataFrame:
    """Bounded-depth SUPER-relation resolution (VERDICT r2 missing #3
    enhancement): type-2 members (relation-of-relations — nested admin
    boundaries are the common case) are expanded through ≤ ``max_depth``
    levels, emitting the resolved LEAF node/way payloads.

    Output schema = ``resolve_members`` plus:
    - ``root_rel_id``   — the top-level relation the row belongs to
    - ``path``          — array of relation ids walked (root → leaf's
                          parent), for lineage/debug
    - ``depth``         — nesting level (0 = direct member)
    Unresolved leaves (dangling refs, or relation refs still unexpanded
    at the depth cap) keep their row with null payload — same contract
    as the flat resolver (reference parity, lib/pbfParser.js:665-676:
    raw refs are emitted as-is).

    Shape: ``max_depth`` rounds of explode + equi-join against the
    (reused) relation member lists — a bounded iterative plan like the
    connected-components loop, not a recursive UDF. Cycles are cut by
    the depth bound plus an explicit ancestor check against ``path``.
    """
    flat = resolve_members(relations, nodes, ways)
    base = flat.select(
        F.col("rel_id").alias("root_rel_id"),
        F.array().cast("array<long>").alias("path"),
        F.lit(0).alias("depth"),
        "*",
    )
    # member lists per relation id, joined repeatedly
    rel_members = relations.select(
        F.col("id").alias("_parent_ref"),
        F.col("members").alias("_members"),
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
    out = base.filter(F.col("member_type") != 2)
    frontier = base.filter(F.col("member_type") == 2)
    cols = [
        "root_rel_id", "path", "depth", "rel_id", "morder", "ref",
        "role", "member_type", "node_lat", "node_lon", "node_tags",
        "way_refs", "way_tags",
    ]
    for depth in range(1, max_depth + 1):
        # cycle cut: a ref already on the path (incl. the immediate
        # parent) is emitted UNRESOLVED, never re-entered
        full_path = F.concat(F.col("path"), F.array(F.col("rel_id")))
        is_cycle = F.array_contains(full_path, F.col("ref"))
        out = out.select(cols).unionByName(frontier.filter(is_cycle).select(cols))
        # expand each remaining relation-member into its own member list.
        # Split on target existence FIRST (ADVICE r3 medium): a type-2
        # member whose target relation is absent from the dataset must
        # keep its row with null payload (same contract as the flat
        # resolver) — re-exploding it would yield a null-typed row that
        # falls through every type filter and silently disappears.
        marked = (
            frontier.filter(~is_cycle)
            .withColumn("_parent_ref", F.col("ref"))
            .join(rel_members, "_parent_ref", "left")
        )
        dangling = marked.filter(F.col("_members").isNull())
        out = out.unionByName(dangling.select(cols))
        expanded = (
            marked.filter(F.col("_members").isNotNull())
            .select(
                "root_rel_id",
                full_path.alias("path"),
                F.col("ref").alias("rel_id"),
                "_members",
            )
            .select(
                "root_rel_id",
                "path",
                "rel_id",
                F.posexplode("_members").alias("morder", "m"),
            )
            .select(
                "root_rel_id",
                "path",
                F.lit(depth).alias("depth"),
                "rel_id",
                "morder",
                F.col("m.ref").alias("ref"),
                F.col("m.role").alias("role"),
                F.col("m.type").alias("member_type"),
            )
        )
        node_m = (
            expanded.filter(F.col("member_type") == 0)
            .join(n, "ref", "left")
            .withColumn("way_refs", F.lit(None))
            .withColumn("way_tags", F.lit(None))
        )
        way_m = (
            expanded.filter(F.col("member_type") == 1)
            .join(w, "ref", "left")
            .withColumn("node_lat", F.lit(None))
            .withColumn("node_lon", F.lit(None))
            .withColumn("node_tags", F.lit(None))
        )
        rel_m = expanded.filter(F.col("member_type") == 2)
        for col in ("node_lat", "node_lon", "node_tags", "way_refs", "way_tags"):
            rel_m = rel_m.withColumn(col, F.lit(None))
        out = out.select(cols).unionByName(node_m.select(cols))
        out = out.unionByName(way_m.select(cols))
        if depth == max_depth:
            # depth cap reached: keep remaining relation refs unresolved
            out = out.unionByName(rel_m.select(cols))
        else:
            frontier = rel_m
    return out
