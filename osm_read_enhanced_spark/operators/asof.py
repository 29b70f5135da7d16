"""Distributed as-of (point-in-time) join — the classic temporal
operator Spark's DataFrame API lacks (training-data pipelines need it
for feature/state lookup at event time; the build brief names it as a
custom-operator target).

Spark-first formulation, NO per-row Python and NO range-explode:
tag both inputs, union them, and run ONE window pass per key ordered
by (ts, side) with ``last(payload, ignorenulls=True)`` — the right
row's payload "flows forward" to every left row until the next right
row. Cost = one shuffle on the keys + a per-key sort: the same plan
shape as any windowed aggregation, linear in |left| + |right|, no
|left| × |right| candidate blow-up at any scale. Hot keys are ordinary
window skew (AQE/salting story unchanged).

Semantics match DuckDB's native ``ASOF JOIN`` (used as the independent
oracle in q49): backward = latest right row with
``right_ts <= left_ts`` (inclusive), forward = earliest right row with
``right_ts >= left_ts``; unmatched left rows keep nulls (left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ASOF_TS = "asof_ts"  # output column: the matched right-side timestamp


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """→ left columns + right payload columns + ``asof_ts``.

    ``on``: equality keys. ``direction``: "backward" (latest right at
    or before the left timestamp) or "forward" (earliest at or after).
    ``tolerance``: optional SQL interval literal (e.g. ``'1 HOUR'``) —
    matches farther than that are nulled, like pandas ``merge_asof``.
    Right payload column names must not collide with left columns
    (rename before calling).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c not in set(on) | {right_ts}]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")

    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in set(on) | {left_ts}],
        *[F.lit(None).alias(c) for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(ASOF_TS),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(on) | {left_ts}],
        *[F.col(c) for c in payload],
        F.col(right_ts).alias(ASOF_TS),
    )
    u = l2.unionByName(r2)

    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *on,
        "_ts",
        "_side",
        *[c for c in left.columns if c not in set(on) | {left_ts}],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload + [ASOF_TS]],
    ).filter(F.col("_side") == 1)

    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            F.col(ASOF_TS) >= F.col("_ts") - iv
            if direction == "backward"
            else F.col(ASOF_TS) <= F.col("_ts") + iv
        )
        filled = filled.select(
            *on,
            "_ts",
            "_side",
            *[c for c in left.columns if c not in set(on) | {left_ts}],
            *[F.when(in_tol, F.col(c)).alias(c) for c in payload + [ASOF_TS]],
        )

    return filled.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[c for c in left.columns if c not in set(on) | {left_ts}],
        *payload,
        ASOF_TS,
    )
