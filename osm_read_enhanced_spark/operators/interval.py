"""Distributed range (interval) join — `value BETWEEN lo AND hi` as an
equi-join, not a theta join (Catalyst plans a raw range predicate as
BroadcastNestedLoop/Cartesian — dead at scale).

Bucket decomposition (the standard public trick, same family as the
kNN kRing and embedding-projection bands here): pick a bucket width w,
each value maps to bucket floor(v/w), each range explodes to its
covered buckets floor(lo/w)..floor(hi/w), equi-join on the bucket id,
then filter the exact predicate. Shuffle volume = |values| +
Σ(range span / w) — linear, AQE-skew-splittable, never |L|×|R|.
Width auto-tunes to the measured mean range span (one tiny aggregate),
so typical ranges explode to ~2-3 buckets; the result is independent
of w (w is physical only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    values: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
) -> DataFrame:
    """→ all (value row × range row) pairs with
    ``lo <= value <= hi`` (inclusive both ends). Column sets must be
    disjoint apart from the join artifacts; both inputs pass all their
    columns through.

    ``bucket_width``: physical knob only (result-invariant). Default =
    mean range span, clamped to a sane floor — one cheap aggregate on
    the ranges side.
    """
    if bucket_width is None:
        row = ranges.agg(
            F.avg(F.col(hi_col) - F.col(lo_col)).alias("span")
        ).collect()[0]
        span = row["span"] or 1.0
        bucket_width = max(float(span), 1e-9)
    w = float(bucket_width)

    v = values.withColumn("_bkt", F.floor(F.col(value_col) / w))
    # empty ranges (lo > hi) match nothing; drop them BEFORE sequence()
    # (Spark's sequence(start, stop) auto-steps -1 when start > stop,
    # which would silently fabricate buckets)
    r = ranges.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)
            )
        ),
    )
    return (
        v.join(r, "_bkt")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_bkt")
    )
