"""Bucketed (co-located) tables: the shuffle-elimination primitive for
repeated big-big joins at 100 TB.

A join between two tables bucketed on the join key with the same bucket
count reads bucket i of each side into the same task — the shuffle
exchange disappears from the plan entirely (verified by
tests/test_bucketed_join.py asserting no Exchange under the
SortMergeJoin). At cluster scale this is the difference between
re-shuffling 100 TB on every join and never shuffling it again after
one bucketed write: fact tables that join repeatedly on the same key
(orders ⋈ lineitem on orderkey; nodes ⋈ way-refs on node id) should be
bucketed once at ingest.

Uses the session catalog's parquet bucketing (`bucketBy` +
`saveAsTable`) — no Hive metastore required; pass ``path`` to keep the
data outside the default warehouse directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table registered in the session catalog. ``sort_col`` makes
    the downstream sort-merge join skip its per-task sort too."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is None:
        # a stale managed-table directory from a previous session blocks
        # re-creation (the catalog entry died with the session, the
        # files did not) — clear it
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key; with
    matching bucket counts Spark plans a shuffle-free SortMergeJoin."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, on)
