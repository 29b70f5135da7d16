"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial rollup on sf0.001; ``queries`` /
``oracle_sql`` expose the full catalog from
``osm_read_enhanced_spark.plans.queries`` (one entry per operator class
of SURVEY.md §2 + the training-data-pipeline extras). Entries without
an ANSI oracle (cell indexes, MinHash, image decode) return None-free
dicts — the driver records rows-only checks for those.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_read_enhanced_spark.plans.queries import QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
