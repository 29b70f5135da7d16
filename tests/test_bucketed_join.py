"""Bucketed co-located join: the plan must contain NO shuffle exchange
on the join key — bucket i of each side is read into the same task."""

import io
from contextlib import redirect_stdout

from osm_read_enhanced_spark.sources.bucketed import bucketed_join, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", "o_orderkey", n_buckets=8,
        sort_col="o_orderkey", path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", n_buckets=8,
        sort_col="o_orderkey", path=str(tmp_path / "lineitem_b"),
    )
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # co-located read: no exchange anywhere under the join
        assert "Exchange" not in plan, plan
        # and the result is the same as the plain shuffled join
        expected = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_q45_join_is_exchange_free(spark):
    """The catalog's bucketed-assembly query must plan exactly ONE
    Exchange (the final groupBy) — the ref→node join reads co-located
    buckets with no shuffle (VERDICT r2 #8)."""
    import re

    from osm_read_enhanced_spark.plans.queries import QUERIES

    df = QUERIES["q45_bucketed_assembly"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"Exchange", plan)) == 1, plan
