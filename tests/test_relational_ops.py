"""Relational operator tests beyond the query catalog: as-of join
semantics (backward/forward/tolerance) against hand-computed
expectations."""


def test_asof_join_directions_and_tolerance(spark):
    """Backward/forward/tolerance semantics vs a hand-computed
    expectation (pandas merge_asof-style reference in plain python)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from osm_read_enhanced_spark.operators.asof import asof_join

    T0 = dt.datetime(2024, 1, 1)

    def t(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, "a", t(0)), (2, "a", t(10)), (3, "a", t(31)), (4, "b", t(5)), (5, "c", t(9))],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(0), 1.0), ("a", t(10), 2.0), ("a", t(20), 3.0), ("b", t(7), 9.0)],
        "k string, ts timestamp, state double",
    )
    back = {
        r.event_id: (r.state, r.asof_ts)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert back[1] == (1.0, t(0))     # inclusive at equal ts
    assert back[2] == (2.0, t(10))
    assert back[3] == (3.0, t(20))
    assert back[4] == (None, None)    # right ts after left ts
    assert back[5] == (None, None)    # no right rows for key
    fwd = {
        r.event_id: (r.state, r.asof_ts)
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert fwd[1] == (1.0, t(0))
    assert fwd[2] == (2.0, t(10))
    assert fwd[3] == (None, None)     # nothing at/after t31
    assert fwd[4] == (9.0, t(7))
    tol = {
        r.event_id: (r.state, r.asof_ts)
        for r in asof_join(left, right, on=["k"], tolerance="5 MINUTES").collect()
    }
    assert tol[2] == (2.0, t(10))
    assert tol[3] == (None, None)     # t20 state is 11 min stale > 5


def test_range_join_bucket_decomposition(spark):
    """Equals the raw BETWEEN predicate (incl. negative values and
    empty lo>hi ranges), result invariant to bucket width, and the plan
    is an equi-join — never a cartesian/nested-loop."""
    from pyspark.sql import functions as F

    from osm_read_enhanced_spark.operators.interval import range_join

    vals = spark.createDataFrame(
        [(i, (i - 20) * 1.7) for i in range(40)], "vid long, v double"
    )
    rng = spark.createDataFrame(
        [(1, -30.0, -10.0), (2, -5.0, 5.0), (3, 4.9, 40.0), (4, 10.0, 2.0)],
        "rid long, lo double, hi double",  # rid 4 is empty (lo > hi)
    )
    want = {
        (r.vid, r.rid)
        for r in vals.join(
            rng, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert want and not any(rid == 4 for _, rid in want)
    for w in (None, 0.5, 100.0):
        got_df = range_join(vals, rng, "v", "lo", "hi", bucket_width=w)
        got = {(r.vid, r.rid) for r in got_df.collect()}
        assert got == want, (w, got ^ want)
    plan = range_join(vals, rng, "v", "lo", "hi")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
