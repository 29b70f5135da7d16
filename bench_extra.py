"""Round-6 optimization measurement harness (guide §1.4: noop-sink
isolation + formatted-plan capture). This file is SEPARATE from the
frozen bench.py; its numbers are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [--queries q61_bm25_topk,...] [--plans-dir plans/r06]
                          [--tag before|after] [--reps 3] [--no-plans]

For every selected headline query it:
  - builds the DataFrame, writes it to the noop sink (computes every
    column of every row, no sink cost),
  - times reps runs (min + all samples reported),
  - saves .explain("formatted") to plans/r06/<query>_<tag>.txt.
Also measures the spatial_pipeline probe stage the same way.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q01_pricing_summary",
    "q03_join_agg",
    "q06_window_topk",
    "q13_collect_ordered",
    "q19_tile_assign",
    "q21_bbox_pip",
    "q25_exact_dedup",
    "q26_token_count",
    "q34_windowed_events",
    "q49_asof_join",
    "q50_range_join",
    "q61_bm25_topk",
    "q64_html_extract",
    "q66_shuffle_shard",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def spatial_pipeline_df(spark, sf_dir):
    """The timed subgraph of bench.py's spatial_pipeline_rows_per_sec
    (frozen), rebuilt here so it can be noop-timed / explained."""
    from pyspark.sql import functions as F

    from osm_read_enhanced_spark.functions.geo import tile_x_col, tile_y_col
    from osm_read_enhanced_spark.operators.spatial_join import pip_join_broadcast
    from osm_read_enhanced_spark.plans.queries import _lat, _lon, _t

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("k1"), F.col("l_partkey").alias("k2"), "l_linenumber"
    ).withColumn("rep", F.lit(0))
    pts = base.select(
        (F.col("k1") * 10 + F.col("l_linenumber")).alias("point_id"),
        _lat(F.col("k1") * 7 + F.col("k2")).alias("lat"),
        _lon(F.col("k1") * 7 + F.col("k2")).alias("lon"),
    )
    r = _t(spark, sf_dir, "region")
    polys = r.select(
        F.col("r_regionkey").cast("long").alias("polygon_id"),
        F.array(
            (-60.0 + F.col("r_regionkey") * 25.0),
            (-60.0 + F.col("r_regionkey") * 25.0),
            (-60.0 + F.col("r_regionkey") * 25.0 + 20.0),
            (-60.0 + F.col("r_regionkey") * 25.0 + 20.0),
        ).alias("lats"),
        F.array(
            (-150.0 + F.col("r_regionkey") * 55.0),
            (-150.0 + F.col("r_regionkey") * 55.0 + 45.0),
            (-150.0 + F.col("r_regionkey") * 55.0 + 45.0),
            (-150.0 + F.col("r_regionkey") * 55.0),
        ).alias("lons"),
    )
    tiled_pts = pts.select(
        "point_id", "lat", "lon",
        tile_x_col(F.col("lon"), 12).alias("x"),
        tile_y_col(F.col("lat"), 12).alias("y"),
    )
    pip = pip_join_broadcast(tiled_pts, polys, keep_cols=("x", "y"))
    return pip.groupBy("polygon_id", "x", "y").agg(F.count("*").alias("n"))


def main():
    args = sys.argv[1:]
    tag = "before"
    plans_dir = "plans/r06"
    reps = 3
    only = None
    save_plans = True
    i = 0
    while i < len(args):
        if args[i] == "--queries":
            only = args[i + 1].split(",")
            i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--no-plans":
            save_plans = False
            i += 1
        else:
            i += 1

    from osm_read_enhanced_spark.session import get_spark
    from osm_read_enhanced_spark.plans.queries import QUERIES, QUERIES_EXTENDED

    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(
        "bench-extra", cores=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the Python worker pool like bench.py does
    from osm_read_enhanced_spark.sources.images import build_images_df

    build_images_df(spark, n=CPUS * 4, partitions=CPUS).count()

    names = only or (HEADLINE + ["spatial_pipeline"])
    results = {}
    for name in names:
        if name == "spatial_pipeline":
            df = spatial_pipeline_df(spark, SF_DIR)
        else:
            df = {**QUERIES, **QUERIES_EXTENDED}[name].fn(spark, SF_DIR)
        if save_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"{tag}:{name}")
        samples = []
        for _ in range(reps):
            t0 = time.time()
            noop(df)
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min={min(samples)} samples={samples}", file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
