"""Planet-scale decode soak (VERDICT r2 next-round #6).

Generates a ≥4 GB multi-file PBF dataset (parallel process-per-file
generation — the reader takes a path list and indexes blocks per file),
then runs the single-pass union decode + way assembly end-to-end at
local[N], reporting:

- dataset bytes, blocks, elements
- decode wall / MB/s / elements/s  (vs the reference's streaming
  15.7-18.3 MB/s, reference README.md:333-343, and vs the 512-block
  BENCH figure)
- way-assembly wall on top of the decode (join refs → node coords)
- peak RSS across driver + JVM/workers (resource.getrusage SELF and
  CHILDREN high-water marks)

Usage:  python tools/soak_decode.py [target_gb] [cores]
Writes nothing outside the repo: data lands in .soak/ (gitignored) and
is DELETED at the end unless SPARK_GRAFT_SOAK_KEEP=1.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".soak")


def _gen_file(args):
    i, blocks, path = args
    from osm_read_enhanced_spark.fixtures import build_scale_pbf_fast

    # disjoint id spaces per file — colliding node ids would fan out the
    # assembly join by the file count
    info = build_scale_pbf_fast(
        path,
        n_blocks=blocks,
        seed=1000 + i,
        id_offset=i * blocks * 8000 * 2,
        way_id_offset=i * blocks * 400 * 2,
    )
    return path, info["nodes"] + info["ways"], info["nodes"], info["ways"]


def main():
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.2
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    os.makedirs(SOAK_DIR, exist_ok=True)

    # ---- parallel generation: ~46 KB/block → blocks for the target
    per_block = 47_000
    total_blocks = int(target_gb * 1e9 / per_block)
    n_files = min(32, max(8, cores))
    per_file = total_blocks // n_files
    jobs = [
        (i, per_file, os.path.join(SOAK_DIR, f"soak-{i:02d}.pbf"))
        for i in range(n_files)
    ]
    t0 = time.time()
    with mp.Pool(min(n_files, cores)) as pool:
        results = pool.map(_gen_file, jobs)
    gen_wall = time.time() - t0
    paths = [r[0] for r in results]
    n_elements = sum(r[1] for r in results)
    total_bytes = sum(os.path.getsize(p) for p in paths)
    print(
        f"generated {len(paths)} files, {total_bytes/1e9:.2f} GB, "
        f"{n_files * per_file} blocks, {n_elements:,} elements "
        f"in {gen_wall:.0f}s",
        flush=True,
    )

    # ---- decode soak
    from osm_read_enhanced_spark.session import get_spark
    from osm_read_enhanced_spark.sources.pbf import read_pbf_union

    spark = get_spark("soak", cores=cores)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm
    t0 = time.time()
    union = read_pbf_union(spark, paths)
    counts = {r["kind"]: r["count"] for r in union.groupBy("kind").count().collect()}
    decode_wall = time.time() - t0
    got = sum(counts.values())
    assert got == n_elements, (counts, n_elements)
    mb_s = total_bytes / 1e6 / decode_wall
    eps = n_elements / decode_wall
    print(
        f"decode: {decode_wall:.1f}s = {mb_s:.1f} MB/s, {eps:,.0f} elem/s",
        flush=True,
    )

    # ---- decode + way assembly end-to-end (single pass, one action)
    from pyspark.sql import functions as F

    from osm_read_enhanced_spark.operators.polygons import assemble_way_geometries
    from osm_read_enhanced_spark.sources.pbf import read_pbf

    t0 = time.time()
    # persist=False: this is a fire-once pipeline whose ONE action
    # touches both kinds — filling the columnar cache (map-typed tags)
    # inside that same action measured ~7× slower than just decoding
    # twice (reader docstring's exact guidance)
    dfs = read_pbf(spark, paths, kinds=("node", "way"), persist=False)
    geoms = assemble_way_geometries(dfs["ways"], dfs["nodes"])
    n_ways = geoms.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("lats")).alias("pts")
    ).collect()[0]
    assembly_wall = time.time() - t0
    from osm_read_enhanced_spark.sources.pbf.reader import release_pbf

    release_pbf(dfs)

    ru_self = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    # live children (the JVM + pyspark.daemon workers) aren't in
    # RUSAGE_CHILDREN until reaped — take VmHWM from /proc instead
    hwm_gb = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
            if "SparkSubmit" not in cmd and "pyspark.daemon" not in cmd:
                continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        hwm_gb += int(line.split()[1]) / 1e6
                        break
        except OSError:
            continue
    ru_children = hwm_gb
    out = {
        "bytes": total_bytes,
        "gb": round(total_bytes / 1e9, 2),
        "files": len(paths),
        "elements": n_elements,
        "decode_wall_s": round(decode_wall, 1),
        "decode_mb_per_s": round(mb_s, 1),
        "decode_elements_per_s": round(eps, 0),
        "assembly_wall_s": round(assembly_wall, 1),
        "assembled_ways": int(n_ways["n"]),
        "assembled_points": int(n_ways["pts"]),
        "peak_rss_driver_gb": round(ru_self, 2),
        "peak_rss_jvm_workers_gb": round(ru_children, 2),
        "cores": cores,
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    if os.environ.get("SPARK_GRAFT_SOAK_KEEP") != "1":
        shutil.rmtree(SOAK_DIR, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
