"""Streaming soak for the stateful operators (VERDICT r3 next #7):
drive ``image_neardup_stream`` (exact + bounded modes) and
``sessionize_stateful`` over multi-hundred-batch rate-source streams,
recording per-batch state-store size and latency from the streaming
progress events.

What it evidences:
- bounded mode (``max_state_per_band``): FLAT state memory once the
  band-key space saturates — an unbounded stream is sustainable;
- exact mode: the documented linear state growth rate (the honest cost
  of dedup-against-all-history);
- per-batch latency stability (p50/p95 over the run) for both, plus
  the sessionizer (whose state is bounded by open sessions: watermark
  timeout closes them).

Usage: python tools/stream_soak.py [seconds_per_run] [rows_per_sec]
Prints one JSON line per run; paste the summary into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _poll_progress(q, seconds: float) -> list[dict]:
    """Poll lastProgress until the deadline, one record per batchId."""
    seen: dict[int, dict] = {}
    deadline = time.time() + seconds
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None:
            seen[p["batchId"]] = p
        time.sleep(0.25)
    return [seen[k] for k in sorted(seen)]


def _summarize(name: str, progresses: list[dict]) -> dict:
    rows = []
    for p in progresses:
        so = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batch": p["batchId"],
                "duration_ms": p.get("batchDuration"),
                "input_rps": p.get("inputRowsPerSecond"),
                "state_rows": so.get("numRowsTotal"),
                "state_bytes": so.get("memoryUsedBytes"),
            }
        )
    rows = [r for r in rows if r["duration_ms"] is not None]
    durs = sorted(r["duration_ms"] for r in rows)
    n = len(durs)
    mem = [r["state_bytes"] for r in rows if r["state_bytes"] is not None]
    # linear growth rate over the SECOND half (post key-space warmup)
    half = rows[len(rows) // 2 :]
    growth = 0.0
    if len(half) >= 2 and half[0]["state_bytes"] is not None:
        growth = (half[-1]["state_bytes"] - half[0]["state_bytes"]) / max(
            half[-1]["batch"] - half[0]["batch"], 1
        )
    return {
        "run": name,
        "batches": n,
        "latency_ms_p50": durs[n // 2] if n else None,
        "latency_ms_p95": durs[int(n * 0.95)] if n else None,
        "latency_ms_max": durs[-1] if n else None,
        "state_bytes_first": mem[0] if mem else None,
        "state_bytes_mid": mem[len(mem) // 2] if mem else None,
        "state_bytes_last": mem[-1] if mem else None,
        "state_rows_last": rows[-1]["state_rows"] if rows else None,
        "state_growth_bytes_per_batch_2nd_half": round(growth, 1),
    }


def run_image_soak(spark, seconds: float, rows_per_sec: int, max_state):
    from osm_read_enhanced_spark.streaming.images import image_neardup_stream

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.concat(
                F.lit("img_"), F.lpad(F.col("value").cast("string"), 12, "0")
            ).alias("image_id"),
            # deterministic synthetic phashes: every 8 consecutive ids
            # share one → steady stream of real dup hits
            F.xxhash64((F.col("value") / F.lit(8)).cast("long")).alias("phash"),
        )
    )
    out = image_neardup_stream(src, max_hamming=6, max_state_per_band=max_state)
    ckpt = tempfile.mkdtemp(prefix="soak-img-")
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        progresses = _poll_progress(q, seconds)
    finally:
        q.stop()
    mode = "bounded" if max_state else "exact"
    return _summarize(f"image_neardup_stream[{mode}]", progresses)


def run_text_soak(spark, seconds: float, rows_per_sec: int, max_state):
    """Round 5: the text twin — MinHash per-bucket state under a
    continuous document stream. Texts are deterministic 12-word strings
    derived from value; every 8 consecutive ids share one text, so the
    stream carries a steady 7/8 dup ratio."""
    from osm_read_enhanced_spark.streaming.text import text_neardup_stream

    words = F.array(
        *[F.hex(F.xxhash64((F.col("value") / 8).cast("long"), F.lit(i))) for i in range(12)]
    )
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
    )
    ttl = float(os.environ.get("SPARK_GRAFT_SOAK_TEXT_TTL_MIN", "1"))
    out = text_neardup_stream(
        src,
        threshold=0.5,
        max_state_per_bucket=max_state,
        bucket_ttl_minutes=ttl if max_state else None,
    )
    ckpt = tempfile.mkdtemp(prefix="soak-txt-")
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        progresses = _poll_progress(q, seconds)
    finally:
        q.stop()
    mode = "bounded" if max_state else "exact"
    return _summarize(f"text_neardup_stream[{mode}]", progresses)


def run_session_soak(spark, seconds: float, rows_per_sec: int, n_users: int = 20000):
    from osm_read_enhanced_spark.streaming.events import sessionize_stateful

    # event time runs 60x real time (driven by value, deterministic):
    # bursts of 5 events per user, inter-burst event-time gap ≫ the
    # session gap → continuous session closure churn, so the soak
    # exercises open→close→timeout cycling, not just accumulation.
    # (sessionize_stateful sets its own watermark from gap_minutes.)
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            ((F.col("value") / 5).cast("long") % n_users).alias("user_id"),
            F.timestamp_seconds(F.col("value") * (60.0 / rows_per_sec)).alias("ts"),
            F.col("value").alias("event_id"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    out = sessionize_stateful(src, gap_minutes=1)
    ckpt = tempfile.mkdtemp(prefix="soak-sess-")
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        progresses = _poll_progress(q, seconds)
    finally:
        q.stop()
    return _summarize("sessionize_stateful", progresses)


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    from osm_read_enhanced_spark.session import get_spark

    spark = get_spark(
        "stream-soak",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    max_state = int(os.environ.get("SPARK_GRAFT_SOAK_MAX_STATE", "128"))
    only = os.environ.get("SPARK_GRAFT_SOAK_ONLY", "")
    runs = {
        "image": lambda: run_image_soak(spark, seconds, rps, max_state=max_state),
        "image_exact": lambda: run_image_soak(spark, seconds, rps, max_state=None),
        "text": lambda: run_text_soak(spark, seconds, max(rps // 5, 200), max_state=max_state),
        "session": lambda: run_session_soak(spark, seconds, rps),
    }
    names = [t.strip() for t in only.split(",") if t.strip()] if only else list(runs)
    unknown = set(names) - set(runs)
    if unknown:
        raise SystemExit(
            f"SPARK_GRAFT_SOAK_ONLY: unknown run(s) {sorted(unknown)}; "
            f"valid: {sorted(runs)}"
        )
    results = [runs[n]() for n in names]
    for r in results:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
