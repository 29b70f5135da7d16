"""Iceberg-lite: snapshot-committed Parquet tables with per-partition
lineage + idempotent resume (SURVEY.md §7 Phase 5).

No Iceberg/Delta jars exist in this Spark distribution (SURVEY.md env
facts), so snapshot semantics are emulated over plain Parquet with an
atomic JSON manifest — the layout stays Iceberg-shaped (partition dirs
+ manifest listing committed partitions + snapshot log) so a real
Iceberg catalog could be swapped in on a cluster that has the jars.

Semantics provided (north_rule):
- write_partitioned: each logical partition lands in its own directory,
  written via temp-dir + atomic rename; the manifest (JSON, atomic
  rename) records partition → {files, row_count, wall_ms} lineage.
- resume: a re-run calls ``uncommitted_partitions`` (or left_anti joins
  against ``committed_partition_ids``) and only processes the rest —
  kill/rerun yields byte-identical committed output.
- snapshots: every commit appends a snapshot entry; ``read_table``
  reads only committed partitions as of the latest snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, MANIFEST)


def read_manifest(table_path: str) -> dict:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return {"table": table_path, "snapshots": [], "partitions": {}}
    with open(p) as f:
        return json.load(f)


def _write_manifest_atomic(table_path: str, manifest: dict) -> None:
    tmp = _manifest_path(table_path) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(table_path))  # atomic on POSIX


class _manifest_lock:
    """Serialize manifest read-modify-write across concurrent committers
    (two writers committing different partitions must not lose each
    other's commit record).

    Kernel-mediated ``fcntl.flock`` on a persistent lock file: a holder
    that dies mid-commit (the exact kill/rerun scenario this module
    resumes from) has its lock released by the kernel automatically, so
    there is no staleness heuristic and therefore no stale-break race —
    two waiters can never delete each other's fresh lock, because the
    lock file itself is never unlinked. A leftover ``.lock`` file from a
    dead run is inert (the flock died with the process)."""

    def __init__(self, table_path: str, timeout_s: float = 30.0, stale_s: float = 60.0):
        # stale_s retained for API compat; unused (flock needs no staleness)
        self.path = _manifest_path(table_path) + ".lock"
        self.timeout_s = timeout_s
        self._fd: int | None = None

    def __enter__(self):
        import fcntl

        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = time.time() + self.timeout_s
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.time() > deadline:
                    os.close(fd)
                    raise TimeoutError(f"manifest lock held too long: {self.path}")
                time.sleep(0.05)
        try:  # holder breadcrumb for debugging only — never read back
            os.ftruncate(fd, 0)
            os.write(fd, f"{os.getpid()} {time.time()}".encode())
        except OSError:
            pass
        self._fd = fd
        return self

    def __exit__(self, *exc):
        import fcntl

        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None
        return False


def committed_partition_ids(table_path: str) -> list:
    return sorted(read_manifest(table_path)["partitions"].keys())


def write_partition(
    df: DataFrame,
    table_path: str,
    partition_id: str,
    metrics: dict | None = None,
) -> dict:
    """Write one logical partition atomically; idempotent (already
    committed → no-op). Returns the lineage record.

    Per-stage metrics land via ``df.observe`` (SURVEY §2.6 A4): the
    write action itself reports the rows that flowed through the plan
    (``observed_rows``), cross-checked against the re-read file count
    (``row_count``) — a mismatch means files were dropped/duplicated
    between plan and disk."""
    manifest = read_manifest(table_path)
    if partition_id in manifest["partitions"]:
        return manifest["partitions"][partition_id]
    os.makedirs(table_path, exist_ok=True)
    final_dir = os.path.join(table_path, f"part={partition_id}")
    tmp_dir = os.path.join(table_path, f"_tmp-{partition_id}-{uuid.uuid4().hex}")
    t0 = time.time()
    from pyspark.sql import Observation

    obs = Observation(f"lineage-{partition_id}")
    df = df.observe(obs, F.count(F.lit(1)).alias("observed_rows"))
    df.write.mode("overwrite").parquet(tmp_dir)
    observed_rows = int(obs.get["observed_rows"])
    row_count = df.sparkSession.read.parquet(tmp_dir).count()
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    record = {
        "partition": partition_id,
        "row_count": row_count,
        "observed_rows": observed_rows,
        "wall_ms": int((time.time() - t0) * 1000),
        "files": sorted(
            f for f in os.listdir(final_dir) if f.endswith(".parquet")
        ),
        **(metrics or {}),
    }
    if observed_rows != row_count:  # pragma: no cover - corruption guard
        raise ValueError(
            f"{table_path} part={partition_id}: observed {observed_rows} rows "
            f"in the write plan but {row_count} on disk"
        )
    with _manifest_lock(table_path):
        manifest = read_manifest(table_path)  # re-read under the lock
        manifest["partitions"][partition_id] = record
        manifest["snapshots"].append(
            {
                "snapshot_id": len(manifest["snapshots"]) + 1,
                "committed": partition_id,
                "ts_ms": int(time.time() * 1000),
            }
        )
        _write_manifest_atomic(table_path, manifest)
    return record


def write_partitioned(
    df: DataFrame,
    table_path: str,
    partition_col: str,
    resume: bool = True,
) -> list[dict]:
    """Commit each distinct value of ``partition_col`` as one atomic
    partition. With ``resume=True``, already-committed partitions are
    skipped (left_anti against the manifest) — the idempotent-resume
    path of the north rule."""
    values = [r[0] for r in df.select(partition_col).distinct().orderBy(partition_col).collect()]
    done = set(committed_partition_ids(table_path)) if resume else set()
    records = []
    for v in values:
        pid = str(v)
        if pid in done:
            continue
        part_df = df.filter(F.col(partition_col) == v).drop(partition_col)
        records.append(write_partition(part_df, table_path, pid))
    return records


def read_table(
    spark: SparkSession, table_path: str, as_of_snapshot: int | None = None
) -> DataFrame:
    """Read only committed partitions (manifest-driven; uncommitted tmp
    dirs are invisible).

    ``as_of_snapshot`` = time travel over the snapshot log: read the
    table as it stood after that snapshot id — only partitions whose
    commit snapshot is ≤ the requested id are visible. Honest scope
    (documented deviation from full Iceberg): partition visibility is
    versioned; a partition RE-committed later reads its current files
    (data files are not retained per-snapshot).
    """
    manifest = read_manifest(table_path)
    if as_of_snapshot is None:
        parts = sorted(manifest["partitions"].keys())
    else:
        known = {s["snapshot_id"] for s in manifest["snapshots"]}
        if as_of_snapshot not in known:
            raise ValueError(
                f"{table_path}: unknown snapshot {as_of_snapshot} (have {sorted(known)})"
            )
        parts = sorted(
            {
                str(s["committed"])
                for s in manifest["snapshots"]
                if s["snapshot_id"] <= as_of_snapshot
            }
            & set(manifest["partitions"].keys())
        )
    if not parts:
        raise ValueError(f"{table_path}: no committed partitions")
    paths = [os.path.join(table_path, f"part={p}") for p in parts]
    return spark.read.option("basePath", table_path).parquet(*paths)


def lineage_df(spark: SparkSession, table_path: str) -> DataFrame:
    """Per-partition lineage/metrics as a DataFrame (the checkpoint
    metrics table of the north rule)."""
    manifest = read_manifest(table_path)
    rows = [
        (
            r["partition"],
            r["row_count"],
            r.get("observed_rows", r["row_count"]),
            r["wall_ms"],
            ",".join(r["files"]),
        )
        for r in manifest["partitions"].values()
    ]
    return spark.createDataFrame(
        rows,
        "partition string, row_count long, observed_rows long, wall_ms long, files string",
    )
