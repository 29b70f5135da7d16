"""Distributed PBF SINK: entity DataFrames → a directory of .pbf part
files ("planet split" layout).

The reference only READS PBF; this closes the write side so the engine
round-trips its own format: each task serializes its partition into one
self-contained .pbf file (own OSMHeader + ~8k-element PrimitiveBlocks,
zlib blobs) using the wire encoders in ``writer.py``. ``read_pbf``
accepts the resulting file list, so sink → source round-trips exactly
(tags, metadata, member order; coords exact on the granularity grid).

Scale notes: entities are range-partitioned and sorted by id before
writing, so each file covers a contiguous id range (delta-friendly
packed varints, and downstream range pruning can skip whole files by
id). Each task writes to ``out_dir`` via its executor's filesystem
client — on a cluster point this at shared storage. ``visible`` is not
serialized (the wire default is true — reference parity).
"""

from __future__ import annotations

import math
import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame

from .writer import _frame_block, build_header_block, build_primitive_block

_META = ("version", "timestamp", "changeset", "uid", "user")


def _clean_meta(row: dict, as_info: bool) -> dict:
    """Metadata for the wire encoders: dense nodes take top-level keys
    with ``timestamp_ms``; ways/relations take an ``info`` dict whose
    timestamp is in date-granularity units (1000 ms here)."""
    out = {}
    for k in _META:
        v = row.get(k)
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if k == "timestamp":
            out["timestamp" if as_info else "timestamp_ms"] = (
                int(v) // 1000 if as_info else int(v)
            )
        elif k == "user":
            out[k] = str(v)
        else:
            out[k] = int(v)
    return {"info": out} if (as_info and out) else out


def _tags(v) -> dict:
    if v is None:
        return {}
    return dict(v)  # works for dict and list-of-(k,v)-tuples alike


def _write_part_factory(out_dir: str, kind: str, per_block: int, compress: bool):
    def write_part(it):
        rows: list[dict] = []
        for pdf in it:
            for rec in pdf.to_dict("records"):
                if kind == "node":
                    d = dict(
                        id=int(rec["id"]), lat=float(rec["lat"]), lon=float(rec["lon"]),
                        tags=_tags(rec.get("tags")),
                    )
                elif kind == "way":
                    refs = rec.get("refs")
                    d = dict(
                        id=int(rec["id"]),
                        refs=[] if refs is None else [int(x) for x in refs],
                        tags=_tags(rec.get("tags")),
                    )
                else:
                    members = rec.get("members")
                    d = dict(
                        id=int(rec["id"]),
                        tags=_tags(rec.get("tags")),
                        members=[
                            dict(
                                ref=int(m["ref"]),
                                role="" if m["role"] is None else m["role"],
                                type=int(m["type"]),
                            )
                            for m in ([] if members is None else members)
                        ],
                    )
                d.update(_clean_meta(rec, as_info=kind != "node"))
                rows.append(d)
        if not rows:
            return
        # deterministic per-partition name + atomic rename: task RETRIES
        # overwrite the same file instead of duplicating entities under
        # a fresh uuid, and readers never see a partial file
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{kind}-{pid:05d}.pbf")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(_frame_block("OSMHeader", build_header_block(), compress))
            for i in range(0, len(rows), per_block):
                payload = build_primitive_block(
                    rows[i : i + per_block] if kind == "node" else (),
                    rows[i : i + per_block] if kind == "way" else (),
                    rows[i : i + per_block] if kind == "relation" else (),
                    100, 0, 0, 1000,
                )
                f.write(_frame_block("OSMData", payload, compress))
        os.replace(tmp, path)
        yield pd.DataFrame(
            {
                "path": [path],
                "kind": [kind],
                "n_entities": [len(rows)],
                "min_id": [rows[0]["id"]],
                "max_id": [rows[-1]["id"]],
            }
        )

    return write_part


MANIFEST_SCHEMA = (
    "path string, kind string, n_entities long, min_id long, max_id long"
)


def write_pbf_dataset(
    out_dir: str,
    nodes: DataFrame | None = None,
    ways: DataFrame | None = None,
    relations: DataFrame | None = None,
    per_block: int = 8000,
    files_per_kind: int | None = None,
    compress: bool = True,
) -> DataFrame:
    """Write entity DataFrames as a directory of PBF part files.

    EAGER: the write runs before this returns (no half-written sink
    hiding behind a lazy plan); part files have deterministic
    per-partition names written via atomic rename, so task retries
    overwrite rather than duplicate. Returns the materialized manifest
    DataFrame (path, kind, n_entities, min_id, max_id) — one row per
    written file; feed ``path`` back to ``read_pbf``/``read_pbf_union``
    to re-read the dataset.

    Entity serialization is row-shaped (tags/metadata need per-block
    string tables); tag-free array producers can use
    ``writer.encode_dense_nodes_from_arrays`` directly.
    """
    if nodes is None and ways is None and relations is None:
        raise ValueError("write_pbf_dataset: no entity DataFrames given")
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for kind, df in (("node", nodes), ("way", ways), ("relation", relations)):
        if df is None:
            continue
        n_parts = files_per_kind
        if n_parts is None:
            from ...session import python_parallelism

            n_parts = python_parallelism(df.sparkSession)
        part = (
            df.repartitionByRange(n_parts, "id")
            .sortWithinPartitions("id")
            .mapInPandas(_write_part_factory(out_dir, kind, per_block, compress),
                         MANIFEST_SCHEMA)
        )
        outs.append(part)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    spark = out.sparkSession
    manifest_rows = out.collect()  # run the write NOW; manifest is tiny
    return spark.createDataFrame(manifest_rows, out.schema)
