"""Spark reader: block-index DataFrame → Arrow-batched decode → entity DFs.

Scale design (SURVEY.md §3.1 "Spark lifecycle equivalent"): the block
index — not raw byte ranges — is what gets distributed. Each task seeks
to its blocks' exact offsets, inflates, and decodes with the vectorized
kernels in ``decode.py``; one PrimitiveBlock never spans partitions, so
the block-local delta decode (prefix sums) stays inside one Arrow batch.
On a real cluster the ``open()`` below is an HDFS/S3 stream via the
executor-local filesystem client; the plan shape is identical.

The per-kind passes implement plan-level column pruning: requesting only
``nodes`` skips way/relation group decode entirely (the working version
of the reference's abandoned per-row "decode modes" — SURVEY.md §4 O3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .blocks import scan_blocks
from .decode import (
    NODE_META,
    count_block_elements,
    decode_blob,
    decode_primitive_block,
)

BLOCK_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("block_type", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("size", T.LongType(), False),
    ]
)

_META_FIELDS = [
    T.StructField("version", T.IntegerType(), True),
    T.StructField("timestamp", T.LongType(), True),  # epoch ms
    T.StructField("changeset", T.LongType(), True),
    T.StructField("uid", T.LongType(), True),
    T.StructField("user", T.StringType(), True),
    T.StructField("visible", T.BooleanType(), True),
]

NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        *_META_FIELDS,
        T.StructField("block_id", T.IntegerType(), False),
    ]
)

WAYS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("refs", T.ArrayType(T.LongType()), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        *_META_FIELDS,
        T.StructField("block_id", T.IntegerType(), False),
    ]
)

MEMBER_TYPE = T.StructType(
    [
        T.StructField("ref", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("type", T.IntegerType(), False),
    ]
)

RELATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("members", T.ArrayType(MEMBER_TYPE), True),
        *_META_FIELDS,
        T.StructField("block_id", T.IntegerType(), False),
    ]
)


def pbf_block_index(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Build the block index as a DataFrame (one scan per file, headers
    only — the Parquet-footer analogue; reference readFileBlocks,
    lib/pbfParser.js:418-456).

    The header walk per file is sequential by nature (framing has no
    central index), so it is parallelized per *file*: each task scans one
    file's headers. Block payloads are NOT read here.
    """
    if isinstance(paths, str):
        paths = [paths]
    files_df = spark.createDataFrame([(p,) for p in paths], "path: string")

    def scan_partition(it):
        for pdf in it:
            for p in pdf["path"]:
                rows = [
                    (b.path, b.block_id, b.block_type, b.offset, b.size)
                    for b in scan_blocks(p)
                ]
                yield pd.DataFrame(
                    rows, columns=["path", "block_id", "block_type", "offset", "size"]
                )

    return files_df.repartition(len(paths)).mapInPandas(scan_partition, BLOCK_INDEX_SCHEMA)


_META_DTYPES = {
    "version": "Int32",
    "timestamp": "Int64",
    "changeset": "Int64",
    "uid": "Int64",
    "user": "object",
    "visible": "boolean",
}


def _meta_columns(n: int, info):
    """Normalize decode info into typed n-length columns.

    Missing metadata becomes typed nullable arrays (pandas extension
    dtypes), NOT object columns of python Nones — the object→Arrow
    null coercion is a per-element python path and dominated the decode
    stage before this (measured ~10× the decode kernel itself)."""
    cols = {}
    for name in NODE_META:
        v = info.get(name) if info is not None else None
        if v is None:
            dt = _META_DTYPES[name]
            cols[name] = (
                [None] * n if dt == "object" else pd.array([None] * n, dtype=dt)
            )
        else:
            cols[name] = v if not isinstance(v, np.ndarray) else v
    return cols


def _read_block_checked(path: str, block_id, offset, size) -> bytes:
    """Seek+read one blob payload with the truncation guard (shared by
    the decode and count paths)."""
    with open(path, "rb") as f:
        f.seek(int(offset))
        raw = f.read(int(size))
    if len(raw) < int(size):
        raise ValueError(
            f"{path}: truncated blob {block_id} (expected {size} bytes "
            f"at offset {offset}, got {len(raw)})"
        )
    return raw


def _decode_partition_factory(kind: str, mode: str, want_info: bool, rows_per_frame: int = 65536):
    """Returns a mapInPandas function decoding one entity kind.

    Per-block frames are concatenated up to ``rows_per_frame`` before
    yielding — fewer Arrow round-trips per task (block ≈ 8k rows; one
    frame ≈ 8 blocks)."""

    def decode_partition(it):
        pending: list = []
        pending_rows = 0

        def flush():
            nonlocal pending, pending_rows
            if not pending:
                return None
            out = pending[0] if len(pending) == 1 else pd.concat(pending, ignore_index=True)
            pending, pending_rows = [], 0
            return out

        for pdf in it:
            for path, block_id, offset, size in zip(
                pdf["path"], pdf["block_id"], pdf["offset"], pdf["size"]
            ):
                raw = _read_block_checked(path, block_id, offset, size)
                payload = decode_blob(raw)
                blk = decode_primitive_block(
                    payload, mode=mode, kinds=(kind,), want_info=want_info
                )
                if kind == "node":
                    n = blk.n_nodes
                    if n == 0:
                        continue
                    data = {
                        "id": blk.node_id,
                        "lat": blk.node_lat,
                        "lon": blk.node_lon,
                        "tags": blk.node_tags,
                    }
                    data.update(_meta_columns(n, blk.node_info))
                    data["block_id"] = np.full(n, int(block_id), dtype=np.int32)
                    frame = pd.DataFrame(data)
                elif kind == "way":
                    if not blk.ways:
                        continue
                    frame = pd.DataFrame(blk.ways)
                    for m in NODE_META:
                        if m not in frame:
                            frame[m] = None
                    frame["block_id"] = int(block_id)
                    frame = frame[["id", "refs", "tags", *NODE_META, "block_id"]]
                else:
                    if not blk.relations:
                        continue
                    frame = pd.DataFrame(blk.relations)
                    for m in NODE_META:
                        if m not in frame:
                            frame[m] = None
                    frame["block_id"] = int(block_id)
                    frame = frame[["id", "tags", "members", *NODE_META, "block_id"]]
                pending.append(frame)
                pending_rows += len(frame)
                if pending_rows >= rows_per_frame:
                    yield flush()
        out = flush()
        if out is not None:
            yield out

    return decode_partition


def read_pbf(
    spark: SparkSession,
    paths: str | list[str],
    kinds: tuple = ("node", "way", "relation"),
    mode: str = "strict",
    want_info: bool = True,
    partitions: int | None = None,
    block_index: DataFrame | None = None,
    max_blocks: int | None = None,
    byte_budget: int | None = None,
) -> dict[str, DataFrame]:
    """Read a PBF file into entity DataFrames {kind+'s': DataFrame}.

    ``partitions`` spreads blocks across tasks (defaults to Spark's
    parallelism). Repartitioning by block_id balances work; sorting the
    index desc-by-size first would give longest-job-first (SURVEY §4 O7)
    — AQE coalescing already mitigates stragglers at this scale.

    ``max_blocks`` = reference maxBlobLimit (Core_Read.js:288-292);
    ``byte_budget`` = reference read_threshold (Core_Read.js:431-459):
    both expressed as LIMIT / running-total window on the tiny block
    index — no data is scanned for skipped blocks.
    """
    if block_index is None:
        # cache: the per-file header walk runs once, not once per entity
        block_index = pbf_block_index(spark, paths).cache()
    index = block_index
    if partitions is None:
        from ...session import python_parallelism

        partitions = python_parallelism(spark)
    data_blocks = index.filter(index.block_type == "OSMData")
    if max_blocks is not None:
        data_blocks = data_blocks.orderBy("path", "block_id").limit(max_blocks)
    if byte_budget is not None:
        from pyspark.sql import Window

        w = (
            Window.orderBy("path", "block_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        data_blocks = (
            data_blocks.withColumn("_cum_bytes", F.sum("size").over(w))
            .filter(F.col("_cum_bytes") <= byte_budget)
            .drop("_cum_bytes")
        )
    data_blocks = data_blocks.repartition(partitions, "block_id")
    schemas = {"node": NODES_SCHEMA, "way": WAYS_SCHEMA, "relation": RELATIONS_SCHEMA}
    out = {}
    for kind in kinds:
        fn = _decode_partition_factory(kind, mode, want_info)
        out[kind + "s"] = data_blocks.mapInPandas(fn, schemas[kind])
    return out


def count_elements(
    spark: SparkSession, paths: str | list[str], partitions: int | None = None
) -> DataFrame:
    """Fast per-block element counts WITHOUT value decode (reference's
    quick-count path, lib/OSM_Blob.js:1539-1576 / Decode:595-631):
    dense-node count = varint terminator bytes in the packed id field,
    ways/relations = message occurrences — no delta/tag/coordinate
    decode at all, and unlike the reference's 50k/10k/5k caps the
    counts are exact.

    → DataFrame(path, block_id, n_nodes, n_ways, n_relations,
    n_changesets). Changeset groups are counted (never silently
    invisible) though their payload is not decoded — reference parity.
    """
    index = pbf_block_index(spark, paths).filter(F.col("block_type") == "OSMData")
    if partitions is None:
        from ...session import python_parallelism

        partitions = python_parallelism(spark)
    index = index.repartition(partitions, "block_id")

    schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("block_id", T.IntegerType(), False),
            T.StructField("n_nodes", T.LongType(), False),
            T.StructField("n_ways", T.LongType(), False),
            T.StructField("n_relations", T.LongType(), False),
            T.StructField("n_changesets", T.LongType(), False),
        ]
    )

    def count_partition(it):
        for pdf in it:
            rows = []
            for path, block_id, offset, size in zip(
                pdf["path"], pdf["block_id"], pdf["offset"], pdf["size"]
            ):
                raw = _read_block_checked(path, block_id, offset, size)
                n_nodes, n_ways, n_rels, n_cs = count_block_elements(decode_blob(raw))
                rows.append((path, int(block_id), n_nodes, n_ways, n_rels, n_cs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "block_id", "n_nodes", "n_ways", "n_relations", "n_changesets",
                ],
            )

    return index.mapInPandas(count_partition, schema)



def read_pbf_header(path: str) -> dict:
    """Decode the OSMHeader block (bbox/features/writingprogram) —
    driver-side, tiny."""
    from .blocks import read_block_payload
    from .decode import decode_header_block

    for b in scan_blocks(path, max_blocks=4):
        if b.block_type == "OSMHeader":
            return decode_header_block(decode_blob(read_block_payload(b)))
    raise ValueError(f"{path}: no OSMHeader block found")
