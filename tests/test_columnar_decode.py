"""Differential tests: Arrow-native columnar decode ≡ row-based decode.

The row path (decode.decode_primitive_block) is the golden-tested
reference implementation; columnar.decode_block_arrow is the hot path
behind read_pbf/read_pbf_union. Every block of every fixture must
produce identical entities, tags, metadata, and member order in both.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from osm_read_enhanced_spark.fixtures import build_pitcairn_like, build_scale_pbf
from osm_read_enhanced_spark.sources.pbf.blocks import read_block_payload, scan_blocks
from osm_read_enhanced_spark.sources.pbf.columnar import decode_block_arrow
from osm_read_enhanced_spark.sources.pbf.decode import (
    decode_blob,
    decode_primitive_block,
)
from osm_read_enhanced_spark.sources.pbf.writer import write_pbf

REF_PBF = "/root/reference/test/test.pbf"


def _assert_block_equal(payload, block_id, mode):
    row = decode_primitive_block(payload, mode=mode)
    batches = decode_block_arrow(payload, block_id, mode=mode)
    if not batches:
        assert row.n_nodes == 0 and not row.ways and not row.relations
        return
    d = pa.Table.from_batches(batches).to_pydict()
    nsel = [i for i, k in enumerate(d["kind"]) if k == "node"]
    assert [d["id"][i] for i in nsel] == row.node_id.tolist()
    assert np.allclose([d["lat"][i] for i in nsel], row.node_lat)
    assert np.allclose([d["lon"][i] for i in nsel], row.node_lon)
    assert [dict(d["tags"][i]) for i in nsel] == row.node_tags
    if row.node_info is not None:
        for f in ("version", "timestamp", "changeset", "uid", "user"):
            exp = row.node_info.get(f)
            if exp is None:
                continue
            exp_l = list(exp.tolist() if hasattr(exp, "tolist") else exp)
            assert [d[f][i] for i in nsel] == exp_l, f
    wsel = [i for i, k in enumerate(d["kind"]) if k == "way"]
    assert [d["id"][i] for i in wsel] == [w["id"] for w in row.ways]
    assert [list(d["refs"][i]) for i in wsel] == [w["refs"] for w in row.ways]
    assert [dict(d["tags"][i]) for i in wsel] == [w["tags"] for w in row.ways]
    for f in ("version", "timestamp", "changeset", "uid", "user", "visible"):
        assert [d[f][i] for i in wsel] == [w.get(f) for w in row.ways], ("way", f)
    rsel = [i for i, k in enumerate(d["kind"]) if k == "relation"]
    assert [d["id"][i] for i in rsel] == [r["id"] for r in row.relations]
    got_m = [
        [{"ref": m["ref"], "role": m["role"], "type": m["type"]} for m in d["members"][i]]
        for i in rsel
    ]
    assert got_m == [r["members"] for r in row.relations]
    assert [dict(d["tags"][i]) for i in rsel] == [r["tags"] for r in row.relations]
    for f in ("version", "timestamp", "user"):
        assert [d[f][i] for i in rsel] == [r.get(f) for r in row.relations], ("rel", f)


def _compare_file(path, mode="strict"):
    for b in scan_blocks(path):
        if b.block_type != "OSMData":
            continue
        _assert_block_equal(decode_blob(read_block_payload(b)), b.block_id, mode)


@pytest.mark.parametrize("mode", ["strict", "osm-read-compat"])
def test_reference_fixture(mode):
    _compare_file(REF_PBF, mode)


@pytest.mark.parametrize("mode", ["strict", "osm-read-compat"])
def test_pitcairn_like(tmp_path, mode):
    path = str(tmp_path / "pit.pbf")
    build_pitcairn_like(path)
    _compare_file(path, mode)


def test_scale_blocks(tmp_path):
    path = str(tmp_path / "scale.pbf")
    build_scale_pbf(path, n_blocks=3)
    _compare_file(path)


def test_multi_group_info_changesets(tmp_path):
    path = str(tmp_path / "multi.pbf")
    nodes = [
        dict(
            id=100 + i, lat=10.0 + i * 0.001, lon=20.0, tags={"n": str(i)},
            version=i + 1, timestamp_ms=1_600_000_000_000 + i * 1000,
            changeset=50 + i, uid=7, user=f"u{i}",
        )
        for i in range(5)
    ]
    write_pbf(
        path,
        [
            dict(
                nodes=nodes, dense_group_size=2, changeset_ids=(1, 2),
                ways=[
                    dict(id=900, refs=[100, 101], tags={"highway": "x"},
                         version=3, timestamp_ms=5000, changeset=9, uid=2, user="w")
                ],
                relations=[
                    dict(id=77, tags={"type": "multipolygon"},
                         members=[dict(ref=900, role="outer", type=1)])
                ],
            )
        ],
    )
    _compare_file(path)


def test_non_default_granularity(tmp_path):
    path = str(tmp_path / "gran.pbf")
    write_pbf(
        path,
        [
            dict(
                nodes=[dict(id=1, lat=45.1234567, lon=-120.7654321, tags={"a": "b"})],
                granularity=1000,
                lat_offset=500,
                lon_offset=-500,
                date_granularity=2000,
            )
        ],
    )
    _compare_file(path)


def test_union_equals_per_kind_reader(spark, tmp_path):
    """read_pbf (filtered views) and read_pbf_union agree with the
    driver-side row decode on a multi-block file."""
    from osm_read_enhanced_spark.sources.pbf import read_pbf, read_pbf_union

    path = str(tmp_path / "s.pbf")
    info = build_scale_pbf(path, n_blocks=4, nodes_per_block=500, ways_per_block=50)
    u = read_pbf_union(spark, path)
    counts = {r["kind"]: r["count"] for r in u.groupBy("kind").count().collect()}
    assert counts == {"node": info["nodes"], "way": info["ways"]}
    dfs = read_pbf(spark, path)
    assert dfs["nodes"].count() == info["nodes"]
    assert dfs["ways"].count() == info["ways"]
    # spot-check a decoded way row end-to-end
    w = dfs["ways"].orderBy("id").first()
    assert len(w.refs) == 10 and w.tags["highway"] == "residential"


# --------------------------------------------------- property-based


from hypothesis import given, settings
from hypothesis import strategies as st

_tag = st.dictionaries(
    st.text(min_size=1, max_size=6), st.text(max_size=6), max_size=3
)
_node = st.tuples(
    st.integers(min_value=1, max_value=2**55),
    st.floats(min_value=-85, max_value=85, allow_nan=False, width=32),
    st.floats(min_value=-179, max_value=179, allow_nan=False, width=32),
    _tag,
    st.integers(min_value=1, max_value=2**20),       # version-ish
    st.integers(min_value=0, max_value=2**40),       # timestamp ms
)


@settings(max_examples=20, deadline=None)
@given(
    nodes=st.lists(_node, min_size=1, max_size=25, unique_by=lambda t: t[0]),
    group_size=st.integers(min_value=1, max_value=26),
    granularity=st.sampled_from([100, 1000]),
    with_way=st.booleans(),
    with_rel=st.booleans(),
)
def test_roundtrip_row_and_columnar_agree(
    tmp_path_factory, nodes, group_size, granularity, with_way, with_rel
):
    """Random entities (unicode tags, >2^53 ids, metadata, multi-group
    splits, non-default granularity) → write → BOTH decoders must
    reproduce the input and each other."""
    path = str(tmp_path_factory.mktemp("prop") / "r.pbf")
    nodes = sorted(nodes, key=lambda t: t[0])
    node_dicts = [
        dict(id=i, lat=la, lon=lo, tags=t, version=v,
             timestamp_ms=(ts // 1000) * 1000, changeset=v + 1, uid=7, user=f"u{v % 3}")
        for i, la, lo, t, v, ts in nodes
    ]
    ids = [n["id"] for n in node_dicts]
    blk = dict(nodes=node_dicts, dense_group_size=group_size, granularity=granularity)
    if with_way:
        blk["ways"] = [dict(id=1, refs=ids[: max(2, len(ids) // 2)],
                            tags={"k": "v"}, version=2, timestamp_ms=5000,
                            changeset=1, uid=1, user="w")]
    if with_rel:
        blk["relations"] = [dict(id=2, tags={"type": "multipolygon"},
                                 members=[dict(ref=ids[0], role="outer", type=0)])]
    write_pbf(path, [blk])
    payload = decode_blob(read_block_payload(scan_blocks(path)[1]))
    row = decode_primitive_block(payload)
    # row decode reproduces the INPUT
    assert row.node_id.tolist() == ids
    gran_q = granularity / 1e9  # writer quantizes coords to the grid
    for j, n in enumerate(node_dicts):
        assert abs(row.node_lat[j] - n["lat"]) <= gran_q
        assert abs(row.node_lon[j] - n["lon"]) <= gran_q
        assert row.node_tags[j] == n["tags"]
    assert [int(v) for v in row.node_info["version"]] == [n["version"] for n in node_dicts]
    assert [int(v) for v in row.node_info["timestamp"]] == [
        n["timestamp_ms"] for n in node_dicts
    ]
    # columnar decode == row decode, field by field
    _assert_block_equal(payload, 1, "strict")


def test_columnar_kind_pruning():
    """Requesting a subset of kinds must skip the other groups' decode
    entirely (plan-level pruning carried into the Arrow path)."""
    payload = decode_blob(read_block_payload(scan_blocks(REF_PBF)[1]))
    only_ways = pa.Table.from_batches(
        decode_block_arrow(payload, 1, kinds=("way",))
    ).to_pydict()
    assert set(only_ways["kind"]) == {"way"}
    only_nodes = pa.Table.from_batches(
        decode_block_arrow(payload, 1, kinds=("node",))
    ).to_pydict()
    assert set(only_nodes["kind"]) == {"node"}
    assert decode_block_arrow(payload, 1, kinds=()) == []
