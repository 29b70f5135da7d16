"""Golden-fixture decode tests against the reference's own PBF files.

Goldens come from FIXTURES.md — produced by executing the reference's
own decoder (/root/reference/lib/OSM_Blob.js) and an independent
raw-wire parse. Counts/coordinates/refs/members are invariant across
all reference parse paths; tags have strict vs osm-read-compat variants
(SURVEY.md §5.3 policy).
"""

import numpy as np
import pytest

from osm_read_enhanced_spark.sources.pbf import (
    decode_blob,
    decode_header_block,
    decode_primitive_block,
    scan_blocks,
)
from osm_read_enhanced_spark.sources.pbf.blocks import read_block_payload

TEST_PBF = "/root/reference/test/test.pbf"
MANY_NODES_PBF = "/root/reference/test/manyNodes.pbf"

GOLDEN_NODES = [
    (319408586, 51.5074089, -0.1080108),
    (319408587, 51.5074343, -0.1081264),
    (275452090, 51.5075933, -0.1076186),
    (304994980, 51.5074645, -0.1075735),
    (304994981, 51.5074723, -0.1075014),
    (304994979, 51.5074060, -0.1083348),
]


@pytest.fixture(scope="module")
def test_block():
    blocks = scan_blocks(TEST_PBF)
    return decode_blob(read_block_payload(blocks[1]))


def test_block_index_framing():
    blocks = scan_blocks(TEST_PBF)
    assert [b.block_type for b in blocks] == ["OSMHeader", "OSMData"]
    assert blocks[1].size == 476


def test_header_block():
    blocks = scan_blocks(TEST_PBF)
    hdr = decode_header_block(decode_blob(read_block_payload(blocks[0])))
    assert hdr["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert hdr["writingprogram"] == "0.40.1"


def test_string_table(test_block):
    blk = decode_primitive_block(test_block)
    assert len(blk.strings) == 26
    assert blk.strings[0] == "" and blk.strings[1] == ""
    assert blk.strings[4] == "name" and blk.strings[25] == "üßé€"


def test_counts_invariant(test_block):
    blk = decode_primitive_block(test_block)
    assert (blk.n_nodes, len(blk.ways), len(blk.relations)) == (6, 1, 1)


def test_node_ids_and_coordinates(test_block):
    blk = decode_primitive_block(test_block)
    for i, (nid, lat, lon) in enumerate(GOLDEN_NODES):
        assert int(blk.node_id[i]) == nid
        assert abs(blk.node_lat[i] - lat) < 5e-8
        assert abs(blk.node_lon[i] - lon) < 5e-8


def test_node_tags_strict(test_block):
    blk = decode_primitive_block(test_block)
    tags = {int(i): t for i, t in zip(blk.node_id, blk.node_tags)}
    assert tags[275452090] == {"name": "Jam's Sandwich Bar", "amenity": "cafe"}
    assert tags[304994980] == {"barrier": "gate"}
    for nid in (319408586, 319408587, 304994981, 304994979):
        assert tags[nid] == {}


def test_node_tags_compat(test_block):
    # reference OSM_Blob string-cache off-by-one (lib/OSM_Blob.js:360-367)
    blk = decode_primitive_block(test_block, mode="osm-read-compat")
    tags = {int(i): t for i, t in zip(blk.node_id, blk.node_tags)}
    assert tags[275452090] == {"Matt": "private", "jamicu": "gate"}
    assert tags[304994980] == {"type": "123"}


def test_way_golden(test_block):
    blk = decode_primitive_block(test_block)
    way = blk.ways[0]
    assert way["id"] == 27776903
    assert way["refs"] == [304994979, 319408587, 319408586, 304994980, 304994981]
    assert way["tags"] == {"access": "private", "highway": "service", "name": "üßé€"}
    assert way["version"] == 3
    assert way["timestamp"] == 1243777155000
    assert way["changeset"] == 1368552
    assert way["uid"] == 70
    assert way["user"] == "Matt"


def test_way_compat_tags_empty(test_block):
    # OSM_Blob lazy path packed-keys bug → {} (lib/OSM_Blob.js:1328)
    blk = decode_primitive_block(test_block, mode="osm-read-compat")
    assert blk.ways[0]["tags"] == {}
    assert blk.ways[0]["refs"] == [304994979, 319408587, 319408586, 304994980, 304994981]


def test_relation_golden(test_block):
    blk = decode_primitive_block(test_block)
    rel = blk.relations[0]
    assert rel["id"] == 56688
    assert rel["tags"] == {"network": "VVW", "ref": "123", "route": "bus", "type": "route"}
    # member order preserved (reference ChangeLog:1-27)
    assert rel["members"] == [
        {"ref": 319408586, "role": "", "type": 0},
        {"ref": 27776903, "role": "", "type": 1},
    ]
    assert rel["user"] == "kmvar" and rel["uid"] == 56190


def test_many_nodes_golden():
    blocks = scan_blocks(MANY_NODES_PBF)
    blk = decode_primitive_block(decode_blob(read_block_payload(blocks[1])))
    assert blk.n_nodes == 3000  # reference test/manyNodesTest.js:30-32
    assert blk.node_id.tolist() == list(range(1, 3001))
    assert np.all(blk.node_lat == 0.0) and np.all(blk.node_lon == 0.0)
    assert blk.strings == ["", "x"]
    assert all(t == {} for t in blk.node_tags)
    assert blk.node_info["user"][0] == "x"
    assert int(blk.node_info["timestamp"][0]) == 1229476722000


def test_kind_pruning(test_block):
    blk = decode_primitive_block(test_block, kinds=("way",))
    assert blk.n_nodes == 0 and len(blk.ways) == 1 and len(blk.relations) == 0


def test_decompress_capability_surface():
    """Round-4 parity hook: the decompress layer recognizes every codec
    the reference's zlib wrapper supports. zlib works; zstd/lz4/brotli
    import-gate with a clear NotImplementedError when absent (none ship
    here); if a module IS present the real path runs."""
    import importlib.util
    import zlib as _z

    import pytest

    from osm_read_enhanced_spark.sources.pbf.decode import decompress

    assert decompress("zlib", _z.compress(b"payload")) == b"payload"
    for codec, mod in (("zstd", "zstandard"), ("lz4", "lz4"), ("brotli", "brotli")):
        if importlib.util.find_spec(mod) is None:
            with pytest.raises(NotImplementedError, match=codec):
                decompress(codec, b"x")
    if importlib.util.find_spec("brotli") is not None:  # pragma: no cover
        import brotli

        assert decompress("brotli", brotli.compress(b"payload")) == b"payload"
    with pytest.raises(NotImplementedError, match="unsupported"):
        decompress("snappy", b"x")
