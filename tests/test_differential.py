"""Differential decode testing — the reference repo's own validation
strategy (compare-parsers.js:31-150 runs its custom parser against
protobufjs side-by-side and lists discrepancies; SURVEY.md §5.1).

Here: an INDEPENDENT minimal PBF decoder (written against the wire
format from scratch, sharing no code with sources/pbf) decodes randomly
generated files and must agree with the engine's decoder exactly.
"""

import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_read_enhanced_spark.fixtures import build_pitcairn_like
from osm_read_enhanced_spark.sources.pbf import (
    decode_blob,
    decode_primitive_block,
    scan_blocks,
    write_pbf,
)
from osm_read_enhanced_spark.sources.pbf.blocks import read_block_payload

# ---------------------------------------------------------------- an
# independent reference decoder: dict-based TLV walk, recursion, python
# ints only. Deliberately different implementation style from proto.py.


def _rv(b, i):
    r = s = 0
    while True:
        r |= (b[i] & 0x7F) << s
        i += 1
        if b[i - 1] < 0x80:
            return r, i
        s += 7


def _fields(b, lo, hi):
    out = []
    i = lo
    while i < hi:
        tag, i = _rv(b, i)
        f, w = tag >> 3, tag & 7
        if w == 0:
            v, i = _rv(b, i)
            out.append((f, v))
        elif w == 2:
            ln, i = _rv(b, i)
            out.append((f, (i, i + ln)))
            i += ln
        elif w == 5:
            out.append((f, b[i : i + 4]))
            i += 4
        elif w == 1:
            out.append((f, b[i : i + 8]))
            i += 8
        else:
            raise ValueError(w)
    return out


def _packed(b, span, signed):
    vals = []
    i, hi = span
    while i < hi:
        v, i = _rv(b, i)
        if signed:
            v = (v >> 1) ^ -(v & 1)
        vals.append(v)
    return vals


def independent_decode(payload: bytes):
    """→ dict(nodes=[(id, lat, lon, tags)], ways=[(id, refs, tags)])."""
    fields = _fields(payload, 0, len(payload))
    strings = []
    gran, lat_off, lon_off = 100, 0, 0
    for f, v in fields:
        if f == 1:
            strings = [
                payload[a:b].decode("utf-8")
                for ff, (a, b) in _fields(payload, v[0], v[1])
                if ff == 1
            ]
        elif f == 17:
            gran = v
        elif f == 19:
            lat_off = (v >> 1) ^ -(v & 1)
        elif f == 20:
            lon_off = (v >> 1) ^ -(v & 1)
    nodes, ways = [], []
    for f, v in fields:
        if f != 2:
            continue
        for gf, gv in _fields(payload, v[0], v[1]):
            if gf == 2:  # dense
                d = dict()
                for df, dv in _fields(payload, gv[0], gv[1]):
                    d[df] = dv
                ids = np.cumsum(_packed(payload, d[1], True)) if 1 in d else []
                lats = np.cumsum(_packed(payload, d[8], True)) if 8 in d else []
                lons = np.cumsum(_packed(payload, d[9], True)) if 9 in d else []
                kv = _packed(payload, d[10], False) if 10 in d else []
                tag_runs = []
                cur = {}
                i = 0
                while i < len(kv):
                    if kv[i] == 0:
                        tag_runs.append(cur)
                        cur = {}
                        i += 1
                    else:
                        cur[strings[kv[i]]] = strings[kv[i + 1]]
                        i += 2
                while len(tag_runs) < len(ids):
                    tag_runs.append({})
                for j in range(len(ids)):
                    nodes.append(
                        (
                            int(ids[j]),
                            (lat_off + gran * int(lats[j])) / 1e9,
                            (lon_off + gran * int(lons[j])) / 1e9,
                            tag_runs[j],
                        )
                    )
            elif gf == 3:  # way
                wid, keys, vals, refs = 0, [], [], []
                for wf, wv in _fields(payload, gv[0], gv[1]):
                    if wf == 1:
                        wid = wv
                    elif wf == 2:
                        keys = _packed(payload, wv, False)
                    elif wf == 3:
                        vals = _packed(payload, wv, False)
                    elif wf == 8:
                        refs = np.cumsum(_packed(payload, wv, True)).tolist()
                ways.append(
                    (wid, refs, {strings[k]: strings[x] for k, x in zip(keys, vals)})
                )
    return dict(nodes=nodes, ways=ways)


# ---------------------------------------------------------------- tests

tag_strat = st.dictionaries(
    st.text(min_size=1, max_size=8), st.text(max_size=8), max_size=3
)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**55),
            st.floats(min_value=-85, max_value=85, allow_nan=False),
            st.floats(min_value=-179, max_value=179, allow_nan=False),
            tag_strat,
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_random_nodes_agree(tmp_path_factory, node_specs):
    path = str(tmp_path_factory.mktemp("diff") / "r.pbf")
    node_specs = sorted(node_specs, key=lambda t: t[0])  # delta-friendly ids
    nodes = [dict(id=i, lat=la, lon=lo, tags=t) for i, la, lo, t in node_specs]
    write_pbf(path, [dict(nodes=nodes)])
    payload = decode_blob(read_block_payload(scan_blocks(path)[1]))
    ours = decode_primitive_block(payload)
    other = independent_decode(payload)
    assert ours.node_id.tolist() == [n[0] for n in other["nodes"]]
    for j, (_, la, lo, tags) in enumerate(other["nodes"]):
        assert abs(ours.node_lat[j] - la) < 1e-12
        assert abs(ours.node_lon[j] - lo) < 1e-12
        assert ours.node_tags[j] == tags


def test_pitcairn_like_agrees(tmp_path):
    path = str(tmp_path / "p.pbf")
    build_pitcairn_like(path)
    for meta in scan_blocks(path):
        if meta.block_type != "OSMData":
            continue
        payload = decode_blob(read_block_payload(meta))
        ours = decode_primitive_block(payload)
        other = independent_decode(payload)
        assert ours.node_id.tolist() == [n[0] for n in other["nodes"]]
        assert [w["id"] for w in ours.ways] == [w[0] for w in other["ways"]]
        for mine, theirs in zip(ours.ways, other["ways"]):
            assert mine["refs"] == theirs[1]
            assert mine["tags"] == theirs[2]
        for j, (_, la, lo, tags) in enumerate(other["nodes"]):
            assert ours.node_tags[j] == tags


def test_reference_fixture_agrees():
    payload = decode_blob(read_block_payload(scan_blocks("/root/reference/test/test.pbf")[1]))
    ours = decode_primitive_block(payload)
    other = independent_decode(payload)
    assert ours.node_id.tolist() == [n[0] for n in other["nodes"]]
    assert [ours.node_tags[i] for i in range(6)] == [n[3] for n in other["nodes"]]
    assert ours.ways[0]["refs"] == other["ways"][0][1]
    assert ours.ways[0]["tags"] == other["ways"][0][2]
