"""Arrow-native single-pass PrimitiveBlock decode.

The row-based ``decode.py`` path is the readable reference
implementation (golden-tested against FIXTURES.md); this module is the
hot path behind ``read_pbf`` / ``read_pbf_union``: each block is
inflated and TLV-walked ONCE, emitting ALL requested entity kinds as
pyarrow RecordBatches built directly from numpy index arrays — no
per-row python dicts, no pandas detour:

- node/way/relation tags become ``pa.MapArray.from_arrays(offsets,
  keys, items)`` where keys/items are C++ ``take``s of the block's
  string table (built once per block straight from the wire bytes);
- way refs / relation members become ListArray/StructArray from the
  packed-varint numpy decodes;
- metadata (version/timestamp/.../user/visible) stays numpy end-to-end
  (user resolved by the same string-table take).

This is the engine's answer to the reference decoding each blob once
and dispatching all groups (lib/pbfParser.js:741-759 →
visitOSMDataBlock 319-378) instead of re-inflating per entity kind.

Semantics are identical to ``decode.decode_primitive_block`` (the
differential test in tests/test_columnar_decode.py pins columnar ≡ row
decode over writer-built blocks including multi-group/compat/info
variants).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decode import COMPAT, STRICT, decode_blob
from .proto import (
    WT_LEN,
    WT_VARINT,
    decode_packed_svarints,
    decode_packed_uvarints,
    delta_decode,
    iter_fields,
    read_varint,
    zigzag_decode,
)

KIND_NODE, KIND_WAY, KIND_RELATION = "node", "way", "relation"

# Arrow schema of the tagged-union output (mirrors reader.UNION_SCHEMA)
MEMBER_ARROW = pa.struct(
    [
        pa.field("ref", pa.int64(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("type", pa.int32(), nullable=False),
    ]
)
UNION_ARROW_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string(), nullable=False),
        pa.field("id", pa.int64(), nullable=False),
        pa.field("lat", pa.float64()),
        pa.field("lon", pa.float64()),
        pa.field("tags", pa.map_(pa.string(), pa.string())),
        pa.field("refs", pa.list_(pa.int64())),
        pa.field("members", pa.list_(MEMBER_ARROW)),
        pa.field("version", pa.int32()),
        pa.field("timestamp", pa.int64()),
        pa.field("changeset", pa.int64()),
        pa.field("uid", pa.int64()),
        pa.field("user", pa.string()),
        pa.field("visible", pa.bool_()),
        pa.field("block_id", pa.int32(), nullable=False),
    ]
)


# ------------------------------------------------------- string table


def _string_table_arrow(data: bytes, s: int, e: int, mode: str):
    """Block string table → (pa.StringArray lookup table, clamp_idx).

    The table is built once per block straight from the wire: string
    bytes are copied into one contiguous buffer with offsets — no
    per-string python objects. Layout per decode mode:

    - strict: [table..., ""] — clamp out-of-range to the final ""
    - compat: ["", table..., ""] — reference OSM_Blob off-by-one cache
      (entry 0 appended twice, lib/OSM_Blob.js:360-367): index i
      resolves one entry late
    """
    chunks = []
    lengths = []
    for fno, wt, val in iter_fields(data, s, e):
        if fno == 1 and wt == WT_LEN:
            chunks.append(data[val[0] : val[1]])
            lengths.append(val[1] - val[0])
    n = len(chunks)
    prefix = 1 if mode == COMPAT else 0
    offsets = np.zeros(n + prefix + 2, dtype=np.int32)
    if n:
        offsets[prefix + 1 : prefix + n + 1] = (
            np.asarray(lengths, dtype=np.int64).cumsum().astype(np.int32)
        )
    offsets[prefix + n + 1] = offsets[prefix + n]  # trailing ""
    values = b"".join(chunks)
    arr = pa.StringArray.from_buffers(
        n + prefix + 1,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(values),
    )
    clamp = n + prefix  # index of the trailing "" slot
    return arr, clamp


def _take_strings(table: pa.StringArray, clamp: int, idx: np.ndarray):
    safe = np.minimum(idx.astype(np.int64, copy=False), clamp)
    return table.take(pa.array(safe, type=pa.int64()))


# ------------------------------------------------------- block meta


class _BlockMeta:
    __slots__ = ("granularity", "date_granularity", "lat_offset", "lon_offset")

    def __init__(self):
        self.granularity = 100
        self.date_granularity = 1000
        self.lat_offset = 0
        self.lon_offset = 0


_EMPTY_I64 = np.empty(0, dtype=np.int64)


def _scan_block(data: bytes):
    """Top-level PrimitiveBlock walk → (string-table span, group spans,
    meta)."""
    meta = _BlockMeta()
    st_span = None
    groups = []
    for fno, wt, val in iter_fields(data):
        if fno == 1 and wt == WT_LEN:
            st_span = val
        elif fno == 2 and wt == WT_LEN:
            groups.append(val)
        elif fno == 17 and wt == WT_VARINT:
            meta.granularity = val
        elif fno == 18 and wt == WT_VARINT:
            meta.date_granularity = val
        elif fno == 19 and wt == WT_VARINT:
            meta.lat_offset = zigzag_decode(val)
        elif fno == 20 and wt == WT_VARINT:
            meta.lon_offset = zigzag_decode(val)
    return st_span, groups, meta


# ------------------------------------------------------- dense nodes


def _kv_runs_columnar(kv: np.ndarray, n: int):
    """0-terminated ((k,v)* 0)* runs → (offsets[n+1], key_idx, val_idx).

    Vectorized fast path: when every zero is a terminator (zero count ==
    n and all runs even-length), each run contributes an even number of
    non-zero entries, so after dropping zeros the global even positions
    are exactly the keys. Falls back to the sequential parity walk when
    a zero appears at a value position (legal but unseen in real files).
    """
    offsets = np.zeros(n + 1, dtype=np.int64)
    if kv.size == 0:
        return offsets, _EMPTY_I64, _EMPTY_I64
    zero_pos = np.flatnonzero(kv == 0)
    if len(zero_pos) == n:
        starts = np.empty(n, dtype=np.int64)
        starts[0] = 0
        starts[1:] = zero_pos[:-1] + 1
        counts = zero_pos - starts
        if bool(np.all(counts % 2 == 0)):
            np.cumsum(counts // 2, out=offsets[1:])
            nz = kv[kv != 0]
            return offsets, nz[0::2], nz[1::2]
    # general path: sequential parity walk (mirrors decode._tags_from_kv_runs)
    keys, vals, cnt = [], [], []
    i, node = 0, 0
    m = kv.size
    while i < m and node < n:
        c = 0
        while i < m and kv[i] != 0:
            keys.append(int(kv[i]))
            vals.append(int(kv[i + 1]) if i + 1 < m else 0)
            c += 1
            i += 2
        i += 1
        cnt.append(c)
        node += 1
    while node < n:
        cnt.append(0)
        node += 1
    np.cumsum(cnt, out=offsets[1:])
    return offsets, np.array(keys, dtype=np.int64), np.array(vals, dtype=np.int64)


def _dense_info_columnar(data: bytes, s: int, e: int, n: int, date_gran: int):
    """DenseInfo → dict of numpy arrays (user kept as sid indices)."""
    info = {
        "version": None, "timestamp": None, "changeset": None,
        "uid": None, "user_sid": None, "visible": None,
    }
    for fno, wt, val in iter_fields(data, s, e):
        if wt != WT_LEN:
            continue
        sl = data[val[0] : val[1]]
        if fno == 1:
            info["version"] = decode_packed_uvarints(sl).astype(np.int32)
        elif fno == 2:
            info["timestamp"] = delta_decode(decode_packed_svarints(sl)) * date_gran
        elif fno == 3:
            info["changeset"] = delta_decode(decode_packed_svarints(sl))
        elif fno == 4:
            info["uid"] = delta_decode(decode_packed_svarints(sl))
        elif fno == 5:
            info["user_sid"] = delta_decode(decode_packed_svarints(sl))
        elif fno == 6:
            info["visible"] = decode_packed_uvarints(sl).astype(bool)
    if info["visible"] is None and n:
        info["visible"] = np.ones(n, dtype=bool)
    return info


def _parse_dense_columnar(data, s, e, meta: _BlockMeta, want_info: bool):
    """One DenseNodes group → columnar dict."""
    spans = {}
    for fno, wt, val in iter_fields(data, s, e):
        if wt == WT_LEN:
            spans.setdefault(fno, []).append(val)

    def packed_s(fno):
        sl = spans.get(fno)
        if not sl:
            return _EMPTY_I64
        return delta_decode(
            np.concatenate(
                [decode_packed_svarints(data[a:b]) for a, b in sl]
            ) if len(sl) > 1 else decode_packed_svarints(data[sl[0][0] : sl[0][1]])
        )

    ids = packed_s(1)
    lats = packed_s(8)
    lons = packed_s(9)
    n = len(ids)
    lat_deg = (meta.lat_offset + meta.granularity * lats.astype(np.float64)) / 1e9
    lon_deg = (meta.lon_offset + meta.granularity * lons.astype(np.float64)) / 1e9
    # field 10 may be split across multiple packed occurrences just like
    # fields 1/8/9 — concatenate every span, not just the first
    kv_span = spans.get(10)
    if not kv_span:
        kv = _EMPTY_I64
    elif len(kv_span) == 1:
        kv = decode_packed_uvarints(data[kv_span[0][0] : kv_span[0][1]]).astype(np.int64)
    else:
        kv = np.concatenate(
            [decode_packed_uvarints(data[a:b]) for a, b in kv_span]
        ).astype(np.int64)
    tag_offsets, key_idx, val_idx = _kv_runs_columnar(kv, n)
    info = None
    if want_info and spans.get(5):
        s5, e5 = spans[5][0]
        info = _dense_info_columnar(data, s5, e5, n, meta.date_granularity)
    return {
        "n": n, "ids": ids, "lat": lat_deg, "lon": lon_deg,
        "tag_offsets": tag_offsets, "key_idx": key_idx, "val_idx": val_idx,
        "info": info,
    }


# ------------------------------------------------------- ways / relations


def _parse_info_scalar(data: bytes, s: int, e: int, date_gran: int):
    """Non-dense Info message → (version, ts, changeset, uid, user_sid,
    visible) python scalars (None = absent)."""
    version = ts = cs = uid = usid = None
    visible = True
    pos = s
    while pos < e:
        tag, pos = read_varint(data, pos)
        fno, wt = tag >> 3, tag & 0x7
        if wt == WT_VARINT:
            val, pos = read_varint(data, pos)
            if fno == 1:
                version = val
            elif fno == 2:
                ts = val * date_gran
            elif fno == 3:
                cs = val
            elif fno == 4:
                uid = val
            elif fno == 5:
                usid = val
            elif fno == 6:
                visible = bool(val)
        elif wt == WT_LEN:
            ln, pos = read_varint(data, pos)
            pos += ln
        elif wt == 1:  # I64
            pos += 8
        elif wt == 5:  # I32
            pos += 4
        else:  # pragma: no cover - deprecated groups in Info
            break
    return version, ts, cs, uid, usid, visible


class _MsgAccumulator:
    """Flat columnar accumulator for way/relation messages."""

    def __init__(self, want_info: bool):
        self.ids = []
        self.tag_counts = []
        self.key_chunks = []
        self.val_chunks = []
        self.want_info = want_info
        self.version = []
        self.timestamp = []
        self.changeset = []
        self.uid = []
        self.user_sid = []
        self.visible = []

    def add_info(self, data, span, date_gran):
        if not self.want_info:
            return
        if span is None:
            self.version.append(None)
            self.timestamp.append(None)
            self.changeset.append(None)
            self.uid.append(None)
            self.user_sid.append(None)
            self.visible.append(None)
        else:
            v, t, c, u, us, vis = _parse_info_scalar(data, span[0], span[1], date_gran)
            self.version.append(v)
            self.timestamp.append(t)
            self.changeset.append(c)
            self.uid.append(u)
            self.user_sid.append(us)
            self.visible.append(vis)


def _batch_packed(data, msg_chunks, signed: bool, delta: bool):
    """Batch-decode one packed field across MANY messages in one
    vectorized pass: all messages' chunk bytes are joined into a single
    buffer (each chunk ends on a varint terminator, so concatenation
    preserves the value stream), decoded once with the byte-parallel
    kernel, then split back by per-message value counts. ``delta``
    applies the per-message cumulative sum (segmented cumsum: global
    cumsum minus each segment's starting base) — this is what removes
    the per-way/per-relation numpy call overhead (was ~60µs/way).

    ``msg_chunks``: per message, list of (s, e) spans.
    → (flat int64 values, per-message counts int64).
    """
    n_msg = len(msg_chunks)
    counts = np.zeros(n_msg, dtype=np.int64)
    parts, chunk_msg = [], []
    for mi, chunks in enumerate(msg_chunks):
        for s, e in chunks:
            parts.append(data[s:e])
            chunk_msg.append(mi)
    if not parts:
        return _EMPTY_I64, counts
    big = b"".join(parts)
    buf = np.frombuffer(big, dtype=np.uint8)
    ends_cum = np.zeros(buf.size + 1, dtype=np.int64)
    np.cumsum(buf < 0x80, out=ends_cum[1:])
    lengths = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
    bnd = np.zeros(len(parts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=bnd[1:])
    ccount = ends_cum[bnd[1:]] - ends_cum[bnd[:-1]]
    np.add.at(counts, np.asarray(chunk_msg, dtype=np.int64), ccount)
    vals_u = decode_packed_uvarints(big)
    if signed:
        vals = (vals_u >> np.uint64(1)).astype(np.int64) ^ -(
            (vals_u & np.uint64(1)).astype(np.int64)
        )
    else:
        vals = vals_u.astype(np.int64)
    if delta:
        c = np.cumsum(vals)
        offs = np.zeros(n_msg + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        starts = offs[:-1]
        base = np.where(starts > 0, c[np.maximum(starts - 1, 0)], 0)
        vals = c - np.repeat(base, counts)
    return vals, counts


def _packed_chunks_u(data, chunks, repeated):
    if chunks:
        if len(chunks) == 1:
            return decode_packed_uvarints(data[chunks[0][0] : chunks[0][1]])
        return np.concatenate([decode_packed_uvarints(data[a:b]) for a, b in chunks])
    if repeated:
        return np.array(repeated, dtype=np.uint64)
    return np.empty(0, dtype=np.uint64)


def _packed_chunks_s(data, chunks, repeated):
    if chunks:
        if len(chunks) == 1:
            return decode_packed_svarints(data[chunks[0][0] : chunks[0][1]])
        return np.concatenate([decode_packed_svarints(data[a:b]) for a, b in chunks])
    if repeated:
        return np.array([zigzag_decode(v) for v in repeated], dtype=np.int64)
    return np.empty(0, dtype=np.int64)


def _trim_tags(key_flat, key_counts, val_flat, val_counts):
    """Per-message zip semantics: tag count = min(|keys|, |vals|) per
    message (mirrors dict(zip(keys, vals)) in the row path). Returns
    (key_idx, val_idx, tag_counts) with the longer side trimmed."""
    if np.array_equal(key_counts, val_counts):
        return key_flat, val_flat, key_counts
    m = np.minimum(key_counts, val_counts)
    k_off = np.zeros(len(key_counts) + 1, dtype=np.int64)
    np.cumsum(key_counts, out=k_off[1:])
    v_off = np.zeros(len(val_counts) + 1, dtype=np.int64)
    np.cumsum(val_counts, out=v_off[1:])
    ki = np.concatenate(
        [key_flat[k_off[i] : k_off[i] + m[i]] for i in range(len(m))]
    ) if m.sum() else _EMPTY_I64
    vi = np.concatenate(
        [val_flat[v_off[i] : v_off[i] + m[i]] for i in range(len(m))]
    ) if m.sum() else _EMPTY_I64
    return ki, vi, m


def _parse_ways_columnar(data, spans, meta, want_info, compat):
    """Way messages → columnar dict. Lean inline TLV walk collects the
    packed-field spans (id=1, keys=2, vals=3, info=4, refs=8); the
    values are then batch-decoded across ALL ways in one vectorized pass
    (_batch_packed) — no per-way numpy calls. Repeated (non-packed)
    varint encodings fall back to the per-message path (the reference's
    packed-keys blind spot, lib/OSM_Blob.js:1328, handled both ways)."""
    acc = _MsgAccumulator(want_info)
    n = len(spans)
    refs_chunks = [[] for _ in range(n)]
    keys_chunks = [[] for _ in range(n)]
    vals_chunks = [[] for _ in range(n)]
    has_repeated = False
    rep = {2: [], 3: [], 8: []}
    for mi, (s, e) in enumerate(spans):
        wid = 0
        info_span = None
        pos = s
        while pos < e:
            tag, pos = read_varint(data, pos)
            fno, wt = tag >> 3, tag & 0x7
            if wt == WT_VARINT:
                val, pos = read_varint(data, pos)
                if fno == 1:
                    wid = val
                elif fno in (2, 3, 8):
                    has_repeated = True
                    rep[fno].append((mi, val))
            elif wt == WT_LEN:
                ln, pos = read_varint(data, pos)
                span = (pos, pos + ln)
                pos += ln
                if fno == 2:
                    keys_chunks[mi].append(span)
                elif fno == 3:
                    vals_chunks[mi].append(span)
                elif fno == 8:
                    refs_chunks[mi].append(span)
                elif fno == 4:
                    info_span = span
            elif wt == 1:  # I64
                pos += 8
            elif wt == 5:  # I32
                pos += 4
            else:  # pragma: no cover - deprecated groups
                break
        acc.ids.append(wid)
        acc.add_info(data, info_span, meta.date_granularity)
    if has_repeated:
        # rare wire layout: decode per message, mixing packed + repeated
        refs_flat, ref_counts = _flat_mixed(
            data, refs_chunks, rep[8], signed=True, delta=True
        )
        key_flat, key_counts = _flat_mixed(data, keys_chunks, rep[2], False, False)
        val_flat, val_counts = _flat_mixed(data, vals_chunks, rep[3], False, False)
    else:
        refs_flat, ref_counts = _batch_packed(data, refs_chunks, signed=True, delta=True)
        key_flat, key_counts = _batch_packed(data, keys_chunks, False, False)
        val_flat, val_counts = _batch_packed(data, vals_chunks, False, False)
    if compat:
        key_idx, val_idx = _EMPTY_I64, _EMPTY_I64
        tag_counts = np.zeros(n, dtype=np.int64)  # OSM_Blob packed-keys bug
    else:
        key_idx, val_idx, tag_counts = _trim_tags(
            key_flat, key_counts, val_flat, val_counts
        )
    return {
        "acc": acc,
        "refs_flat": refs_flat,
        "ref_counts": ref_counts,
        "key_idx": key_idx,
        "val_idx": val_idx,
        "tag_counts": tag_counts,
    }


def _flat_mixed(data, msg_chunks, repeated_pairs, signed: bool, delta: bool):
    """Per-message decode path for the rare repeated-varint wire layout:
    merges packed chunks and repeated scalar values in field order
    (packed first, matching decode._packed_or_repeated precedence)."""
    n = len(msg_chunks)
    rep_by_msg: dict[int, list] = {}
    for mi, v in repeated_pairs:
        rep_by_msg.setdefault(mi, []).append(v)
    out, counts = [], np.zeros(n, dtype=np.int64)
    for mi in range(n):
        if signed:
            vals = _packed_chunks_s(data, msg_chunks[mi], rep_by_msg.get(mi, []))
            if delta:
                vals = delta_decode(vals)
        else:
            vals = _packed_chunks_u(data, msg_chunks[mi], rep_by_msg.get(mi, [])).astype(
                np.int64
            )
        out.append(vals)
        counts[mi] = len(vals)
    return (np.concatenate(out) if out else _EMPTY_I64), counts


def _trim_members(roles, r_cnt, memids, m_cnt, types, t_cnt):
    """Per-message member count = min of the three parallel arrays
    (mirrors zip() in the row path); trims each to that count."""
    m = np.minimum(np.minimum(r_cnt, m_cnt), t_cnt)
    if (
        np.array_equal(r_cnt, m)
        and np.array_equal(m_cnt, m)
        and np.array_equal(t_cnt, m)
    ):
        return roles, memids, types, m

    def trim(flat, cnt):
        off = np.zeros(len(cnt) + 1, dtype=np.int64)
        np.cumsum(cnt, out=off[1:])
        if not m.sum():
            return _EMPTY_I64
        return np.concatenate([flat[off[i] : off[i] + m[i]] for i in range(len(m))])

    return trim(roles, r_cnt), trim(memids, m_cnt), trim(types, t_cnt), m


def _parse_relations_columnar(data, spans, meta, want_info, compat):
    """Relation messages → columnar dict. roles_sid=8, memids=9 (field 9
    per spec — NOT 8, the OSM_Blob fastParse bug, lib/OSM_Blob.js:962),
    types=10; member wire order preserved. Packed fields batch-decoded
    across all relations (one vectorized pass per field)."""
    acc = _MsgAccumulator(want_info)
    n = len(spans)
    chunks = {f: [[] for _ in range(n)] for f in (2, 3, 8, 9, 10)}
    rep = {f: [] for f in (2, 3, 8, 9, 10)}
    has_repeated = False
    for mi, (s, e) in enumerate(spans):
        rid = 0
        info_span = None
        pos = s
        while pos < e:
            tag, pos = read_varint(data, pos)
            fno, wt = tag >> 3, tag & 0x7
            if wt == WT_VARINT:
                val, pos = read_varint(data, pos)
                if fno == 1:
                    rid = val
                elif fno in rep:
                    has_repeated = True
                    rep[fno].append((mi, val))
            elif wt == WT_LEN:
                ln, pos = read_varint(data, pos)
                span = (pos, pos + ln)
                pos += ln
                if fno in chunks:
                    chunks[fno][mi].append(span)
                elif fno == 4:
                    info_span = span
            elif wt == 1:  # I64
                pos += 8
            elif wt == 5:  # I32
                pos += 4
            else:  # pragma: no cover - deprecated groups
                break
        acc.ids.append(rid)
        acc.add_info(data, info_span, meta.date_granularity)
    dec = _flat_mixed if has_repeated else (
        lambda d, c, r, signed, delta: _batch_packed(d, c, signed, delta)
    )
    roles, r_cnt = dec(data, chunks[8], rep[8], False, False)
    memids, m_cnt = dec(data, chunks[9], rep[9], True, True)
    types, t_cnt = dec(data, chunks[10], rep[10], False, False)
    roles, memids, types, mem_counts = _trim_members(
        roles, r_cnt, memids, m_cnt, types, t_cnt
    )
    if compat:
        key_idx, val_idx = _EMPTY_I64, _EMPTY_I64
        tag_counts = np.zeros(n, dtype=np.int64)
    else:
        key_flat, key_counts = dec(data, chunks[2], rep[2], False, False)
        val_flat, val_counts = dec(data, chunks[3], rep[3], False, False)
        key_idx, val_idx, tag_counts = _trim_tags(
            key_flat, key_counts, val_flat, val_counts
        )
    return {
        "acc": acc,
        "roles": roles,
        "memids": memids,
        "types": types.astype(np.int32),
        "mem_counts": mem_counts,
        "key_idx": key_idx,
        "val_idx": val_idx,
        "tag_counts": tag_counts,
    }


# ------------------------------------------------------- plain nodes


def _parse_plain_nodes_columnar(data, spans, meta, want_info, compat):
    """Non-dense Node messages (rare) → same columnar dict as dense."""
    ids, lats, lons = [], [], []
    acc = _MsgAccumulator(want_info)
    for s, e in spans:
        nid = lat_raw = lon_raw = 0
        keys_p, vals_p = [], []
        keys_r, vals_r = [], []
        info_span = None
        pos = s
        while pos < e:
            tag, pos = read_varint(data, pos)
            fno, wt = tag >> 3, tag & 0x7
            if wt == WT_VARINT:
                val, pos = read_varint(data, pos)
                if fno == 1:
                    nid = zigzag_decode(val)
                elif fno == 2:
                    keys_r.append(val)
                elif fno == 3:
                    vals_r.append(val)
                elif fno == 8:
                    lat_raw = zigzag_decode(val)
                elif fno == 9:
                    lon_raw = zigzag_decode(val)
            elif wt == WT_LEN:
                ln, pos = read_varint(data, pos)
                span = (pos, pos + ln)
                pos += ln
                if fno == 2:
                    keys_p.append(span)
                elif fno == 3:
                    vals_p.append(span)
                elif fno == 4:
                    info_span = span
            elif wt == 1:  # I64
                pos += 8
            elif wt == 5:  # I32
                pos += 4
            else:  # pragma: no cover - deprecated groups
                break
        ids.append(nid)
        lats.append((meta.lat_offset + meta.granularity * lat_raw) / 1e9)
        lons.append((meta.lon_offset + meta.granularity * lon_raw) / 1e9)
        if compat:
            acc.tag_counts.append(0)
        else:
            k = _packed_chunks_u(data, keys_p, keys_r).astype(np.int64)
            v = _packed_chunks_u(data, vals_p, vals_r).astype(np.int64)
            m = min(len(k), len(v))
            acc.tag_counts.append(m)
            acc.key_chunks.append(k[:m])
            acc.val_chunks.append(v[:m])
        acc.add_info(data, info_span, meta.date_granularity)
    n = len(ids)
    tag_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(acc.tag_counts, out=tag_offsets[1:])
    info = None
    if want_info:
        info = {
            "version": _np_nullable(acc.version, np.int32),
            "timestamp": _np_nullable(acc.timestamp, np.int64),
            "changeset": _np_nullable(acc.changeset, np.int64),
            "uid": _np_nullable(acc.uid, np.int64),
            "user_sid": _np_nullable(acc.user_sid, np.int64),
            "visible": _np_nullable(acc.visible, bool),
        }
        if all(v is None for v in info.values()):
            info = None
    return {
        "n": n,
        "ids": np.array(ids, dtype=np.int64),
        "lat": np.array(lats, dtype=np.float64),
        "lon": np.array(lons, dtype=np.float64),
        "tag_offsets": tag_offsets,
        "key_idx": np.concatenate(acc.key_chunks) if acc.key_chunks else _EMPTY_I64,
        "val_idx": np.concatenate(acc.val_chunks) if acc.val_chunks else _EMPTY_I64,
        "info": info,
    }


def _np_nullable(values: list, dtype):
    """list (with Nones) → (np array, valid mask) pair or None if empty."""
    if not values:
        return None
    mask = np.array([v is not None for v in values], dtype=bool)
    if not mask.any():
        return None
    filled = np.array([v if v is not None else 0 for v in values])
    return filled.astype(dtype), mask


# ------------------------------------------------------- Arrow assembly


def _pa_maybe(pair_or_arr, n, pa_type):
    """numpy array / (values, mask) pair / None → pa.Array of length n."""
    if pair_or_arr is None:
        return pa.nulls(n, pa_type)
    if isinstance(pair_or_arr, tuple):
        values, mask = pair_or_arr
        return pa.array(values, type=pa_type, mask=~mask)
    return pa.array(pair_or_arr, type=pa_type)


def _user_array(info, n, table, clamp):
    if info is None:
        return pa.nulls(n, pa.string())
    usid = info.get("user_sid")
    if usid is None:
        return pa.nulls(n, pa.string())
    if isinstance(usid, tuple):
        values, mask = usid
        taken = _take_strings(table, clamp, values)
        # null out the absent entries
        return pa.array(
            [t if m else None for t, m in zip(taken.to_pylist(), mask)], type=pa.string()
        )
    return _take_strings(table, clamp, usid)


def _map_array(n, offsets, key_idx, val_idx, table, clamp):
    keys = _take_strings(table, clamp, key_idx)
    vals = _take_strings(table, clamp, val_idx)
    return pa.MapArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()), keys, vals
    )


def _info_columns(info, n, table, clamp):
    if info is None:
        return {
            "version": pa.nulls(n, pa.int32()),
            "timestamp": pa.nulls(n, pa.int64()),
            "changeset": pa.nulls(n, pa.int64()),
            "uid": pa.nulls(n, pa.int64()),
            "user": pa.nulls(n, pa.string()),
            "visible": pa.nulls(n, pa.bool_()),
        }
    return {
        "version": _pa_maybe(info.get("version"), n, pa.int32()),
        "timestamp": _pa_maybe(info.get("timestamp"), n, pa.int64()),
        "changeset": _pa_maybe(info.get("changeset"), n, pa.int64()),
        "uid": _pa_maybe(info.get("uid"), n, pa.int64()),
        "user": _user_array(info, n, table, clamp),
        "visible": _pa_maybe(info.get("visible"), n, pa.bool_()),
    }


def _union_batch(kind, n, ids, lat, lon, tags, refs, members, info_cols, block_id):
    cols = [
        pa.array([kind] * n, type=pa.string()),
        pa.array(ids, type=pa.int64()),
        lat if lat is not None else pa.nulls(n, pa.float64()),
        lon if lon is not None else pa.nulls(n, pa.float64()),
        tags,
        refs if refs is not None else pa.nulls(n, pa.list_(pa.int64())),
        members if members is not None else pa.nulls(n, pa.list_(MEMBER_ARROW)),
        info_cols["version"],
        info_cols["timestamp"],
        info_cols["changeset"],
        info_cols["uid"],
        info_cols["user"],
        info_cols["visible"],
        pa.array(np.full(n, block_id, dtype=np.int32), type=pa.int32()),
    ]
    return pa.RecordBatch.from_arrays(cols, schema=UNION_ARROW_SCHEMA)


def _merge_dense_groups(parts: list[dict]) -> dict:
    """Concatenate several node groups of one block, info row-aligned
    (null-padded where a group lacks a field) — columnar twin of
    decode._merge_node_info."""
    if len(parts) == 1:
        return parts[0]
    n = sum(p["n"] for p in parts)
    off = np.zeros(n + 1, dtype=np.int64)
    pos, acc = 1, 0
    for p in parts:
        off[pos : pos + p["n"]] = p["tag_offsets"][1:] + acc
        acc += p["tag_offsets"][-1]
        pos += p["n"]
    merged = {
        "n": n,
        "ids": np.concatenate([p["ids"] for p in parts]),
        "lat": np.concatenate([p["lat"] for p in parts]),
        "lon": np.concatenate([p["lon"] for p in parts]),
        "tag_offsets": off,
        "key_idx": np.concatenate([p["key_idx"] for p in parts]),
        "val_idx": np.concatenate([p["val_idx"] for p in parts]),
        "info": None,
    }
    if any(p["info"] is not None for p in parts):
        info = {}
        for key, dtype in (
            ("version", np.int32), ("timestamp", np.int64), ("changeset", np.int64),
            ("uid", np.int64), ("user_sid", np.int64), ("visible", bool),
        ):
            vals = np.zeros(n, dtype=dtype)
            mask = np.zeros(n, dtype=bool)
            pos = 0
            any_set = False
            for p in parts:
                k = p["n"]
                pi = p["info"]
                v = None if pi is None else pi.get(key)
                if v is not None:
                    if isinstance(v, tuple):
                        vals[pos : pos + k] = v[0]
                        mask[pos : pos + k] = v[1]
                    else:
                        vals[pos : pos + k] = v
                        mask[pos : pos + k] = True
                    any_set = True
                pos += k
            info[key] = (vals, mask) if any_set else None
        merged["info"] = info
    return merged


def decode_block_arrow(
    payload: bytes,
    block_id: int,
    mode: str = STRICT,
    kinds: tuple = (KIND_NODE, KIND_WAY, KIND_RELATION),
    want_info: bool = True,
) -> list[pa.RecordBatch]:
    """One decompressed PrimitiveBlock → union RecordBatches (one per
    present entity kind), decoding every requested group in ONE walk."""
    if mode not in (STRICT, COMPAT):
        raise ValueError(f"unknown decode mode {mode!r}")
    compat = mode == COMPAT
    st_span, groups, meta = _scan_block(payload)
    table, clamp = _string_table_arrow(
        payload, *(st_span or (0, 0)), mode
    )
    node_parts = []
    way_spans, rel_spans = [], []
    for gs, ge in groups:
        plain_spans = []
        for fno, wt, val in iter_fields(payload, gs, ge):
            if wt != WT_LEN:
                continue
            if fno == 1 and KIND_NODE in kinds:
                plain_spans.append(val)
            elif fno == 2 and KIND_NODE in kinds:
                node_parts.append(
                    _parse_dense_columnar(payload, val[0], val[1], meta, want_info)
                )
            elif fno == 3 and KIND_WAY in kinds:
                way_spans.append(val)
            elif fno == 4 and KIND_RELATION in kinds:
                rel_spans.append(val)
        if plain_spans:
            node_parts.append(
                _parse_plain_nodes_columnar(payload, plain_spans, meta, want_info, compat)
            )

    out = []
    if node_parts:
        nd = _merge_dense_groups(node_parts)
        if nd["n"]:
            tags = _map_array(
                nd["n"], nd["tag_offsets"], nd["key_idx"], nd["val_idx"], table, clamp
            )
            out.append(
                _union_batch(
                    KIND_NODE, nd["n"], nd["ids"],
                    pa.array(nd["lat"], type=pa.float64()),
                    pa.array(nd["lon"], type=pa.float64()),
                    tags, None, None,
                    _info_columns(nd["info"], nd["n"], table, clamp),
                    block_id,
                )
            )
    if way_spans:
        w = _parse_ways_columnar(payload, way_spans, meta, want_info, compat)
        acc = w["acc"]
        n = len(acc.ids)
        tag_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(w["tag_counts"], out=tag_off[1:])
        tags = _map_array(n, tag_off, w["key_idx"], w["val_idx"], table, clamp)
        ref_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(w["ref_counts"], out=ref_off[1:])
        refs = pa.ListArray.from_arrays(
            pa.array(ref_off.astype(np.int32), type=pa.int32()),
            pa.array(w["refs_flat"], type=pa.int64()),
        )
        out.append(
            _union_batch(
                KIND_WAY, n, np.array(acc.ids, dtype=np.int64), None, None,
                tags, refs, None, _acc_info_columns(acc, n, table, clamp), block_id,
            )
        )
    if rel_spans:
        r = _parse_relations_columnar(payload, rel_spans, meta, want_info, compat)
        acc = r["acc"]
        n = len(acc.ids)
        tag_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(r["tag_counts"], out=tag_off[1:])
        tags = _map_array(n, tag_off, r["key_idx"], r["val_idx"], table, clamp)
        mem_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(r["mem_counts"], out=mem_off[1:])
        struct = pa.StructArray.from_arrays(
            [
                pa.array(r["memids"], type=pa.int64()),
                _take_strings(table, clamp, r["roles"]),
                pa.array(r["types"], type=pa.int32()),
            ],
            fields=list(MEMBER_ARROW),
        )
        members = pa.ListArray.from_arrays(
            pa.array(mem_off.astype(np.int32), type=pa.int32()), struct
        )
        out.append(
            _union_batch(
                KIND_RELATION, n, np.array(acc.ids, dtype=np.int64), None, None,
                tags, None, members, _acc_info_columns(acc, n, table, clamp), block_id,
            )
        )
    return out


def _acc_info_columns(acc: _MsgAccumulator, n: int, table, clamp):
    if not acc.want_info:
        return _info_columns(None, n, table, clamp)
    info = {
        "version": _np_nullable(acc.version, np.int32),
        "timestamp": _np_nullable(acc.timestamp, np.int64),
        "changeset": _np_nullable(acc.changeset, np.int64),
        "uid": _np_nullable(acc.uid, np.int64),
        "user_sid": _np_nullable(acc.user_sid, np.int64),
        "visible": _np_nullable(acc.visible, bool),
    }
    if all(v is None for v in info.values()):
        return _info_columns(None, n, table, clamp)
    return _info_columns(info, n, table, clamp)


def decode_blob_to_batches(
    raw: bytes,
    block_id: int,
    mode: str = STRICT,
    kinds: tuple = (KIND_NODE, KIND_WAY, KIND_RELATION),
    want_info: bool = True,
) -> list[pa.RecordBatch]:
    """Blob wire bytes → union RecordBatches (inflate + one-pass decode)."""
    return decode_block_arrow(decode_blob(raw), block_id, mode, kinds, want_info)
