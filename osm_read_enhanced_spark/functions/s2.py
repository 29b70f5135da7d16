"""S2 cell ids, pure numpy (vectorized), from the public S2 geometry
algorithm (s2geometry.io: cube-face projection + quadratic s/t transform
+ Hilbert curve position with 4-bit lookup tables).

No external S2 library exists in this environment (SURVEY.md env facts),
so the cell math is implemented here and validated by property tests
(parent/child containment, Hilbert adjacency, center round-trip).

Cell id layout (standard S2): 3 face bits, 2×MAX_LEVEL position bits,
one trailing 1 bit marking the level.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1
SWAP_MASK = 0x1
INVERT_MASK = 0x2
LOOKUP_BITS = 4

_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup_cell(level, i, j, orig_orientation, pos, orientation):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
    else:
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            _init_lookup_cell(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )


for _orient in range(4):
    _init_lookup_cell(0, 0, 0, _orient, 0, _orient)


def latlon_to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Cube face (0..5) + (u,v) face coordinates, vectorized."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    # u/v per face (standard S2 table)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    sel = [
        (0, lambda: (y / x, z / x)),
        (1, lambda: (-x / y, z / y)),
        (2, lambda: (-x / z, -y / z)),
        (3, lambda: (z / x, y / x)),
        (4, lambda: (z / y, -x / y)),
        (5, lambda: (-y / z, -x / z)),
    ]
    for f, fn in sel:
        m = face == f
        if np.any(m):
            uu, vv = fn()
            u[m] = np.asarray(uu)[m] if np.ndim(uu) else uu
            v[m] = np.asarray(vv)[m] if np.ndim(vv) else vv
    return face, u, v


def uv_to_st(u):
    """Quadratic projection (area-balanced), standard S2."""
    u = np.asarray(u, dtype=np.float64)
    s = 0.5 * np.sqrt(1 + 3 * np.abs(u))
    return np.where(u >= 0, s, 1 - s)


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4 * s * s - 1), (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def st_to_ij(s):
    return np.clip(
        np.floor(np.asarray(s, dtype=np.float64) * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1
    ).astype(np.int64)


def face_ij_to_cell_id(face, i, j, level: int = MAX_LEVEL) -> np.ndarray:
    """Hilbert-encode (face,i,j) → uint64 cell id at ``level``.

    8 table-lookup rounds of 4 bits each — fully vectorized."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(POS_BITS - 1)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * 4)
        bits += ((i >> kk) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << (np.uint64(k) * np.uint64(8))
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    cell = n * np.uint64(2) + np.uint64(1)  # leaf id
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        cell = (cell & ~(lsb - np.uint64(1))) | lsb
    return cell


def cell_id_to_face_ij(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse Hilbert decode → (face, i, j) of a leaf inside the cell
    (standard to_face_ij: k=7 round carries only the top 2 i/j bits)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    face = (cid >> np.uint64(POS_BITS)).astype(np.int64)
    bits = (face.astype(np.uint64)) & np.uint64(SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        mask = np.uint64((1 << (2 * nbits)) - 1)
        bits += ((cid >> np.uint64(k * 2 * LOOKUP_BITS + 1)) & mask) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(LOOKUP_BITS + 2)) << np.uint64(k * LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << LOOKUP_BITS) - 1)) << np.uint64(
            k * LOOKUP_BITS
        )
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64)


def s2_cell_id(lat_deg, lon_deg, level: int = 10) -> np.ndarray:
    """lat/lon degrees → S2 cell id (uint64 view returned as int64 for
    Spark LongType; bit pattern preserved)."""
    x, y, z = latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return face_ij_to_cell_id(face, i, j, level).view(np.int64)


def cell_level(cell_id) -> np.ndarray:
    cid = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return (MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)).astype(
        np.int64
    )


def cell_point_latlon(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """A representative (lat, lon) inside the cell — the decoded leaf's
    center. For round-trip property tests (re-encoding at the same level
    must return the same cell) and coarse kNN seeding."""
    face, i, j = cell_id_to_face_ij(cell_id)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    # face uv → xyz (standard table)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    fu = [
        lambda u, v: (np.ones_like(u), u, v),
        lambda u, v: (-u, np.ones_like(u), v),
        lambda u, v: (-u, -v, np.ones_like(u)),
        lambda u, v: (-np.ones_like(u), -v, -u),
        lambda u, v: (v, -np.ones_like(u), -u),
        lambda u, v: (v, u, -np.ones_like(u)),
    ]
    for f in range(6):
        m = face == f
        if np.any(m):
            xx, yy, zz = fu[f](u[m], v[m])
            x[m], y[m], z[m] = xx, yy, zz
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def cell_parent(cell_id, level: int) -> np.ndarray:
    cid = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((cid & ~(lsb - np.uint64(1))) | lsb).view(np.int64)
