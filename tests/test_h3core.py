"""True icosahedral H3 validation (functions/h3core.py).

Three independent evidence classes (no h3 library exists here):
1. geometric invariants that hold regardless of table recall,
2. published anchor vectors from the H3 docs, bit-exact,
3. derivation self-checks (tables derived from geometry at import
   already assert tiling/uniqueness; tests re-run the derivation).
"""

import math

import numpy as np
import pytest

from osm_read_enhanced_spark.functions import h3core as h3

RNG = np.random.default_rng(20260816)


def _random_latlng(n):
    z = RNG.uniform(-1, 1, n)
    phi = RNG.uniform(-np.pi, np.pi, n)
    return np.degrees(np.arcsin(z)), np.degrees(phi)


def _pentagon_cell(bc, res):
    head = 0x0800000000000000 | (res << 52) | (bc << 45)
    v = 0
    for r in range(1, 16):
        v |= (0 if r <= res else 7) << (3 * (15 - r))
    return head | v


# ------------------------------------------------- geometric invariants


def test_face_centers_form_perfect_icosahedron():
    """Pairwise dot products of the 20 face centers must take exactly
    the icosahedral values (adjacent / non-adjacent / antipodal) — a
    typo in any recalled face-center coordinate breaks this."""
    xyz = h3._FACE_XYZ
    dots = xyz @ xyz.T
    off = dots[~np.eye(20, dtype=bool)]
    legal = np.array([np.sqrt(5) / 3, -np.sqrt(5) / 3, 1 / 3, -1 / 3, -1.0])
    # every off-diagonal dot must be within 1e-9 of SOME legal value
    d = np.abs(off[:, None] - legal[None, :]).min(axis=1)
    assert float(d.max()) < 1e-9, float(d.max())
    # each face has exactly 3 edge-adjacent faces (max off-diag dot)
    adj = np.isclose(dots, dots[~np.eye(20, dtype=bool)].max(), atol=1e-9)
    assert (adj.sum(axis=1) == 3).all()


def test_res0_cover_and_pentagons():
    lat, lng = _random_latlng(20000)
    cells = h3.latlng_to_cell_vec(lat, lng, 0)
    bcs = np.unique((cells >> 45) & 0x7F)
    assert len(bcs) == 122
    pents = sorted(h3.PENTAGON_BASE_CELLS)
    assert pents == [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]
    # pentagons sit exactly on the 12 icosahedron vertices: each vertex
    # is equidistant (circumradius) from 5 face centers
    for bc in pents:
        f, i, j, k = h3.BASE_CELL_DATA[bc][:4]
        la, lo = h3._face_ijk_to_geo(f, i, j, k, 0)
        v = np.asarray(h3._geo_to_xyz(np.float64(la), np.float64(lo)))
        d = h3._FACE_XYZ @ v
        near = np.sort(d)[-5:]
        assert np.allclose(near, near[0], atol=1e-9)  # 5 equidistant faces


@pytest.mark.parametrize("res", [0, 1, 2, 4, 7, 9, 12, 15])
def test_roundtrip_geo_cell_geo(res):
    lat, lng = _random_latlng(1500)
    cells = h3.latlng_to_cell_vec(lat, lng, res)
    for c in np.unique(cells)[:300]:
        la, lo = h3.cell_to_latlng(int(c))
        assert h3.latlng_to_cell(la, lo, res) == int(c)


def test_scalar_matches_vectorized():
    lat, lng = _random_latlng(300)
    for res in (1, 6, 9):
        vec = h3.latlng_to_cell_vec(lat, lng, res)
        for m in range(0, 300, 7):
            assert h3.latlng_to_cell(float(lat[m]), float(lng[m]), res) == int(vec[m])


@pytest.mark.parametrize("res", [1, 3, 8])
def test_neighbor_symmetry_and_counts(res):
    lat, lng = _random_latlng(300)
    cells = [int(c) for c in np.unique(h3.latlng_to_cell_vec(lat, lng, res))[:60]]
    for c in cells:
        nb = h3._cell_neighbors(c)
        assert len(nb) == (5 if h3.is_pentagon(c) else 6)
        for b in nb:
            assert c in h3._cell_neighbors(b)


def test_pentagon_cells_roundtrip_and_neighbors():
    for res in (1, 2, 3):
        for bc in sorted(h3.PENTAGON_BASE_CELLS):
            c = _pentagon_cell(bc, res)
            assert h3.is_pentagon(c)
            la, lo = h3.cell_to_latlng(c)
            assert h3.latlng_to_cell(la, lo, res) == c
            nb = h3._cell_neighbors(c)
            assert len(nb) == 5
            for b in nb:
                assert c in h3._cell_neighbors(b)


def test_grid_disk_sizes_and_symmetry():
    c = h3.latlng_to_cell(48.8566, 2.3522, 9)
    for k in (1, 2, 3):
        d = h3.grid_disk(c, k)
        assert len(d) == 1 + 3 * k * (k + 1)
        assert c in d
    # pentagon disks are smaller (deleted subsequence)
    p = _pentagon_cell(38, 4)
    assert len(h3.grid_disk(p, 1)) == 6  # 1 + 5


def test_parent_child():
    lat, lng = _random_latlng(120)
    cells = [int(c) for c in np.unique(h3.latlng_to_cell_vec(lat, lng, 3))[:25]]
    for c in cells:
        ch = h3.cell_to_children(c, 5)
        n_exp = 49 if not h3.is_pentagon(c) else 49 - 8  # 7² minus K-subtree
        assert len(ch) == n_exp
        for x in ch[::5]:
            assert h3.cell_to_parent(x, 3) == c
            la, lo = h3.cell_to_latlng(x)
            assert h3.latlng_to_cell(la, lo, 5) == x
        # DIRECT children's centers are contained in the parent (distance
        # 1/√7 ≈ 0.378 of a parent spacing < 0.5 inradius); note deeper
        # descendants legitimately overhang in H3 — corner grandchildren
        # sit at ~0.52 spacings, outside the parent edge — so center
        # containment is only asserted one level down
        d1 = h3.cell_to_children(c, 4)
        las, los = zip(*(h3.cell_to_latlng(x) for x in d1))
        back = h3.latlng_to_cell_vec(np.array(las), np.array(los), 3)
        assert (back == c).all()


def test_cell_areas_sum_to_sphere():
    """Res-1 cell count × measured mean area ≈ sphere area: estimate
    each cell's area by the fraction of uniform random points it
    captures — a grossly wrong projection breaks this."""
    lat, lng = _random_latlng(200000)
    cells = h3.latlng_to_cell_vec(lat, lng, 1)
    uniq, counts = np.unique(cells, return_counts=True)
    assert len(uniq) == 842  # 120·7 + 2? no: 122·7 - 12 = 842 res-1 cells
    # uniformity: hexagon cell areas within ~2.5x of each other
    hexmask = np.array([not h3.is_pentagon(int(c)) for c in uniq])
    hc = counts[hexmask]
    assert hc.max() / hc.min() < 2.5


def test_is_valid_and_string():
    c = h3.latlng_to_cell(1.0, 2.0, 7)
    assert h3.is_valid_cell(c)
    assert not h3.is_valid_cell(c | (1 << 63))
    assert h3.string_to_cell(h3.cell_to_string(c)) == c
    assert h3.get_resolution(c) == 7


# ------------------------------------------------- published anchors


def test_published_anchor_vectors():
    """Bit-exact against the H3 documentation quickstart examples."""
    assert h3.latlng_to_cell(37.3615593, -122.0553238, 5) == 0x85283473FFFFFFF
    assert (
        h3.latlng_to_cell(37.7752702151959257, -122.418307270836565, 9)
        == 0x8928308280FFFFF
    )
    la, lo = h3.cell_to_latlng(0x85283473FFFFFFF)
    assert abs(la - 37.345793375368) < 1e-9
    assert abs(lo - (-121.976375972551)) < 1e-9
    # hierarchy consistency on the anchor
    assert h3.cell_to_parent(0x8928308280FFFFF, 5) == h3.latlng_to_cell(
        37.7752702151959257, -122.418307270836565, 5
    )


def test_polygon_to_cells_covers():
    ring_lat = np.array([48.85, 48.85, 48.87, 48.87])
    ring_lon = np.array([2.33, 2.36, 2.36, 2.33])
    cells = h3.polygon_to_cells(ring_lat, ring_lon, 9)
    assert len(cells) > 10
    # every interior sample's cell is in the cover
    for la in np.linspace(48.852, 48.868, 5):
        for lo in np.linspace(2.332, 2.358, 5):
            assert h3.latlng_to_cell(la, lo, 9) in set(int(c) for c in cells)


def test_cross_face_indexing_consistent():
    """Points on either side of an icosahedron edge, inside the same
    straddling cell, must index identically (the frame maps encode
    this — regression for the cross-face machinery)."""
    lat, lng = _random_latlng(4000)
    cells = h3.latlng_to_cell_vec(lat, lng, 2)
    # find cells whose center's face differs from some member point's face
    xyz = h3._geo_to_xyz(np.radians(lat), np.radians(lng))
    pt_face = np.argmax(xyz @ h3._FACE_XYZ.T, axis=1)
    checked = 0
    for c in np.unique(cells):
        m = cells == c
        if len(set(pt_face[m])) > 1:
            la, lo = h3.cell_to_latlng(int(c))
            assert h3.latlng_to_cell(la, lo, 2) == int(c)
            checked += 1
    assert checked > 10  # straddling cells exist and are consistent
