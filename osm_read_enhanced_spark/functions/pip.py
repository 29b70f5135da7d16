"""Point-in-polygon kernels: vectorized ray casting (points × edges).

Engine-only operator (SURVEY.md §2.5 J4): the exact refine step after a
coarse cell equi-join. Runs inside Arrow batches — numpy broadcasting
over (n_points × n_edges), never per-row Python.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(plat, plon, ring_lats, ring_lons) -> np.ndarray:
    """Even-odd ray cast: bool mask of points inside the closed ring.

    Boundary behaviour follows the half-open convention (a point exactly
    on a lower edge counts inside, upper edge outside) — deterministic
    and double-count-free when rings tile a plane.
    """
    plat = np.asarray(plat, dtype=np.float64)
    plon = np.asarray(plon, dtype=np.float64)
    y1 = np.asarray(ring_lats, dtype=np.float64)
    x1 = np.asarray(ring_lons, dtype=np.float64)
    y2 = np.roll(y1, -1)
    x2 = np.roll(x1, -1)
    # (n_points, n_edges) broadcast
    py = plat[:, None]
    px = plon[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    crossings = cond & (px < xint)
    return crossings.sum(axis=1) % 2 == 1


def points_in_polygon(plat, plon, outer_lats, outer_lons, holes=()) -> np.ndarray:
    """Ring + holes (relation multipolygon semantics: outer minus inners)."""
    inside = points_in_ring(plat, plon, outer_lats, outer_lons)
    for hlat, hlon in holes:
        inside &= ~points_in_ring(plat, plon, hlat, hlon)
    return inside


def ring_area_deg2(ring_lats, ring_lons) -> float:
    """Signed shoelace area (degree² units; sign = orientation)."""
    y = np.asarray(ring_lats, dtype=np.float64)
    x = np.asarray(ring_lons, dtype=np.float64)
    return float(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
