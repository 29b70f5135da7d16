"""Douglas-Peucker polyline simplification (public algorithm;
Douglas & Peucker 1973) — the standard geometry reduction for
rendering/tiling OSM way geometries at low zooms.

Iterative stack formulation (no recursion depth limit on long ways),
planar perpendicular distance in degree space — appropriate for the
small extents of individual ways; callers needing metric tolerance
convert eps via cos(lat) like the tile math does.
"""

from __future__ import annotations

import numpy as np


def _perp_dist(lats, lons, i0: int, i1: int) -> np.ndarray:
    """Perpendicular distance of points (i0, i1) exclusive to the
    segment i0→i1; degenerate segment falls back to point distance."""
    x = lons[i0 + 1 : i1]
    y = lats[i0 + 1 : i1]
    x0, y0, x1, y1 = lons[i0], lats[i0], lons[i1], lats[i1]
    dx, dy = x1 - x0, y1 - y0
    den = np.hypot(dx, dy)
    if den == 0.0:
        return np.hypot(x - x0, y - y0)
    return np.abs(dy * x - dx * y + x1 * y0 - y1 * x0) / den


def dp_keep_mask(lats: np.ndarray, lons: np.ndarray, eps: float) -> np.ndarray:
    """→ boolean keep-mask over the points. Endpoints always kept;
    interior points kept iff they anchor a split (max perpendicular
    distance > eps at some stage)."""
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    n = len(lats)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        d = _perp_dist(lats, lons, i0, i1)
        j = int(np.argmax(d))
        if d[j] > eps:
            split = i0 + 1 + j
            keep[split] = True
            stack.append((i0, split))
            stack.append((split, i1))
    return keep


def dp_simplify(lats: np.ndarray, lons: np.ndarray, eps: float):
    """→ (lats', lons') with the non-anchor interior points removed."""
    m = dp_keep_mask(lats, lons, eps)
    return np.asarray(lats, dtype=np.float64)[m], np.asarray(lons, dtype=np.float64)[m]
