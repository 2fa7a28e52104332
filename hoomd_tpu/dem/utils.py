"""DEM shape helpers (reference dem/utils.py: mass properties, convex
hulls, shape centering)."""

from __future__ import annotations

import numpy as np


def center(vertices, faces=None):
    """Shift vertices so the centroid is at the origin
    (reference dem.utils.center)."""
    v = np.asarray(vertices, dtype=float)
    c = v.mean(axis=0)
    if faces is None:
        return v - c
    return v - c, faces


def area(vertices, factor=1.0):
    """Polygon area via the shoelace formula (reference dem.utils.area)."""
    v = np.asarray(vertices, dtype=float)[:, :2] * factor
    x, y = v[:, 0], v[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def mass_properties(vertices, faces=None, factor=1.0):
    """(mass-area, center, moment of inertia about z) for a 2D polygon of
    unit density (reference dem.utils.massProperties)."""
    v = np.asarray(vertices, dtype=float)[:, :2] * factor
    n = len(v)
    A = 0.0
    cx = cy = 0.0
    Iz = 0.0
    for i in range(n):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % n]
        cross = x0 * y1 - x1 * y0
        A += cross / 2.0
        cx += (x0 + x1) * cross / 6.0
        cy += (y0 + y1) * cross / 6.0
        Iz += cross * (x0 * x0 + x0 * x1 + x1 * x1
                       + y0 * y0 + y0 * y1 + y1 * y1) / 12.0
    cx, cy = cx / A, cy / A
    return abs(A), (cx, cy), abs(Iz)


def convexHull(vertices):
    """2D convex hull, counter-clockwise (reference dem.utils uses
    quickhull; scipy's implementation here)."""
    from scipy.spatial import ConvexHull
    v = np.asarray(vertices, dtype=float)[:, :2]
    h = ConvexHull(v)
    return v[h.vertices]


def rmax(vertices, radius=0.0, factor=1.0):
    v = np.asarray(vertices, dtype=float) * factor
    return float(np.linalg.norm(v, axis=1).max() + radius)
