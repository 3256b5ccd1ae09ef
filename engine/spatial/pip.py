"""Point-in-polygon ray casting (SURVEY B8) — vectorized numpy.

Even-odd rule: a point is inside iff a ray to +infinity crosses the polygon
boundary an odd number of times. Counting crossings over ALL rings
(exterior + holes) makes holes subtract automatically. Boundary behavior is
the standard half-open convention (deterministic, consistent with the
DuckDB oracle SQL used in __spark_entry__.py).
"""

from __future__ import annotations

import numpy as np


def ring_crossings(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Number of upward/downward edge crossings of a horizontal +x ray from
    each point. ``ring`` is (n,2) closed or open (closing edge implied).
    Returns int array of crossing counts per point."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x1, y1 = r[None, :, 0], r[None, :, 1]
    x2 = np.roll(r[:, 0], -1)[None, :]
    y2 = np.roll(r[:, 1], -1)[None, :]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hits = straddle & (px < x_at)
    return hits.sum(axis=1)


def points_in_polygon(px, py, rings) -> np.ndarray:
    """Even-odd inside test for points vs a polygon (list of rings:
    exterior first, then holes)."""
    total = np.zeros(np.asarray(px).shape, dtype=np.int64)
    for ring in rings:
        total += ring_crossings(px, py, ring)
    return (total % 2) == 1


def bbox_of(rings) -> tuple[float, float, float, float]:
    pts = np.vstack([np.asarray(r, dtype=np.float64) for r in rings])
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )
