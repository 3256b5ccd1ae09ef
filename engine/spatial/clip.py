"""Sutherland–Hodgman polygon clip + Liang–Barsky line clip to an
axis-aligned rectangle (SURVEY B11). Vectorized per edge pass.

Used by the tile encode stage to clip features to a buffered tile bbox
before quantization to the extent grid.
"""

from __future__ import annotations

import numpy as np


def clip_ring(ring: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring (open, (n,2) float64) against the
    rect [x0,x1]x[y0,y1]. Returns the clipped open ring (may be empty).

    Each of the four half-plane passes is vectorized: inside masks and edge
    intersections computed for all vertices at once.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]

    for axis, bound, keep_ge in ((0, x0, True), (0, x1, False), (1, y0, True), (1, y1, False)):
        if len(pts) == 0:
            return pts.reshape(0, 2)
        cur = pts
        nxt = np.roll(pts, -1, axis=0)
        if keep_ge:
            cur_in = cur[:, axis] >= bound
            nxt_in = nxt[:, axis] >= bound
        else:
            cur_in = cur[:, axis] <= bound
            nxt_in = nxt[:, axis] <= bound
        denom = nxt[:, axis] - cur[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0, (bound - cur[:, axis]) / denom, 0.0)
        inter = cur + t[:, None] * (nxt - cur)
        inter[:, axis] = bound  # exact on the clip edge

        out = []
        for i in range(len(cur)):
            if cur_in[i]:
                out.append(cur[i])
                if not nxt_in[i]:
                    out.append(inter[i])
            elif nxt_in[i]:
                out.append(inter[i])
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return _dedupe_consecutive(pts)


def _dedupe_consecutive(pts: np.ndarray) -> np.ndarray:
    """Remove consecutive duplicate vertices (incl. wraparound)."""
    if len(pts) < 2:
        return pts
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.diff(pts, axis=0) != 0).any(axis=1)
    pts = pts[keep]
    while len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    return pts


def clip_line(line: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> list[np.ndarray]:
    """Liang–Barsky clip of a polyline to the rect; returns the list of
    surviving sub-polylines (each (n>=2,2))."""
    pts = np.asarray(line, dtype=np.float64)
    if len(pts) < 2:
        return []
    p, q = pts[:-1], pts[1:]
    d = q - p
    t0 = np.zeros(len(p))
    t1 = np.ones(len(p))
    tmins, tmaxs = [], []
    for axis, lo, hi in ((0, x0, x1), (1, y0, y1)):
        dv = d[:, axis]
        pv = p[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            tlo = np.where(dv != 0, (lo - pv) / dv, np.inf)
            thi = np.where(dv != 0, (hi - pv) / dv, -np.inf)
        tmin = np.minimum(tlo, thi)
        tmax = np.maximum(tlo, thi)
        tmins.append(tmin)
        tmaxs.append(tmax)
        par_in = (dv == 0) & (pv >= lo) & (pv <= hi)
        t0 = np.where(dv != 0, np.maximum(t0, tmin), np.where(par_in, t0, 2.0))
        t1 = np.where(dv != 0, np.minimum(t1, tmax), np.where(par_in, t1, -1.0))
    visible = t0 <= t1
    av = p + t0[:, None] * d
    bv = p + t1[:, None] * d
    # snap binding-clamp endpoints onto the exact boundary constant — the
    # LB twin of clip_ring's `inter[:, axis] = bound` (see
    # clipbatch.clip_segments, which must stay byte-identical to this path)
    for axis, lo, hi in ((0, x0, x1), (1, y0, y1)):
        dv = d[:, axis]
        entry = np.where(dv > 0, lo, hi)
        exit_ = np.where(dv > 0, hi, lo)
        bind0 = (dv != 0) & (t0 > 0) & (t0 == tmins[axis])
        bind1 = (dv != 0) & (t1 < 1) & (t1 == tmaxs[axis])
        av[:, axis] = np.where(bind0, entry, av[:, axis])
        bv[:, axis] = np.where(bind1, exit_, bv[:, axis])

    parts: list[list[np.ndarray]] = []
    current: list[np.ndarray] = []
    for i in range(len(p)):
        if not visible[i]:
            if len(current) >= 2:
                parts.append(current)
            current = []
            continue
        a = av[i]
        b = bv[i]
        if not current:
            current = [a, b]
        elif np.allclose(current[-1], a):
            current.append(b)
        else:
            if len(current) >= 2:
                parts.append(current)
            current = [a, b]
    if len(current) >= 2:
        parts.append(current)
    return [_collapse_dupes(np.asarray(part)) for part in parts]


def _collapse_dupes(pts: np.ndarray) -> np.ndarray:
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.abs(np.diff(pts, axis=0)) > 1e-12).any(axis=1)
    return pts[keep]
