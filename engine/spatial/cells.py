"""Hierarchical cell index: Morton (Z-order) quadkey cells + k-ring.

H3/S2-style cell ids mandated by the north rule (SURVEY.md §2.B B6),
realized as bit-interleaved z/x/y quadkeys: locality-preserving, pure
integer math (runs JVM-side in Spark via shiftleft/bitwiseOR; this numpy
version is the oracle and the UDF-side kernel).

cell_id layout (fits a signed int64 for z <= 26):
    cell = (z << 58) | morton(x, y)
"""

from __future__ import annotations

import numpy as np

_Z_SHIFT = 58


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so bit i lands at position 2i."""
    v = np.asarray(v, dtype=np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits (gather bits at even positions)."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton(x, y) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits)."""
    return (_spread_bits(x) | (_spread_bits(y) << np.uint64(1))).astype(np.int64)


def unmorton(m) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, dtype=np.uint64)
    return (
        _compact_bits(m).astype(np.int64),
        _compact_bits(m >> np.uint64(1)).astype(np.int64),
    )


def cell_id(z: int, x, y) -> np.ndarray:
    """Pack (z, x, y) into one int64 cell id."""
    return (np.int64(z) << np.int64(_Z_SHIFT)) | morton(x, y)


def cell_zxy(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    z = (cell >> np.int64(_Z_SHIFT)).astype(np.int64)
    x, y = unmorton(cell & np.int64((1 << _Z_SHIFT) - 1))
    return z, x, y


def parent(cell, steps: int = 1) -> np.ndarray:
    """Ancestor cell ``steps`` zoom levels up."""
    z, x, y = cell_zxy(cell)
    return cell_id(int(z.flat[0]) - steps if z.ndim else z - steps, x >> steps, y >> steps)


def k_ring(z: int, x: int, y: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k of (z,x,y): x wraps around the
    antimeridian, y clamps at the poles. Analog of H3's k_ring (SURVEY B6/B9).
    Returns a sorted unique int64 array of cell ids, scalar inputs only.
    """
    n = 1 << z
    xs = (np.arange(x - k, x + k + 1) % n + n) % n
    ys = np.arange(max(0, y - k), min(n - 1, y + k) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return np.unique(cell_id(z, gx.ravel(), gy.ravel()))


def cells_covering_bbox(z: int, u0: float, v0: float, u1: float, v1: float) -> np.ndarray:
    """Cell ids of all z-tiles intersecting a unit-square bbox (for bucketing
    broadcast polygons, SURVEY B8)."""
    n = 1 << z
    x0 = max(0, int(np.floor(u0 * n)))
    y0 = max(0, int(np.floor(v0 * n)))
    x1 = min(n - 1, int(np.floor(u1 * n - 1e-15)))
    y1 = min(n - 1, int(np.floor(v1 * n - 1e-15)))
    if x1 < x0 or y1 < y0:
        return np.empty(0, dtype=np.int64)
    gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return cell_id(z, gx.ravel(), gy.ravel())
