"""Raster <-> vector tile reprojection (SURVEY B10).

A raster grid is (rows x cols) over a unit-square bbox. Deterministic
closed-form integer/float math, vectorized; used both as a numpy oracle and
inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np


def raster_cell_of_unit(u, v, rows: int, cols: int, bbox=(0.0, 0.0, 1.0, 1.0)):
    """(row, col) raster cell containing unit coords; -1 outside bbox."""
    u0, v0, u1, v1 = bbox
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    col = np.floor((u - u0) / (u1 - u0) * cols).astype(np.int64)
    row = np.floor((v - v0) / (v1 - v0) * rows).astype(np.int64)
    inside = (col >= 0) & (col < cols) & (row >= 0) & (row < rows)
    return np.where(inside, row, -1), np.where(inside, col, -1)


def raster_center_unit(row, col, rows: int, cols: int, bbox=(0.0, 0.0, 1.0, 1.0)):
    """Unit coords of raster cell centers."""
    u0, v0, u1, v1 = bbox
    u = u0 + (np.asarray(col, dtype=np.float64) + 0.5) / cols * (u1 - u0)
    v = v0 + (np.asarray(row, dtype=np.float64) + 0.5) / rows * (v1 - v0)
    return u, v


def raster_cell_to_tile(row, col, rows: int, cols: int, z: int,
                        extent: int = 4096, bbox=(0.0, 0.0, 1.0, 1.0)):
    """Reproject raster cell centers to (tile_x, tile_y, px, py) at zoom z —
    the raster->vector direction of B10."""
    u, v = raster_center_unit(row, col, rows, cols, bbox)
    n = 1 << z
    tx = np.clip(np.floor(u * n), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor(v * n), 0, n - 1).astype(np.int64)
    px = np.trunc(u * n * extent - tx * extent).astype(np.int64)
    py = np.trunc(v * n * extent - ty * extent).astype(np.int64)
    return tx, ty, px, py


def rasterize_points(u, v, rows: int, cols: int, bbox=(0.0, 0.0, 1.0, 1.0)) -> np.ndarray:
    """Vector->raster: histogram point counts into the grid."""
    row, col = raster_cell_of_unit(u, v, rows, cols, bbox)
    ok = row >= 0
    flat = row[ok] * cols + col[ok]
    counts = np.bincount(flat, minlength=rows * cols)
    return counts.reshape(rows, cols)
