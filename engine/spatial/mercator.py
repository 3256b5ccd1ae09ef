"""WebMercator (EPSG:4326 -> 3857-style slippy map) projection kernels.

Generalizes the reference's pluggable Project/Unproject hooks
(/root/reference/internal/geometry/marshal.go:12, unmarshal.go:14) into the
standard z/x/y tile scheme. All functions are vectorized numpy; math in
float64 throughout (SURVEY.md §7.4 item 3).

Conventions: unit-square coordinates u,v in [0,1) with v growing SOUTH
(screen y-down). A tile (z,x,y) covers u in [x/2^z,(x+1)/2^z), v likewise.
Tile-local pixel coordinates are u*2^z*extent - x*extent (float; quantization
to int happens in the encode stage and truncates toward zero like the
reference's int32() cast, marshal.go:190,196).
"""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.05112878  # WebMercator validity bound


def lnglat_to_unit(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> unit-square WebMercator (u right, v down)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    u = (lon + 180.0) / 360.0
    sin = np.sin(np.radians(lat))
    v = 0.5 - np.log((1.0 + sin) / (1.0 - sin)) / (4.0 * np.pi)
    return u, v


def unit_to_lnglat(u, v) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of lnglat_to_unit."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    lon = u * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * v))))
    return lon, lat


def tile_of_unit(u, v, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile x,y containing unit coords at zoom z (edge-clamped)."""
    n = 1 << z
    x = np.clip(np.floor(np.asarray(u) * n), 0, n - 1).astype(np.int64)
    y = np.clip(np.floor(np.asarray(v) * n), 0, n - 1).astype(np.int64)
    return x, y


def tile_of(lon, lat, z: int) -> tuple[np.ndarray, np.ndarray]:
    u, v = lnglat_to_unit(lon, lat)
    return tile_of_unit(u, v, z)


def tile_pixel(lon, lat, z: int, tx, ty, extent: int = 4096):
    """Tile-local float pixel coords of lon/lat relative to tile (z,tx,ty).

    May fall outside [0, extent) for features near tile borders — the clip
    stage handles the buffer.
    """
    u, v = lnglat_to_unit(lon, lat)
    scale = float((1 << z) * extent)
    px = u * scale - np.asarray(tx, dtype=np.float64) * extent
    py = v * scale - np.asarray(ty, dtype=np.float64) * extent
    return px, py


def tile_bounds_unit(z: int, x, y) -> tuple[np.ndarray, ...]:
    """Unit-square bbox (u0, v0, u1, v1) of tile (z,x,y)."""
    inv = 1.0 / (1 << z)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return x * inv, y * inv, (x + 1) * inv, (y + 1) * inv
