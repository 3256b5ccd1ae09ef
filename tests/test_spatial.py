"""Spatial kernel tests with brute-force oracles (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import numpy as np
import pytest

from engine.spatial import cells, clip, hilbert, mercator, pip, raster

rng = np.random.default_rng(42)


def test_mercator_roundtrip():
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    u, v = mercator.lnglat_to_unit(lon, lat)
    assert (u >= 0).all() and (u <= 1).all() and (v >= 0).all() and (v <= 1).all()
    lon2, lat2 = mercator.unit_to_lnglat(u, v)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_mercator_known_points():
    u, v = mercator.lnglat_to_unit(0.0, 0.0)
    assert u == 0.5 and abs(v - 0.5) < 1e-12
    x, y = mercator.tile_of(0.0, 0.0, 1)
    assert (int(x), int(y)) == (1, 1)
    # z0: everything in tile (0,0)
    x, y = mercator.tile_of(-179.9, 84.9, 0)
    assert (int(x), int(y)) == (0, 0)


def test_tile_pixel_in_range():
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    z = 7
    tx, ty = mercator.tile_of(lon, lat, z)
    px, py = mercator.tile_pixel(lon, lat, z, tx, ty, 4096)
    assert (px >= 0).all() and (px < 4096).all()
    assert (py >= 0).all() and (py < 4096).all()


def test_morton_roundtrip():
    x = rng.integers(0, 2**14, 10000)
    y = rng.integers(0, 2**14, 10000)
    m = cells.morton(x, y)
    x2, y2 = cells.unmorton(m)
    assert (x2 == x).all() and (y2 == y).all()
    c = cells.cell_id(14, x, y)
    z2, x3, y3 = cells.cell_zxy(c)
    assert (z2 == 14).all() and (x3 == x).all() and (y3 == y).all()


def test_cell_parent():
    c = cells.cell_id(10, np.array([513]), np.array([770]))
    z, x, y = cells.cell_zxy(cells.parent(c, 2))
    assert (int(z.flat[0]), int(x[0]), int(y[0])) == (8, 128, 192)


def test_k_ring():
    ring = cells.k_ring(4, 3, 3, 1)
    assert len(ring) == 9
    zs, xs, ys = cells.cell_zxy(ring)
    assert sorted(zip(xs.tolist(), ys.tolist())) == [
        (x, y) for x in (2, 3, 4) for y in (2, 3, 4)
    ]
    # antimeridian wrap
    ring = cells.k_ring(4, 0, 5, 1)
    _, xs, _ = cells.cell_zxy(ring)
    assert set(xs.tolist()) == {15, 0, 1}
    # pole clamp
    ring = cells.k_ring(4, 5, 0, 1)
    _, _, ys = cells.cell_zxy(ring)
    assert set(ys.tolist()) == {0, 1}


def test_cells_covering_bbox():
    got = cells.cells_covering_bbox(2, 0.2, 0.2, 0.8, 0.8)
    zs, xs, ys = cells.cell_zxy(got)
    # floor(.2*4)=0 .. floor(.8*4)=3 -> all 16 tiles
    assert sorted(zip(xs.tolist(), ys.tolist())) == [
        (x, y) for x in range(4) for y in range(4)
    ]
    # a bbox inside one tile covers exactly that tile
    one = cells.cells_covering_bbox(2, 0.30, 0.30, 0.45, 0.45)
    _, xs1, ys1 = cells.cell_zxy(one)
    assert list(zip(xs1.tolist(), ys1.tolist())) == [(1, 1)]


def test_hilbert_roundtrip_and_locality():
    z = 8
    x = rng.integers(0, 2**z, 5000)
    y = rng.integers(0, 2**z, 5000)
    d = hilbert.xy2d(z, x, y)
    x2, y2 = hilbert.d2xy(z, d)
    assert (x2 == x).all() and (y2 == y).all()
    # curve visits every cell exactly once at small order
    d_all = hilbert.xy2d(3, *np.meshgrid(np.arange(8), np.arange(8)))
    assert sorted(d_all.ravel().tolist()) == list(range(64))
    # adjacent d -> adjacent cells (the defining property)
    xs, ys = hilbert.d2xy(3, np.arange(64))
    steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (steps == 1).all()


def test_pip_against_matplotlib_free_oracle():
    # star-ish concave polygon + hole; oracle = slow per-point loop
    outer = np.array([[0, 0], [10, 0], [10, 10], [5, 5], [0, 10]], dtype=float)
    hole = np.array([[2, 1], [4, 1], [4, 3], [2, 3]], dtype=float)
    px = rng.uniform(-1, 11, 2000)
    py = rng.uniform(-1, 11, 2000)
    got = pip.points_in_polygon(px, py, [outer, hole])

    def slow_inside(x, y, ring):
        n = len(ring)
        c = False
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                c = not c
        return c

    want = np.array(
        [slow_inside(x, y, outer) != slow_inside(x, y, hole) for x, y in zip(px, py)]
    )
    assert (got == want).all()


def test_clip_ring_basic():
    # triangle overlapping the unit box
    tri = np.array([[-1, 0.5], [0.5, -1], [2, 2]], dtype=float)
    out = clip.clip_ring(tri, 0, 0, 1, 1)
    assert len(out) >= 3
    assert (out >= -1e-9).all() and (out <= 1 + 1e-9).all()
    # fully inside: unchanged
    sq = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]])
    np.testing.assert_array_equal(clip.clip_ring(sq, 0, 0, 1, 1), sq)
    # fully outside: empty
    assert len(clip.clip_ring(sq + 5.0, 0, 0, 1, 1)) == 0


def test_clip_ring_area_oracle():
    # clipped area of random convex polygons == monte-carlo estimate
    ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
    poly = np.stack([0.5 + 0.8 * np.cos(ang), 0.5 + 0.8 * np.sin(ang)], axis=1)
    out = clip.clip_ring(poly, 0, 0, 1, 1)

    def area(r):
        x, y = r[:, 0], r[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))

    pts = rng.uniform(0, 1, (200_000, 2))
    mc_est = pip.points_in_polygon(pts[:, 0], pts[:, 1], [poly]).mean()
    assert abs(area(out) - mc_est) < 5e-3


def test_clip_line():
    line = np.array([[-1, 0.5], [0.5, 0.5], [0.5, 2], [2, 2], [0.9, 0.9]], dtype=float)
    parts = clip.clip_line(line, 0, 0, 1, 1)
    assert len(parts) == 2
    for p in parts:
        assert (p >= -1e-9).all() and (p <= 1 + 1e-9).all() and len(p) >= 2
    # fully inside line untouched
    inside = np.array([[0.1, 0.1], [0.9, 0.9]])
    parts = clip.clip_line(inside, 0, 0, 1, 1)
    assert len(parts) == 1 and np.allclose(parts[0], inside)
    # fully outside
    assert clip.clip_line(inside + 10, 0, 0, 1, 1) == []


def test_raster_roundtrip():
    u = rng.uniform(0, 1, 5000)
    v = rng.uniform(0, 1, 5000)
    grid = raster.rasterize_points(u, v, 16, 16)
    assert grid.sum() == 5000
    row, col = raster.raster_cell_of_unit(u, v, 16, 16)
    assert (row >= 0).all()
    # centers land back in their own cell
    r2, c2 = raster.raster_cell_of_unit(
        *raster.raster_center_unit(row, col, 16, 16), 16, 16
    )
    assert (r2 == row).all() and (c2 == col).all()
    # raster -> tile reprojection stays in-range
    tx, ty, px, py = raster.raster_cell_to_tile(row, col, 16, 16, z=5)
    assert (tx >= 0).all() and (tx < 32).all() and (px >= 0).all() and (px < 4096).all()
    assert (ty >= 0).all() and (ty < 32).all() and (py >= 0).all() and (py < 4096).all()
