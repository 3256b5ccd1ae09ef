"""DuckDB oracle for the polygon/outline MVT tile queries.

The binary tile itself has no SQL twin, but the encoder's auditable
projection — which (poly, tile) pairs produce a feature in each layer —
does, because the fixture polygons are CONVEX (fixtures.polygons_np):

- polygons layer: a feature survives in a tile iff the Sutherland-Hodgman
  clip of its exterior ring against the buffered tile rect has nonzero
  signed area AFTER int32-truncation quantization (polytiler._orient).
  For a convex polygon clipped by a rect, the clip output's vertex set is
  exactly: (V1) polygon vertices inside the rect, (V2) rect corners inside
  the polygon (even-odd parity), and (V3) polygon-edge x rect-side
  intersection points within the side's extent; and its cyclic order is
  the angular order around any interior point (the vertex centroid). The
  quantized shoelace over that ordered set therefore equals the encoder's
  area test exactly (duplicates contribute zero).
- outlines layer: a feature survives iff some ring edge's Liang-Barsky
  clip is visible with the two clipped endpoints quantizing to different
  pixels (part chaining never merges distinct quantized runs: interior
  junctions are bitwise-equal shared vertices, so a part has >= 2 distinct
  quantized points iff one of its segments does).

Pixel-space arithmetic mirrors the numpy kernels expression-for-expression
(same IEEE double ops); the predicates only flip when a coordinate sits
within ulps of an integer boundary — checked empirically green at every SF.
"""

from __future__ import annotations

from engine.pipeline import fixtures

from .polytiler import BUFFER
from .tiler import EXTENT

LO = float(-BUFFER)
HI = float(EXTENT + BUFFER)


def _px(lon: str) -> str:
    """lon -> tile-pixel x for covered-tile row c (u * 4096*2^z - x*4096)."""
    return (
        f"((({lon}) + 180.0) / 360.0) * (4096.0 * CAST((1 << c.z) AS DOUBLE)) "
        f"- CAST(c.x AS DOUBLE) * 4096.0"
    )


def _py(lat: str) -> str:
    s = f"sin(radians({lat}))"
    return (
        f"(0.5 - ln((1.0 + {s}) / (1.0 - {s})) / (4.0 * pi())) "
        f"* (4096.0 * CAST((1 << c.z) AS DOUBLE)) - CAST(c.y AS DOUBLE) * 4096.0"
    )


def survival_ctes(sf_dir: str, z_min: int, z_max: int) -> str:
    """CTE chain ending in ``surv(z, x, y, layer)``: one row per surviving
    (feature, layer, tile)."""
    n = fixtures.poly_count_for(sf_dir)
    m = BUFFER / EXTENT
    return f"""
{fixtures.polygon_edges_cte(n)},
{fixtures.polygon_bbox_cte(n)},
bounds AS (
  SELECT b.poly_id, z.z,
         greatest(CAST(0 AS BIGINT), CAST(floor(b.u0 * (1 << z.z) - {m}) AS BIGINT)) AS xlo,
         least(CAST((1 << z.z) AS BIGINT) - 1, CAST(floor(b.u1 * (1 << z.z) + {m}) AS BIGINT)) AS xhi,
         greatest(CAST(0 AS BIGINT), CAST(floor(b.v0 * (1 << z.z) - {m}) AS BIGINT)) AS ylo,
         least(CAST((1 << z.z) AS BIGINT) - 1, CAST(floor(b.v1 * (1 << z.z) + {m}) AS BIGINT)) AS yhi
  FROM poly_bbox b CROSS JOIN (SELECT unnest(generate_series({z_min}, {z_max})) AS z) z),
xs AS (SELECT poly_id, z, unnest(generate_series(xlo, xhi)) AS x, ylo, yhi FROM bounds),
cov AS (SELECT poly_id, z, x, unnest(generate_series(ylo, yhi)) AS y FROM xs),
pedges AS (
  SELECT c.poly_id, e.ring_idx, c.z, c.x, c.y,
         {_px('e.x1')} AS px1, {_py('e.y1')} AS py1,
         {_px('e.x2')} AS px2, {_py('e.y2')} AS py2
  FROM cov c JOIN poly_edges e USING (poly_id)),
lbt AS (
  SELECT poly_id, z, x, y, px1, py1,
         px2 - px1 AS dx, py2 - py1 AS dy,
         CASE WHEN px2 - px1 != 0 THEN least(({LO} - px1) / (px2 - px1), ({HI} - px1) / (px2 - px1)) END AS tminx,
         CASE WHEN px2 - px1 != 0 THEN greatest(({LO} - px1) / (px2 - px1), ({HI} - px1) / (px2 - px1)) END AS tmaxx,
         CASE WHEN py2 - py1 != 0 THEN least(({LO} - py1) / (py2 - py1), ({HI} - py1) / (py2 - py1)) END AS tminy,
         CASE WHEN py2 - py1 != 0 THEN greatest(({LO} - py1) / (py2 - py1), ({HI} - py1) / (py2 - py1)) END AS tmaxy
  FROM pedges),
lbp AS (
  SELECT *, greatest(0.0, coalesce(tminx, 0.0), coalesce(tminy, 0.0)) AS t0,
            least(1.0, coalesce(tmaxx, 1.0), coalesce(tmaxy, 1.0)) AS t1
  FROM lbt),
lbv AS (
  -- visible clipped segments with SNAPPED endpoints: a binding parametric
  -- clamp puts the endpoint exactly on that axis's boundary (the encoder
  -- snaps identically — clipbatch.clip_segments), so trunc is stable there
  SELECT poly_id, z, x, y,
         CASE WHEN dx != 0 AND t0 > 0 AND t0 = tminx THEN (CASE WHEN dx > 0 THEN {LO} ELSE {HI} END) ELSE px1 + t0 * dx END AS ax,
         CASE WHEN dy != 0 AND t0 > 0 AND t0 = tminy THEN (CASE WHEN dy > 0 THEN {LO} ELSE {HI} END) ELSE py1 + t0 * dy END AS ay,
         CASE WHEN dx != 0 AND t1 < 1 AND t1 = tmaxx THEN (CASE WHEN dx > 0 THEN {HI} ELSE {LO} END) ELSE px1 + t1 * dx END AS bx,
         CASE WHEN dy != 0 AND t1 < 1 AND t1 = tmaxy THEN (CASE WHEN dy > 0 THEN {HI} ELSE {LO} END) ELSE py1 + t1 * dy END AS bly
  FROM lbp
  WHERE t0 <= t1
    AND (dx != 0 OR (px1 >= {LO} AND px1 <= {HI}))
    AND (dy != 0 OR (py1 >= {LO} AND py1 <= {HI}))),
outline AS (
  SELECT DISTINCT poly_id, z, x, y
  FROM lbv
  WHERE CAST(trunc(ax) AS BIGINT) != CAST(trunc(bx) AS BIGINT)
     OR CAST(trunc(ay) AS BIGINT) != CAST(trunc(bly) AS BIGINT)),
ext AS (SELECT * FROM pedges WHERE ring_idx = 0),
v1 AS (
  SELECT poly_id, z, x, y, px1 AS vx, py1 AS vy FROM ext
  WHERE px1 >= {LO} AND px1 <= {HI} AND py1 >= {LO} AND py1 <= {HI}),
corners(cx, cy) AS (VALUES ({LO}, {LO}), ({LO}, {HI}), ({HI}, {LO}), ({HI}, {HI})),
v2 AS (
  SELECT e.poly_id, e.z, e.x, e.y, k.cx AS vx, k.cy AS vy
  FROM ext e CROSS JOIN corners k
  GROUP BY e.poly_id, e.z, e.x, e.y, k.cx, k.cy
  HAVING SUM(CASE WHEN ((e.py1 > k.cy) != (e.py2 > k.cy))
                   AND (k.cx < e.px1 + (k.cy - e.py1) * (e.px2 - e.px1) / (e.py2 - e.py1))
             THEN 1 ELSE 0 END) % 2 = 1),
sides(c) AS (VALUES ({LO}), ({HI})),
v3x AS (
  SELECT e.poly_id, e.z, e.x, e.y, s.c AS vx,
         e.py1 + ((s.c - e.px1) / (e.px2 - e.px1)) * (e.py2 - e.py1) AS vy
  FROM ext e CROSS JOIN sides s
  WHERE e.px2 - e.px1 != 0
    AND ((s.c - e.px1) / (e.px2 - e.px1)) >= 0
    AND ((s.c - e.px1) / (e.px2 - e.px1)) <= 1),
v3y AS (
  SELECT e.poly_id, e.z, e.x, e.y,
         e.px1 + ((s.c - e.py1) / (e.py2 - e.py1)) * (e.px2 - e.px1) AS vx,
         s.c AS vy
  FROM ext e CROSS JOIN sides s
  WHERE e.py2 - e.py1 != 0
    AND ((s.c - e.py1) / (e.py2 - e.py1)) >= 0
    AND ((s.c - e.py1) / (e.py2 - e.py1)) <= 1),
verts AS (
  SELECT * FROM v1
  UNION ALL SELECT * FROM v2
  UNION ALL SELECT * FROM v3x WHERE vy >= {LO} AND vy <= {HI}
  UNION ALL SELECT * FROM v3y WHERE vx >= {LO} AND vx <= {HI}),
cent AS (
  SELECT poly_id, z, x, y, AVG(vx) AS mx, AVG(vy) AS my, COUNT(*) AS n
  FROM verts GROUP BY 1, 2, 3, 4),
ordv AS (
  SELECT v.poly_id, v.z, v.x, v.y, c.n,
         CAST(trunc(v.vx) AS BIGINT) AS qx, CAST(trunc(v.vy) AS BIGINT) AS qy,
         ROW_NUMBER() OVER (PARTITION BY v.poly_id, v.z, v.x, v.y
                            ORDER BY atan2(v.vy - c.my, v.vx - c.mx)) AS rn
  FROM verts v JOIN cent c USING (poly_id, z, x, y)),
area AS (
  SELECT a.poly_id, a.z, a.x, a.y, SUM(a.qx * b.qy - b.qx * a.qy) AS area2
  FROM ordv a JOIN ordv b
    ON a.poly_id = b.poly_id AND a.z = b.z AND a.x = b.x AND a.y = b.y
   AND b.rn = (a.rn % a.n) + 1
  GROUP BY 1, 2, 3, 4),
surv AS (
  SELECT z, x, y, 'polygons' AS layer FROM area WHERE area2 != 0
  UNION ALL SELECT z, x, y, 'outlines' AS layer FROM outline)"""


def polygon_tiles_sql(sf_dir: str, z_min: int, z_max: int) -> str:
    """Oracle for mvt_polygon_tiles: per-tile total feature count."""
    return (
        f"WITH {survival_ctes(sf_dir, z_min, z_max)} "
        "SELECT z, x, y, COUNT(*) AS n_features FROM surv GROUP BY z, x, y"
    )


def polygon_verify_sql(sf_dir: str, z_min: int, z_max: int) -> str:
    """Oracle for mvt_polygon_verify: per-(tile, layer) DECODED counts."""
    return (
        f"WITH {survival_ctes(sf_dir, z_min, z_max)} "
        "SELECT z, x, y, layer, COUNT(*) AS n_features "
        "FROM surv GROUP BY z, x, y, layer"
    )


def polygon_coords_sql(sf_dir: str, z_min: int, z_max: int) -> str:
    """Coordinate-exact oracle for the polygon layer round-trip
    (mvt_polygon_coords): per surviving (tile, feature), the DISTINCT
    quantized exterior-ring vertex set's count/sum stats plus |area2| (the
    doubled shoelace the encoder's survival test evaluates). The decoded
    ring may carry consecutive duplicate pixels and an arbitrary start/
    winding, so the checked projection is order-free: the distinct vertex
    set and the absolute area are invariant under rotation, reversal, and
    consecutive duplication, while still pinning every decoded coordinate
    value (any wrong pixel changes the set stats)."""
    return f"""
WITH {survival_ctes(sf_dir, z_min, z_max)},
dverts AS (SELECT DISTINCT poly_id, z, x, y, qx, qy FROM ordv),
vstats AS (
  SELECT poly_id, z, x, y,
         COUNT(*) AS n_pts,
         CAST(SUM(qx) AS BIGINT) AS sum_qx, CAST(SUM(qy) AS BIGINT) AS sum_qy,
         MIN(qx) AS min_qx, MAX(qx) AS max_qx,
         MIN(qy) AS min_qy, MAX(qy) AS max_qy
  FROM dverts GROUP BY 1, 2, 3, 4)
SELECT a.z, a.x, a.y, CAST(a.poly_id AS BIGINT) AS feature_id,
       v.n_pts, v.sum_qx, v.sum_qy,
       v.min_qx, v.max_qx, v.min_qy, v.max_qy,
       CAST(abs(a.area2) AS BIGINT) AS area2_abs
FROM area a JOIN vstats v
  ON a.poly_id = v.poly_id AND a.z = v.z AND a.x = v.x AND a.y = v.y
WHERE a.area2 != 0"""


def outline_coords_sql(sf_dir: str, z_min: int, z_max: int) -> str:
    """Coordinate-exact oracle for the OUTLINES layer round-trip
    (mvt_outline_coords): per surviving (tile, feature), edge-multiset
    stats over the quantized Liang-Barsky segment clips.

    The decoded layer's edges (consecutive vertex pairs of its parts) are
    exactly the visible segments whose clipped endpoints quantize to
    DIFFERENT pixels — chaining joins segments at bitwise-shared junction
    vertices (one pixel after quantization) and the encoder drops
    consecutive duplicate pixels, so part structure never adds or removes
    an edge (see polytiler.decode_outline_coords). The aggregate therefore
    reuses lbt (the expression-for-expression LB mirror) extended with the
    quantized endpoints; sums/extrema/cross/length pin every coordinate
    pair order-free. Same ulp caveat as the module docstring; empirically
    green at every SF."""
    return f"""
WITH {survival_ctes(sf_dir, z_min, z_max)},
oseg AS (
  SELECT poly_id, z, x, y,
         CAST(trunc(ax) AS BIGINT) AS qax,
         CAST(trunc(ay) AS BIGINT) AS qay,
         CAST(trunc(bx) AS BIGINT) AS qbx,
         CAST(trunc(bly) AS BIGINT) AS qby
  FROM lbv)
SELECT z, x, y, CAST(poly_id AS BIGINT) AS feature_id,
       COUNT(*) AS n_edges,
       CAST(SUM(qax) AS BIGINT) AS sum_ax,
       CAST(SUM(qay) AS BIGINT) AS sum_ay,
       CAST(SUM(qbx) AS BIGINT) AS sum_bx,
       CAST(SUM(qby) AS BIGINT) AS sum_by,
       MIN(LEAST(qax, qbx)) AS min_px,
       MAX(GREATEST(qax, qbx)) AS max_px,
       MIN(LEAST(qay, qby)) AS min_py,
       MAX(GREATEST(qay, qby)) AS max_py,
       CAST(SUM(qax * qby - qbx * qay) AS BIGINT) AS cross_sum,
       CAST(SUM((qbx - qax) * (qbx - qax) + (qby - qay) * (qby - qay)) AS BIGINT) AS len2_sum
FROM oseg
WHERE qax != qbx OR qay != qby
GROUP BY 1, 2, 3, 4"""
