"""Polygon / linestring tile layers: clip -> quantize -> MVT encode.

Extends the point tiler (tiler.py) to the reference's full geometry menu
(reference internal/geometry/marshal.go:15-38): each polygon is assigned to
every tile its bbox covers (JVM-side explode over the x/y ranges — no UDF),
then per tile the rings are projected to tile-pixel space, clipped to a
buffered tile rect (Sutherland-Hodgman for rings, Liang-Barsky for the
outline layer — engine.spatial.clip), quantized by int32 truncation
(reference internal/geometry/marshal.go:190), winding-checked (exterior CW /
holes CCW in y-down tile space, so the reference decoder's TurningAngle
classification reconstructs them — SURVEY §7.4 item 2), and encoded into a
two-layer tile ("polygons" + "outlines", names sorted by the codec).

Scale notes: the polygon table is the SMALL side (dims like admin regions:
10^4-10^6 rows); bbox coverage explodes it by the covered-tile count, which
grows 4x per zoom — callers bound z_max (mega-coverage guard) exactly like
real tile pipelines bound polygon zoom. The per-tile group is then a
broadcast-sized pandas batch; the feature stream never joins against it
here (that's the PIP join's job, engine.pipeline.joins).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from engine.mvtcodec import geomstream, tile as tilemod
from engine.spatial import clip as clipmod
from engine.spatial.mercator import lnglat_to_unit

from . import fixtures
from .tiler import EXTENT, TILE_SCHEMA

BUFFER = 128  # tile-pixel clip buffer around the 0..EXTENT square


def polygons_nested_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture polygons with nested rings + precomputed unit-square bbox.

    rings: array<array<array<double>>> — rings[r][i] = [lon, lat], closed.
    The bbox is computed driver-side in numpy (the fixture already lives on
    the driver); at real scale these columns come straight off the polygon
    table's parquet min/max or a prior select.
    """
    n_polys = fixtures.poly_count_for(sf_dir)
    bbox = {pid: (u0, v0, u1, v1) for pid, u0, v0, u1, v1 in fixtures.polygon_bbox_np(n_polys)}
    rows = []
    for poly in fixtures.polygons_np(n_polys):
        rings = [[[float(x), float(y)] for x, y in ring] for ring in poly["rings"]]
        u0, v0, u1, v1 = bbox[poly["poly_id"]]
        rows.append((poly["poly_id"], poly["name"], rings, u0, v0, u1, v1))
    return spark.createDataFrame(
        rows,
        "poly_id long, name string, rings array<array<array<double>>>, "
        "u0 double, v0 double, u1 double, v1 double",
    )


def with_covered_tiles(polys: DataFrame, z_min: int, z_max: int) -> DataFrame:
    """One row per (polygon, covered z/x/y) — pure built-in explode/sequence.

    Buffer margin: the clip rect extends BUFFER pixels outside the tile, so
    coverage widens the bbox by BUFFER/EXTENT of a tile on each side to keep
    buffered borders byte-identical regardless of which tile encodes them.
    """
    m = BUFFER / EXTENT
    df = polys.withColumn("z", F.explode(F.sequence(F.lit(z_min), F.lit(z_max))))
    n = "cast(shiftleft(1, z) as double)"
    lo = lambda c: f"greatest(cast(0 as bigint), cast(floor({c} * {n} - {m}) as bigint))"
    hi = (
        lambda c: f"least(cast(shiftleft(1, z) as bigint) - 1, "
        f"cast(floor({c} * {n} + {m}) as bigint))"
    )
    df = df.withColumn("x", F.explode(F.expr(f"sequence({lo('u0')}, {hi('u1')})")))
    df = df.withColumn("y", F.explode(F.expr(f"sequence({lo('v0')}, {hi('v1')})")))
    return df


def _rings_to_pixels(rings, z: int, x: int, y: int) -> list[np.ndarray]:
    """lon/lat rings -> float tile-pixel coords (y-down), open form."""
    scale = float(1 << z) * EXTENT
    out = []
    for ring in rings:
        arr = np.asarray([list(pt) for pt in ring], dtype=np.float64)
        u, v = lnglat_to_unit(arr[:, 0], arr[:, 1])
        out.append(np.stack([u * scale - x * EXTENT, v * scale - y * EXTENT], axis=1))
    return out


def _orient(ring: np.ndarray, clockwise: bool) -> np.ndarray | None:
    """Force the required y-down winding; drop degenerate rings (area 0 after
    quantization — SURVEY §7.6: zero-area rings are dropped by the clip
    stage, never emitted)."""
    q = geomstream.quantize(ring)
    if len(q) < 3:
        return None
    area = geomstream.signed_area(q)  # y-up shoelace on y-down coords
    if area == 0:
        return None
    # y-up CCW (area>0) == y-down CW
    if (area > 0) != clockwise:
        return q[::-1]
    return q


def _encode_poly_tile(pdf: pd.DataFrame) -> pd.DataFrame:
    z = int(pdf["z"].iloc[0])
    x = int(pdf["x"].iloc[0])
    y = int(pdf["y"].iloc[0])
    lo, hi = -float(BUFFER), float(EXTENT + BUFFER)
    poly_feats = []
    line_feats = []
    for row in pdf.sort_values("poly_id").itertuples():
        pix = _rings_to_pixels(row.rings, z, x, y)
        # polygons layer: Sutherland-Hodgman per ring, exterior first
        rings_q: list[np.ndarray] = []
        for i, ring in enumerate(pix):
            clipped = clipmod.clip_ring(ring, lo, lo, hi, hi)
            if i == 0 and len(clipped) < 3:
                rings_q = []
                break
            oriented = _orient(clipped, clockwise=(i == 0)) if len(clipped) >= 3 else None
            if i == 0 and oriented is None:
                rings_q = []
                break
            if oriented is not None:
                rings_q.append(np.vstack([oriented, oriented[:1]]))  # re-close
        if rings_q:
            words = geomstream.encode_polygon(rings_q)
            poly_feats.append(
                {
                    "id": int(row.poly_id),
                    "geom_type": geomstream.GEOM_POLYGON,
                    "geometry": words,
                    "tags": [("name", ("string", row.name))],
                }
            )
        # outlines layer: every ring boundary as clipped polylines
        parts = []
        for ring in pix:
            closed = np.vstack([ring, ring[:1]])
            for part in clipmod.clip_line(closed, lo, lo, hi, hi):
                q = geomstream.quantize(part)
                keep = np.ones(len(q), dtype=bool)
                keep[1:] = (np.diff(q, axis=0) != 0).any(axis=1)
                q = q[keep]
                if len(q) >= 2:
                    parts.append(q)
        if parts:
            line_feats.append(
                {
                    "id": int(row.poly_id),
                    "geom_type": geomstream.GEOM_LINESTRING,
                    "geometry": geomstream.encode_multilinestring(parts),
                    "tags": [("name", ("string", row.name))],
                }
            )
    layers = {}
    if poly_feats:
        layers["polygons"] = {"extent": EXTENT, "features": poly_feats}
    if line_feats:
        layers["outlines"] = {"extent": EXTENT, "features": line_feats}
    if not layers:
        return pd.DataFrame(
            {
                "z": pd.array([], dtype="int32"),
                "x": pd.array([], dtype="int64"),
                "y": pd.array([], dtype="int64"),
                "mvt": pd.array([], dtype=object),
                "n_features": pd.array([], dtype="int64"),
                "n_bytes": pd.array([], dtype="int64"),
                "mvt_sha256": pd.array([], dtype=object),
            }
        )
    data = tilemod.encode_tile(layers)
    return pd.DataFrame(
        {
            "z": pd.array([z], dtype="int32"),
            "x": [x],
            "y": [y],
            "mvt": [data],
            "n_features": [len(poly_feats) + len(line_feats)],
            "n_bytes": [len(data)],
            "mvt_sha256": [hashlib.sha256(data).hexdigest()],
        }
    )


def encode_polygon_tiles(
    spark: SparkSession, sf_dir: str, z_min: int = 0, z_max: int = 6
) -> DataFrame:
    """Full polygon/outline tile pyramid for the fixture polygon table."""
    covered = with_covered_tiles(polygons_nested_df(spark, sf_dir), z_min, z_max)
    return covered.groupBy("z", "x", "y").applyInPandas(_encode_poly_tile, TILE_SCHEMA)
