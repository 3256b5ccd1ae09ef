"""Geometry command-stream codec (the tile-internal geometry IR).

Re-expresses the reference encoders/decoders in vectorized numpy:

- encode: /root/reference/internal/geometry/marshal.go:15-203
- decode: /root/reference/internal/geometry/unmarshal.go:46-282

Layouts (reference-faithful, see SURVEY.md §1.4):
- Point:           MoveTo(1), x, y
- MultiPoint:      MoveTo(n), x1,y1,...,xn,yn  (ABSOLUTE coords — the
                   reference does not delta-encode MultiPoint, a documented
                   deviation from MVT 2.1; marshal.go:57-68,173-185)
- LineString:      MoveTo(1), x0,y0, LineTo(n-1), dx,dy...  (deltas)
- MultiLineString: concatenated LineString encodings
- Polygon:         per ring: closing vertex dropped, LineString encoding,
                   then ClosePath(1)  (marshal.go:131-159)
- MultiPolygon:    concatenated Polygon encodings
- RawShape:        identity []uint32 passthrough (marshal.go:40-42)

Coordinates here are already-quantized integers; ``quantize`` reproduces
Go's ``int32(float64)`` truncation-toward-zero (marshal.go:190,196).

Decode collapses single-element Multi* to the scalar type exactly like the
reference (unmarshal.go:74-90,104-107,149-152), so round-trips are lossy for
single-element Multi* — callers compare canonicalized forms.
"""

from __future__ import annotations

import numpy as np

from .commands import (
    CLOSE_PATH,
    LINE_TO,
    MOVE_TO,
    command_count,
    command_id,
    make_command,
    validate_command,
)
from .zigzag import make_parameter, unzigzag, validate_parameter

# Wire geometry types (/root/reference/internal/spec/vector_tile.proto:8-13)
GEOM_UNKNOWN = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


def quantize(coords: np.ndarray) -> np.ndarray:
    """float64 -> int64 truncation toward zero, matching Go's int32() cast
    (reference marshal.go:190,196). Range validation happens at encode."""
    return np.trunc(np.asarray(coords, dtype=np.float64)).astype(np.int64)


def _encode_pairs(xy: np.ndarray) -> np.ndarray:
    """Interleave zigzag(x),zigzag(y) for an (n,2) int array."""
    xy = np.asarray(xy, dtype=np.int64).reshape(-1, 2)
    return make_parameter(xy).reshape(-1)


def encode_point(xy) -> np.ndarray:
    """Point: MoveTo(1), x, y (reference marshal.go:44-55)."""
    words = np.empty(3, dtype=np.uint32)
    words[0] = make_command(MOVE_TO, 1)
    words[1:] = _encode_pairs(np.asarray(xy).reshape(1, 2))
    return words


def encode_multipoint(xys) -> np.ndarray:
    """MultiPoint: MoveTo(n), absolute coords (reference marshal.go:57-68)."""
    xys = np.asarray(xys, dtype=np.int64).reshape(-1, 2)
    words = np.empty(1 + 2 * len(xys), dtype=np.uint32)
    words[0] = make_command(MOVE_TO, len(xys))
    words[1:] = _encode_pairs(xys)
    return words


def encode_linestring(xys) -> np.ndarray:
    """LineString: MoveTo(1), x0,y0, LineTo(n-1), deltas
    (reference marshal.go:70-117). Deltas via np.diff."""
    xys = np.asarray(xys, dtype=np.int64).reshape(-1, 2)
    n = len(xys)
    if n < 2:
        raise ValueError("linestring must consist of at least 2 points")
    words = np.empty(2 * n + 2, dtype=np.uint32)
    words[0] = make_command(MOVE_TO, 1)
    words[1:3] = _encode_pairs(xys[:1])
    words[3] = make_command(LINE_TO, n - 1)
    words[4:] = _encode_pairs(np.diff(xys, axis=0))
    return words


def encode_multilinestring(parts) -> np.ndarray:
    """Concatenation of LineString encodings (reference marshal.go:119-129)."""
    return np.concatenate([encode_linestring(p) for p in parts])


def encode_polygon(rings_closed) -> np.ndarray:
    """Polygon from GeoJSON-closed rings (first point repeated last).

    Per ring: require >=4 points, drop the closing vertex, encode as a
    LineString, then append ClosePath(1) (reference marshal.go:131-159).
    """
    if len(rings_closed) < 1:
        raise ValueError("polygon must consist of at least an exterior ring")
    close_word = np.asarray([make_command(CLOSE_PATH, 1)], dtype=np.uint32)
    out = []
    for i, ring in enumerate(rings_closed):
        ring = np.asarray(ring, dtype=np.int64).reshape(-1, 2)
        if len(ring) < 4:
            raise ValueError(
                f"loop '{i}' must consist of at least 4 points (excluding the last)"
            )
        out.append(encode_linestring(ring[:-1]))
        out.append(close_word)
    return np.concatenate(out)


def encode_multipolygon(polys) -> np.ndarray:
    """Concatenation of Polygon encodings (reference marshal.go:161-171)."""
    return np.concatenate([encode_polygon(p) for p in polys])


def encode(kind: str, parts) -> tuple[int, np.ndarray]:
    """Dispatch like reference geometry.Marshal (marshal.go:15-38).

    Returns (wire_geom_type, words).
    """
    if kind == "Point":
        return GEOM_POINT, encode_point(parts)
    if kind == "MultiPoint":
        return GEOM_POINT, encode_multipoint(parts)
    if kind == "LineString":
        return GEOM_LINESTRING, encode_linestring(parts)
    if kind == "MultiLineString":
        return GEOM_LINESTRING, encode_multilinestring(parts)
    if kind == "Polygon":
        return GEOM_POLYGON, encode_polygon(parts)
    if kind == "MultiPolygon":
        return GEOM_POLYGON, encode_multipolygon(parts)
    if kind == "RawShape":
        return GEOM_UNKNOWN, np.asarray(parts, dtype=np.uint32)
    raise ValueError(f"unknown type '{kind}'")


# ---------------------------------------------------------------- decode --


def _decode_linestring(words: np.ndarray, pos: int) -> tuple[np.ndarray, int]:
    """Decode one MoveTo(1)+LineTo(n) run starting at ``pos``; cumsum the
    deltas back to absolute coords (reference unmarshal.go:155-216)."""
    n = len(words)
    if n - pos < 4:
        raise ValueError(f"data len must be >= 4, have {n - pos}")
    w0 = words[pos]
    validate_command(w0)
    if command_id(w0) != MOVE_TO:
        raise ValueError("expecting 'MoveTo' command")
    if command_count(w0) != 1:
        raise ValueError(f"expecting command count of 1, received '{command_count(w0)}'")
    w3 = words[pos + 3]
    validate_command(w3)
    if command_id(w3) != LINE_TO:
        raise ValueError("expecting 'LineTo' command")
    cnt = int(command_count(w3))
    if cnt < 1:
        raise ValueError(f"expecting command count >= 1, received '{cnt}'")
    end = pos + 4 + 2 * cnt
    if n < end:
        raise ValueError(f"data len must be >= {end - pos}, have {n - pos}")
    params = np.concatenate([words[pos + 1 : pos + 3], words[pos + 4 : end]])
    deltas = unzigzag(params).astype(np.int64).reshape(-1, 2)
    validate_parameter(deltas)
    return np.cumsum(deltas, axis=0), end


def decode_points(words: np.ndarray):
    """Reference unmarshalPoints (unmarshal.go:61-91)."""
    n = len(words)
    if n == 0:
        raise ValueError("data len must be >= 1")
    validate_command(words[0])
    if command_id(words[0]) != MOVE_TO:
        raise ValueError("expecting MoveTo command")
    count = int(command_count(words[0]))
    coords = unzigzag(words[1:]).astype(np.int64).reshape(-1, 2)
    if count == 1 and n == 3:
        return ("Point", coords[0])
    if count > 1 and n == 1 + count * 2:
        return ("MultiPoint", coords)
    raise ValueError(
        f"MoveTo must be followed by at least one pair of ParameterIntegers: {count}, {n}"
    )


def decode_linestrings(words: np.ndarray):
    """Reference unmarshalLinestrings (unmarshal.go:93-108)."""
    parts, pos = [], 0
    while pos < len(words):
        part, pos = _decode_linestring(words, pos)
        parts.append(part)
    if len(parts) == 1:
        return ("LineString", parts[0])
    return ("MultiLineString", parts)


def signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of an open ring in (x east, y north) coords.

    Positive = CCW. Stands in for the reference's S2 TurningAngle sign
    (unmarshal.go:138-146): TurningAngle <= 0 (CW) starts a new exterior
    ring; >= 0 (CCW) is a hole of the current polygon. The reference
    classifies after unprojection; callers must hand this function coords in
    an orientation-preserving frame relative to lat/lng (see tile decode).
    """
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def decode_polygons(words: np.ndarray, flip_y: bool = False, unproject=None):
    """Reference unmarshalPolygons (unmarshal.go:110-153).

    The reference classifies winding AFTER unprojection (LoopToS2 on the
    unprojected loop, unmarshal.go:131-146); pass ``unproject`` to do the
    same here (loops are returned in unprojected coords). Without it the
    classification runs on the integer tile coords; ``flip_y=True`` when the
    unprojection reverses orientation (e.g. WebMercator pixel space, y-down)
    so the winding test negates.
    """
    polys, pos = [], 0
    sign = -1.0 if flip_y else 1.0
    while pos < len(words):
        loop, pos = _decode_linestring(words, pos)
        if pos > len(words) - 1:
            raise ValueError("unexpected end")
        validate_command(words[pos])
        if command_id(words[pos]) != CLOSE_PATH:
            raise ValueError("expecting 'ClosePath' command")
        pos += 1
        if unproject is not None:
            loop = np.asarray(unproject(loop.astype(np.float64)), dtype=np.float64)
        closed = np.vstack([loop, loop[:1]])  # GeoJSON loops explicitly closed
        if sign * signed_area(loop) <= 0:  # CW exterior (TurningAngle <= 0)
            polys.append([closed])
        else:  # CCW interior
            if not polys:
                raise ValueError(f"missing exterior loop ({len(closed)})")
            polys[-1].append(closed)
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def decode(words, wire_type: int, flip_y: bool = False):
    """Dispatch like reference unmarshal (unmarshal.go:46-59)."""
    words = np.asarray(words, dtype=np.uint32)
    if wire_type == GEOM_UNKNOWN:
        return ("RawShape", words)
    if wire_type == GEOM_POINT:
        return decode_points(words)
    if wire_type == GEOM_LINESTRING:
        return decode_linestrings(words)
    if wire_type == GEOM_POLYGON:
        return decode_polygons(words, flip_y=flip_y)
    raise ValueError(f"unknown geometry type '{wire_type}'")


# ------------------------------------------- pluggable projection (CRS) ---
# The reference codec never hardcodes a CRS: every vertex goes through a
# caller-supplied Project func(s2.LatLng) r2.Point on encode
# (marshal.go:12-13, applied at marshalPositions :173-185) and the inverse
# Unproject on decode (unmarshal.go:14). These twins take/return (n,2)
# float64 arrays so the hook stays vectorized.


def encode_geo(kind: str, parts, project) -> tuple[int, np.ndarray]:
    """Encode geometry given in user (unprojected) coordinates with a
    pluggable per-vertex projection, like reference geometry.Marshal with an
    injected Project (geometry_test.go:168-172 uses an affine one).

    ``project``: callable (n,2) user coords -> (n,2) projected float coords;
    the result is int32-truncated (quantize) exactly like marshal.go:187-203.
    """

    def P(a):
        out = np.asarray(project(np.asarray(a, dtype=np.float64).reshape(-1, 2)))
        return quantize(out)

    if kind == "Point":
        return GEOM_POINT, encode_point(P(parts))
    if kind == "MultiPoint":
        return GEOM_POINT, encode_multipoint(P(parts))
    if kind == "LineString":
        return GEOM_LINESTRING, encode_linestring(P(parts))
    if kind == "MultiLineString":
        return GEOM_LINESTRING, encode_multilinestring([P(p) for p in parts])
    if kind == "Polygon":
        return GEOM_POLYGON, encode_polygon([P(r) for r in parts])
    if kind == "MultiPolygon":
        return GEOM_POLYGON, encode_multipolygon(
            [[P(r) for r in poly] for poly in parts]
        )
    if kind == "RawShape":
        return GEOM_UNKNOWN, np.asarray(parts, dtype=np.uint32)
    raise ValueError(f"unknown type '{kind}'")


def decode_geo(words, wire_type: int, unproject):
    """Decode with a pluggable unprojection (reference Unproject,
    unmarshal.go:14): coordinates come back in user space, and polygon
    winding is classified AFTER unprojection like the reference."""
    words = np.asarray(words, dtype=np.uint32)

    def U(a):
        return np.asarray(
            unproject(np.asarray(a, dtype=np.float64).reshape(-1, 2)),
            dtype=np.float64,
        )

    if wire_type == GEOM_UNKNOWN:
        return ("RawShape", words)
    if wire_type == GEOM_POINT:
        kind, pts = decode_points(words)
        if kind == "Point":
            return (kind, U(pts.reshape(1, 2))[0])
        return (kind, U(pts))
    if wire_type == GEOM_LINESTRING:
        kind, parts = decode_linestrings(words)
        if kind == "LineString":
            return (kind, U(parts))
        return (kind, [U(p) for p in parts])
    if wire_type == GEOM_POLYGON:
        return decode_polygons(words, unproject=U)
    raise ValueError(f"unknown geometry type '{wire_type}'")


def rawshape_to_json(words) -> str:
    """RawShape JSON codec, encode side (reference internal/geometry/
    raw.go:13-16: json.Marshal of the []uint32 word array)."""
    import json

    return json.dumps(
        [int(w) for w in np.asarray(words, dtype=np.uint32)], separators=(",", ":")
    )


def rawshape_from_json(s: str) -> np.ndarray:
    """RawShape JSON codec, decode side (reference raw.go:18-21), with the
    uint32 range check Go's json decoder applies to []uint32."""
    import json

    arr = json.loads(s)
    if not isinstance(arr, list):
        raise ValueError("RawShape JSON must be an array")
    out = np.asarray(arr, dtype=np.int64)
    if len(out) and ((out < 0).any() or (out > 0xFFFFFFFF).any()):
        raise ValueError("RawShape word out of uint32 range")
    return out.astype(np.uint32)
