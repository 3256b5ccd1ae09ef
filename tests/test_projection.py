"""Pluggable-projection round trips — the reference's injected-Project
test suite re-derived (geometry_test.go:14-166 with SimpleProject/
SimpleUnproject :168-177), plus the RawShape JSON codec (raw.go:13-30) and
the missing-geometry-type decode gate (unmarshal.go:133-138).

User coordinates below are (x=lng, y=lat); the reference's positions are
geojson.MakePosition(lat, lng), so each MakePosition(a, b) appears here as
(b, a). SimpleProject is x=lng-10, y=lat-10 (affine, orientation-preserving:
no flip_y needed — winding classifies after unprojection, like the
reference's LoopToS2 TurningAngle)."""

from __future__ import annotations

import numpy as np
import pytest

from engine import mvtcodec as mc
from engine.mvtcodec import pbwire
from engine.mvtcodec.tile import decode_tile


def simple_project(a):  # geometry_test.go:168-172
    return np.asarray(a, dtype=np.float64) - 10.0


def simple_unproject(a):  # geometry_test.go:174-177
    return np.asarray(a, dtype=np.float64) + 10.0


def roundtrip(kind, parts):
    gt, words = mc.encode_geo(kind, parts, simple_project)
    return gt, mc.decode_geo(words, gt, simple_unproject)


def test_point_roundtrip():  # geometry_test.go:29-38
    gt, (kind, pt) = roundtrip("Point", [(34.0, 12.0)])
    assert gt == mc.GEOM_POINT and kind == "Point"
    assert tuple(pt) == (34.0, 12.0)


def test_multipoint_roundtrip():  # geometry_test.go:40-52
    pts = [(12.0, 34.0), (56.0, 78.0)]
    gt, (kind, out) = roundtrip("MultiPoint", pts)
    assert kind == "MultiPoint"
    np.testing.assert_array_equal(out, pts)


def test_linestring_roundtrip():  # geometry_test.go:54-66
    pts = [(12.0, 34.0), (56.0, 78.0), (90.0, 12.0), (34.0, 56.0)]
    gt, (kind, out) = roundtrip("LineString", pts)
    assert kind == "LineString"
    np.testing.assert_array_equal(out, pts)


def test_multilinestring_roundtrip():  # geometry_test.go:68-90
    parts = [
        [(34.0, 12.0), (78.0, 56.0), (12.0, 90.0)],
        [(45.0, 23.0), (89.0, 67.0), (34.0, 12.0), (78.0, 56.0)],
    ]
    gt, (kind, out) = roundtrip("MultiLineString", parts)
    assert kind == "MultiLineString"
    assert len(out) == 2
    for got, want in zip(out, parts):
        np.testing.assert_array_equal(got, want)


EXTERIOR = [(7.0, 7.0), (8.0, 4.0), (4.0, 3.0), (2.0, 5.0), (3.0, 7.0), (7.0, 7.0)]
HOLE = [(4.0, 4.0), (6.0, 4.0), (7.0, 5.0), (4.0, 6.0), (4.0, 4.0)]


def test_polygon_with_hole_roundtrip():  # geometry_test.go:92-117
    gt, (kind, rings) = roundtrip("Polygon", [EXTERIOR, HOLE])
    assert kind == "Polygon"
    assert len(rings) == 2  # winding classified the hole as interior
    np.testing.assert_array_equal(rings[0], EXTERIOR)
    np.testing.assert_array_equal(rings[1], HOLE)


def test_multipolygon_roundtrip():  # geometry_test.go:119-156
    poly2 = [[(7.0, 7.0), (4.0, 3.0), (2.0, 5.0), (7.0, 7.0)]]
    gt, (kind, polys) = roundtrip("MultiPolygon", [[EXTERIOR, HOLE], poly2])
    assert kind == "MultiPolygon"
    assert [len(p) for p in polys] == [2, 1]
    np.testing.assert_array_equal(polys[0][0], EXTERIOR)
    np.testing.assert_array_equal(polys[0][1], HOLE)
    np.testing.assert_array_equal(polys[1][0], poly2[0])


def test_rawshape_roundtrip():  # geometry_test.go:14-27
    gt, words = mc.encode_geo("Point", [(34.0, 12.0)], simple_project)
    kind, raw = mc.decode_geo(words, mc.GEOM_UNKNOWN, simple_unproject)
    assert kind == "RawShape"
    np.testing.assert_array_equal(raw, words)
    gt2, words2 = mc.encode_geo("RawShape", raw, simple_project)
    assert gt2 == mc.GEOM_UNKNOWN
    np.testing.assert_array_equal(words2, words)


def test_rawshape_json_codec():  # raw.go:13-21
    words = np.asarray([9, 2, 2], dtype=np.uint32)
    s = mc.rawshape_to_json(words)
    assert s == "[9,2,2]"  # Go json.Marshal([]uint32) form
    np.testing.assert_array_equal(mc.rawshape_from_json(s), words)
    assert mc.rawshape_to_json([]) == "[]"
    assert len(mc.rawshape_from_json("[]")) == 0
    with pytest.raises(ValueError):
        mc.rawshape_from_json("[4294967296]")  # > uint32, Go json rejects
    with pytest.raises(ValueError):
        mc.rawshape_from_json("[-1]")
    with pytest.raises(ValueError):
        mc.rawshape_from_json('{"a":1}')


def test_missing_geom_type_rejected():  # unmarshal.go:133-138
    # hand-build a layer whose feature omits field 3 (type)
    feature = pbwire.tag(1, pbwire.WT_VARINT) + pbwire.varint(7)
    layer = b"".join(
        [
            pbwire.len_delimited(1, b"bad"),
            pbwire.len_delimited(2, feature),
            pbwire.tag(5, pbwire.WT_VARINT) + pbwire.varint(4096),
            pbwire.tag(15, pbwire.WT_VARINT) + pbwire.varint(2),
        ]
    )
    data = pbwire.len_delimited(3, layer)
    with pytest.raises(ValueError, match="missing geometry type"):
        decode_tile(data)
