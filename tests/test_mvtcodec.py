"""Byte-level codec vectors derived from the reference tests (SURVEY.md §5.2
items 1-3).

Coordinate vectors reuse the reference's fixtures under its SimpleProject
affine projection x=lng-10, y=lat-10
(/root/reference/internal/geometry/geometry_test.go:168-177), with positions
written (lat, lng) like geojson.MakePosition.
"""

from __future__ import annotations

import numpy as np
import pytest

from engine import mvtcodec as mc
from engine.mvtcodec import pbwire


def project(latlng):
    """Reference SimpleProject (geometry_test.go:168-172), quantized."""
    arr = np.asarray(latlng, dtype=np.float64).reshape(-1, 2)
    xy = np.stack([arr[:, 1] - 10.0, arr[:, 0] - 10.0], axis=1)
    return mc.quantize(xy)


# ------------------------------------------------------------ zigzag ------

def test_zigzag_vectors():
    # parameter.go:39-45 semantics
    cases = [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
             (2**31 - 1, 2**32 - 2), (-(2**31 - 1), 2**32 - 3)]
    vals = np.array([c[0] for c in cases], dtype=np.int64)
    enc = mc.zigzag(vals)
    assert enc.tolist() == [c[1] for c in cases]
    assert mc.unzigzag(enc).tolist() == vals.tolist()


def test_parameter_bounds():
    # paremeter_test.go:11-37 — ±(2^31-1) ok, ±2^31 rejected
    mc.make_parameter(np.array([mc.PARAM_MAX, mc.PARAM_MIN]))
    with pytest.raises(ValueError, match="maximum"):
        mc.validate_parameter(np.array([2**31]))
    with pytest.raises(ValueError, match="minimum"):
        mc.validate_parameter(np.array([-(2**31)]))


# ------------------------------------------------------------ commands ----

def test_command_pack_unpack():
    # command_test.go:11-33 — pack/unpack incl. count limits
    assert int(mc.make_command(mc.MOVE_TO, 1)) == 9
    assert int(mc.make_command(mc.LINE_TO, 3)) == 26
    assert int(mc.make_command(mc.CLOSE_PATH, 1)) == 15
    w = mc.make_command(mc.MOVE_TO, mc.COUNT_MAX)
    assert int(mc.command_count(w)) == mc.COUNT_MAX
    assert int(mc.command_id(w)) == mc.MOVE_TO
    assert int(mc.command_count(mc.make_command(mc.LINE_TO, 0))) == 0
    with pytest.raises(ValueError, match="count exceeds maximum"):
        mc.make_command(mc.MOVE_TO, 2**29)
    with pytest.raises(ValueError, match="invalid command ID"):
        mc.make_command(3, 1)
    with pytest.raises(ValueError, match="invalid command ID"):
        mc.validate_command(np.array([3], dtype=np.uint32))


# ------------------------------------------------------------ geometry ----

def test_point_words():
    # geometry_test.go:29-38 fixture, frozen byte vector
    words = mc.encode_point(project([(12, 34)])[0])
    assert words.tolist() == [9, 48, 4]  # MoveTo(1), zz(24), zz(2)
    kind, coords = mc.decode(words, mc.GEOM_POINT)
    assert kind == "Point" and coords.tolist() == [24, 2]


def test_multipoint_words_absolute():
    # geometry_test.go:40-52 — reference quirk: NO delta for MultiPoint
    words = mc.encode_multipoint(project([(34, 12), (78, 56)]))
    assert words.tolist() == [17, 4, 48, 92, 136]
    kind, coords = mc.decode(words, mc.GEOM_POINT)
    assert kind == "MultiPoint" and coords.tolist() == [[2, 24], [46, 68]]


def test_linestring_words_delta():
    # geometry_test.go:54-67
    pts = project([(34, 12), (78, 56), (12, 90), (56, 34)])
    words = mc.encode_linestring(pts)
    assert words.tolist() == [9, 4, 48, 26, 88, 88, 68, 131, 111, 88]
    kind, coords = mc.decode(words, mc.GEOM_LINESTRING)
    assert kind == "LineString" and coords.tolist() == pts.tolist()
    with pytest.raises(ValueError, match="at least 2 points"):
        mc.encode_linestring(pts[:1])


def test_multilinestring_roundtrip():
    # geometry_test.go:69-89
    p1 = project([(12, 34), (56, 78), (90, 12)])
    p2 = project([(23, 45), (67, 89), (12, 34), (56, 78)])
    words = mc.encode_multilinestring([p1, p2])
    kind, parts = mc.decode(words, mc.GEOM_LINESTRING)
    assert kind == "MultiLineString"
    assert [p.tolist() for p in parts] == [p1.tolist(), p2.tolist()]


def test_polygon_with_hole_words_and_winding():
    # geometry_test.go:92-117 — the winding-rule regression anchor
    ext = project([(7, 7), (4, 8), (3, 4), (5, 2), (7, 3), (7, 7)])
    hole = project([(4, 4), (4, 6), (5, 7), (6, 4), (4, 4)])
    words = mc.encode_polygon([ext, hole])
    assert words.tolist() == [
        9, 5, 5, 34, 2, 5, 7, 1, 3, 4, 2, 4, 15,      # exterior (CW)
        9, 11, 11, 26, 4, 0, 2, 2, 5, 2, 15,           # hole (CCW)
    ]
    kind, polys = mc.decode(words, mc.GEOM_POLYGON)
    assert kind == "Polygon"
    assert len(polys) == 2  # exterior + hole attached to it
    assert polys[0].tolist() == ext.tolist()
    assert polys[1].tolist() == hole.tolist()
    # winding signs (unmarshal.go:138-146 semantics via shoelace)
    assert mc.signed_area(ext[:-1]) <= 0   # CW exterior
    assert mc.signed_area(hole[:-1]) >= 0  # CCW hole


def test_multipolygon_roundtrip_and_collapse():
    # geometry_test.go:119-155
    ext = project([(7, 7), (4, 8), (3, 4), (5, 2), (7, 3), (7, 7)])
    hole = project([(4, 4), (4, 6), (5, 7), (6, 4), (4, 4)])
    tri = project([(7, 7), (3, 4), (5, 2), (7, 7)])
    words = mc.encode_multipolygon([[ext, hole], [tri]])
    kind, polys = mc.decode(words, mc.GEOM_POLYGON)
    assert kind == "MultiPolygon" and len(polys) == 2
    assert [r.tolist() for r in polys[0]] == [ext.tolist(), hole.tolist()]
    assert [r.tolist() for r in polys[1]] == [tri.tolist()]
    # single-element MultiPolygon collapses to Polygon (unmarshal.go:149-152)
    kind2, _ = mc.decode(mc.encode_multipolygon([[tri]]), mc.GEOM_POLYGON)
    assert kind2 == "Polygon"


def test_polygon_validation():
    tri = project([(7, 7), (3, 4), (7, 7)])  # 3 pts incl closing -> too few
    with pytest.raises(ValueError, match="at least 4 points"):
        mc.encode_polygon([tri])
    with pytest.raises(ValueError, match="exterior ring"):
        mc.encode_polygon([])


def test_rawshape_passthrough():
    # marshal.go:40-42 / unmarshal.go:48-49
    words = mc.encode_point(project([(12, 34)])[0])
    wire_type, out = mc.encode("RawShape", words)
    assert wire_type == mc.GEOM_UNKNOWN and out.tolist() == words.tolist()
    kind, raw = mc.decode(words, mc.GEOM_UNKNOWN)
    assert kind == "RawShape" and raw.tolist() == words.tolist()


def test_hole_without_exterior_rejected():
    hole = project([(4, 4), (4, 6), (5, 7), (6, 4), (4, 4)])  # CCW
    words = mc.encode_polygon([hole])
    with pytest.raises(ValueError, match="missing exterior loop"):
        mc.decode(words, mc.GEOM_POLYGON)


# ------------------------------------------------------------ varint ------

def test_varint_array_matches_scalar():
    vals = np.array(
        [0, 1, 127, 128, 300, 2**14 - 1, 2**14, 2**21, 2**28, 2**35,
         2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    expected = b"".join(pbwire.varint(int(v)) for v in vals)
    assert pbwire.varint_array(vals) == expected
    r = pbwire.Reader(expected)
    assert [r.read_varint() for _ in vals] == [int(v) for v in vals]


# ------------------------------------------------------------ tile --------

def _point_feature(fid, latlng, tags):
    xy = project([latlng])[0]
    return {
        "id": fid,
        "geom_type": mc.GEOM_POINT,
        "geometry": mc.encode_point(xy),
        "tags": tags,
    }


def test_tile_roundtrip_two_layers():
    # marshal_test.go:13-41 / unmarshal_test.go:13-54 analog
    tile = {
        "layer2": {"extent": 8192, "features": [_point_feature(2, (56, 78), [])]},
        "layer1": {
            "extent": 4096,
            "features": [
                _point_feature(
                    1,
                    (12, 34),
                    [("key1", ("string", "value1")),
                     ("key2", ("int", -95)),
                     ("key1", ("string", "value2"))],
                ),
            ],
        },
    }
    data = mc.encode_tile(tile)
    out = mc.decode_tile(data)
    assert sorted(out) == ["layer1", "layer2"]
    assert out["layer1"]["extent"] == 4096 and out["layer2"]["extent"] == 8192
    assert out["layer1"]["version"] == 2
    f = out["layer1"]["features"][0]
    assert f["id"] == 1
    assert f["tags"] == [
        ("key1", ("string", "value1")),
        ("key2", ("int", -95)),
        ("key1", ("string", "value2")),
    ]
    kind, coords = mc.decode(f["geometry"], f["geom_type"])
    assert kind == "Point" and coords.tolist() == [24, 2]
    # deterministic bytes: encoding twice is identical
    assert mc.encode_tile(tile) == data


def test_tag_dictionary_first_seen_shared_key():
    # marshal_test.go:264-277 — shared key, two values -> tags (0,0),(0,1)
    tile = {
        "l": {
            "extent": 4096,
            "features": [
                {
                    "id": None,
                    "geom_type": mc.GEOM_POINT,
                    "geometry": mc.encode_point([0, 0]),
                    "tags": [("key1", ("string", "v1")), ("key1", ("string", "v2"))],
                }
            ],
        }
    }
    data = mc.encode_tile(tile)
    # inspect the raw layer: keys has exactly one entry, tag indices (0,0,0,1)
    r = pbwire.Reader(data)
    field, wt = r.read_tag()
    assert (field, wt) == (3, pbwire.WT_LEN)
    s, e = r.read_len()
    lr = pbwire.Reader(data, s, e)
    keys, tag_idx = [], None
    while not lr.at_end():
        f2, w2 = lr.read_tag()
        if f2 == 3 and w2 == pbwire.WT_LEN:
            keys.append(lr.read_bytes().decode())
        elif f2 == 2 and w2 == pbwire.WT_LEN:
            fs, fe = lr.read_len()
            fr = pbwire.Reader(data, fs, fe)
            while not fr.at_end():
                f3, w3 = fr.read_tag()
                if f3 == 2 and w3 == pbwire.WT_LEN:
                    tag_idx = fr.read_packed_uint32().tolist()
                else:
                    fr.skip(w3)
        else:
            lr.skip(w2)
    assert keys == ["key1"]
    assert tag_idx == [0, 0, 0, 1]


def test_value_variants_roundtrip():
    # unmarshal_test.go:56-184 — all arms incl. decode-only sint
    cases = [
        ("string", "hello"),
        ("float", np.float32(3.5).item()),
        ("double", -95.25),
        ("int", -(2**62)),
        ("uint", 2**63 - 1),
        ("sint", -12345),
        ("bool", True),
        ("bool", False),
    ]
    for vtype, val in cases:
        msg = mc.encode_value(vtype, val)
        out_t, out_v = mc.decode_value(msg, 0, len(msg))
        assert (out_t, out_v) == (vtype, val), (vtype, val, out_t, out_v)


def test_duplicate_feature_id_rejected():
    # marshal_test.go:65-81
    tile = {
        "l": {
            "extent": 4096,
            "features": [_point_feature(7, (12, 34), []),
                         _point_feature(7, (56, 78), [])],
        }
    }
    with pytest.raises(ValueError, match="already exists"):
        mc.encode_tile(tile)


def test_version_gate_and_bad_indices():
    # unmarshal.go:40-42 version gate: craft a layer with version=1
    layer = (
        pbwire.len_delimited(1, b"l")
        + pbwire.tag(15, pbwire.WT_VARINT)
        + pbwire.varint(1)
    )
    with pytest.raises(ValueError, match="unsupported version"):
        mc.decode_tile(pbwire.len_delimited(3, layer))

    # odd tag count / out-of-range indices (unmarshal.go:82-95)
    feat_odd = pbwire.packed_uint32(2, np.array([0], dtype=np.uint32))
    layer_odd = (
        pbwire.len_delimited(1, b"l")
        + pbwire.len_delimited(2, feat_odd)
        + pbwire.len_delimited(3, b"k")
        + pbwire.tag(15, pbwire.WT_VARINT)
        + pbwire.varint(2)
    )
    with pytest.raises(ValueError, match="even number of tags"):
        mc.decode_tile(pbwire.len_delimited(3, layer_odd))

    feat_oob = pbwire.packed_uint32(2, np.array([5, 0], dtype=np.uint32))
    layer_oob = (
        pbwire.len_delimited(1, b"l")
        + pbwire.len_delimited(2, feat_oob)
        + pbwire.tag(15, pbwire.WT_VARINT)
        + pbwire.varint(2)
    )
    with pytest.raises(ValueError, match="does not exist in layer"):
        mc.decode_tile(pbwire.len_delimited(3, layer_oob))


def test_duplicate_layer_name_rejected():
    # unmarshal.go:25-27
    layer = (
        pbwire.len_delimited(1, b"dup")
        + pbwire.tag(15, pbwire.WT_VARINT)
        + pbwire.varint(2)
    )
    data = pbwire.len_delimited(3, layer) * 2
    with pytest.raises(ValueError, match="already exists"):
        mc.decode_tile(data)
