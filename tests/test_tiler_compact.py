"""Compact (shuffle-lean) pyramid encode == standard path, byte for byte."""

from __future__ import annotations

from engine.pipeline import fixtures, index, tiler

from .conftest import SF_DIR


def test_compact_encode_byte_identical(spark):
    geo = index.with_feature_id(fixtures.geotag_df(fixtures.pages_df(spark, SF_DIR)))
    unit = index.with_unit(geo)
    std = tiler.encode_point_tiles(index.with_tiles(unit, 0, 4)).toPandas()
    cmp = tiler.encode_point_tiles_compact(unit, 0, 4).toPandas()
    want = {(r.z, r.x, r.y): r.mvt_sha256 for r in std.itertuples()}
    got = {(r.z, r.x, r.y): r.mvt_sha256 for r in cmp.itertuples()}
    assert got == want and len(got) > 100
