"""Pure numpy/Python MVT codec — no Spark imports.

Reimplements the semantics of /root/reference (everystreet/go-mvt) per
SURVEY.md §2.A: zigzag/command integer codecs, geometry command streams,
tag dictionaries, value variants, and a hand-rolled protobuf wire codec.
"""

from .zigzag import zigzag, unzigzag, make_parameter, validate_parameter, PARAM_MAX, PARAM_MIN
from .commands import (
    MOVE_TO,
    LINE_TO,
    CLOSE_PATH,
    COUNT_MAX,
    make_command,
    command_id,
    command_count,
    validate_command,
)
from .geomstream import (
    GEOM_UNKNOWN,
    GEOM_POINT,
    GEOM_LINESTRING,
    GEOM_POLYGON,
    quantize,
    encode,
    decode,
    encode_point,
    encode_multipoint,
    encode_linestring,
    encode_multilinestring,
    encode_polygon,
    encode_multipolygon,
    signed_area,
    encode_geo,
    decode_geo,
    rawshape_to_json,
    rawshape_from_json,
)
from .tile import encode_tile, decode_tile, encode_layer, encode_value, decode_value, DEFAULT_EXTENT, VERSION
from . import pbwire

__all__ = [name for name in dir() if not name.startswith("_")]
