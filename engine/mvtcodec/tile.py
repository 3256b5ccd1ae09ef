"""Tile-level assembly: layers, features, tag dictionaries, values.

Re-expresses the reference's tile marshal/unmarshal:
- encode: /root/reference/marshal.go:16-171
- decode: /root/reference/unmarshal.go:16-138

Layer/feature model (engine-side, plain dicts + numpy):

    tile   = {layer_name: layer}
    layer  = {"extent": int, "features": [feature, ...]}
    feature= {"id": int | None,
              "geom_type": int,              # wire enum 0-3
              "geometry": np.uint32 array,   # command stream
              "tags": [(key, (vtype, value)), ...]}
    vtype in {"string","float","double","int","uint","sint","bool"}

Canonicalizations (SURVEY.md §7.6):
- layers are encoded sorted by name (the reference iterates a Go map —
  nondeterministic order, marshal.go:22);
- value dictionary dedup happens post-normalization (typed input), vs the
  reference's pre-normalization interface{} map (marshal.go:87-89);
- Feature.type is always emitted (see pbwire module docstring).

Per-layer dictionaries are first-seen ordered, exactly like the reference's
``keys[tag.Name] = len(keys)`` (marshal.go:83-89). The encoder never
produces the ``sint`` arm (marshal.go:113-161); the decoder accepts it
(unmarshal.go:124-125).
"""

from __future__ import annotations

import struct

import numpy as np

from . import pbwire
from .pbwire import Reader, WT_I32, WT_I64, WT_LEN, WT_VARINT

DEFAULT_EXTENT = 4096
VERSION = 2

_VTYPES = ("string", "float", "double", "int", "uint", "sint", "bool")
_VFIELD = {t: i + 1 for i, t in enumerate(_VTYPES)}  # proto:19-25


def encode_value(vtype: str, value) -> bytes:
    """Encode one Tile.Value message (reference marshal.go:113-161)."""
    f = _VFIELD[vtype]
    if vtype == "string":
        return pbwire.len_delimited(f, str(value).encode("utf-8"))
    if vtype == "float":
        return pbwire.tag(f, WT_I32) + struct.pack("<f", float(value))
    if vtype == "double":
        return pbwire.tag(f, WT_I64) + struct.pack("<d", float(value))
    if vtype == "int":
        return pbwire.tag(f, WT_VARINT) + pbwire.varint(int(value))
    if vtype == "uint":
        if value < 0:
            raise ValueError("uint value must be non-negative")
        return pbwire.tag(f, WT_VARINT) + pbwire.varint(int(value))
    if vtype == "sint":
        return pbwire.tag(f, WT_VARINT) + pbwire.varint(pbwire.zigzag64(int(value)))
    if vtype == "bool":
        return pbwire.tag(f, WT_VARINT) + pbwire.varint(1 if value else 0)
    raise ValueError(f"unsupported type '{vtype}'")


def decode_value(data: bytes, start: int, end: int):
    """Decode one Value; first-set-arm in declaration order like the
    reference (unmarshal.go:112-131)."""
    r = Reader(data, start, end)
    arms = {}
    while not r.at_end():
        field, wt = r.read_tag()
        if field == 1 and wt == WT_LEN:
            arms.setdefault(1, r.read_bytes().decode("utf-8"))
        elif field == 2 and wt == WT_I32:
            arms.setdefault(2, struct.unpack("<f", r.read_i32())[0])
        elif field == 3 and wt == WT_I64:
            arms.setdefault(3, struct.unpack("<d", r.read_i64())[0])
        elif field == 4 and wt == WT_VARINT:
            v = r.read_varint()
            arms.setdefault(4, v - (1 << 64) if v >= (1 << 63) else v)
        elif field == 5 and wt == WT_VARINT:
            arms.setdefault(5, r.read_varint())
        elif field == 6 and wt == WT_VARINT:
            arms.setdefault(6, pbwire.unzigzag64(r.read_varint()))
        elif field == 7 and wt == WT_VARINT:
            arms.setdefault(7, r.read_varint() != 0)
        else:
            r.skip(wt)
    for i, t in enumerate(_VTYPES, start=1):
        if i in arms:
            return (t, arms[i])
    raise ValueError("missing value")


def _encode_feature(feature, keys: dict, values: dict) -> bytes:
    """Encode one Feature, updating the per-layer first-seen dictionaries
    (reference marshalTags, marshal.go:80-94)."""
    parts = []
    fid = feature.get("id")
    if fid is not None:
        parts.append(pbwire.tag(1, WT_VARINT) + pbwire.varint(int(fid)))
    tags = feature.get("tags") or []
    if tags:
        idx = np.empty(2 * len(tags), dtype=np.uint64)
        for i, (key, typed_value) in enumerate(tags):
            if key not in keys:
                keys[key] = len(keys)
            if typed_value not in values:
                values[typed_value] = len(values)
            idx[2 * i] = keys[key]
            idx[2 * i + 1] = values[typed_value]
        parts.append(pbwire.packed_uint32(2, idx))
    parts.append(pbwire.tag(3, WT_VARINT) + pbwire.varint(int(feature["geom_type"])))
    geom = feature.get("geometry")
    if geom is not None and len(geom):
        parts.append(pbwire.packed_uint32(4, geom))
    return b"".join(parts)


def encode_layer(name: str, layer: dict) -> bytes:
    """Encode one Layer message (reference marshalLayer/marshalFeatures,
    marshal.go:35-111), incl. the duplicate-feature-ID guard."""
    keys: dict = {}
    values: dict = {}
    seen_ids: set = set()
    feature_msgs = []
    for feature in layer.get("features", ()):
        fid = feature.get("id")
        if fid is not None:
            if fid in seen_ids:
                raise ValueError(f"layer with ID '{fid}' already exists")
            seen_ids.add(fid)
        feature_msgs.append(_encode_feature(feature, keys, values))

    parts = [pbwire.len_delimited(1, name.encode("utf-8"))]
    parts.extend(pbwire.len_delimited(2, msg) for msg in feature_msgs)
    parts.extend(pbwire.len_delimited(3, k.encode("utf-8")) for k in keys)
    parts.extend(
        pbwire.len_delimited(4, encode_value(vt, v)) for (vt, v) in values
    )
    extent = int(layer.get("extent", DEFAULT_EXTENT))
    parts.append(pbwire.tag(5, WT_VARINT) + pbwire.varint(extent))
    parts.append(pbwire.tag(15, WT_VARINT) + pbwire.varint(VERSION))
    return b"".join(parts)


def encode_tile(layers: dict) -> bytes:
    """Encode a full tile; layers sorted by name for determinism."""
    return b"".join(
        pbwire.len_delimited(3, encode_layer(name, layers[name]))
        for name in sorted(layers)
    )


# ---------------------------------------------------------------- decode --


def _decode_feature(data: bytes, start: int, end: int) -> dict:
    r = Reader(data, start, end)
    feature = {"id": None, "geom_type": None, "geometry": None, "_tag_idx": None}
    while not r.at_end():
        field, wt = r.read_tag()
        if field == 1 and wt == WT_VARINT:
            feature["id"] = r.read_varint()
        elif field == 2 and wt == WT_LEN:
            feature["_tag_idx"] = r.read_packed_uint32()
        elif field == 3 and wt == WT_VARINT:
            feature["geom_type"] = r.read_varint()
        elif field == 4 and wt == WT_LEN:
            feature["geometry"] = r.read_packed_uint32()
        else:
            r.skip(wt)
    if feature["geometry"] is None:
        feature["geometry"] = np.empty(0, dtype=np.uint32)
    return feature


def decode_layer(data: bytes, start: int, end: int) -> tuple[str, dict]:
    """Decode one Layer with the reference's validations: version==2
    (unmarshal.go:40-42), even tag count (:82-84), dictionary index bounds
    (:91-95), duplicate feature IDs (:61-67)."""
    r = Reader(data, start, end)
    name = None
    version = 1  # proto2 default (proto:58)
    extent = DEFAULT_EXTENT
    keys: list[str] = []
    values: list = []
    raw_features: list[tuple[int, int]] = []
    while not r.at_end():
        field, wt = r.read_tag()
        if field == 1 and wt == WT_LEN:
            name = r.read_bytes().decode("utf-8")
        elif field == 2 and wt == WT_LEN:
            raw_features.append(r.read_len())
        elif field == 3 and wt == WT_LEN:
            keys.append(r.read_bytes().decode("utf-8"))
        elif field == 4 and wt == WT_LEN:
            s, e = r.read_len()
            values.append(decode_value(data, s, e))
        elif field == 5 and wt == WT_VARINT:
            extent = r.read_varint()
        elif field == 15 and wt == WT_VARINT:
            version = r.read_varint()
        else:
            r.skip(wt)
    if version != VERSION:
        raise ValueError(f"unsupported version '{version}'")

    features = []
    seen_ids: set = set()
    for s, e in raw_features:
        feature = _decode_feature(data, s, e)
        if feature["id"] is not None:
            if feature["id"] in seen_ids:
                raise ValueError(f"layer with ID '{feature['id']}' already exists")
            seen_ids.add(feature["id"])
        idx = feature.pop("_tag_idx")
        tags = []
        if idx is not None:
            if len(idx) % 2 != 0:
                raise ValueError("expecting even number of tags")
            for i in range(len(idx) // 2):
                ki, vi = int(idx[2 * i]), int(idx[2 * i + 1])
                if ki >= len(keys):
                    raise ValueError(f"tag key '{ki}' does not exist in layer")
                if vi >= len(values):
                    raise ValueError(f"tag value '{vi}' does not exist in layer")
                tags.append((keys[ki], values[vi]))
        feature["tags"] = tags
        if feature["geom_type"] is None:
            # reference unmarshal.go:133-138: a feature without a Type field
            # is rejected (after ID/tag validation, matching :54-79 order)
            raise ValueError("missing geometry type")
        features.append(feature)
    return name, {
        "extent": extent,
        "version": version,
        "keys": keys,
        "values": values,
        "features": features,
    }


def decode_tile(data: bytes) -> dict:
    """Decode a full tile with the duplicate-layer-name guard
    (reference unmarshal.go:25-27)."""
    r = Reader(data)
    layers: dict = {}
    while not r.at_end():
        field, wt = r.read_tag()
        if field == 3 and wt == WT_LEN:
            s, e = r.read_len()
            name, layer = decode_layer(data, s, e)
            if name in layers:
                raise ValueError(f"layer with name '{name}' already exists")
            layers[name] = layer
        else:
            r.skip(wt)
    return layers
