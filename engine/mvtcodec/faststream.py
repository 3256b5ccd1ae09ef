"""Batched layer framing for arbitrary precomputed geometry streams.

fastpoints.py vectorizes the POINT layer end-to-end; this module frames a
stream of features whose geometry command words are ALREADY encoded (e.g.
the polygon/outline tilers' ragged scatter output, clipbatch) into per-tile
Layer messages with zero per-feature Python: every varint in the output —
feature ids, tag indices, geometry words, message lengths — is produced by
a handful of whole-array varint_array calls and stitched with the ragged
scatter-copy.

Specialization (asserted): one tag per feature, a single shared key, and
values unique per tile — the first-seen dictionary then equals the feature
order, so tag pairs are (0, local_idx). The generic first-seen path remains
tile.encode_layer; byte-equality between the two is asserted in
tests/test_faststream.py.

Wire layout matches tile.encode_layer exactly (reference marshal.go:35-111):
Feature{id=1 varint, tags=2 packed, type=3 varint, geometry=4 packed},
Layer{name=1, features=2, keys=3, values=4, extent=5, version=15}.
"""

from __future__ import annotations

import numpy as np

from . import pbwire
from .fastpoints import _ragged_copy
from .tile import VERSION, encode_value


def _scatter_bytes(dst: np.ndarray, dst_pos: np.ndarray, blob: bytes, lens: np.ndarray):
    """Copy the i-th varint (length lens[i]) of the concatenated ``blob``
    to dst[dst_pos[i]:...] for all i."""
    src = np.frombuffer(blob, dtype=np.uint8)
    ends = np.cumsum(lens)
    _ragged_copy(dst, dst_pos, src, ends - lens, lens)


def encode_tag1_layers(
    layer_name: str,
    extent: int,
    tile_ids: np.ndarray,
    fids: np.ndarray,
    geom_type: int,
    words: np.ndarray,
    woff: np.ndarray,
    tag_key: str,
    tag_values,
) -> dict[int, bytes]:
    """Frame one layer per distinct tile id -> {tile_id: layer_msg_bytes}.

    tile_ids: (F,) ascending ints; fids: (F,) feature ids; words/woff: flat
    uint32 command stream + per-feature offsets ((F+1,)); tag_values: (F,)
    strings, unique within each tile.
    """
    F = len(fids)
    if F == 0:
        return {}
    fids = np.asarray(fids, dtype=np.int64)
    tile_ids = np.asarray(tile_ids)
    t_starts = np.flatnonzero(
        np.concatenate([[True], tile_ids[1:] != tile_ids[:-1]])
    )
    t_bounds = np.append(t_starts, F)
    local = np.arange(F, dtype=np.int64) - np.repeat(t_starts, np.diff(t_bounds))

    # ---- geometry: one varint pass over every word of every feature
    geom_blob = np.frombuffer(pbwire.varint_array(words), dtype=np.uint8)
    wlens = pbwire.varint_array_lengths(words)
    bcum = np.concatenate([[0], np.cumsum(wlens)])
    g_start = bcum[np.asarray(woff[:-1], dtype=np.int64)]
    g_len = bcum[np.asarray(woff[1:], dtype=np.int64)] - g_start

    # ---- per-feature varint pieces
    fid_blob = pbwire.varint_array(fids)
    fid_len = pbwire.varint_array_lengths(fids)
    idx_blob = pbwire.varint_array(local)
    idx_len = pbwire.varint_array_lengths(local)
    glen_blob = pbwire.varint_array(g_len)
    glen_len = pbwire.varint_array_lengths(g_len)

    tags_payload_len = 1 + idx_len  # varint(0) + varint(local)
    # field sizes: id(1+fid) tags(1+1+payload) type(2) geometry(1+glen+g)
    msg_len = (
        (1 + fid_len)
        + (1 + 1 + tags_payload_len)
        + 2
        + (1 + glen_len + g_len)
    )
    mlen_blob = pbwire.varint_array(msg_len)
    mlen_len = pbwire.varint_array_lengths(msg_len)
    framed_len = 1 + mlen_len + msg_len  # tag(2,LEN) + varint(len) + msg

    total = int(framed_len.sum())
    out = np.empty(total, dtype=np.uint8)
    f_start = np.concatenate([[0], np.cumsum(framed_len)])[:-1]

    pos = f_start
    out[pos] = 0x12  # tag(2, LEN) at the layer level
    _scatter_bytes(out, pos + 1, mlen_blob, mlen_len)
    pos = pos + 1 + mlen_len
    out[pos] = 0x08  # tag(1, VARINT): feature id
    _scatter_bytes(out, pos + 1, fid_blob, fid_len)
    pos = pos + 1 + fid_len
    out[pos] = 0x12  # tag(2, LEN): packed tags
    _scatter_bytes(
        out, pos + 1, pbwire.varint_array(tags_payload_len),
        pbwire.varint_array_lengths(tags_payload_len),
    )
    pos = pos + 1 + pbwire.varint_array_lengths(tags_payload_len)
    out[pos] = 0x00  # key index 0 (single shared key)
    _scatter_bytes(out, pos + 1, idx_blob, idx_len)
    pos = pos + 1 + idx_len
    out[pos] = 0x18  # tag(3, VARINT): geom type
    out[pos + 1] = geom_type
    out[pos + 2] = 0x22  # tag(4, LEN): packed geometry
    _scatter_bytes(out, pos + 3, glen_blob, glen_len)
    pos = pos + 3 + glen_len
    _ragged_copy(out, pos, geom_blob, g_start, g_len)

    # ---- per-tile assembly
    feat_block = out.tobytes()
    name_field = pbwire.len_delimited(1, layer_name.encode("utf-8"))
    key_field = pbwire.len_delimited(3, tag_key.encode("utf-8"))
    tail = (
        pbwire.tag(5, pbwire.WT_VARINT)
        + pbwire.varint(int(extent))
        + pbwire.tag(15, pbwire.WT_VARINT)
        + pbwire.varint(VERSION)
    )
    vals = [
        pbwire.len_delimited(4, encode_value("string", v)) for v in tag_values
    ]
    fb_bounds = np.concatenate([[0], np.cumsum(framed_len)])
    layers: dict[int, bytes] = {}
    for ti in range(len(t_starts)):
        s, e = t_bounds[ti], t_bounds[ti + 1]
        assert len({*tag_values[s:e]}) == e - s, "tag values must be unique per tile"
        layers[int(tile_ids[t_starts[ti]])] = (
            name_field
            + feat_block[fb_bounds[s] : fb_bounds[e]]
            + key_field
            + b"".join(vals[s:e])
            + tail
        )
    return layers
