"""Multi-layer tile assembly from independently encoded partial tiles
(SURVEY B14: partial encode per (tile, salt/stream) -> final merge).

Legality: a protobuf message built by concatenating serialized occurrences
of a repeated submessage field equals the message holding all of them
(reference Tile.layers framing, internal/spec/vector_tile.proto:75;
layer model /root/reference/layer.go:14). Two merge levels:

- distinct layer names (e.g. the point stream's "pages" + the polygon
  stream's "polygons"/"outlines"): pure wire-level splice — each partial
  tile is split into its layer submessages, and the merged tile re-frames
  them sorted by name. No re-encode, no geometry work.
- same layer name split across salt groups (mega-tile skew, B14): the
  partial layers' features are cheaply re-framed — geometry command words
  pass through opaque; only the per-layer tag dictionary and feature
  framing are rebuilt over the canonical feature order (sorted by id) —
  so the merged layer is BYTE-IDENTICAL to a single-pass encode (the
  engine's canon: layers sorted by name, features by feature id;
  tests/test_tilemerge.py::test_salted_encode_byte_identical asserts
  salted == unsalted bytes).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from engine.mvtcodec import pbwire, tile as tilemod
from engine.mvtcodec.pbwire import WT_LEN

from .tiler import _group_bounds, carry_group_iter

MERGED_SCHEMA = (
    "z int, x bigint, y bigint, mvt binary, n_features long, n_bytes long, "
    "n_layers int"
)


def split_tile_layers(data: bytes) -> list[tuple[str, bytes]]:
    """Top-level wire scan: the tile's layer submessages with their names
    (no feature/geometry decoding)."""
    r = pbwire.Reader(data)
    out = []
    while not r.at_end():
        field, wt = r.read_tag()
        if field == 3 and wt == WT_LEN:
            s, e = r.read_len()
            rr = pbwire.Reader(data, s, e)
            name = None
            while not rr.at_end():
                f, w = rr.read_tag()
                if f == 1 and w == WT_LEN:
                    name = rr.read_bytes().decode("utf-8")
                    break
                rr.skip(w)
            out.append((name, data[s:e]))
        else:
            r.skip(wt)
    return out


def _merge_layer(name: str, msgs: list[bytes]) -> bytes:
    """Merge same-name partial layers: features re-framed in canonical
    (id) order; geometry words pass through untouched."""
    feats = []
    extent = None
    for msg in msgs:
        _, layer = tilemod.decode_layer(msg, 0, len(msg))
        if extent is None:
            extent = layer["extent"]
        elif layer["extent"] != extent:
            # partials quantized on different grids cannot be re-framed
            # onto one extent without re-quantizing geometry
            raise ValueError(
                f"layer '{name}': partials disagree on extent "
                f"({extent} vs {layer['extent']})"
            )
        feats.extend(layer["features"])
    feats.sort(key=lambda f: (f["id"] is None, f["id"]))
    return tilemod.encode_layer(name, {"extent": extent, "features": feats})


def merge_tile_blobs(blobs) -> bytes:
    """Merge partial tiles for ONE (z,x,y) into a single canonical tile."""
    parts: dict[str, list[bytes]] = {}
    for data in blobs:
        for name, msg in split_tile_layers(data):
            parts.setdefault(name, []).append(msg)
    return b"".join(
        pbwire.len_delimited(
            3, parts[n][0] if len(parts[n]) == 1 else _merge_layer(n, parts[n])
        )
        for n in sorted(parts)
    )


def merge_tiles(partials: DataFrame) -> DataFrame:
    """(z,x,y,mvt,n_features) partial-tile rows -> ONE multi-layer tile row
    per (z,x,y). One shuffle on the tile key; the merge itself is wire-level
    splicing (or feature re-framing for same-name salt partials)."""

    def merge_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = list(_group_bounds(pdf)) + [len(pdf)]
        out = {k: [] for k in ("z", "x", "y", "mvt", "n_features", "n_bytes", "n_layers")}
        for s, e in zip(starts[:-1], starts[1:]):
            blobs = [bytes(b) for b in pdf["mvt"].iloc[s:e]]
            data = merge_tile_blobs(blobs)
            out["z"].append(int(pdf["z"].iloc[s]))
            out["x"].append(int(pdf["x"].iloc[s]))
            out["y"].append(int(pdf["y"].iloc[s]))
            out["mvt"].append(data)
            out["n_features"].append(int(pdf["n_features"].iloc[s:e].sum()))
            out["n_bytes"].append(len(data))
            out["n_layers"].append(sum(1 for _ in split_tile_layers(data)))
        return pd.DataFrame(
            {
                "z": pd.array(out["z"], dtype="int32"),
                "x": pd.array(out["x"], dtype="int64"),
                "y": pd.array(out["y"], dtype="int64"),
                "mvt": out["mvt"],
                "n_features": pd.array(out["n_features"], dtype="int64"),
                "n_bytes": pd.array(out["n_bytes"], dtype="int64"),
                "n_layers": pd.array(out["n_layers"], dtype="int32"),
            }
        )

    parted = partials.select("z", "x", "y", "mvt", "n_features").repartition(
        "z", "x", "y"
    ).sortWithinPartitions("z", "x", "y")
    merged = parted.mapInPandas(
        lambda b: carry_group_iter(b, merge_batch), MERGED_SCHEMA
    )
    return merged.withColumn("mvt_sha256", F.sha2(F.col("mvt"), 256))
