"""faststream batched framer == generic tile.encode_layer, byte for byte."""

from __future__ import annotations

import numpy as np

from engine.mvtcodec import faststream, geomstream, pbwire, tile as tilemod


def test_tag1_layers_match_generic_encoder():
    rng = np.random.default_rng(7)
    tile_ids, fids, values, woffs, all_words = [], [], [], [0], []
    per_tile_feats = {0: [], 1: [], 5: []}
    for ti in (0, 1, 5):
        for j in range(1 + ti):
            ring = rng.integers(0, 4096, size=(rng.integers(3, 9), 2))
            ring = np.vstack([ring, ring[:1]])
            words = geomstream.encode_polygon([ring])
            tile_ids.append(ti)
            fid = int(ti * 100 + j)
            fids.append(fid)
            values.append(f"region-{ti}-{j}")
            all_words.append(words)
            woffs.append(woffs[-1] + len(words))
            per_tile_feats[ti].append(
                {
                    "id": fid,
                    "geom_type": geomstream.GEOM_POLYGON,
                    "geometry": words,
                    "tags": [("name", ("string", f"region-{ti}-{j}"))],
                }
            )
    layers = faststream.encode_tag1_layers(
        "polygons",
        4096,
        np.asarray(tile_ids),
        np.asarray(fids, dtype=np.int64),
        geomstream.GEOM_POLYGON,
        np.concatenate(all_words),
        np.asarray(woffs, dtype=np.int64),
        "name",
        values,
    )
    assert set(layers) == {0, 1, 5}
    for ti, feats in per_tile_feats.items():
        want = tilemod.encode_layer("polygons", {"extent": 4096, "features": feats})
        assert layers[ti] == want, f"tile {ti}"
        # and the framed tile decodes with the engine's reader
        decoded = tilemod.decode_tile(pbwire.len_delimited(3, layers[ti]))
        assert len(decoded["polygons"]["features"]) == len(feats)
