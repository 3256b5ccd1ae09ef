"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pages table carries ``html: binary`` — the stand-in for image/audio/
video payloads at 100 TB. This module makes the Spark-side plumbing real
(binary columns through Arrow batches, mapInPandas schema/batch shape,
deterministic partitioning) while the actual media decode is STUBBED with a
deterministic fake (this container has no image/audio libraries):

- decode_media_df: mapInPandas over (url, html) -> typed metadata struct
  (media_type, width, height, n_frames, payload_sha). The fake "decode"
  derives everything from payload bytes/lengths with vectorized pandas ops
  (no per-row Python), and is closed-form enough to have an exact SQL
  oracle (media_metadata_sql).
- frame_sample_df: mapInPandas -> one row per sampled frame with a binary
  frame payload (deterministic byte slices). Exercises array-of-binary
  fan-out shapes.
- real_decode(): NotImplementedError — the marked extension point where
  PIL/ffmpeg decoding would slot in on a real cluster.
"""

from __future__ import annotations

import pandas as pd

import numpy as np

MEDIA_SCHEMA = (
    "url string, media_type string, width int, height int, n_frames int, "
    "payload_bytes bigint"
)


def real_decode(payload: bytes) -> dict:
    """Extension point for actual media decoding (PIL / libav). Not
    available in this environment by design."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; the pipeline uses the deterministic fake below"
    )


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized deterministic fake decode: metadata from payload length
    and the payload's leading bytes. Stands in for a real decoder while
    keeping schema, batching, and downstream joins real."""
    n_bytes = pdf["html"].map(len).astype("int64").to_numpy()  # C-level len
    kinds = np.array(["image", "audio", "video"])
    return pd.DataFrame(
        {
            "url": pdf["url"].to_numpy(),
            "media_type": kinds[n_bytes % 3],
            "width": (16 + (n_bytes * 7) % 1904).astype("int32"),
            "height": (16 + (n_bytes * 13) % 1064).astype("int32"),
            "n_frames": (1 + n_bytes % 5).astype("int32"),
            "payload_bytes": n_bytes,
        }
    )


def decode_media_df(pages):
    """pages(url, html binary, ...) -> typed media metadata (stub decode)."""

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield _fake_decode(pdf)

    return pages.select("url", "html").mapInPandas(run, MEDIA_SCHEMA)


def media_metadata_sql(pages_cte: str) -> str:
    """Exact DuckDB twin of the fake decode. The pages CTE carries text, not
    html; html = '<html><body>' || text || '</body></html>' so payload bytes
    = octet_length(text) + 26 — matches Spark's length(html: binary)."""
    return f"""
WITH {pages_cte},
m AS (SELECT url, CAST(strlen(text) + 26 AS BIGINT) AS n_bytes FROM pages)
SELECT url,
       CASE n_bytes % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(16 + (n_bytes * 7) % 1904 AS INT) AS width,
       CAST(16 + (n_bytes * 13) % 1064 AS INT) AS height,
       CAST(1 + n_bytes % 5 AS INT) AS n_frames,
       n_bytes AS payload_bytes
FROM m"""


def frame_sample_df(pages, frame_len: int = 16):
    """One row per sampled frame: (url, frame_idx, frame binary). The frame
    payload is a deterministic byte slice — the plumbing (binary fan-out
    through Arrow, per-frame rows) is what a real frame sampler needs."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {"url": [], "frame_idx": [], "frame": []}
            metas = _fake_decode(pdf)
            for url, payload, nf in zip(
                pdf["url"], pdf["html"], metas["n_frames"]
            ):
                step = max(1, (len(payload) - frame_len) // max(nf, 1))
                for i in range(nf):
                    rows["url"].append(url)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(payload[i * step : i * step + frame_len]))
            yield pd.DataFrame(rows)

    return pages.select("url", "html").mapInPandas(
        run, "url string, frame_idx int, frame binary"
    )
