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
    """One row per sampled frame: (url, frame_idx, frame binary).

    Pure JVM plan: n_frames and the frame byte offsets are closed-form over
    length(html) (the deterministic fake decode), so the fan-out is an
    explode over a sequence and the slice is a codegen'd substring on the
    binary column — no Python anywhere, bounded 5x row blowup, scale-safe.
    A real media sampler would replace the substring with a mapInPandas
    decode (see real_decode) while keeping this exact fan-out shape:
    compute offsets vectorized, then slice per frame row.
    """
    nf = "(1 + pmod(length(html), 5))"
    step = f"greatest(1, cast((length(html) - {frame_len}) div {nf} as bigint))"
    return (
        pages.selectExpr("url", "html", f"{nf} as n_frames", f"{step} as step")
        .selectExpr(
            "url",
            "html",
            "step",
            "explode(sequence(0, n_frames - 1)) as frame_idx",
        )
        .selectExpr(
            "url",
            "frame_idx",
            f"substring(html, cast(frame_idx * step + 1 as int), {frame_len}) as frame",
        )
    )


def frame_sample_sql(pages_cte: str, frame_len: int = 16) -> str:
    """Exact DuckDB twin of the frame fan-out, projected to hash-checkable
    columns (url, frame_idx, frame_sha, frame_bytes). The oracle slices the
    reconstructed html VARCHAR (DuckDB's sha256/substring take VARCHAR);
    this equals Spark's byte slicing because the fixture corpus is ASCII
    (verified over all SFs) so byte offsets == char offsets."""
    return f"""
WITH {pages_cte},
m AS (SELECT url, '<html><body>' || text || '</body></html>' AS payload,
             CAST(strlen(text) + 26 AS BIGINT) AS n_bytes FROM pages),
f AS (SELECT url, payload, (1 + n_bytes % 5) AS n_frames,
             greatest(1, (n_bytes - {frame_len}) // (1 + n_bytes % 5)) AS step
      FROM m),
x AS (SELECT url, payload, step,
             unnest(generate_series(0, n_frames - 1)) AS frame_idx FROM f),
s AS (SELECT url, frame_idx,
             substring(payload, CAST(frame_idx * step + 1 AS INT), {frame_len}) AS frame
      FROM x)
SELECT url, CAST(frame_idx AS INT) AS frame_idx, sha256(frame) AS frame_sha,
       CAST(strlen(frame) AS BIGINT) AS frame_bytes FROM s"""
