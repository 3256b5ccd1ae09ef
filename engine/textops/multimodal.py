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


def _media_hex_expr(nb: str) -> str:
    """Engine-neutral SQL: hex text of a deterministic, WELL-FORMED media
    container header per page — even n_bytes get a PNG (8-byte signature +
    IHDR chunk), odd get a JPEG (SOI + APP0/JFIF + SOF0 frame + EOI).
    Width/height reuse the fake-decode formulas so every stage of the
    multimodal story agrees on the same dimensions. Valid on both Spark and
    DuckDB (concat/lpad/hex(int)/%)."""
    w = f"(16 + ({nb} * 7) % 1904)"
    h = f"(16 + ({nb} * 13) % 1064)"
    png = (
        "concat('89504E470D0A1A0A', '0000000D49484452', "
        f"lpad(hex({w}), 8, '0'), lpad(hex({h}), 8, '0'), "
        "'0806000000', 'AABBCCDD')"
    )
    jpeg = (
        "concat('FFD8FFE000104A46494600010100000100010000', "
        f"'FFC00011', '08', lpad(hex({h}), 4, '0'), lpad(hex({w}), 4, '0'), "
        "'03012200021101031101', 'FFD9')"
    )
    return f"CASE WHEN {nb} % 2 = 0 THEN {png} ELSE {jpeg} END"


def media_fixture_df(pages):
    """(url, media binary): the synthetic container payloads as a REAL
    binary column (unhex of the shared hex template) — the stand-in for an
    image blob column at 100 TB."""
    nb = "cast(length(html) as bigint)"
    return pages.selectExpr("url", f"unhex({_media_hex_expr(nb)}) as media")


def media_dims_df(pages):
    """Pure-SQL media header parse: PNG IHDR / JPEG SOF0 width+height
    decoded from the binary column with JVM built-ins only (hex, substring,
    conv, position) — no UDF, codegen end-to-end, scale-safe. PNG: width/
    height are the two big-endian uint32s at IHDR bytes 17-24. JPEG: the
    SOF0 marker (FFC0) is located in the hex text; height/width are the
    big-endian uint16s at marker offsets +5/+7. Replaces the stub-adjacent
    fake decode with a real (if header-only) decoder; real pixel decode
    remains the real_decode extension point."""
    m = media_fixture_df(pages)
    e = m.selectExpr(
        "url",
        "media",
        "upper(hex(media)) as hx",
        "cast(length(media) as bigint) as hdr_bytes",
    ).selectExpr(
        "url",
        "hx",
        "hdr_bytes",
        "substring(hx, 1, 16) = '89504E470D0A1A0A' as is_png",
        "substring(hx, 1, 4) = 'FFD8' as is_jpeg",
        "position('FFC0' IN hx) as sof",
    )
    return e.selectExpr(
        "url",
        "CASE WHEN is_png THEN 'png' WHEN is_jpeg THEN 'jpeg' ELSE 'unknown' END as media_kind",
        "cast(CASE WHEN is_png THEN conv(substring(hx, 33, 8), 16, 10) "
        "          WHEN is_jpeg AND sof > 0 THEN conv(substring(hx, sof + 14, 4), 16, 10) END as bigint) as width",
        "cast(CASE WHEN is_png THEN conv(substring(hx, 41, 8), 16, 10) "
        "          WHEN is_jpeg AND sof > 0 THEN conv(substring(hx, sof + 10, 4), 16, 10) END as bigint) as height",
        "hdr_bytes",
    )


def media_dims_sql(pages_cte: str) -> str:
    """DuckDB twin of media_dims_df: the oracle derives the expected
    dimensions CLOSED-FORM (not by parsing), so a hash match proves the
    Spark-side binary header parse recovers exactly what the container
    encodes. hdr_bytes: PNG header = 33 bytes, JPEG = 41."""
    return f"""
WITH {pages_cte},
m AS (SELECT url, CAST(strlen(text) + 26 AS BIGINT) AS n_bytes FROM pages)
SELECT url,
       CASE WHEN n_bytes % 2 = 0 THEN 'png' ELSE 'jpeg' END AS media_kind,
       CAST(16 + (n_bytes * 7) % 1904 AS BIGINT) AS width,
       CAST(16 + (n_bytes * 13) % 1064 AS BIGINT) AS height,
       CAST(CASE WHEN n_bytes % 2 = 0 THEN 33 ELSE 41 END AS BIGINT) AS hdr_bytes
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
