"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Throughput counters (tiles/sec, joined rows/sec — BASELINE.json metric) are
included as extra keys. Wall-clock excludes JVM startup (timed inside).
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from engine.pipeline import queries as Q
    from engine.pipeline.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="bench"
    )

    bench_cases = [
        # name, builder, action -> rows metric
        ("geotag", Q.q_geotag),
        ("tile_counts_pyramid", Q.q_tile_counts),
        ("cell_index_z12", Q.q_cell_index),
        ("pip_join", Q.q_pip_join),
        ("knn_3", Q.q_knn),
        ("mvt_pyramid_z0_8", lambda s, d: _mvt_pyramid(s, d, 0, 8)),
    ]

    spark.range(1000).count()  # session warm-up (codegen, executors)

    results: dict[str, float] = {}
    counters: dict[str, float] = {}
    t_total = 0.0
    for name, builder in bench_cases:
        df = builder(spark, SF_DIR)
        # noop sink: full materialization of every column (groupBy().count()
        # would let Catalyst prune the computed columns away)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = round(dt, 3)
        counters[f"{name}_rows"] = df.count()
        t_total += dt

    # throughput metrics per BASELINE.json
    tiles = counters.get("mvt_pyramid_z0_8_rows", 0)
    counters["tiles_per_sec"] = round(tiles / results["mvt_pyramid_z0_8"], 1)
    counters["joined_rows_per_sec"] = round(
        counters["pip_join_rows"] / results["pip_join"], 1
    )

    print(
        json.dumps(
            {
                "metric": "tiles/sec + joined rows/sec, z0-z8 MVT pyramid + PIP/kNN joins",
                "value": round(t_total, 3),
                "unit": "sec",
                "queries": results,
                "sf": SF_DIR.rstrip("/").split("/")[-1],
                "cpus": CPUS,
                "counters": counters,
            }
        )
    )
    spark.stop()


def _mvt_pyramid(spark, sf_dir, z_min, z_max):
    from pyspark.sql import functions as F

    from engine.pipeline import fixtures, index, tiler

    geo = fixtures.geotag_df(fixtures.pages_df(spark, sf_dir))
    df = index.with_tiles(index.with_unit(geo), z_min, z_max)
    df = df.withColumn("feature_id", F.expr(index.feature_id_expr("spark")))
    return tiler.encode_point_tiles(df)


if __name__ == "__main__":
    main()
