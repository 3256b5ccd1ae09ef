"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship pipeline at sf0.001 (pages -> geotag -> z0-z4
                 tile pyramid -> MVT encode), returns the tiles DataFrame.
queries()     -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engine.pipeline.queries import REGISTRY, q_mvt_tiles

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_mvt_tiles(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, (_, sql_fn) in REGISTRY.items():
        if sql_fn is not None:
            out[name] = sql_fn("/root/testdata/sf0.01")
    return out
