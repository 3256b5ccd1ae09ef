"""Spatial joins (SURVEY B8, B9): point-in-polygon and kNN.

Both are expressed RELATIONALLY with broadcast dimension sides — the whole
plan stays in JVM whole-stage codegen (no Python in the hot path), Catalyst
picks broadcast-hash joins, and the exact same arithmetic runs in the
DuckDB oracle (IEEE doubles: +,-,*,/ and comparisons are correctly rounded,
so results match bit-for-bit).

PIP = even-odd ray casting, decomposed as:
  1. bbox prefilter: broadcast range join pages x poly_bbox  (the "prepared"
     bucket stage; at cluster scale the bbox table is tiny and broadcast)
  2. edge join on poly_id (broadcast) + crossing-parity aggregation
     (partial aggregation is map-side: Catalyst plans partial_sum before
     the shuffle, so the z0-style skew never concentrates).

kNN = broadcast centers cross join + two-level deterministic top-k
(ties broken by poly_id; SURVEY B9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CROSSING_COND = (
    "((y1 > lat) != (y2 > lat)) AND (lon < x1 + (lat - y1) * (x2 - x1) / (y2 - y1))"
)


def poly_bbox(edges: DataFrame) -> DataFrame:
    return edges.groupBy("poly_id").agg(
        F.least(F.min("x1"), F.min("x2")).alias("bx0"),
        F.least(F.min("y1"), F.min("y2")).alias("by0"),
        F.greatest(F.max("x1"), F.max("x2")).alias("bx1"),
        F.greatest(F.max("y1"), F.max("y2")).alias("by1"),
    )


def pip_join(geotagged: DataFrame, edges: DataFrame) -> DataFrame:
    """(url, poly_id) pairs where the page's point is inside the polygon
    (even-odd over all rings, holes subtract)."""
    bbox = poly_bbox(edges)
    candidates = geotagged.join(
        F.broadcast(bbox),
        (F.col("lon") >= F.col("bx0"))
        & (F.col("lon") <= F.col("bx1"))
        & (F.col("lat") >= F.col("by0"))
        & (F.col("lat") <= F.col("by1")),
    ).select("url", "lat", "lon", "poly_id")
    crossings = (
        candidates.join(F.broadcast(edges), "poly_id")
        .withColumn("hit", F.expr(f"CASE WHEN {CROSSING_COND} THEN 1 ELSE 0 END"))
        .groupBy("url", "poly_id")
        .agg(F.sum("hit").alias("c"))
    )
    return crossings.filter(F.col("c") % 2 == 1).select("url", "poly_id")


def pip_oracle_sql(with_ctes: str) -> str:
    """DuckDB twin of pip_join; ``with_ctes`` provides pages/geotagged/
    poly_edges CTE bodies."""
    return f"""
WITH {with_ctes},
bbox AS (
  SELECT poly_id,
         least(min(x1), min(x2)) AS bx0, least(min(y1), min(y2)) AS by0,
         greatest(max(x1), max(x2)) AS bx1, greatest(max(y1), max(y2)) AS by1
  FROM poly_edges GROUP BY poly_id),
candidates AS (
  SELECT g.url, g.lat, g.lon, b.poly_id
  FROM geotagged g JOIN bbox b
    ON g.lon >= b.bx0 AND g.lon <= b.bx1 AND g.lat >= b.by0 AND g.lat <= b.by1),
crossings AS (
  SELECT c.url, c.poly_id,
         SUM(CASE WHEN {CROSSING_COND} THEN 1 ELSE 0 END) AS c
  FROM candidates c JOIN poly_edges e USING (poly_id)
  GROUP BY c.url, c.poly_id)
SELECT url, poly_id FROM crossings WHERE c % 2 = 1
"""


def knn_join(geotagged: DataFrame, centers: DataFrame, k: int = 3) -> DataFrame:
    """k nearest polygon centers per page; distance = squared euclidean in
    degree space (deterministic, oracle-identical); ties by poly_id."""
    paired = geotagged.select("url", "lat", "lon").join(F.broadcast(centers))
    paired = paired.withColumn(
        "dist2",
        (F.col("lon") - F.col("clon")) * (F.col("lon") - F.col("clon"))
        + (F.col("lat") - F.col("clat")) * (F.col("lat") - F.col("clat")),
    )
    w = Window.partitionBy("url").orderBy("dist2", "poly_id")
    return (
        paired.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("url", "poly_id", "dist2", "rank")
    )


def knn_oracle_sql(with_ctes: str, k: int = 3) -> str:
    return f"""
WITH {with_ctes},
paired AS (
  SELECT g.url, c.poly_id,
         (g.lon - c.clon) * (g.lon - c.clon) + (g.lat - c.clat) * (g.lat - c.clat) AS dist2
  FROM geotagged g CROSS JOIN poly_centers c),
ranked AS (
  SELECT url, poly_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY dist2, poly_id) AS rank
  FROM paired)
SELECT url, poly_id, dist2, rank FROM ranked WHERE rank <= {k}
"""
