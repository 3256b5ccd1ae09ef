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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

CROSSING_COND = (
    "((y1 > lat) != (y2 > lat)) AND (lon < x1 + (lat - y1) * (x2 - x1) / (y2 - y1))"
)


PIP_GRID_DEG = 8.0  # bucket grid for the prepared-polygon stage


def pip_grid_deg(n_edges: int) -> float:
    """Density-adaptive candidate-grid width: shrink cells as the polygon
    table grows so per-cell polygon fanout (and with it the candidate-join
    blowup) stays roughly constant. Anchored on the two measured calibration
    points (362k edges -> 2.0 deg, 6.2M edges -> 0.5 deg; bench cases
    pip_join_50k/_1m), i.e. w ~ n_edges^-1/2, clamped to the fixture
    default at the small end."""
    return float(
        min(PIP_GRID_DEG, max(0.05, (1_450_000.0 / max(n_edges, 1)) ** 0.5))
    )


def poly_bbox(edges: DataFrame) -> DataFrame:
    return edges.groupBy("poly_id").agg(
        F.least(F.min("x1"), F.min("x2")).alias("bx0"),
        F.least(F.min("y1"), F.min("y2")).alias("by0"),
        F.greatest(F.max("x1"), F.max("x2")).alias("bx1"),
        F.greatest(F.max("y1"), F.max("y2")).alias("by1"),
    )


def pip_join(
    geotagged: DataFrame, edges: DataFrame, grid_deg: float | None = None
) -> DataFrame:
    """(url, poly_id) pairs where the page's point is inside the polygon
    (even-odd over all rings, holes subtract).

    Scale path ("prepared ray-casting over cell-bucketed broadcast
    polygons"): each polygon bbox explodes into the grid cells it
    intersects (broadcast, tiny); pages equi-join on their own cell — a
    HASH join whose fanout is the local polygon density, instead of an
    O(pages x polys) nested-loop range join. The bbox filter then the
    crossing-parity aggregation keep semantics exact. ``grid_deg`` should
    shrink as polygon density grows (default 8 deg fits the fixture set).
    """
    bbox = poly_bbox(edges)
    w = grid_deg or PIP_GRID_DEG
    bbox_cells = bbox.selectExpr(
        "poly_id", "bx0", "bx1", "by0", "by1",
        f"explode(sequence(cast(floor(bx0 / {w}) as bigint), cast(floor(bx1 / {w}) as bigint))) as gx",
    ).selectExpr(
        "poly_id", "bx0", "bx1", "by0", "by1", "gx",
        f"explode(sequence(cast(floor(by0 / {w}) as bigint), cast(floor(by1 / {w}) as bigint))) as gy",
    )
    pages_c = geotagged.selectExpr(
        "url", "lat", "lon",
        f"cast(floor(lon / {w}) as bigint) as gx",
        f"cast(floor(lat / {w}) as bigint) as gy",
    )
    candidates = (
        pages_c.join(F.broadcast(bbox_cells), ["gx", "gy"])
        .filter(
            (F.col("lon") >= F.col("bx0"))
            & (F.col("lon") <= F.col("bx1"))
            & (F.col("lat") >= F.col("by0"))
            & (F.col("lat") <= F.col("by1"))
        )
        .select("url", "lat", "lon", "poly_id")
    )
    # r7 restructure (guide §2.3/§2.4): the polygon's edges GROUP into one
    # array row per poly_id; candidates join 1:1 and the crossing-parity
    # count is a per-row array kernel (same IEEE CROSSING_COND per edge).
    # The old plan materialized candidates x edges rows out of the second
    # broadcast join and fed the survivors through a (url, poly_id) hash
    # aggregate + exchange; the array form makes the whole query one
    # map-only pipeline — scan -> bj(cells) -> bj(edge arrays) -> filter —
    # with ZERO exchanges, measured ~25% faster at the 50k-poly (~360k-edge)
    # calibration point. Past ~2M edges the collect_list groupBy feeding the
    # broadcast build turns into ObjectHashAggregate heap churn and measured
    # slightly SLOWER (the 1M-poly evidence arm), so the plan branches on
    # the calibrated grid width: callers derive grid_deg from n_edges via
    # pip_grid_deg (w ~ n_edges^-1/2), making w >= pip_grid_deg(2M edges)
    # exactly the broadcastable-density regime where the array kernel wins.
    if w >= pip_grid_deg(BROADCAST_EDGE_LIMIT):
        return candidates.join(F.broadcast(_edges_arr(edges)), "poly_id").filter(
            F.expr(f"{_ARR_PARITY} % 2 = 1")
        ).select("url", "poly_id")
    crossings = (
        candidates.join(F.broadcast(edges.select("poly_id", "x1", "y1", "x2", "y2")), "poly_id")
        # non-crossing pairs contribute 0 to the parity sum, so drop them
        # BEFORE the aggregate: it sees ~#crossings rows, not cand x edges
        .filter(F.expr(CROSSING_COND))
        .groupBy("url", "poly_id")
        .agg(F.count("*").alias("c"))
    )
    return crossings.filter(F.col("c") % 2 == 1).select("url", "poly_id")


# per-edge crossing test over the grouped edge array — textually the same
# arithmetic as CROSSING_COND with e.-qualified edge fields
_ARR_PARITY = (
    "size(filter(_edges, e -> ((e.y1 > lat) != (e.y2 > lat)) AND "
    "(lon < e.x1 + (lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1))))"
)


def _edges_arr(edges: DataFrame) -> DataFrame:
    """(poly_id, _edges array<struct<x1,y1,x2,y2>>) — one row per polygon.
    collect_list order is nondeterministic, but the only consumer counts
    matching elements (order-invariant)."""
    return edges.groupBy("poly_id").agg(
        F.collect_list(F.struct("x1", "y1", "x2", "y2")).alias("_edges")
    )


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


def pip_join_numpy(
    geotagged: DataFrame, polys: list[dict], grid_deg: float | None = None
) -> DataFrame:
    """PIP join, map-only path: the polygon table (small dim side) ships to
    every task; each Arrow batch looks its pages up in a CELL-BUCKETED
    polygon index (the in-memory twin of pip_join's grid), bbox-checks only
    the local candidates, then vector-ray-casts per candidate polygon
    (engine.spatial.pip — the SAME IEEE expression as CROSSING_COND, so
    this shares pip_join's oracle). Zero shuffle; per-batch work is
    O(candidate pairs) like the relational plan, NOT O(P) per batch — the
    round-2 version looped every polygon per batch, fine at P=500, wrong
    at P=10^5. Past the closure-shipping regime entirely (P beyond memory),
    use pip_join_partitioned — pip_join_auto chooses.

    ``polys``: fixtures.polygons_np output (rings per polygon).
    """
    from engine.spatial import pip as pipmod

    w = grid_deg or PIP_GRID_DEG
    rings_by_slot = [
        [np.asarray(r, dtype=np.float64) for r in p["rings"]] for p in polys
    ]
    pids = np.array([int(p["poly_id"]) for p in polys], dtype=np.int64)
    bbox = np.array([pipmod.bbox_of(p["rings"]) for p in polys], dtype=np.float64)
    bx0, by0, bx1, by1 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(len(polys)):
        for gx in range(int(np.floor(bx0[i] / w)), int(np.floor(bx1[i] / w)) + 1):
            for gy in range(int(np.floor(by0[i] / w)), int(np.floor(by1[i] / w)) + 1):
                buckets.setdefault((gx, gy), []).append(i)
    buckets_np = {k: np.asarray(v, dtype=np.int64) for k, v in buckets.items()}

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            urls = pdf["url"].to_numpy()
            gx = np.floor(lon / w).astype(np.int64)
            gy = np.floor(lat / w).astype(np.int64)
            code = (gx + (1 << 20)) * (1 << 21) + (gy + (1 << 20))
            order = np.argsort(code, kind="stable")
            sc = code[order]
            cell_starts = np.flatnonzero(
                np.concatenate([[True], sc[1:] != sc[:-1]])
            )
            cell_ends = np.append(cell_starts[1:], len(sc))
            pair_page, pair_poly = [], []
            for s, e in zip(cell_starts, cell_ends):
                idx = order[s:e]
                cand = buckets_np.get((int(gx[idx[0]]), int(gy[idx[0]])))
                if cand is None:
                    continue
                sub_lon, sub_lat = lon[idx], lat[idx]
                mask = (
                    (sub_lon[:, None] >= bx0[cand])
                    & (sub_lon[:, None] <= bx1[cand])
                    & (sub_lat[:, None] >= by0[cand])
                    & (sub_lat[:, None] <= by1[cand])
                )
                pi, pj = np.nonzero(mask)
                if len(pi):
                    pair_page.append(idx[pi])
                    pair_poly.append(cand[pj])
            out_urls, out_pids = [], []
            if pair_page:
                pages_c = np.concatenate(pair_page)
                polys_c = np.concatenate(pair_poly)
                po = np.argsort(polys_c, kind="stable")
                pages_c, polys_c = pages_c[po], polys_c[po]
                p_starts = np.flatnonzero(
                    np.concatenate([[True], polys_c[1:] != polys_c[:-1]])
                )
                p_ends = np.append(p_starts[1:], len(polys_c))
                for s, e in zip(p_starts, p_ends):
                    slot = int(polys_c[s])
                    cand_pages = pages_c[s:e]
                    inside = pipmod.points_in_polygon(
                        lon[cand_pages], lat[cand_pages], rings_by_slot[slot]
                    )
                    sel = cand_pages[inside]
                    if len(sel):
                        out_urls.append(urls[sel])
                        out_pids.append(
                            np.full(len(sel), pids[slot], dtype=np.int64)
                        )
            yield pd.DataFrame(
                {
                    "url": np.concatenate(out_urls) if out_urls else [],
                    "poly_id": np.concatenate(out_pids) if out_pids else [],
                }
            )

    return geotagged.select("url", "lat", "lon").mapInPandas(
        compute, "url string, poly_id long"
    )


# Broadcast chooser thresholds. Edges: ~48 B/row -> ~100 MB at 2M edges,
# the practical ceiling for a broadcast build side on real executors
# (hash relation ~2-3x data size against executor memory); measured
# in-sandbox the broadcast PIP plan also keeps winning through ~400k edges
# (its second join stays map-side — candidates never hit an exchange) and
# loses by 1M-polygon scale (bench pip_join_1m_*). Centers: the hybrid kNN
# collects the center table to the driver and matmuls the residue pages
# against ALL of it, so it loses once the O(residue x n_centers) kernel
# outgrows the partitioned path's density-bounded candidate join. The
# crossover is PARALLELISM-DEPENDENT: the hybrid's matmul wall-time is
# ~ n_centers / cores (it parallelizes near-perfectly), while the
# partitioned cascade is stage-count-bound and nearly flat in cores
# (measured at 50k centers: 8.1s@local[8] vs 9.3s@local[32]) — so the
# crossover moves ~linearly with cores. Measured windows under the
# clearCache protocol (BENCH/CALIBRATION.md, `python bench.py
# --calibration`, sf0.1): crossover in (50k, ~120k] at local[32]
# (hybrid clearly wins 50k, 6.3s vs 9.6s; 100k straddles run-to-run,
# 10.1s vs 10.8s then 11.6s vs 9.9s; 200k clearly partitioned) and in
# (10k, 50k] at local[8] (4.2s vs 6.9s at 10k, 10.0s vs 8.1s at 50k) —
# 3k centers/core sits inside both windows. The cap bounds the hybrid's
# driver collect + broadcast (~40 B/center -> ~80 MB at 2M), the real
# ceiling once a cluster's core count stops being the binding
# constraint.
BROADCAST_EDGE_LIMIT = 2_000_000
BROADCAST_CENTER_LIMIT_PER_CORE = 3_000
BROADCAST_CENTER_COLLECT_CAP = 2_000_000


def broadcast_center_limit(spark) -> int:
    """Largest center-table size knn_join_auto routes to the broadcast-
    hybrid plan at this session's parallelism: per-core crossover x
    total cores, capped by the driver-collect ceiling (constants and
    evidence above; table in BENCH/CALIBRATION.md)."""
    try:
        par = max(1, spark.sparkContext.defaultParallelism)
    except Exception:
        # Spark Connect sessions expose no sparkContext (ADVICE r6): fall
        # back to the conf the session was sized with
        par = max(
            1,
            int(
                spark.conf.get(
                    "spark.default.parallelism",
                    spark.conf.get("spark.sql.shuffle.partitions", "8"),
                )
            ),
        )
    return min(BROADCAST_CENTER_LIMIT_PER_CORE * par, BROADCAST_CENTER_COLLECT_CAP)


# a polygon with this many edges concentrates its candidates x edges join
# rows on one reducer; past it the edge join salts that polygon selectively
EDGE_SALT_EDGES_PER_POLY = 10_000


def pip_join_partitioned(
    geotagged: DataFrame,
    edges: DataFrame,
    grid_deg: float | None = None,
    n_salt: int = 4,
    salt_edges: bool | None = None,
    max_edges_per_poly: int | None = None,
    edge_salt_threshold: int = EDGE_SALT_EDGES_PER_POLY,
) -> DataFrame:
    """PIP join, shuffle-both-sides path: for polygon tables too large to
    broadcast (a country-scale OSM table: 10^7 polygons x 10^2 vertices).

    Same decomposition as pip_join — grid-cell candidate equi-join, bbox
    filter, edge join, crossing-parity aggregate — but the joins are
    SHUFFLE hash joins: the polygon side is pre-exploded to its grid cells
    and SALTED (replicated n_salt ways), pages pick one salt by url hash,
    so a hot cell (urban polygon cluster under a page-dense area) spreads
    over n_salt reducers instead of one. Salting replicates the polygon
    side's shuffle bytes x n_salt, so the factor stays small; AQE
    skew-join is the backstop for residual imbalance.

    The candidates-x-edges join on poly_id is skew-guarded too: a
    MEGA-polygon (10^4+ edges — a country polygon in OSM — under a
    page-dense area) would concentrate candidates x edges rows on one
    reducer. ``salt_edges=None`` (default) auto-detects from the per-poly
    edge-count maximum (one tiny dimension-side aggregate; pass
    ``max_edges_per_poly`` from table stats to skip it); when on, ONLY
    polygons at/above ``edge_salt_threshold`` edges are replicated n_salt
    ways (selective salting — total edge shuffle bytes grow by n_salt x
    the skewed share, not n_salt x everything), everything else joins on
    salt 0. Salting only changes routing — output is identical to
    pip_join, same oracle.
    """
    bbox = poly_bbox(edges)
    w = grid_deg or PIP_GRID_DEG
    bbox_cells = bbox.selectExpr(
        "poly_id", "bx0", "bx1", "by0", "by1",
        f"explode(sequence(cast(floor(bx0 / {w}) as bigint), cast(floor(bx1 / {w}) as bigint))) as gx",
    ).selectExpr(
        "poly_id", "bx0", "bx1", "by0", "by1", "gx",
        f"explode(sequence(cast(floor(by0 / {w}) as bigint), cast(floor(by1 / {w}) as bigint))) as gy",
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    pages_c = geotagged.selectExpr(
        "url", "lat", "lon",
        f"cast(floor(lon / {w}) as bigint) as gx",
        f"cast(floor(lat / {w}) as bigint) as gy",
    ).withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(n_salt)))
    # The shuffle-hash hint PINS the declared plan: the pages side of this
    # engine derives from a tiny pre-explode source (Iceberg stats see KBs),
    # so Catalyst's size estimate would otherwise BROADCAST the fact side —
    # planning both "partitioned" joins as BroadcastHashJoin(BuildLeft=pages)
    # and defeating the salting entirely (measured: 22.5s flat 8->32 at the
    # 50k calibration point vs 6s properly shuffled). Same trap and same fix
    # as knn_join_partitioned's candidate join.
    candidates = (
        pages_c.join(bbox_cells.hint("shuffle_hash"), ["gx", "gy", "_salt"])
        .filter(
            (F.col("lon") >= F.col("bx0"))
            & (F.col("lon") <= F.col("bx1"))
            & (F.col("lat") >= F.col("by0"))
            & (F.col("lat") <= F.col("by1"))
        )
        .select("url", "lat", "lon", "poly_id", "_salt")
    )
    skew_ids = None
    if salt_edges is None:
        if max_edges_per_poly is not None:
            salt_edges = max_edges_per_poly >= edge_salt_threshold
        else:
            # No stats passed: ONE eager aggregate job at DataFrame-
            # construction time (callers wanting full laziness pass
            # max_edges_per_poly from table stats). Collecting the skewed
            # ids directly — bounded by n_edges/threshold polygons, each
            # holding >= threshold edges — gives both the detection verdict
            # and the skew list, so the per-poly aggregate runs exactly once.
            skew_ids = [
                r["poly_id"]
                for r in edges.groupBy("poly_id")
                .agg(F.count("*").alias("_ne"))
                .filter(F.col("_ne") >= edge_salt_threshold)
                .select("poly_id")
                .collect()
            ]
            salt_edges = bool(skew_ids)
    # NOTE (r7): the broadcast pip_join moved to the per-polygon edge-ARRAY
    # parity kernel, but this partitioned path deliberately keeps the
    # row-based edge join + (url, poly_id) parity aggregate: grouping a
    # data-sized edge table with collect_list is an ObjectHashAggregate
    # (per-group heap buffers, sort-based fallback past the group
    # threshold) whose GC churn made the 50k/1m bench cases bimodal
    # (measured 7s warm vs 23-34s under heap pressure), while the row plan
    # below exchanges the same bytes once and aggregates in UnsafeRow land.
    if salt_edges:
        # selective salting: the skewed-poly list is tiny by construction
        # (mega-polygons), so it broadcasts to tag both join sides
        if skew_ids is not None:
            from pyspark.sql.types import StructType

            skewed = edges.sparkSession.createDataFrame(
                [(p,) for p in skew_ids],
                StructType([edges.schema["poly_id"]]),
            ).select("poly_id", F.lit(True).alias("_skew"))
        else:
            skewed = (
                edges.groupBy("poly_id")
                .agg(F.count("*").alias("_ne"))
                .filter(F.col("_ne") >= edge_salt_threshold)
                .select("poly_id", F.lit(True).alias("_skew"))
            )
        edges_s = (
            edges.join(F.broadcast(skewed), "poly_id", "left")
            .withColumn(
                "_salt_e",
                F.explode(
                    F.when(
                        F.col("_skew").isNotNull(),
                        F.sequence(F.lit(0), F.lit(n_salt - 1)),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            .drop("_skew")
        )
        cand_s = (
            candidates.join(F.broadcast(skewed), "poly_id", "left")
            .withColumn(
                "_salt_e",
                F.when(F.col("_skew").isNotNull(), F.col("_salt")).otherwise(
                    F.lit(0)
                ),
            )
            .drop("_skew", "_salt")
        )
        paired = cand_s.join(edges_s.hint("shuffle_hash"), ["poly_id", "_salt_e"])
    else:
        # shuffle_hash keeps the edge join a shuffle join too; with the
        # candidates exchanged on poly_id, Catalyst proves HashPartitioning
        # (poly_id) satisfies the (url, poly_id) aggregate below, so the
        # crossings never re-exchange (same trick as the kNN top-k windows).
        paired = candidates.drop("_salt").join(edges.hint("shuffle_hash"), "poly_id")
    crossings = (
        # drop non-crossing pairs BEFORE the aggregate (zero-crossing groups
        # are even-parity; see pip_join) — the post-join hash aggregate
        # processes ~#crossings rows, not candidates x edges
        paired.filter(F.expr(CROSSING_COND))
        .groupBy("url", "poly_id")
        .agg(F.count("*").alias("c"))
    )
    return crossings.filter(F.col("c") % 2 == 1).select("url", "poly_id")


def pip_join_auto(
    geotagged: DataFrame,
    edges: DataFrame,
    n_edges: int | None = None,
    max_edges_per_poly: int | None = None,
) -> DataFrame:
    """Size-based chooser between the broadcast and partitioned PIP plans.
    BROADCAST_EDGE_LIMIT is calibrated by `python bench.py --calibration`
    (BENCH/CALIBRATION.md) — regenerate after touching either plan.


    ``n_edges`` / ``max_edges_per_poly`` are polygon-side stats — at real
    scale they come from table metadata (Iceberg snapshot stats + a
    partition-level max); a count() on the dimension table is the fallback
    (one cheap metadata-ish job, never on the fact side). When
    ``max_edges_per_poly`` is omitted on the partitioned path, salt
    auto-detection additionally runs one eager per-poly aggregate at
    construction time (see pip_join_partitioned). The candidate
    grid width derives from n_edges (pip_grid_deg) so the per-cell fanout
    stays bounded in exactly the large-dimension regime the partitioned
    plan targets."""
    if n_edges is None:
        n_edges = edges.count()
    w = pip_grid_deg(n_edges)
    if n_edges <= BROADCAST_EDGE_LIMIT:
        return pip_join(geotagged, edges, grid_deg=w)
    return pip_join_partitioned(
        geotagged, edges, grid_deg=w, max_edges_per_poly=max_edges_per_poly
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: tuple[str, ...],
) -> DataFrame:
    """As-of join: for every left row, the right row with the greatest
    right.ts <= left.ts within the same ``on`` key — the event-time
    enrichment operator Spark has no built-in for (DuckDB: ASOF JOIN,
    which is this operator's oracle).

    Plan: union the two streams with a kind tag (markers sort before
    events at equal ts -> inclusive semantics) and take a running
    last(ignorenulls) window over (key, ts, kind). ONE shuffle on the key,
    a single sorted pass — at 100 TB this is sort-merge-shaped, vs the
    quadratic blowup of the naive theta-join formulation. ``right`` must
    be unique per (on, ts); pre-aggregate to enforce.
    """
    l_pay = [c for c in left.columns if c not in (on, ts)]
    lt = left.select(
        on,
        ts,
        F.lit(1).alias("_kind"),
        *l_pay,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    rt = right.select(
        on,
        ts,
        F.lit(0).alias("_kind"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_pay],
        *right_cols,
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_kind") == 1).drop("_kind")


KNN_CELL_DEG = 22.5  # default degree-grid cell width for candidate gen


def _with_dist2(paired: DataFrame) -> DataFrame:
    return paired.withColumn(
        "dist2",
        (F.col("lon") - F.col("clon")) * (F.col("lon") - F.col("clon"))
        + (F.col("lat") - F.col("clat")) * (F.col("lat") - F.col("clat")),
    )


def _topk(paired: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("url").orderBy("dist2", "poly_id")
    return (
        _with_dist2(paired)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _topk_two_phase(paired: DataFrame, k: int, n_chunks: int = 32) -> DataFrame:
    """Top-k over a pairing whose per-url group may be huge (e.g. the
    residue x full-center-table exact join): phase 1 takes a local top-k
    within (url, center-hash chunk) — bounding any single window task to
    ~|centers|/n_chunks rows — phase 2 merges the n_chunks*k survivors per
    url. Identical output to _topk (row_number over the same total order)."""
    d = _with_dist2(paired).withColumn(
        "_chunk", F.pmod(F.xxhash64("poly_id"), F.lit(n_chunks))
    )
    w1 = Window.partitionBy("url", "_chunk").orderBy("dist2", "poly_id")
    local = (
        d.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_chunk")
    )
    w2 = Window.partitionBy("url").orderBy("dist2", "poly_id")
    return local.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def _attach_persists(out: DataFrame, frames) -> DataFrame:
    """Tag a cascade output with the intermediates it persisted so the
    caller can free them (free_persisted) once its terminal action has
    materialized the result. The persists are load-bearing WITHIN one
    action (each level's `good` feeds both the union output and the next
    level's anti-join, and Spark does not dedup common subplans), but
    their lifetime is the QUERY — in a long-lived session repeated kNN
    calls would otherwise accumulate block-manager storage."""
    out._graft_persists = list(frames)
    return out


def free_persisted(out: DataFrame, blocking: bool = False) -> None:
    """Drop the block-manager storage a kNN cascade output persisted, once
    the caller's terminal action has run. Never destructive: these are
    cache-manager persists, not checkpoints — a later action on ``out``
    recomputes them from lineage. Idempotent; no-op on untagged frames."""
    for f in getattr(out, "_graft_persists", ()):
        try:
            f.unpersist(blocking)
        except Exception:  # best-effort on teardown / Connect backends
            pass
    out._graft_persists = []


def knn_bruteforce(geotagged: DataFrame, centers: DataFrame, k: int = 3) -> DataFrame:
    """Exact kNN via full cross join + window top-k (the baseline path)."""
    paired = geotagged.select("url", "lat", "lon").join(F.broadcast(centers))
    return _topk(paired, k).select("url", "poly_id", "dist2", "rank")


def _knn_topk_col(k: int, w2_expr: str):
    """Map-side top-k column over a per-cell candidate ARRAY (guide
    §2.3/§2.4: shuffle/sort candidate pairs -> per-row array kernel).

    ``_cands`` is array<struct<poly_id, clon, clat>> (all centers whose 3x3
    neighborhood covers the page's cell, or null when the cell is empty).
    ``w2_expr`` bounds provability: only candidates with dist2 <= w2 count.
    ``_topk`` holds the first k in-ball candidates sorted by
    (dist2, poly_id) — the same total order the old per-url row_number
    window produced, computed per ROW with no exchange and no partition
    sort. Exactly ONE column comes back: HOF chains are interpreted (no
    codegen CSE), so every derived value (the "k-th candidate within w"
    verify gate = size(_topk) >= k, null array -> size null -> never >= k)
    must be read off the materialized _topk, not recomputed from _cands.
    dist2 is the same IEEE double expression as the oracle
    ((lon-clon)^2 + (lat-clat)^2), evaluated once per candidate."""
    d2 = (
        "((lon - c.clon) * (lon - c.clon) + (lat - c.clat) * (lat - c.clat))"
    )
    inball = (
        f"filter(transform(_cands, c -> struct({d2} as dist2, "
        f"c.poly_id as poly_id)), s -> s.dist2 <= {w2_expr})"
    )
    return F.expr(f"slice(array_sort({inball}), 1, {k})").alias("_topk")


def _explode_topk(split: DataFrame) -> DataFrame:
    """(url, _topk array) -> (url, poly_id, dist2, rank): rank is the
    1-based array position — positions are (dist2, poly_id)-sorted, so this
    is exactly row_number() over that order."""
    return split.select(
        "url", F.posexplode("_topk").alias("_pos", "_s")
    ).selectExpr(
        "url",
        "_s.poly_id as poly_id",
        "_s.dist2 as dist2",
        "cast(_pos + 1 as int) as rank",
    )


def knn_join(
    geotagged: DataFrame,
    centers: DataFrame,
    k: int = 3,
    cell_deg: float | None = None,
    level_mults: tuple[float, ...] = (1.0,),
    n_centers: int | None = None,
) -> DataFrame:
    """Exact kNN, scale path (B9): cell-neighbor candidate expansion.

    Centers explode into their 3x3 neighborhood on a degree grid, GROUP
    into one array row per cell, and broadcast; pages equi-join 1:1 on
    their own cell and compute the provable top-k per row with array
    kernels (r7 restructure, guide §2.4): the old plan exploded ~O(density)
    candidate rows per page and paid a url-keyed EXCHANGE plus a window
    sort over the whole candidate-pair volume (26M rows at the 50k-center
    bench point); the array form keeps the candidate set inside the page's
    row, so the plan is scan -> broadcast hash join -> project, with ZERO
    exchange before the residue union. Any center OUTSIDE the 3x3
    neighborhood is > one cell width away in some axis, so dist2 > w^2:
    if a page has >= k in-ball candidates its top-k is provably exact.

    Pages whose top-k is not provable (fewer than k in-ball candidates —
    e.g. polar pages far from the center band) fall through; the residue
    is resolved by the VECTORIZED brute-force kernel (knn_join_numpy:
    broadcast centers, numpy distance matrix, zero shuffle). Exactness is
    unchanged: both paths produce the oracle's (dist2, poly_id) order.
    cell_deg defaults to a density-adaptive W targeting a high verify rate.
    """
    if cell_deg is None:
        if n_centers is None:
            n_centers = centers.count()  # dimension side: tiny, driver-known
        cell_deg = min(KNN_CELL_DEG, max(2.0, (129900.0 / max(n_centers, 1)) ** 0.5))
    pages = geotagged.select("url", "lat", "lon")
    frames = []
    resolved = []
    remaining = pages
    for w in (m * cell_deg for m in level_mults):
        if w >= 120.0:
            break
        cell = f"cast(floor(%s / {w}) as bigint)"
        pages_c = remaining.withColumn("cx", F.expr(cell % "lon")).withColumn(
            "cy", F.expr(cell % "lat")
        )
        cell_arr = (
            centers.withColumn("di", F.explode(F.sequence(F.lit(-1), F.lit(1))))
            .withColumn("dj", F.explode(F.sequence(F.lit(-1), F.lit(1))))
            .selectExpr(
                "poly_id",
                "clon",
                "clat",
                f"{cell % 'clon'} + di as cx",
                f"{cell % 'clat'} + dj as cy",
            )
            .groupBy("cx", "cy")
            .agg(
                F.collect_list(F.struct("poly_id", "clon", "clat")).alias(
                    "_cands"
                )
            )
        )
        # collect_list order is nondeterministic, but every consumer sorts
        # (array_sort by (dist2, poly_id) — a total order, poly_id unique),
        # so the output is order-invariant. LEFT join: a page over an empty
        # cell keeps a null array -> _cnt 0 -> residue.
        split = (
            pages_c.join(F.broadcast(cell_arr), ["cx", "cy"], "left")
            .select("url", "lat", "lon", _knn_topk_col(k, repr(w * w)))
            # referenced twice (good + remaining); <= k structs/page. The
            # caller frees via free_persisted after its terminal action.
            # The verify gate reads size() off the PERSISTED array, so the
            # HOF chain runs once per page during materialization.
            .persist()
        )
        frames.append(split)
        resolved.append(_explode_topk(split.filter(F.size("_topk") >= k)))
        remaining = split.filter(
            F.coalesce(F.size("_topk"), F.lit(0)) < k
        ).select("url", "lat", "lon")
    out = knn_join_numpy(remaining, centers, k)
    for good in resolved:
        out = out.unionByName(good)
    return _attach_persists(out, frames)


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


def knn_join_numpy(
    geotagged: DataFrame, centers: DataFrame, k: int = 3
) -> DataFrame:
    """Exact kNN, map-only path: centers (small dim side) ship to every
    task; each Arrow batch computes the full distance matrix in numpy and
    takes top-k with deterministic (dist2, poly_id) tie-breaking.

    No shuffle at all — at cluster scale this is a pure map over the pages
    table, which beats any join/window formulation while the center count
    fits in memory (chunked to bound the distance-matrix footprint).
    Arithmetic is the same IEEE float64 expression as the SQL oracle.
    """
    rows = centers.select("poly_id", "clon", "clat").collect()
    # sort by poly_id so the argmin first-minimum tie-break below is a
    # property of the DATA, not of the center table's scan/file order
    # (r7: the bulk fixture's multi-file layout no longer guarantees it)
    rows.sort(key=lambda r: r.poly_id)
    poly_ids = np.array([r.poly_id for r in rows], dtype=np.int64)
    clon = np.array([r.clon for r in rows], dtype=np.float64)
    clat = np.array([r.clat for r in rows], dtype=np.float64)

    def compute(batches):
        P = len(poly_ids)
        for pdf in batches:
            urls = pdf["url"].to_numpy()
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            out_url, out_pid, out_d2, out_rank = [], [], [], []
            # ~16MB f64 working buffers: small enough that many concurrent
            # tasks' buffers stay in cache/resident pages (128MB buffers
            # measured 4x slower at 32 concurrent tasks on the lazy-fault
            # sandbox VM and thrash LLC on real executors too)
            chunk = max(1, (1 << 21) // max(P, 1))
            buf = np.empty((min(chunk, len(lon)), P), dtype=np.float64)
            tmp = np.empty_like(buf)
            for s in range(0, len(lon), chunk):
                e = min(s + chunk, len(lon))
                m = e - s
                d2 = buf[:m]
                t = tmp[:m]
                # exact oracle arithmetic, minimal memory traffic
                np.subtract(lon[s:e, None], clon[None, :], out=d2)
                np.multiply(d2, d2, out=d2)
                np.subtract(lat[s:e, None], clat[None, :], out=t)
                np.multiply(t, t, out=t)
                np.add(d2, t, out=d2)
                kk = min(k, P)
                sel_pid = np.empty((m, kk), dtype=np.int64)
                sel_d2 = np.empty((m, kk), dtype=np.float64)
                rows = np.arange(m)
                for j in range(kk):
                    # argmin returns the FIRST minimum -> smallest poly_id
                    # among ties, i.e. exactly the (dist2, poly_id) order
                    idx = np.argmin(d2, axis=1)
                    sel_pid[:, j] = poly_ids[idx]
                    sel_d2[:, j] = d2[rows, idx]
                    d2[rows, idx] = np.inf
                out_url.append(np.repeat(urls[s:e], kk))
                out_pid.append(sel_pid.reshape(-1))
                out_d2.append(sel_d2.reshape(-1))
                out_rank.append(
                    np.tile(np.arange(1, kk + 1), m).astype(np.int32)
                )
            yield pd.DataFrame(
                {
                    "url": np.concatenate(out_url) if out_url else [],
                    "poly_id": np.concatenate(out_pid) if out_pid else [],
                    "dist2": np.concatenate(out_d2) if out_d2 else [],
                    "rank": np.concatenate(out_rank) if out_rank else [],
                }
            )

    return geotagged.select("url", "lat", "lon").mapInPandas(
        compute, "url string, poly_id long, dist2 double, rank int"
    )


def _ring_offsets(w: float, c: float) -> list[tuple[int, int]]:
    """Fine-cell (dx, dy) offsets a center must replicate into so that
    every center within distance ``w`` of ANY point of a page's cell is
    joined: offset cell g is kept iff its min distance to the page cell f
    is <= w (adjacent cells touch, so the per-axis gap is
    max(|d| - 1, 0) * c). As c shrinks the kept set approaches the pi*w^2
    ball; the excluded corners are exactly where a coarse 3x3 neighborhood
    (a (3w)^2 block) wastes candidate pairs."""
    import math

    r = int(math.ceil(w / c)) + 1
    out = []
    for dx in range(-r, r + 1):
        ax = max(abs(dx) - 1, 0) * c
        for dy in range(-r, r + 1):
            ay = max(abs(dy) - 1, 0) * c
            if ax * ax + ay * ay <= w * w:
                out.append((dx, dy))
    return out


def _knn_cell_bound_terminal(
    remaining: DataFrame,
    centers: DataFrame,
    k: int,
    c: float,
    n_salt: int = 4,
) -> DataFrame:
    """Exact kNN for the cascade's unresolved pages via per-cell distance
    bounds — the classic grid-kNN pruning argument, fully relational:

    1. For every occupied page cell P and center cell K, the cell-to-cell
       bounds hold for EVERY page p in P and center q in K:
         mind(P,K) = axis-wise max(|d|-1, 0) * c gap   <= |pq|
         maxd(P,K) = axis-wise (|d|+1) * c             >= |pq|
    2. Sort K by maxd, accumulate center counts: R2(P) = the smallest maxd2
       whose running count reaches k. Every page in P therefore has >= k
       centers within sqrt(R2(P)) — its true k-th neighbor distance is
       bounded by R2(P), ADAPTIVELY per cell (pages near the center region
       get a small ball; only genuinely isolated pages get a wide one).
    3. Candidate centers for P = centers whose point-to-cell distance to P
       is <= sqrt(R2(P)). Contains every possible top-k member by (2).
    4. Per-CENTER refinement: r2pt(P) = k-th smallest point-to-cell MAX
       distance over P's candidates — the same argument at center
       granularity, so the page-cell diagonal is paid once instead of the
       (|d|+1)-cell slack twice; candidates shrink to pmind2 <= r2pt.

    The bound table is |page cells| x |center cells| rows (both DISTINCT
    aggregates — thousands, never data-sized), so steps 1-2 cost nothing at
    any scale; step 3's candidate volume is the sum of adaptive balls,
    which is the information-theoretic floor for exact cell kNN (the fixed-
    width w-ball the widening cascade used is the SAME ball with w forced
    to the worst page's radius: measured 594M pairs vs ~60M adaptive on the
    50k-center bench geometry). One shuffle-hash join keyed on the page
    cell + salt; the per-url top-k windows reuse its partitioning, so the
    candidate pairs never cross the wire (same argument as run_level).
    Always resolves every page (no residue, no driver-side loop): when the
    center table has < k rows, R2 is +inf and all centers rank.
    """
    cell = f"cast(floor(%s / {c}) as bigint)"
    pag = remaining.withColumn("cx", F.expr(cell % "lon")).withColumn(
        "cy", F.expr(cell % "lat")
    )
    pcells = pag.select("cx", "cy").distinct()
    cc = centers.selectExpr(
        "poly_id",
        "clon",
        "clat",
        f"{cell % 'clon'} as kx",
        f"{cell % 'clat'} as ky",
    )
    ccells = cc.groupBy("kx", "ky").agg(F.count("*").alias("_n"))
    dmin = lambda a, b: f"(greatest(abs({a} - {b}) - 1L, 0L) * {c})"
    dmax = lambda a, b: f"((abs({a} - {b}) + 1L) * {c})"
    mind2_e = (
        f"{dmin('cx','kx')} * {dmin('cx','kx')}"
        f" + {dmin('cy','ky')} * {dmin('cy','ky')}"
    )
    maxd2_e = (
        f"{dmax('cx','kx')} * {dmax('cx','kx')}"
        f" + {dmax('cy','ky')} * {dmax('cy','ky')}"
    )
    # Metadata-cheap UPPER bound on r2 BEFORE the pair table exists: the
    # nearest single center cell holding >= k centers bounds the k-th
    # neighbor by its maxd2 (one min-agg over the cells-only cross — no
    # window, map-side partial). Pushing `mind2 <= r2ub` INTO the pair
    # join condition means the |pcells| x |ccells| cross (3.7M rows on the
    # 50k-center residue geometry) is never materialized or exchanged —
    # the nested-loop join emits only the ~1% of cell pairs that can
    # matter, and every window below runs on that pruned set. (Measured:
    # windowing the unpruned cross cost ~9-11s at local[32]; the whole
    # terminal now runs in a fraction of that.) Exact: r2 <= r2ub, so a
    # pair with mind2 > r2ub can neither define r2 (it sorts after it in
    # the cum window: maxd2 >= mind2 > r2ub >= r2) nor be a candidate.
    # one pass: the conditional min folds the ">= k centers" gate into the
    # aggregate, so pcells is referenced (and its distinct computed) once,
    # and page cells survive even when NO cell holds >= k centers
    # (r2ub = inf -> the pair join below degrades to the full cross).
    pbound = (
        pcells.crossJoin(F.broadcast(ccells))
        .withColumn("maxd2", F.expr(maxd2_e))
        .groupBy("cx", "cy")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("_n") >= k, F.col("maxd2"))),
                F.lit(float("inf")),
            ).alias("r2ub")
        )
    )
    pairs = (
        pbound.join(F.broadcast(ccells), F.expr(f"{mind2_e} <= r2ub"))
        .withColumn("mind2", F.expr(mind2_e))
        .withColumn("maxd2", F.expr(maxd2_e))
    )
    # r2 and the candidate filter FUSE into one Window stage: the running
    # count ordered by maxd2 and the per-cell min-over-threshold are both
    # window functions over the SAME (cx, cy) partitioning, so Catalyst
    # plans one exchange + one sorted pass — no groupBy/self-join round
    # trip re-materializing the pair table.
    wcell = Window.partitionBy("cx", "cy")
    wp = wcell.orderBy("maxd2")
    cand_cells = (
        pairs.withColumn("_cum", F.sum("_n").over(wp))
        .withColumn(
            "r2",
            F.coalesce(
                F.min(F.when(F.col("_cum") >= k, F.col("maxd2"))).over(wcell),
                F.lit(float("inf")),  # < k centers total: keep everything
            ),
        )
        .filter(F.col("mind2") <= F.col("r2"))
        .select("cx", "cy", "kx", "ky", "r2")
    )
    # tighten cell->cell to point(center)->cell: per candidate center q
    # and page cell P compute the point-to-cell MIN distance (pmind2: 0 if
    # q is over P) and MAX distance (pmaxd2: to P's farthest corner)
    cellcand = (
        cand_cells.join(cc, ["kx", "ky"])
        .withColumn("_pdx", F.expr(f"greatest(cx * {c} - clon, clon - (cx + 1) * {c}, 0D)"))
        .withColumn("_pdy", F.expr(f"greatest(cy * {c} - clat, clat - (cy + 1) * {c}, 0D)"))
        .withColumn("pmind2", F.col("_pdx") * F.col("_pdx") + F.col("_pdy") * F.col("_pdy"))
        .filter(F.col("pmind2") <= F.col("r2"))
        .withColumn("_mx", F.expr(f"greatest(clon - cx * {c}, (cx + 1) * {c} - clon)"))
        .withColumn("_my", F.expr(f"greatest(clat - cy * {c}, (cy + 1) * {c} - clat)"))
        .withColumn("pmaxd2", F.col("_mx") * F.col("_mx") + F.col("_my") * F.col("_my"))
    )
    # SECOND, per-CENTER tightening (the r5 terminal's dominant-cost fix):
    # r2pt(P) = k-th smallest pmaxd2 over P's candidate centers. At least
    # k centers lie within sqrt(r2pt) of EVERY page in P (each of those
    # k has pmaxd2 <= r2pt), so any center with pmind2 > r2pt can never
    # enter a top-k — and r2pt <= r2 always (the k cell-bound centers have
    # pmaxd2 <= r2), so this strictly shrinks the per-cell candidate set
    # (measured 26.8M -> 8.1M candidate pairs on the 50k-center residue:
    # the cell-level bound pays the full (|d|+1)-cell slack twice, the
    # point-level bound only the page-cell diagonal once). Same fusion as
    # r2: row_number + min-over-threshold in one Window stage, filter
    # inline — the terminal stays fully lazy with ZERO persists.
    wpt = wcell.orderBy("pmaxd2", "poly_id")
    tight = (
        cellcand.withColumn("_rn", F.row_number().over(wpt))
        .withColumn(
            "r2pt",
            F.coalesce(
                F.min(F.when(F.col("_rn") == k, F.col("pmaxd2"))).over(wcell),
                F.lit(float("inf")),  # < k candidates total: keep all
            ),
        )
        .filter(F.col("pmind2") <= F.col("r2pt"))
        .select("cx", "cy", "poly_id", "clon", "clat", F.col("r2pt").alias("r2"))
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    )
    # NOTE (r7): the broadcast knn_join moved to per-cell candidate ARRAYS,
    # but this terminal (and the partitioned levels) keeps the window form:
    # the pairs are already co-partitioned by the shuffle-hash join, so the
    # top-k is a codegen'd LOCAL sort with no exchange, and replacing it
    # with interpreted array kernels measured ~25% SLOWER at the 50k-center
    # bench point (ABBA-isolated 12.4s vs 9.6s) - the HOF interpreter costs
    # more than the in-partition sort it removes when nothing crosses the
    # wire either way.
    pag_s = pag.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(n_salt)))
    cand = _with_dist2(pag_s.join(tight.hint("shuffle_hash"), ["cx", "cy", "_salt"]))
    # any candidate beyond sqrt(r2pt) is provably outside the top-k (>= k
    # candidates sit within r2pt), so drop it before the sort
    cand = cand.filter(F.col("dist2") <= F.col("r2"))
    wk = Window.partitionBy("cx", "cy", "_salt", "url").orderBy("dist2", "poly_id")
    return (
        cand.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("url", "poly_id", "dist2", "rank")
    )


def knn_join_partitioned(
    geotagged: DataFrame,
    centers: DataFrame,
    k: int = 3,
    cell_deg: float | None = None,
    level_mults: tuple[float, ...] = (1.0,),
    n_salt: int = 4,
    n_centers: int | None = None,
) -> DataFrame:
    """Exact kNN, shuffle-both-sides path: for center tables too large to
    broadcast or collect (knn_join broadcasts the 3x3-neighbor table and
    resolves the residue with a driver-collected numpy kernel — both assume
    the dimension side fits one task's memory).

    Same provably-exact cell-neighbor fast path as knn_join, but the
    candidate join is a SHUFFLE hash join on (cell, salt): centers explode
    into their 3x3 neighborhood AND n_salt salt replicas, pages pick one
    salt by url hash — a hot cell spreads over n_salt reducers. Properties
    that keep the candidate-pair volume (the dominant cost) bounded and
    OFF the wire:

    - pairs never shuffle: a url has exactly one (cell, salt) key, so the
      shuffle hash join already co-locates each url's candidates and the
      top-k windows run partitioned by the join keys + url — Catalyst
      proves the child partitioning satisfies them, so the pairs are
      sorted in place, never exchanged;
    - provability pre-filter: only centers within w can appear in a
      provable top-k, so dist2 <= w^2 drops the rest before the sort;
    - optional coarse levels (level_mults entries > 1) use ring-pruned
      fine cells (c = w/8) covering the ~pi*w^2 ball instead of the
      (3w)^2 block.

    Everything the fine level(s) cannot prove goes to the cell-bound
    terminal (_knn_cell_bound_terminal): per-page-cell ADAPTIVE radii from
    cell-to-cell distance bounds, so the terminal's candidate volume is
    the sum of per-cell balls sized by the actual k-th-neighbor distance —
    not a globally-widened w-ball, not a cartesian fallback. The terminal
    always resolves (no residue, no driver-side widening loop, no counts:
    the whole plan is lazy). Output equals exact kNN; shares knn_join's
    oracle.
    """
    if n_centers is None:
        n_centers = centers.count()  # table-stats surrogate (see pip_join_auto)
    if cell_deg is None:
        cell_deg = min(KNN_CELL_DEG, max(2.0, (129900.0 / max(n_centers, 1)) ** 0.5))
    pages = geotagged.select("url", "lat", "lon")
    frames = []
    resolved = []
    remaining = pages

    def run_level(remaining, w):
        # At coarse widths the grid goes FINER than the proof radius: with
        # c == w the 3x3 neighborhood examines a (3w)^2 block while
        # provability only needs the w-ball (pi*w^2) — at the terminal
        # (out-of-band / polar) widths that is ~2-3x more candidate pairs
        # than necessary, and pair production is the cascade's dominant
        # cost. Fine cells (c = w/8) + ring-pruned offsets join only the
        # cells whose min distance to the page's cell is <= w; the
        # center-side explode grows to |offsets| rows per center, but that
        # stays in the millions where the pair production it avoids is in
        # the billions. Fine cells also spread hot coarse cells, so the
        # salt replication is redundant there.
        if w >= 4.0 * cell_deg:
            c = max(cell_deg, w / 8.0)
            offsets = _ring_offsets(w, c)
            salt = 1
        else:
            c = w
            offsets = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
            salt = n_salt
        cell = f"cast(floor(%s / {c}) as bigint)"
        pages_c = (
            remaining.withColumn("cx", F.expr(cell % "lon"))
            .withColumn("cy", F.expr(cell % "lat"))
            .withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(salt)))
        )
        off = F.explode(
            F.array(
                *[
                    F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
                    for di, dj in offsets
                ]
            )
        )
        neigh = (
            centers.withColumn("o", off)
            .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
            .selectExpr(
                "poly_id",
                "clon",
                "clat",
                "_salt as nsalt",
                f"{cell % 'clon'} + o.di as ncx",
                f"{cell % 'clat'} + o.dj as ncy",
            )
        )
        # LEFT OUTER join with the w-ball predicate INSIDE the join
        # condition — same restructure as knn_join: every page emerges
        # with its in-ball candidates or one null row, so pass/fail
        # routing is a filter on the window output instead of a url-keyed
        # anti-join re-shuffling the whole page table per level. The
        # shuffle_hash hint pins the join whose output partitioning is
        # HashPartitioning(cx, cy, _salt): the windows below reuse it, so
        # the candidate pairs (the cascade's dominant data volume) never
        # cross the wire — the top-k is a within-partition sort. (A
        # broadcast of the page side would leave the stream partitioned
        # by the center scan instead, forcing that exchange.) In-ball in
        # the join condition is also the provability pre-filter: only
        # centers within w can appear in a provable top-k.
        dist2_e = (
            "((lon - clon) * (lon - clon) + (lat - clat) * (lat - clat))"
        )
        cond = F.expr(
            f"cx = ncx AND cy = ncy AND _salt = nsalt AND {dist2_e} <= {w * w!r}"
        )
        cand = pages_c.join(neigh.hint("shuffle_hash"), cond, "left")
        cand = cand.withColumn("dist2", F.expr(dist2_e))  # null <=> no match
        # a url carries exactly ONE (cx, cy, _salt) key; windowing by the
        # join keys + url lets Catalyst prove the join's partitioning
        # satisfies the clustered distribution -> no extra exchange.
        wk = Window.partitionBy("cx", "cy", "_salt", "url").orderBy(
            "dist2", "poly_id"
        )
        wu = Window.partitionBy("cx", "cy", "_salt", "url")
        split = (
            cand.withColumn("rank", F.row_number().over(wk))
            .withColumn("_cnt", F.count("poly_id").over(wu))
            .filter(F.col("rank") <= k)
            .select("url", "lat", "lon", "poly_id", "dist2", "rank", "_cnt")
            .persist()
        )
        frames.append(split)
        resolved.append(
            split.filter(F.col("_cnt") >= k).select(
                "url", "poly_id", "dist2", "rank"
            )
        )
        return split.filter(
            (F.col("_cnt") < k) & (F.col("rank") == 1)
        ).select("url", "lat", "lon")

    w = cell_deg
    for m in level_mults:
        w = m * cell_deg
        if w >= 120.0:
            break
        remaining = run_level(remaining, w)

    # terminal: the cell-bound exact join resolves every unresolved page in
    # one pass with per-cell adaptive radii — no residue count, no widening
    # loop, no cartesian fallback, and the plan stays fully lazy. The bound
    # grid is coarser than the fine level (its pcells x ccells bound table
    # must stay metadata-sized even for plane-covering page sets).
    #
    # r7 width calibration (guide §1/§2): the residue is the SPARSE page
    # set (pages far from any center), whose k-th-neighbor distance scales
    # like n_centers^-1/2 — when the bound grid is much finer than that
    # scale, the terminal pays extra bound-window cells and candidate
    # replication for radii it cannot tighten. ABBA-alternated sweep at
    # local[32] sf0.1 (min/med of 3, same session, order-balanced):
    # 50k centers: c=4 8.68/8.84s, c=6 7.57/7.89s (c=2 35s, c=3 13s —
    # finer explodes the bound table); 200k: c=4 12.75 vs c=6 13.72;
    # 500k: c=4 19.1 vs c=6 23.5 — so the optimum tracks ~sqrt(1/n),
    # anchored at the 50k point (6 deg), capped at 6 so the 10k
    # calibration point keeps its measured 2*cell_deg width, and floored
    # by the old max(2*cell_deg, 4) for center tables past ~450k.
    term_c = max(
        2.0 * cell_deg,
        4.0,
        min(6.0, (1_800_000.0 / max(n_centers, 1)) ** 0.5),
    )
    out = _knn_cell_bound_terminal(remaining, centers, k, term_c, n_salt)
    for good in resolved:
        out = out.unionByName(good)
    return _attach_persists(out, frames)


def knn_join_auto(
    geotagged: DataFrame,
    centers: DataFrame,
    k: int = 3,
    n_centers: int | None = None,
) -> DataFrame:
    """Size-based chooser between the broadcast-hybrid and partitioned kNN
    plans (same contract as pip_join_auto). The routing threshold is
    parallelism-aware (broadcast_center_limit: per-core crossover x
    cores, capped by the driver-collect ceiling), calibrated by `python
    bench.py --calibration` (BENCH/CALIBRATION.md: the hybrid/partitioned
    sweep at 10k-500k centers, run at two core counts) — regenerate after
    touching either plan."""
    if n_centers is None:
        n_centers = centers.count()
    if n_centers <= broadcast_center_limit(centers.sparkSession):
        return knn_join(geotagged, centers, k, n_centers=n_centers)
    return knn_join_partitioned(geotagged, centers, k, n_centers=n_centers)
