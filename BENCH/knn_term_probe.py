"""Terminal-stage microprobe: candidate volume + stage costs of
_knn_cell_bound_terminal on the true level-1 residue (50k centers, sf0.1).
Run: python BENCH/knn_term_probe.py [cpus]
"""
import sys
import time

sys.path.insert(0, ".")

from engine.pipeline.session import get_spark
from engine.pipeline import fixtures, joins
from pyspark.sql import functions as F, Window

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = "/root/testdata/sf0.1"

spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="knnterm")
spark.range(1000).count()

N = 50_000
centers = fixtures.polygon_centers_table(spark, N)
geo = fixtures.geotag_df(fixtures.pages_df(spark, SF))

# page lat extent vs center lat extent
print(geo.agg(F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")).collect())
print(centers.agg(F.min("clat"), F.max("clat")).collect())

cell_deg = 2.0
pages = geo.select("url", "lat", "lon").persist()
pages.count()

w = cell_deg
cell = f"cast(floor(%s / {w}) as bigint)"
pages_c = (
    pages.withColumn("cx", F.expr(cell % "lon"))
    .withColumn("cy", F.expr(cell % "lat"))
    .withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(4)))
)
neigh = (
    centers.withColumn("di", F.explode(F.sequence(F.lit(-1), F.lit(1))))
    .withColumn("dj", F.explode(F.sequence(F.lit(-1), F.lit(1))))
    .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(3))))
    .selectExpr(
        "poly_id", "clon", "clat", "_salt",
        f"{cell % 'clon'} + di as cx",
        f"{cell % 'clat'} + dj as cy",
    )
)
cand = pages_c.join(neigh.hint("shuffle_hash"), ["cx", "cy", "_salt"])
cand = joins._with_dist2(cand).filter(F.col("dist2") <= F.lit(w * w))
wk = Window.partitionBy("cx", "cy", "_salt", "url").orderBy("dist2", "poly_id")
top = cand.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= 3)
wu = Window.partitionBy("cx", "cy", "_salt", "url")
top = top.withColumn("_cnt", F.count("*").over(wu)).withColumn("_maxd", F.max("dist2").over(wu))
good = top.filter((F.col("_cnt") == 3) & (F.col("_maxd") <= F.lit(w * w))).select("url")
remaining = pages.join(good.distinct(), "url", "left_anti").persist()
print("remaining:", remaining.count())
print("remaining polar (|lat|>60):", remaining.filter(F.abs(F.col("lat")) > 60).count())

# --- dissect the terminal at term_c = 4 ---
c = 4.0
k = 3
n_salt = 4
cellx = f"cast(floor(%s / {c}) as bigint)"
pag = remaining.withColumn("cx", F.expr(cellx % "lon")).withColumn("cy", F.expr(cellx % "lat"))
pcells = pag.select("cx", "cy").distinct()
cc = centers.selectExpr(
    "poly_id", "clon", "clat", f"{cellx % 'clon'} as kx", f"{cellx % 'clat'} as ky"
)
ccells = cc.groupBy("kx", "ky").agg(F.count("*").alias("_n"))
print("pcells:", pcells.count(), "ccells:", ccells.count())

dmin = lambda a, b: f"(greatest(abs({a} - {b}) - 1L, 0L) * {c})"
dmax = lambda a, b: f"((abs({a} - {b}) + 1L) * {c})"
pairs = (
    pcells.crossJoin(F.broadcast(ccells))
    .withColumn("mind2", F.expr(f"{dmin('cx','kx')} * {dmin('cx','kx')} + {dmin('cy','ky')} * {dmin('cy','ky')}"))
    .withColumn("maxd2", F.expr(f"{dmax('cx','kx')} * {dmax('cx','kx')} + {dmax('cy','ky')} * {dmax('cy','ky')}"))
)
wp = Window.partitionBy("cx", "cy").orderBy("maxd2")
r2 = (
    pairs.withColumn("_cum", F.sum("_n").over(wp))
    .filter(F.col("_cum") >= k)
    .groupBy("cx", "cy")
    .agg(F.min("maxd2").alias("r2"))
)
cand_cells = (
    pairs.join(r2, ["cx", "cy"], "left")
    .withColumn("r2", F.coalesce(F.col("r2"), F.lit(float("inf"))))
    .filter(F.col("mind2") <= F.col("r2"))
    .select("cx", "cy", "kx", "ky", "r2")
)
t0 = time.perf_counter()
print("cand_cells rows:", cand_cells.count(), f"({time.perf_counter()-t0:.2f}s)")

cellcand = (
    cand_cells.join(cc, ["kx", "ky"])
    .withColumn("_pdx", F.expr(f"greatest(cx * {c} - clon, clon - (cx + 1) * {c}, 0D)"))
    .withColumn("_pdy", F.expr(f"greatest(cy * {c} - clat, clat - (cy + 1) * {c}, 0D)"))
    .filter(F.col("_pdx") * F.col("_pdx") + F.col("_pdy") * F.col("_pdy") <= F.col("r2"))
    .select("cx", "cy", "poly_id", "clon", "clat", "r2")
)
t0 = time.perf_counter()
n_cellcand = cellcand.count()
print("cellcand (per page-cell candidate centers):", n_cellcand, f"({time.perf_counter()-t0:.2f}s)")

# per-center tightened radius: k-th smallest point-to-cell MAX distance
pmax = (
    cellcand
    .withColumn("_mx", F.expr(f"greatest(clon - cx * {c}, (cx + 1) * {c} - clon)"))
    .withColumn("_my", F.expr(f"greatest(clat - cy * {c}, (cy + 1) * {c} - clat)"))
    .withColumn("pmaxd2", F.col("_mx") * F.col("_mx") + F.col("_my") * F.col("_my"))
    .withColumn("pmind2", F.expr(
        f"pow(greatest(cx * {c} - clon, clon - (cx + 1) * {c}, 0D), 2)"
        f" + pow(greatest(cy * {c} - clat, clat - (cy + 1) * {c}, 0D), 2)"))
)
wpc = Window.partitionBy("cx", "cy").orderBy("pmaxd2")
r2pt = (
    pmax.withColumn("_rn", F.row_number().over(wpc))
    .filter(F.col("_rn") == k)
    .select("cx", "cy", F.col("pmaxd2").alias("r2pt"))
)
tight = pmax.join(r2pt, ["cx", "cy"], "left").withColumn(
    "r2pt", F.coalesce(F.col("r2pt"), F.lit(float("inf")))
).filter(F.col("pmind2") <= F.col("r2pt"))
t0 = time.perf_counter()
n_tight = tight.count()
print("tightened cellcand:", n_tight, f"({time.perf_counter()-t0:.2f}s)")

# fact-join volume now vs tightened
pag_s = pag.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(n_salt)))
cc_now = cellcand.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
f_now = joins._with_dist2(pag_s.join(cc_now.hint("shuffle_hash"), ["cx", "cy", "_salt"]))
t0 = time.perf_counter()
print("fact pairs (current, pre-r2-filter):", f_now.count(), f"({time.perf_counter()-t0:.2f}s)")
t0 = time.perf_counter()
print("fact pairs (current, post-r2-filter):", f_now.filter(F.col("dist2") <= F.col("r2")).count(), f"({time.perf_counter()-t0:.2f}s)")

cc_t = tight.select("cx", "cy", "poly_id", "clon", "clat", F.col("r2pt").alias("r2")).withColumn(
    "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
)
f_t = joins._with_dist2(pag_s.join(cc_t.hint("shuffle_hash"), ["cx", "cy", "_salt"]))
t0 = time.perf_counter()
print("fact pairs (tightened, post-r2pt-filter):", f_t.filter(F.col("dist2") <= F.col("r2")).count(), f"({time.perf_counter()-t0:.2f}s)")

spark.stop()
