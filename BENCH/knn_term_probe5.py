"""Pruned-terminal piece timing against warm inputs (manual)."""
import sys, time
sys.path.insert(0, ".")
from engine.pipeline.session import get_spark
from engine.pipeline import fixtures, joins
from pyspark.sql import functions as F, Window

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = "/root/testdata/sf0.1"
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="knnterm5")
spark.range(1000).count()
N = 50_000
centers = fixtures.polygon_centers_table(spark, N)
geo = fixtures.geotag_df(fixtures.pages_df(spark, SF))
pages = geo.select("url", "lat", "lon").persist(); pages.count()

def t(name, fn):
    t0 = time.perf_counter(); r = fn()
    print(f"{name}: {time.perf_counter()-t0:.2f}s ({r})", flush=True)

cell_deg = 2.0
w = cell_deg
cell = f"cast(floor(%s / {w}) as bigint)"
pages_c = (pages.withColumn("cx", F.expr(cell % "lon")).withColumn("cy", F.expr(cell % "lat"))
           .withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(4))))
neigh = (centers.withColumn("di", F.explode(F.sequence(F.lit(-1), F.lit(1))))
         .withColumn("dj", F.explode(F.sequence(F.lit(-1), F.lit(1))))
         .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(3))))
         .selectExpr("poly_id", "clon", "clat", "_salt",
                     f"{cell % 'clon'} + di as cx", f"{cell % 'clat'} + dj as cy"))
cand0 = pages_c.join(neigh.hint("shuffle_hash"), ["cx", "cy", "_salt"])
cand0 = joins._with_dist2(cand0).filter(F.col("dist2") <= F.lit(w * w))
wk0 = Window.partitionBy("cx", "cy", "_salt", "url").orderBy("dist2", "poly_id")
top0 = cand0.withColumn("rank", F.row_number().over(wk0)).filter(F.col("rank") <= 3)
wu0 = Window.partitionBy("cx", "cy", "_salt", "url")
top0 = top0.withColumn("_cnt", F.count("*").over(wu0)).withColumn("_maxd", F.max("dist2").over(wu0))
good = (top0.filter((F.col("_cnt") == 3) & (F.col("_maxd") <= F.lit(w * w)))
        .select("url", "poly_id", "dist2", "rank").persist())
good.count()
remaining = pages.join(good.select("url").distinct(), "url", "left_anti").persist()
remaining.count()

c, k, n_salt = 4.0, 3, 4
cellx = f"cast(floor(%s / {c}) as bigint)"
pag = remaining.withColumn("cx", F.expr(cellx % "lon")).withColumn("cy", F.expr(cellx % "lat"))
pcells = pag.select("cx", "cy").distinct()
t("pcells", lambda: pcells.count())
cc = centers.selectExpr("poly_id", "clon", "clat", f"{cellx % 'clon'} as kx", f"{cellx % 'clat'} as ky")
ccells = cc.groupBy("kx", "ky").agg(F.count("*").alias("_n"))
dmin = lambda a, b: f"(greatest(abs({a} - {b}) - 1L, 0L) * {c})"
dmax = lambda a, b: f"((abs({a} - {b}) + 1L) * {c})"
mind2_e = f"{dmin('cx','kx')} * {dmin('cx','kx')} + {dmin('cy','ky')} * {dmin('cy','ky')}"
maxd2_e = f"{dmax('cx','kx')} * {dmax('cx','kx')} + {dmax('cy','ky')} * {dmax('cy','ky')}"
ccells_k = ccells.filter(F.col("_n") >= k)
r2ub = (pcells.crossJoin(F.broadcast(ccells_k)).withColumn("maxd2", F.expr(maxd2_e))
        .groupBy("cx", "cy").agg(F.min("maxd2").alias("r2ub")))
t("r2ub", lambda: r2ub.count())
pbound = pcells.join(F.broadcast(r2ub), ["cx", "cy"], "left").withColumn(
    "r2ub", F.coalesce(F.col("r2ub"), F.lit(float("inf"))))
pairs = (pbound.join(F.broadcast(ccells), F.expr(f"{mind2_e} <= r2ub"))
         .withColumn("mind2", F.expr(mind2_e)).withColumn("maxd2", F.expr(maxd2_e)))
t("pairs_pruned", lambda: pairs.count())
wcell = Window.partitionBy("cx", "cy")
wp = wcell.orderBy("maxd2")
cand_cells = (pairs.withColumn("_cum", F.sum("_n").over(wp))
    .withColumn("r2", F.coalesce(F.min(F.when(F.col("_cum") >= k, F.col("maxd2"))).over(wcell), F.lit(float("inf"))))
    .filter(F.col("mind2") <= F.col("r2")).select("cx", "cy", "kx", "ky", "r2"))
t("cand_cells", lambda: cand_cells.count())
cellcand = (cand_cells.join(cc, ["kx", "ky"])
    .withColumn("_pdx", F.expr(f"greatest(cx * {c} - clon, clon - (cx + 1) * {c}, 0D)"))
    .withColumn("_pdy", F.expr(f"greatest(cy * {c} - clat, clat - (cy + 1) * {c}, 0D)"))
    .withColumn("pmind2", F.col("_pdx") * F.col("_pdx") + F.col("_pdy") * F.col("_pdy"))
    .filter(F.col("pmind2") <= F.col("r2"))
    .withColumn("_mx", F.expr(f"greatest(clon - cx * {c}, (cx + 1) * {c} - clon)"))
    .withColumn("_my", F.expr(f"greatest(clat - cy * {c}, (cy + 1) * {c} - clat)"))
    .withColumn("pmaxd2", F.col("_mx") * F.col("_mx") + F.col("_my") * F.col("_my")))
t("cellcand", lambda: cellcand.count())
wpt = wcell.orderBy("pmaxd2", "poly_id")
tight = (cellcand.withColumn("_rn", F.row_number().over(wpt))
    .withColumn("r2pt", F.coalesce(F.min(F.when(F.col("_rn") == k, F.col("pmaxd2"))).over(wcell), F.lit(float("inf"))))
    .filter(F.col("pmind2") <= F.col("r2pt"))
    .select("cx", "cy", "poly_id", "clon", "clat", F.col("r2pt").alias("r2"))
    .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))))
t("tight", lambda: tight.count())
pag_s = pag.withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(n_salt)))
fj = joins._with_dist2(pag_s.join(tight.hint("shuffle_hash"), ["cx", "cy", "_salt"]))
fj = fj.filter(F.col("dist2") <= F.col("r2"))
t("fact_pairs", lambda: fj.count())
wk2 = Window.partitionBy("cx", "cy", "_salt", "url").orderBy("dist2", "poly_id")
out = (fj.withColumn("rank", F.row_number().over(wk2)).filter(F.col("rank") <= k)
       .select("url", "poly_id", "dist2", "rank"))
t("full_noop", lambda: out.write.format("noop").mode("overwrite").save())
t("full_noop2", lambda: out.write.format("noop").mode("overwrite").save())
spark.stop()
