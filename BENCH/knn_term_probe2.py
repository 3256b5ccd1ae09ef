"""Warm-stage attribution for the improved partitioned kNN (run manually)."""
import sys, time
sys.path.insert(0, ".")
from engine.pipeline.session import get_spark
from engine.pipeline import fixtures, joins
from pyspark.sql import functions as F, Window

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = "/root/testdata/sf0.1"
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="knnterm2")
spark.range(1000).count()

N = 50_000
centers = fixtures.polygon_centers_table(spark, N)
geo = fixtures.geotag_df(fixtures.pages_df(spark, SF))
pages = geo.select("url", "lat", "lon").persist()

def t(name, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{name}: {time.perf_counter()-t0:.2f}s ({r})", flush=True)

t("pages_count", lambda: pages.count())

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
cand = pages_c.join(neigh.hint("shuffle_hash"), ["cx", "cy", "_salt"])
cand = joins._with_dist2(cand).filter(F.col("dist2") <= F.lit(w * w))
wk = Window.partitionBy("cx", "cy", "_salt", "url").orderBy("dist2", "poly_id")
top = cand.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= 3)
wu = Window.partitionBy("cx", "cy", "_salt", "url")
top = top.withColumn("_cnt", F.count("*").over(wu)).withColumn("_maxd", F.max("dist2").over(wu))
good = (top.filter((F.col("_cnt") == 3) & (F.col("_maxd") <= F.lit(w * w)))
        .select("url", "poly_id", "dist2", "rank").persist())
t("level1_good_noop", lambda: good.write.format("noop").mode("overwrite").save())
remaining = pages.join(good.select("url").distinct(), "url", "left_anti").persist()
t("remaining_count", lambda: remaining.count())
t("remaining_count_warm", lambda: remaining.count())

term = joins._knn_cell_bound_terminal(remaining, centers, 3, 4.0, 4)
t("terminal_noop_warm_inputs", lambda: term.write.format("noop").mode("overwrite").save())
# and the union write (resolved + terminal) to mimic the tail of the full job
out = term.unionByName(good)
t("union_noop", lambda: out.write.format("noop").mode("overwrite").save())
spark.stop()
