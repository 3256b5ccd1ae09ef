"""One-off profiling harness for the partitioned kNN cascade at 50k
centers: times the level-1 pass and the terminal separately so the
optimization target (VERDICT r5 item 3) is attributable. Not part of the
bench protocol; run manually:

    python BENCH/knn_profile.py [cpus]
"""
import sys
import time

sys.path.insert(0, ".")

from engine.pipeline.session import get_spark
from engine.pipeline import fixtures, joins
from pyspark.sql import functions as F

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = "/root/testdata/sf0.1"

spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="knnprof")
spark.range(1000).count()

N = 50_000
centers = fixtures.polygon_centers_table(spark, N)
geo = fixtures.geotag_df(fixtures.pages_df(spark, SF))


def timed(name, fn):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.2f}s  ({out})", flush=True)
    return out


# full job, twice (clearCache protocol)
for i in range(2):
    timed(
        f"full_partitioned_{i}",
        lambda: joins.knn_join_partitioned(geo, centers, k=3, n_centers=N)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

# level-1 resolution rate: how many pages fall to the terminal?
cell_deg = min(joins.KNN_CELL_DEG, max(2.0, (129900.0 / N) ** 0.5))
print("cell_deg:", cell_deg)

pages = geo.select("url", "lat", "lon").persist()
n_pages = pages.count()
print("pages:", n_pages)

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
timed("level1_cand_count", lambda: cand.count())

from pyspark.sql import Window

wk = Window.partitionBy("cx", "cy", "_salt", "url").orderBy("dist2", "poly_id")
top = cand.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= 3)
wu = Window.partitionBy("cx", "cy", "_salt", "url")
top = top.withColumn("_cnt", F.count("*").over(wu)).withColumn("_maxd", F.max("dist2").over(wu))
good = top.filter((F.col("_cnt") == 3) & (F.col("_maxd") <= F.lit(w * w))).select("url")
timed("level1_good_urls", lambda: good.distinct().count())

remaining = pages.join(good.distinct(), "url", "left_anti").persist()
n_rem = timed("remaining_count", lambda: remaining.count())

# terminal alone on the true remaining set
term_c = max(2.0 * cell_deg, 4.0)
print("term_c:", term_c)
term = joins._knn_cell_bound_terminal(remaining, centers, 3, term_c, 4)
timed("terminal_noop", lambda: term.write.format("noop").mode("overwrite").save())
timed("terminal_count", lambda: term.count())

# terminal candidate volume
pag = remaining.withColumn("cx", F.expr(f"cast(floor(lon / {term_c}) as bigint)")).withColumn(
    "cy", F.expr(f"cast(floor(lat / {term_c}) as bigint)")
)
print("remaining cells:", pag.select("cx", "cy").distinct().count())

spark.stop()
