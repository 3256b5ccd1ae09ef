"""Terminal-only kNN (no cascade) over ALL pages at several grid widths."""
import sys, time
sys.path.insert(0, ".")
from engine.pipeline.session import get_spark
from engine.pipeline import fixtures, joins
from pyspark.sql import functions as F

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = "/root/testdata/sf0.1"
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="knnonly")
spark.range(1000).count()
N = 50_000
centers = fixtures.polygon_centers_table(spark, N)
geo = fixtures.geotag_df(fixtures.pages_df(spark, SF))

def t(name, fn):
    t0 = time.perf_counter(); r = fn()
    print(f"{name}: {time.perf_counter()-t0:.2f}s ({r})", flush=True)

for c in (2.0, 3.0, 4.0):
    for rep in range(2):
        spark.catalog.clearCache()
        pages = geo.select("url", "lat", "lon")
        out = joins._knn_cell_bound_terminal(pages, centers, 3, c, 4)
        t(f"terminal_only_c{c}_r{rep}", lambda: out.write.format("noop").mode("overwrite").save())
    t(f"count_c{c}", lambda: out.count())
spark.stop()
