"""Manual hybrid-vs-partitioned kNN crossover sweep (clearCache protocol)."""
import sys, time
sys.path.insert(0, ".")
from engine.pipeline.session import get_spark
from engine.pipeline import fixtures, joins

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF = "/root/testdata/sf0.1"
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="knncross")
spark.range(1000).count()
geo = fixtures.geotag_df(fixtures.pages_df(spark, SF))

for n in (10_000, 50_000, 100_000, 200_000, 500_000):
    centers = fixtures.polygon_centers_table_bulk(spark, n)
    for label, fn in (
        ("hybrid", joins.knn_join),
        ("partitioned", joins.knn_join_partitioned),
    ):
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = fn(geo, centers, k=3, n_centers=n)
            out.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            joins.free_persisted(out)
        print(f"CROSS n={n} {label}: {best:.2f}s", flush=True)
spark.stop()
