"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Throughput counters (tiles/sec, joined rows/sec — BASELINE.json metric) are
included as extra keys. Wall-clock excludes JVM startup (timed inside).

`python bench.py --scaling` additionally runs the headline subset at N and
4N cores (fresh JVM each, via subprocess) and writes BENCH/BASELINE.md with
throughput at both levels + scaling efficiency (the sandbox substitute for
N vs 4N executors, SURVEY §4.4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline throughput cases used for the scaling comparison
SCALING_CASES = ("mvt_pyramid_z0_14", "pip_join")


def _cases():
    from engine.pipeline import queries as Q

    return [
        ("geotag", Q.q_geotag),
        ("tile_counts_pyramid", Q.q_tile_counts),
        ("cell_index_z12", Q.q_cell_index),
        ("pip_join", Q.q_pip_join),
        ("knn_3", Q.q_knn),
        ("mvt_pyramid_z0_14", lambda s, d: _mvt_pyramid(s, d, 0, 14)),
        ("mvt_polygon_tiles_z0_6", lambda s, d: Q.q_mvt_polygon_tiles(s, d)),
        ("near_dup_jaccard", Q.q_near_dup),
        ("ann_topk_maponly", Q.q_ann_maponly),
        ("media_metadata", Q.q_media_metadata),
    ]


def run_once(case_filter=None) -> dict:
    from engine.pipeline.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS, app_name="bench"
    )
    spark.range(1000).count()  # session warm-up (codegen, executors)

    results: dict[str, float] = {}
    counters: dict[str, float] = {}
    t_total = 0.0
    for name, builder in _cases():
        if case_filter and name not in case_filter:
            continue
        df = builder(spark, SF_DIR)
        # noop sink: full materialization of every column (groupBy().count()
        # would let Catalyst prune the computed columns away)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = round(dt, 3)
        counters[f"{name}_rows"] = df.count()
        t_total += dt

    if "mvt_pyramid_z0_14" in results:
        counters["tiles_per_sec"] = round(
            counters["mvt_pyramid_z0_14_rows"] / results["mvt_pyramid_z0_14"], 1
        )
        # features encoded = pages x 15 zoom levels
        counters["encoded_features_per_sec"] = round(
            counters["geotag_rows"] * 15 / results["mvt_pyramid_z0_14"], 1
        ) if "geotag" in results else None
    if "pip_join" in results:
        counters["joined_rows_per_sec"] = round(
            counters["pip_join_rows"] / results["pip_join"], 1
        )

    out = {
        "metric": "tiles/sec + joined rows/sec, z0-z14 MVT pyramid + PIP/kNN joins + dedup/ANN",
        "value": round(t_total, 3),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "cpus": CPUS,
        "counters": {k: v for k, v in counters.items() if v is not None},
    }
    spark.stop()
    return out


def _mvt_pyramid(spark, sf_dir, z_min, z_max):
    from pyspark.sql import functions as F

    from engine.pipeline import fixtures, index, tiler

    geo = fixtures.geotag_df(fixtures.pages_df(spark, sf_dir))
    df = index.with_tiles(index.with_unit(geo), z_min, z_max)
    df = df.withColumn("feature_id", F.expr(index.feature_id_expr("spark")))
    return tiler.encode_point_tiles(df)


def _subprocess_run(cpus: int, cases) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cases", ",".join(cases)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def scaling_report(n: int = 8) -> None:
    """Same job at local[N] and local[4N] on identical input; efficiency =
    throughput(4N) / (4 * throughput(N)). North-rule target >= 0.8."""
    lo = _subprocess_run(n, SCALING_CASES)
    hi = _subprocess_run(4 * n, SCALING_CASES)
    lines = [
        "# BENCH — scaling evidence (N vs 4N cores, sandbox substitute for executors)",
        "",
        f"Input: `{SF_DIR}` (identical for both runs; fresh JVM each).",
        f"N = {n} cores (`local[{n}]`) vs 4N = {4 * n} (`local[{4 * n}]`).",
        "",
        "| case | rows | t(N) s | t(4N) s | X(N) rows/s | X(4N) rows/s | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = []
    for case in SCALING_CASES:
        rows = lo["counters"][f"{case}_rows"]
        t_lo, t_hi = lo["queries"][case], hi["queries"][case]
        x_lo, x_hi = rows / t_lo, rows / t_hi
        eff = x_hi / (4 * x_lo)
        effs.append(eff)
        lines.append(
            f"| {case} | {rows} | {t_lo:.2f} | {t_hi:.2f} | {x_lo:,.0f} | {x_hi:,.0f} | {eff:.2f} |"
        )
    lines += [
        "",
        f"Mean efficiency: **{sum(effs) / len(effs):.2f}** (target >= 0.8, BASELINE.json north_rule).",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(lo),
        json.dumps(hi),
        "```",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"scaling_efficiency": round(sum(effs) / len(effs), 3),
                      "per_case": {c: round(e, 3) for c, e in zip(SCALING_CASES, effs)}}))


def main() -> None:
    if "--scaling" in sys.argv:
        scaling_report()
        return
    case_filter = None
    if "--cases" in sys.argv:
        case_filter = set(sys.argv[sys.argv.index("--cases") + 1].split(","))
    print(json.dumps(run_once(case_filter)))


if __name__ == "__main__":
    main()
