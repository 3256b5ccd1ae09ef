"""Driver-mirror correctness sweep: run EVERY registry query on Spark and
its DuckDB oracle at an arbitrary SF (default sf0.01, the driver's gate
scale) and compare rows / schema / values exactly. Usage:

    python BENCH/validate_sf001.py [/root/testdata/sf0.01]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from engine.pipeline.queries import REGISTRY
    from engine.pipeline.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16, app_name="validate")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name, (fn, sql_fn) in REGISTRY.items():
        if sql_fn is None:
            print(f"{name}: NO ORACLE")
            continue
        got = normalize(fn(spark, sf_dir).toPandas())
        want = normalize(con.execute(sql_fn(sf_dir)).df())
        ok = len(got) == len(want) and list(got.columns) == list(want.columns)
        if ok:
            for c in got.columns:
                g, w = got[c], want[c]
                eq = (g == w) | (g.isna() & w.isna())
                if not eq.all():
                    ok = False
                    break
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(got)} rows)")
        bad += 0 if ok else 1
    spark.stop()
    print(f"done: {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
