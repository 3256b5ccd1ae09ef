"""Mirror of the driver's correctness gate: every SQL-expressible query in
the registry runs on Spark AND DuckDB at sf0.001; results must match
exactly (row count, schema-insensitive column order, values)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from engine.pipeline.queries import REGISTRY

from .conftest import SF_DIR


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
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


SQL_CASES = [name for name, (_, sql) in REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name", SQL_CASES)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql_fn = REGISTRY[name]
    got = _normalize(fn(spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(sql_fn(SF_DIR)).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: cols {list(got.columns)} != {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            both_nan = g.isna() & w.isna()
            eq = (g == w) | both_nan
        else:
            eq = (g == w) | (g.isna() & w.isna())
        bad = ~eq
        assert not bad.any(), (
            f"{name}.{c}: {int(bad.sum())} mismatches, first: "
            f"{got[bad].head(3).to_dict()} vs {want[bad].head(3).to_dict()}"
        )


def test_mvt_rows_only(spark):
    """Non-SQL ops: rows-only sanity like the driver's weaker check."""
    fn, _ = REGISTRY["mvt_tiles_z0_4"]
    pdf = fn(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_features"] > 0).all()
    assert set(pdf["z"].unique()) == {0, 1, 2, 3, 4}
    # z0 tile holds every page exactly once
    from engine.pipeline.fixtures import replicas_for

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert pdf.loc[pdf.z == 0, "n_features"].sum() == len(docs) * replicas_for(SF_DIR)


def test_mvt_verify_all_ok(spark):
    fn, _ = REGISTRY["mvt_roundtrip_verify"]
    pdf = fn(spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert pdf["ok"].all()
    assert (pdf["n_features"] > 0).all()  # decoded counts (oracle-checked)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    names = set(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= names
