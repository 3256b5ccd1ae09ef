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


def _dtype_class(dtype) -> str:
    """Coarse dtype class used by the driver's hash protocol: a value-level
    match across classes (e.g. DuckDB HUGEINT->float64 vs Spark bigint)
    still hash-mismatches, so the mirror must be strict about the class."""
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return "other"


def _assert_dtype_classes_match(name: str, got_raw: pd.DataFrame, want_raw: pd.DataFrame):
    """Driver-faithful dtype gate: Spark int column => oracle must deliver an
    integer dtype (not HUGEINT-degraded float64 or narrowed int32-vs-float),
    and likewise for bool/datetime/float. Runs on RAW toPandas()/duckdb
    frames, before any normalization coercion can mask the divergence."""
    for c in got_raw.columns:
        if c not in want_raw.columns:
            continue  # column-set mismatch is reported by the main assert
        g_cls, w_cls = _dtype_class(got_raw[c].dtype), _dtype_class(want_raw[c].dtype)
        assert g_cls == w_cls, (
            f"{name}.{c}: dtype class mismatch — Spark {got_raw[c].dtype} "
            f"({g_cls}) vs oracle {want_raw[c].dtype} ({w_cls}); the driver "
            f"hash is dtype-sensitive, CAST the oracle SQL output"
        )


SQL_CASES = [name for name, (_, sql) in REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name", SQL_CASES)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql_fn = REGISTRY[name]
    got_raw = fn(spark, SF_DIR).toPandas()
    want_raw = ddb.execute(sql_fn(SF_DIR)).df()
    _assert_dtype_classes_match(name, got_raw, want_raw)
    got = _normalize(got_raw)
    want = _normalize(want_raw)
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


def test_dtype_gate_catches_hugeint(ddb):
    """A deliberately-HUGEINT oracle column (DuckDB SUM(BIGINT) -> float64 in
    pandas) must fail the mirror even though values match — this is the exact
    class that shipped round-4's only red (mvt_polygon_coords)."""
    want_raw = ddb.execute(
        "SELECT SUM(v) AS s FROM (SELECT CAST(1 AS BIGINT) AS v)"
    ).df()
    got_raw = pd.DataFrame({"s": pd.array([1], dtype="int64")})
    assert _dtype_class(want_raw["s"].dtype) != "int"  # HUGEINT degraded
    with pytest.raises(AssertionError, match="dtype class mismatch"):
        _assert_dtype_classes_match("hugeint_demo", got_raw, want_raw)
    # and the CAST convention fixes it
    want_cast = ddb.execute(
        "SELECT CAST(SUM(v) AS BIGINT) AS s FROM (SELECT CAST(1 AS BIGINT) AS v)"
    ).df()
    _assert_dtype_classes_match("hugeint_demo", got_raw, want_cast)


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
