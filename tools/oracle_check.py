"""Local replica of the driver's correctness gate: run each catalog query on
Spark AND its oracle SQL on DuckDB over the same parquet tables, compare
row-count + (order-insensitive) values column-name-sorted.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for comparison: columns sorted by name, values normalized
    (timestamps → µs strings, floats rounded to 9 significant-ish dp),
    rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("us").astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else round(float(v), 9))
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(name: str, spark_df, con) -> tuple[bool, str]:
    import __spark_entry__ as entry

    oracle = entry.oracle_sql().get(name)
    sp = canon(spark_df.toPandas())
    if oracle is None:
        return True, f"rows-only ({len(sp)} rows)"
    du = canon(con.sql(oracle).df())
    if list(sp.columns) != list(du.columns):
        return False, f"column mismatch: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return False, f"row count mismatch: spark={len(sp)} duck={len(du)}"
    eq = sp.equals(du)
    if not eq:
        neq = (sp != du) & ~(sp.isna() & du.isna())
        bad_cols = [c for c in sp.columns if neq[c].any()]
        detail = []
        for c in bad_cols[:3]:
            idx = neq[c].idxmax()
            detail.append(f"{c}[{idx}]: spark={sp[c][idx]!r} duck={du[c][idx]!r}")
        return False, f"value mismatch in {bad_cols}: " + "; ".join(detail)
    return True, f"OK ({len(sp)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs = entry.queries()
    names = sys.argv[2:] or sorted(qs)
    failures = []
    for name in names:
        try:
            ok, msg = compare(name, qs[name](spark, sf_dir), con)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(exc).__name__}: {exc}"
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg}")
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    if failures:
        print("failed:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
