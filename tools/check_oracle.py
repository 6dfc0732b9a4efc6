"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()`` twin
through DuckDB on the same parquet tables, then compares:
  - row count
  - column names (sorted)
  - values, exactly (after sorting columns by name and rows by all columns)

Exact-match here implies any order-insensitive hashing scheme passes.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = canonicalize(spark_pdf), canonicalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = sv.astype(float).to_numpy()
            da = dv.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(da)
            eq = (sa == da) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                diffs = np.abs(sa[~eq] - da[~eq])
                problems.append(
                    f"col {c}: {bad} value diffs, max abs diff {np.nanmax(diffs):.3e}"
                )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {(~eq).sum()} diffs, first at row {idx}: "
                    f"spark={sv[idx]!r} duck={dv[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from etl_school_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duck_connection(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()

    failures, rowless = 0, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            rowless.append((name, len(spark_pdf)))
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle — rows-only check)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s, {len(spark_pdf)} rows)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"ok    {name} ({dt:.1f}s, {len(spark_pdf)} rows)")

    print(f"\n{failures} failures; {len(rowless)} rows-only checks")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
