#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <outDir> <sfDir>

Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares: column names (sorted), row count, and
cell values (rows sorted by all columns). Mirrors the driver's
sort-columns-by-name-then-hash compare, but prints diffs for debugging.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates arrive as datetime.date from duckdb, Timestamps via parquet
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLS spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
        else:
            ok = (av.astype(str).where(~av.isna(), "<NA>") ==
                  bv.astype(str).where(~bv.isna(), "<NA>")).all()
        if not ok:
            mask = ~(((av.isna()) & (bv.isna())) |
                     (av.astype(str) == bv.astype(str)))
            i = mask[mask].index[:3].tolist()
            return (f"VALUES col={c} rows={i} "
                    f"spark={av.iloc[i].tolist()} oracle={bv.iloc[i].tolist()}")
    return ""


def main() -> None:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Read the Spark output through DuckDB too, so both sides get
            # identical parquet-type → pandas mapping (dates, timestamps).
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        diff = cmp(name, got, want)
        if diff:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
