#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the
testdata tables, sorts columns by name and rows by all columns, and
compares shape + values (with a small report of dtype differences).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = normalize(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            oracle_df = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: harness error {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL  {name}: columns {list(spark_df.columns)} vs {list(oracle_df.columns)}")
            failures += 1
            continue
        if spark_df.shape != oracle_df.shape:
            print(f"FAIL  {name}: shape {spark_df.shape} vs {oracle_df.shape}")
            failures += 1
            continue
        mismatch_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], oracle_df[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    ok = a.astype(str).equals(b.astype(str))
            except Exception:
                ok = a.astype(str).equals(b.astype(str))
            if not ok:
                mismatch_cols.append(c)
        if mismatch_cols:
            print(f"FAIL  {name}: value mismatch in {mismatch_cols}")
            for c in mismatch_cols[:2]:
                neq = spark_df[c].astype(str) != oracle_df[c].astype(str)
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"      row {i} col {c}: spark={spark_df[c][i]!r} oracle={oracle_df[c][i]!r}")
            failures += 1
        else:
            dt = [f"{c}:{spark_df[c].dtype}/{oracle_df[c].dtype}"
                  for c in spark_df.columns
                  if str(spark_df[c].dtype) != str(oracle_df[c].dtype)]
            note = f"  [dtypes differ: {', '.join(dt)}]" if dt else ""
            print(f"OK    {name}: {spark_df.shape[0]} rows{note}")
    # rows-only queries (no oracle)
    import glob
    import os
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS  {name}: {n} rows (no oracle)")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
