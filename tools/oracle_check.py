#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result) with pyarrow —
NOT through DuckDB — so the Spark-side dtypes survive exactly as the
driver sees them (round 1 lesson: reading both sides through DuckDB
coerced decimals to float64 on both sides and masked a driver-visible
type mismatch). Runs the matching SQL from oracle_sql.json in DuckDB
over views named after the testdata tables, sorts columns by name and
rows by all columns, and compares shape + values + dtype kind.

Any DECIMAL column surviving to a Spark output is a hard FAIL: the
convention is that final decimal renderings are cast to DOUBLE on both
sides (the driver's hash is type-preserving and DuckDB's pandas export
renders decimals as float64, so a Spark-side decimal can never
hash-match).
"""
import glob
import json
import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def read_spark(result_dir: str) -> pd.DataFrame:
    parts = sorted(glob.glob(f"{result_dir}/*.parquet"))
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


def decimal_cols(df: pd.DataFrame):
    bad = []
    for c in df.columns:
        if df[c].dtype.kind == "O":
            vals = df[c].dropna()
            if len(vals) and isinstance(vals.iloc[0], Decimal):
                bad.append(c)
    return bad


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = normalize(read_spark(f"{out_dir}/{name}"))
            oracle_df = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: harness error {e}")
            failures += 1
            continue
        dec = decimal_cols(spark_df)
        if dec:
            print(f"FAIL  {name}: Spark output has DECIMAL columns {dec} "
                  f"(cast final decimals to DOUBLE on both sides)")
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
        kind_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], oracle_df[c]
            # dtype KIND must agree (f vs f, i vs i, M vs M, O vs O):
            # the driver's hash is type-preserving, so a float column on
            # one side and an int/object on the other cannot match.
            if a.dtype.kind != b.dtype.kind:
                kind_cols.append(f"{c}:{a.dtype}/{b.dtype}")
                continue
            try:
                if a.dtype.kind == "f":
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                elif a.dtype.kind == "M":
                    ok = a.astype("datetime64[us]").equals(b.astype("datetime64[us]"))
                else:
                    ok = a.astype(str).equals(b.astype(str))
            except Exception:
                ok = a.astype(str).equals(b.astype(str))
            if not ok:
                mismatch_cols.append(c)
        if kind_cols:
            print(f"FAIL  {name}: dtype kind mismatch {kind_cols}")
            failures += 1
            continue
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
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            dec = decimal_cols(read_spark(d))
            note = f"  [WARN decimal cols {dec}]" if dec else ""
            print(f"ROWS  {name}: {n} rows (no oracle){note}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
