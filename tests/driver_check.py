"""Standalone driver-contract check (the verify-skill recipe as a script):
vanilla SparkSession, every queries() entry vs oracle_sql() via DuckDB.

Usage: python tests/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = e.entry(spark).collect()
    print(f"entry rows: {len(rows)}")
    assert rows, "entry() returned no rows"

    fails = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        sql = e.oracle_sql().get(name)
        raw_got = fn(spark, sf_dir).toPandas()
        got = norm(raw_got)
        if sql is None:
            print(f"{name}: rows-only ({len(got)} rows)")
            continue
        raw_want = con.execute(sql).df()
        # The driver hashes raw values, so an int64 column on one side
        # rendered float64 on the other (e.g. DuckDB HUGEINT sums) is a
        # hash mismatch even when values agree — flag dtype-kind drift.
        kind_drift = [
            c
            for c in raw_got.columns
            if c in raw_want.columns
            and raw_want[c].dtype.kind != raw_got[c].dtype.kind
            and not {raw_want[c].dtype.kind, raw_got[c].dtype.kind} <= {"i", "u"}
        ]
        # columns present on only one side are invisible to kind_drift;
        # surface the set mismatch explicitly (the value compare below
        # still fails on it, but this names the columns)
        col_mismatch = set(raw_got.columns) ^ set(raw_want.columns)
        if col_mismatch:
            print(f"{name}: COLUMN-SET MISMATCH {sorted(col_mismatch)}")
        want = norm(raw_want)
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, atol=0, rtol=0
            )
            if kind_drift:
                fails.append(name)
                print(f"{name}: DTYPE-KIND DRIFT {kind_drift} (values match)")
            else:
                print(f"{name}: MATCH ({len(got)} rows)")
        except AssertionError as ex:
            fails.append(name)
            print(f"{name}: MISMATCH -> {str(ex)[:200]}")
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
