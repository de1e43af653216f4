"""Targeted oracle verify: run a subset of registered queries against the
DuckDB oracle with a vanilla session (verify-skill recipe).

Usage: python tools/verify_subset.py <substring> [<substring> ...]
Runs every registry query whose name contains ANY given substring
(exact name match also works).  Empty arg list = full registry.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession


def norm(pdf):
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> None:
    pats = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    SF = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = [
        n for n in qs
        if not pats or any(p in n for p in pats)
    ]
    print(f"verifying {len(names)} queries: {names}")
    fails = []
    for name in names:
        sql = oracles.get(name)
        got = norm(qs[name](spark, SF).toPandas())
        if sql is None:
            print(name, "rows-only", len(got))
            continue
        want = norm(con.execute(sql).df())
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, atol=0, rtol=0
            )
            print(name, "MATCH", len(got))
        except AssertionError as ex:
            fails.append(name)
            print(name, "MISMATCH", str(ex)[:200])
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
