"""Driver-mimic: run each __spark_entry__.queries() entry vs its oracle_sql()
in DuckDB at a given sf dir and compare row count + order-insensitive values.

Usage: python tests/driver_check.py [sf_dir] [--vanilla] [--spark-only] [only_query ...]

--vanilla: use a bare ``SparkSession.builder.getOrCreate()`` with NO engine
configs — the exact session shape the driver harness uses. Round 1's only
failure class (TIMESTAMP_NTZ) was invisible to the mimic because it ran under
``build_session`` (which disables NTZ inference); the vanilla mode exists so
that can never happen again.
--spark-only: execute every query but skip the DuckDB comparison (fast smoke
of the analysis/runtime failure class).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    if len(spark_df) != len(oracle_df):
        return f"ROWS {len(spark_df)} vs {len(oracle_df)}"
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"COLS {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    a, b = _norm(spark_df), _norm(oracle_df)
    if a.equals(b):
        return "OK"
    for c in a.columns:
        if not a[c].equals(b[c]):
            neq = (a[c].astype(str) != b[c].astype(str))
            idx = neq.idxmax()
            return f"VALUES col={c} ndiff={int(neq.sum())} first@{idx}: {a[c][idx]!r} vs {b[c][idx]!r}"
    return "VALUES (unlocated)"


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    spark_only = "--spark-only" in args
    args = [a for a in args if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    if vanilla:
        # driver-identical session: defaults only (NTZ inference ON, 200
        # shuffle partitions, JVM-default timezone)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("driver_check_vanilla").getOrCreate()
    else:
        from marmot_spark.session import build_session

        spark = build_session("driver_check", master="local[8]", shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:28s} SPARK-ERROR {str(e).splitlines()[0][:160]}")
            failures.append(name)
            continue
        if spark_only or name not in oracles:
            note = "spark-only" if spark_only else "no oracle — rows-only"
            print(f"{name:28s} rows={len(got)} ({note})  ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {str(e).splitlines()[0][:160]}")
            failures.append(name)
            continue
        verdict = compare(got, want)
        print(f"{name:28s} rows={len(got):7d} {verdict}  ({time.time()-t0:.1f}s)")
        if verdict != "OK":
            failures.append(name)
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
