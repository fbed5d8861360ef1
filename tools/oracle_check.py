"""Local replica of the driver's correctness gate.

Runs every workload's Spark query AND DuckDB oracle at a given sf dir,
compares row count, schema (loose), and values (columns sorted by name, rows
sorted by all columns, exact equality for non-floats, 1e-9 relative for
floats).  Usage:  python tools/oracle_check.py [sf_dir] [name_filter]

Set VANILLA=1 to use a bare ``SparkSession.builder.master("local[*]")`` session
instead of this repo's tuned ``get_spark`` — that replicates the driver's
own default-config environment, so conf-dependent bugs surface here instead
of in CORRECTNESS_r{N}.json.  Set STRICT=1 for bit-exact float comparison
(what the driver's value hash does).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from efficient_trees_spark.sources.io import TPCH_TABLES  # noqa: E402
from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.workloads import REGISTRY  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for table in TPCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


STRICT = bool(os.environ.get("STRICT"))  # bit-exact floats, like the driver's value hash


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        if STRICT:
            return float(a) == float(b)
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"row count {len(spark_pdf)} != {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x = None if x is pd.NaT or (isinstance(x, float) and pd.isna(x) and y is None) else x
            y = None if y is pd.NaT or (isinstance(y, float) and pd.isna(y) and x is None) else y
            if not values_equal(x, y):
                return f"value mismatch col={col} row={i}: {x!r} != {y!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    if os.environ.get("VANILLA"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[*]")
            .appName("oracle-check-vanilla")
            .config("spark.sql.shuffle.partitions", "32")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    failures = 0
    for name, wl in sorted(REGISTRY.items()):
        if name_filter and name_filter not in name:
            continue
        try:
            spark_pdf = wl.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(exc).splitlines()[0][:160]}")
            failures += 1
            continue
        if wl.oracle is None:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            duck_pdf = con.execute(wl.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(exc).splitlines()[0][:160]}")
            failures += 1
            continue
        problem = compare(spark_pdf, duck_pdf)
        if problem:
            print(f"FAIL  {name}: {problem}")
            failures += 1
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
