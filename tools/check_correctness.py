"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf dir, run the matching
oracle_sql() in DuckDB over the same parquet views, and compare
row-count + schema + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount {len(a)} vs {len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not ((av.astype(float).values == bv.astype(float).values) | (av.isna() & b[c].isna()).values).all():
                bad = (av.astype(float).values != bv.astype(float).values).sum()
                return False, f"float col {c}: {bad} mismatches (bit-exact check)"
        else:
            if not (av.astype(str).values == bv.astype(str).values).all():
                return False, f"col {c} mismatch"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:22s} spark error: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name:22s} rows={len(got):7d}  ({t_spark:.1f}s, no oracle)")
            continue
        t0 = time.time()
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:22s} duckdb error: {e}")
            failures += 1
            continue
        ok, why = values_match(got, exp)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures += 1
        print(
            f"{status}  {name:22s} rows={len(got):7d} oracle={len(exp):7d} "
            f"({t_spark:.1f}s/{time.time() - t0:.1f}s)  {why}"
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
