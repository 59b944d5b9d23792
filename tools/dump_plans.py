"""Dump .explain('formatted') for declared queries into plans/r06/.

Usage: python tools/dump_plans.py <suffix> [query ...]
e.g.   python tools/dump_plans.py before        # all queries
       python tools/dump_plans.py after decontam token_budget
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = Path(__file__).resolve().parent.parent / "plans" / "r06"


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    OUT.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("rindex-plan-dump")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # queries needing jobs at plan time still run them
            plan = f"ERROR: {e}"
        (OUT / f"{name}_{suffix}.txt").write_text(plan)
        print(name, "->", f"{name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
