"""Scan-parallelism guard for compute-heavy narrow stages.

File-split partitioning follows BYTES (spark.sql.files.maxPartitionBytes,
default 128 MB), so a few-MB table scans as 1-2 tasks — and any
per-row-EXPENSIVE narrow stage stacked on it (vectorized UDF, BLAS
matmul, shingle construction) pins 1-2 cores while the rest of the
cluster idles (guide §2: partitioning must follow the WORK, not just
the bytes).  ``spread_scan`` raises such inputs to the session's
default parallelism; the repartition is a tiny shuffle precisely in
the case where it fires (the input is small), and it NEVER fires on a
real at-scale scan (thousands of splits), so no corpus-sized shuffle
is ever added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Return ``df`` repartitioned to the session's default parallelism
    when its current partition count is below parallelism/min_factor;
    unchanged otherwise.

    The partition count comes from ``df.rdd.getNumPartitions()`` —
    METADATA only: building the RDD handle runs no job and moves no
    rows (the deserializing conversion an ``.rdd`` data path would pay
    only happens if the RDD were computed, which it never is here)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n * min_factor >= p:
        return df
    return df.repartition(p)
