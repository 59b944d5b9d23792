"""Reverse kNN — reference ``query_reverse`` (rindex.rs:231-241, :809-833).

Semantics: all points p with ``dist(p, q) <= knn_dist_of(p)``
(INCLUSIVE, rindex.rs:820), ascending by distance; k=0 / empty index
=> empty (rindex.rs:232-234).

Distributed shape: with the kNN graph materialized, RkNN is a join +
filter — no recursion.  Pruning reuses the reference's RdNN ``bound``
aggregate (sphere.rs:10): a per-cell ``max_knn_dist`` stats table.  A
cell can contain a reverse neighbor of q only if
``cell_min_dist(cell, q) <= cell.max_knn_dist`` (exactly the descent
test at rindex.rs:826-829).  The stats table is tiny (one row per
occupied cell) so the prune is a broadcast theta-join; the surviving
(query, cell) pairs equi-join the points, then the exact row-level
refine ``dist <= knn_dist`` (rindex.rs:817-822) runs as a column
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rindex_spark.config import GridSpec
from rindex_spark.functions.distance import euclidean
from rindex_spark.grid import cell_min_dist, with_cells
from rindex_spark.operators.stats import knn_dist


def reverse_knn(
    points: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    k: int,
    spec: GridSpec,
) -> DataFrame:
    """points: (id, x, y); graph: (src, dst, dist, rank) with k incl.
    self; queries: (qid, x, y).

    returns (qid, id, dist) — every point whose k-NN ball (including
    itself) covers the query point; ascending (qid, dist, id) — the
    reference returns its result sorted ascending (rindex.rs:238-240),
    so the order IS the contract.  The sort costs an exchange over the
    RESULT only (query-scale, not corpus-scale): reverse-neighbor sets
    are O(k * |queries|)-ish, so this never becomes a data-sized sort.
    """
    spark = points.sparkSession
    if k <= 0:
        return spark.createDataFrame([], "qid long, id long, dist double")

    kd = knn_dist(graph, k)  # (id, knn_dist), inf when < k rows
    pts = with_cells(points.select("id", "x", "y"), spec).join(kd, "id", "left")
    pts = pts.na.fill({"knn_dist": float("inf")})

    stats = (
        pts.groupBy("ix", "iy")
        .agg(F.max("knn_dist").alias("max_knn_dist"))
        .withColumnRenamed("ix", "cix")
        .withColumnRenamed("iy", "ciy")
    )

    q = queries.select("qid", F.col("x").alias("qx"), F.col("y").alias("qy"))
    # broadcast theta-join: |cells| << |points|; the reference's subtree
    # skip `min_distance(q) > bound` (rindex.rs:826-829) becomes a filter.
    cand_cells = q.join(F.broadcast(stats)).filter(
        cell_min_dist(spec, F.col("cix"), F.col("ciy"), F.col("qx"), F.col("qy"))
        <= F.col("max_knn_dist")
    )

    joined = cand_cells.join(
        pts,
        (F.col("cix") == F.col("ix")) & (F.col("ciy") == F.col("iy")),
        "inner",
    )
    dist = euclidean(F.col("qx"), F.col("qy"), F.col("x"), F.col("y"))
    return (
        joined.select("qid", "id", dist.alias("dist"), "knn_dist")
        .filter(F.col("dist") <= F.col("knn_dist"))
        .select("qid", "id", "dist")
        .orderBy("qid", "dist", "id")
    )
