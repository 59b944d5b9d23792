"""Graph/read-out and index-observability operators.

* ``neighbors_of``   — reference rindex.rs:272-288 (stored kNN set,
  ascending, dummies filtered).
* ``knn_dist_of``    — reference rindex.rs:306-313 (k-th NN distance;
  infinity when fewer than k points exist).
* ``cell_stats``     — the per-cell aggregate table replacing the tree's
  sphere statistics: weight (sphere.rs:8), centroid (rindex.rs:732-745),
  per-dim variance (rindex.rs:715-730), and ``max_knn_dist`` — the RdNN
  ``bound`` aggregate (sphere.rs:10, rindex.rs:492-498) that prunes
  reverse-kNN.
* ``index_stats``    — observability parity for ``height``/``num_points``
  /``nodes_to_string_rows`` (rindex.rs:336-360): no tree, so we expose
  cell/point counts and occupancy extremes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rindex_spark.config import EngineConfig, GridSpec
from rindex_spark.grid import with_cells


def neighbors_of(graph: DataFrame, point_id: int) -> DataFrame:
    """The stored kNN row set of one point, ascending by (dist, dst).

    Includes the self-loop at distance 0.0 (rindex.rs:481); infinity
    dummies are never materialized in the graph, so no filter is needed
    (the reference filters them at read-out, rindex.rs:279-283).
    """
    return (
        graph.filter(F.col("src") == F.lit(point_id))
        .select("src", "dst", "dist", "rank")
        .orderBy("dist", "dst")
    )


def knn_dist(graph: DataFrame, k: int) -> DataFrame:
    """Per-point k-th NN distance: (id, knn_dist).

    infinity when the point has fewer than k graph rows (dataset smaller
    than k) — the reference's heap peek on a dummy (rindex.rs:306-313).
    """
    return graph.groupBy(F.col("src").alias("id")).agg(
        F.when(F.count(F.lit(1)) >= k, F.max("dist"))
        .otherwise(F.lit(float("inf")))
        .alias("knn_dist")
    )


def knn_dist_of(graph: DataFrame, k: int, point_id: int) -> float:
    """Scalar convenience — reference ``knn_dist_of`` (rindex.rs:306-313)."""
    rows = knn_dist(graph.filter(F.col("src") == F.lit(point_id)), k).collect()
    return float(rows[0]["knn_dist"]) if rows else float("inf")


def cell_stats(
    points: DataFrame,
    spec: GridSpec,
    graph: DataFrame | None = None,
    k: int | None = None,
) -> DataFrame:
    """Per-cell aggregate table: (ix, iy, n, cx, cy, var_x, var_y
    [, max_knn_dist]).

    This IS the reference's sphere statistics re-expressed as a groupBy:
    weight -> n, weighted centroid -> avg, per-dim variance -> var_pop
    (rindex.rs:715-759), and the RdNN bound -> max(knn_dist)
    (sphere.rs:10).  It is small (|cells| ~ n/target_per_cell) and is
    broadcast where used.
    """
    pts = with_cells(points.select("id", "x", "y"), spec)
    agg = pts.groupBy("ix", "iy").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("cx"),
        F.avg("y").alias("cy"),
        F.var_pop("x").alias("var_x"),
        F.var_pop("y").alias("var_y"),
    )
    if graph is not None:
        if k is None:
            raise ValueError("k is required when graph is given")
        kd = knn_dist(graph, k)
        per_cell = (
            pts.join(kd, "id", "left")
            .na.fill({"knn_dist": float("inf")})
            .groupBy("ix", "iy")
            .agg(F.max("knn_dist").alias("max_knn_dist"))
        )
        agg = agg.join(per_cell, ["ix", "iy"], "left")
    return agg


def index_stats(points: DataFrame, spec: GridSpec) -> dict:
    """Observability parity for height()/num_points()/debug dump
    (rindex.rs:336-360): grid + occupancy summary."""
    pts = with_cells(points.select("id", "x", "y"), spec)
    row = (
        pts.groupBy("ix", "iy")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("count").alias("n_points"),
            F.max("count").alias("max_cell"),
            F.avg("count").alias("avg_cell"),
        )
        .collect()[0]
    )
    return {
        "cell_size": spec.cell_size,
        "n_cells": row["n_cells"],
        "n_points": int(row["n_points"] or 0),
        "max_points_per_cell": row["max_cell"],
        "avg_points_per_cell": row["avg_cell"],
    }
