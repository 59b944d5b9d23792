"""Exact k-nearest-neighbor search and kNN-graph construction.

Reference semantics reproduced here (SURVEY.md §2):

* ``query_neighbors(q, k)`` (rindex.rs:197-214, :764-807): exact kNN by
  best-first branch-and-bound — descend subtrees while their
  ``min_distance`` beats the current k-th candidate distance.
* the per-point kNN graph maintained on insert (rindex.rs:478-482,
  :500-560): every point's k nearest INCLUDING ITSELF at distance 0.0.

Distributed re-expression: iterative **cell-ring expansion**.  Each
round, every still-unfinished query joins the points lying in the next
Chebyshev annulus of grid cells; a window top-k keeps its best k
candidates; the query finishes when its k-th candidate distance is
strictly below the minimum possible distance of any unvisited cell
(``grid.ring_lower_bound`` — the exact invariant of rindex.rs:800-802).
All queries advance one ring per join round, so the driver loop runs
O(1) Spark jobs per ring, never per query.  With the ring-jump
heuristic (once k candidates exist, jump straight to the ring that
certifies the current k-th distance) almost all workloads finish in
2-3 rounds.

Scale notes (100 TB posture):
* the ring join is an equi-join on (cell_x, cell_y) — shuffle-hash /
  sort-merge with AQE; the points side is reusable across rounds
  (cache/persist by the caller for iterative workloads).
* the frontier SHRINKS monotonically; later rounds touch only straggler
  queries (sparse regions), so per-round shuffle volume decays fast.
* nothing driver-side grows with data: the loop keeps only per-round
  row counts.
* determinism: candidates ordered by (dist, id); ties at the k-th
  distance are broken by id (the reference's order is arbitrary on
  ties — its tests compare sets/multisets only, lib/tests/graph.rs:60-67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rindex_spark.config import EngineConfig, GridSpec
from rindex_spark.functions.distance import euclidean
from rindex_spark.grid import (
    explode_annulus,
    infer_grid,
    ring_lower_bound,
    with_cells,
)


def _topk(cand: DataFrame, k: int) -> DataFrame:
    """Keep each query's k best candidates, ordered by (dist, id).

    The distributed replacement for the reference's per-point
    BinaryHeap of size k (node.rs:12, rindex.rs:478-482).
    """
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_for_queries(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    spec: GridSpec | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """Exact kNN of each query point against ``points``.

    points:  columns (id long, x double, y double)
    queries: columns (qid long, x double, y double)
    returns: (qid long, id long, dist double, rank int) — rank 1..k by
             (dist, id); fewer than k rows per qid when the dataset has
             fewer than k points (the reference pads with infinity
             dummies and filters them on read-out, rindex.rs:279-283 —
             we simply omit them).

    ``query_neighbors`` parity: rindex.rs:197-214.  k <= 0 or empty
    points => empty result (rindex.rs:198-200).
    """
    spark = points.sparkSession
    out_schema = "qid long, id long, dist double, rank int"
    # k = 0 / empty index => empty result (rindex.rs:198-200), before any
    # config validation (the reference validates k only at construction).
    if k <= 0:
        return spark.createDataFrame([], out_schema)
    cfg = cfg or EngineConfig(k=k)

    if spec is None:
        spec = infer_grid(points, cfg)

    ext = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    ).collect()[0]
    if not ext["n"]:
        return spark.createDataFrame([], out_schema)
    qext = queries.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    ).collect()[0]
    # Ring radius that certifies full coverage of the data extent from
    # ANY query cell (termination backstop for k > n / far-out queries):
    # the Chebyshev span of the combined data+query bounding box.
    def _mm(fn, *vals):
        vs = [v for v in vals if v is not None]
        return fn(vs)

    span = max(
        _mm(max, ext["xmax"], qext["xmax"]) - _mm(min, ext["xmin"], qext["xmin"]),
        _mm(max, ext["ymax"], qext["ymax"]) - _mm(min, ext["ymin"], qext["ymin"]),
    )
    r_max = int(span / spec.cell_size) + 2

    pts = with_cells(points.select("id", "x", "y"), spec)

    frontier = (
        with_cells(
            queries.select("qid", F.col("x").alias("qx"), F.col("y").alias("qy")),
            spec,
            x="qx",
            y="qy",
            prefix="q",
        )
        .withColumn("r_lo", F.lit(-1).cast("long"))
        .withColumn("r_hi", F.lit(1).cast("long"))
    )

    best: DataFrame | None = None  # (qid, id, dist) — ≤ k rows per unfinished qid
    finished_parts: list[DataFrame] = []

    for _ in range(cfg.max_rounds):
        cells = explode_annulus(frontier, F.col("r_lo"), F.col("r_hi"))
        new_cand = cells.join(
            pts,
            (cells["cix"] == pts["ix"]) & (cells["ciy"] == pts["iy"]),
            "inner",
        ).select(
            "qid",
            "id",
            euclidean(F.col("qx"), F.col("qy"), F.col("x"), F.col("y")).alias("dist"),
        )
        all_cand = new_cand if best is None else best.unionByName(new_cand)
        topk = _topk(all_cand, k).localCheckpoint(eager=True)

        stats = topk.groupBy("qid").agg(
            F.count(F.lit(1)).alias("cnt"), F.max("dist").alias("kth")
        )
        lb = ring_lower_bound(
            spec, F.col("qx"), F.col("qy"), F.col("qix"), F.col("qiy"), F.col("r_hi")
        )
        meta = (
            frontier.join(stats, "qid", "left")
            .na.fill({"cnt": 0})
            .withColumn("lb", lb)
            .withColumn(
                "is_done",
                ((F.col("cnt") >= k) & (F.col("kth") < F.col("lb")))
                | (F.col("r_hi") >= r_max),
            )
            .localCheckpoint(eager=True)
        )

        done_ids = meta.filter("is_done").select("qid")
        finished_parts.append(topk.join(done_ids, "qid", "left_semi"))

        next_frontier = (
            meta.filter(~F.col("is_done"))
            .withColumn("r_lo", F.col("r_hi"))
            .withColumn(
                # Ring jump: once k candidates exist, lb(R') >= R'*cs, so
                # R' = floor(kth/cs)+1 certifies the current k-th distance
                # in one more round.  Clamped geometrically (<= 2R+8) so a
                # single sparse query can't explode a huge annulus, and to
                # r_max (full coverage).
                "r_hi",
                F.least(
                    F.greatest(
                        F.col("r_hi") + 1,
                        F.when(
                            F.col("cnt") >= k,
                            F.floor(F.col("kth") / F.lit(spec.cell_size)) + 1,
                        ).otherwise(F.col("r_hi") * 2 + 8),
                    ),
                    F.col("r_hi") * 2 + 8,
                    F.lit(r_max).cast("long"),
                ),
            )
            .select("qid", "qx", "qy", "qix", "qiy", "r_lo", "r_hi")
        )
        n_left = next_frontier.count()
        if n_left == 0:
            break
        frontier = next_frontier
        best = topk.join(frontier.select("qid"), "qid", "left_semi").select(
            "qid", "id", "dist"
        )
    else:
        raise RuntimeError(
            f"knn_for_queries did not converge in {cfg.max_rounds} rounds"
        )

    out = finished_parts[0]
    for part in finished_parts[1:]:
        out = out.unionByName(part)
    # bound the output partition count: the union concatenates one
    # partition set per ring round
    out = out.coalesce(max(spark.sparkContext.defaultParallelism, 2))
    return out.select("qid", "id", "dist", F.col("rank").cast("int").alias("rank"))


def build_knn_graph(
    points: DataFrame,
    k: int,
    spec: GridSpec | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """The materialized kNN graph: every point's k nearest neighbors
    INCLUDING itself at distance 0.0 / rank 1 (reference invariant:
    a point seeds its own heap with (0.0, self), rindex.rs:481;
    confirmed by neighbors_of in usage.rs:16-17 and the demo edge list
    self-loops, demo/data/knn.csv:1).

    returns: (src long, dst long, dist double, rank int)
    """
    queries = points.select(F.col("id").alias("qid"), "x", "y")
    g = knn_for_queries(points, queries, k, spec=spec, cfg=cfg)
    return g.select(
        F.col("qid").alias("src"), F.col("id").alias("dst"), "dist", "rank"
    )
