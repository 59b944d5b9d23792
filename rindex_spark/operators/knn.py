"""Exact k-nearest-neighbor search and kNN-graph construction.

Reference semantics reproduced here (SURVEY.md §2):

* ``query_neighbors(q, k)`` (rindex.rs:197-214, :764-807): exact kNN by
  best-first branch-and-bound — descend subtrees while their
  ``min_distance`` beats the current k-th candidate distance.
* the per-point kNN graph maintained on insert (rindex.rs:478-482,
  :500-560): every point's k nearest INCLUDING ITSELF at distance 0.0.

Distributed re-expression: iterative **cell-ring expansion** with the
kNN math in vectorized Arrow UDFs (the north_star architecture):

round r:
  1. the distinct (query-cell, ring-window) keys explode to their
     Chebyshev ANNULUS of candidate cells (pure sequence/explode) and
     equi-join the points — shuffle volume is points x ring-size, NOT
     queries x occupancy (the naive pair-join blows up quadratically in
     dense cells).
  2. queries and candidates COGROUP on the query cell; a pandas UDF
     computes, per group, the full numpy distance matrix (chunked),
     stable-argsorts it in (dist, id) order, and merges each query's
     new top-k with its carried best-so-far list.
  3. a query finishes when its k-th distance is STRICTLY below the
     minimum possible distance of any unvisited cell
     (grid.ring_lower_bound — the exact invariant of rindex.rs:800-802)
     or the ring already covers the whole data extent.
  4. unfinished queries jump their ring radius to the certifying radius
     (floor(kth/cs)+1), clamped geometrically; the frontier shrinks
     monotonically.

Scale notes (100 TB posture):
* per round: one equi-join keyed on cell ints + one cogroup shuffle —
  both AQE-managed; nothing driver-side grows with data (the loop keeps
  only frontier row counts).
* dense (urban/hot) cells cost O(occupancy) numpy flops per query, not
  O(occupancy) shuffled rows per query — C-speed instead of shuffle.
* determinism: candidates ordered by (dist, id); ties at the k-th
  distance break by id (the reference's order is arbitrary on ties —
  its tests compare sets/multisets only, lib/tests/graph.rs:60-67).
* distance = sqrt((qx-x)^2 + (qy-y)^2) in float64, the same IEEE op
  order as the reference (distance.rs:1-7) and the SQL oracles.
"""

from __future__ import annotations

import os
import time as _time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rindex_spark.config import EngineConfig, GridSpec
from rindex_spark.grid import explode_annulus, ring_lower_bound, with_cells

_STATE_SCHEMA = (
    "qid long, qx double, qy double, qix long, qiy long, "
    "r_lo long, r_hi long, cnt long, kth double, "
    "best_dist array<double>, best_id array<long>"
)


def _make_round_udf(k: int, chunk: int = 1024):
    """Cogrouped per-query-cell kNN round: merge each query's carried
    top-k with the candidates of the newly visited annulus."""

    def fn(queries: pd.DataFrame, cand: pd.DataFrame) -> pd.DataFrame:
        nq = len(queries)
        if nq == 0:
            return pd.DataFrame(
                columns=[
                    "qid", "qx", "qy", "qix", "qiy", "r_lo", "r_hi",
                    "cnt", "kth", "best_dist", "best_id",
                ]
            )
        qx = queries["qx"].to_numpy(dtype=np.float64)
        qy = queries["qy"].to_numpy(dtype=np.float64)
        prev_d = queries["best_dist"].tolist()
        prev_i = queries["best_id"].tolist()

        nc = len(cand)
        if nc:
            cx = cand["x"].to_numpy(dtype=np.float64)
            cy = cand["y"].to_numpy(dtype=np.float64)
            cid = cand["id"].to_numpy(dtype=np.int64)

        out_cnt = np.empty(nq, dtype=np.int64)
        out_kth = np.empty(nq, dtype=np.float64)
        out_d: list[list[float]] = [None] * nq  # type: ignore[list-item]
        out_i: list[list[int]] = [None] * nq  # type: ignore[list-item]

        if not nc:
            for r in range(nq):
                pd_ = prev_d[r] if prev_d[r] is not None else []
                pi_ = prev_i[r] if prev_i[r] is not None else []
                out_d[r] = list(pd_)
                out_i[r] = list(pi_)
                out_cnt[r] = len(out_d[r])
                out_kth[r] = out_d[r][-1] if out_d[r] else np.inf
        else:
            cand_chunk = 8192  # bounds the distance matrix in dense cells
            for s in range(0, nq, chunk):
                e = min(s + chunk, nq)
                cur_d = [
                    np.asarray(prev_d[r], dtype=np.float64)
                    if prev_d[r] is not None
                    else np.empty(0)
                    for r in range(s, e)
                ]
                cur_i = [
                    np.asarray(prev_i[r], dtype=np.int64)
                    if prev_i[r] is not None
                    else np.empty(0, dtype=np.int64)
                    for r in range(s, e)
                ]
                for cs_ in range(0, nc, cand_chunk):
                    ce = min(cs_ + cand_chunk, nc)
                    ids_c = cid[cs_:ce]
                    dx = qx[s:e, None] - cx[None, cs_:ce]
                    dy = qy[s:e, None] - cy[None, cs_:ce]
                    d = np.sqrt(dx * dx + dy * dy)
                    kk = min(k, ce - cs_)
                    # O(c) selection instead of O(c log c) sort: take a
                    # k-pool with argpartition, then widen any row whose
                    # boundary DISTANCE TIE spills outside the pool (so
                    # the canonical (dist, id) top-k stays exact) and
                    # lexsort only the tiny pool per row.
                    part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
                    pool_d = np.take_along_axis(d, part, axis=1)
                    pmax = pool_d.max(axis=1)
                    n_le = (d <= pmax[:, None]).sum(axis=1)
                    for r in range(e - s):
                        if n_le[r] > kk:
                            idxs = np.nonzero(d[r] <= pmax[r])[0]
                            dd, ii = d[r][idxs], ids_c[idxs]
                        else:
                            dd, ii = pool_d[r], ids_c[part[r]]
                        o = np.lexsort((ii, dd))[:k]
                        dd, ii = dd[o], ii[o]
                        # merge (dist,id)-sorted running best with the
                        # chunk's top-k
                        if len(cur_d[r]):
                            md = np.concatenate([cur_d[r], dd])
                            mi = np.concatenate([cur_i[r], ii])
                            mo = np.lexsort((mi, md))[:k]
                            cur_d[r], cur_i[r] = md[mo], mi[mo]
                        else:
                            cur_d[r], cur_i[r] = dd, ii
                for r in range(e - s):
                    out_d[s + r] = cur_d[r].tolist()
                    out_i[s + r] = cur_i[r].tolist()
                    out_cnt[s + r] = len(cur_d[r])
                    out_kth[s + r] = cur_d[r][-1] if len(cur_d[r]) else np.inf

        return pd.DataFrame(
            {
                "qid": queries["qid"].to_numpy(),
                "qx": qx,
                "qy": qy,
                "qix": queries["qix"].to_numpy(),
                "qiy": queries["qiy"].to_numpy(),
                "r_lo": queries["r_lo"].to_numpy(),
                "r_hi": queries["r_hi"].to_numpy(),
                "cnt": out_cnt,
                "kth": out_kth,
                "best_dist": out_d,
                "best_id": out_i,
            }
        )

    return fn


def knn_for_queries(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    spec: GridSpec | None = None,
    cfg: EngineConfig | None = None,
    queries_within_extent: bool = False,
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

    # one aggregate job yields both the grid spec and the extent
    ext = points.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    ).collect()[0]
    if not ext["n"]:
        return spark.createDataFrame([], out_schema)
    if spec is None:
        from rindex_spark.grid import grid_from_extent

        spec = grid_from_extent(ext, cfg)

    # Ring radius that certifies full coverage of the data extent from
    # ANY query cell (termination backstop for k > n / far-out queries):
    # the Chebyshev span of the combined data+query bounding box.
    # queries_within_extent=True (e.g. the self kNN graph) skips the
    # query-extent job.
    if queries_within_extent:
        span = max(ext["xmax"] - ext["xmin"], ext["ymax"] - ext["ymin"])
    else:
        qext = queries.agg(
            F.min("x").alias("xmin"),
            F.max("x").alias("xmax"),
            F.min("y").alias("ymin"),
            F.max("y").alias("ymax"),
        ).collect()[0]

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
        .withColumn("cnt", F.lit(0).cast("long"))
        .withColumn("kth", F.lit(float("inf")))
        .withColumn("best_dist", F.array().cast("array<double>"))
        .withColumn("best_id", F.array().cast("array<long>"))
    )

    round_udf = _make_round_udf(k)
    finished_parts: list[DataFrame] = []
    debug = bool(os.environ.get("RINDEX_DEBUG_TIMING"))
    group_keys = ["qix", "qiy", "r_lo", "r_hi"]

    for _round in range(cfg.max_rounds):
        _t0 = _time.monotonic()
        # candidate points for each DISTINCT (query cell, ring window) —
        # point rows are replicated per ring cell, never per query
        # rename the candidate-side keys: both sides descend from the
        # same frontier lineage, and cogroup keys align POSITIONALLY, so
        # fresh names avoid Catalyst's ambiguous-self-join trap
        ring_keys = frontier.select(
            F.col("qix").alias("kix"),
            F.col("qiy").alias("kiy"),
            F.col("r_lo").alias("klo"),
            F.col("r_hi").alias("khi"),
        ).distinct()
        cells = explode_annulus(ring_keys, F.col("klo"), F.col("khi"), qix="kix", qiy="kiy")
        cand = cells.join(
            pts,
            (F.col("cix") == pts["ix"]) & (F.col("ciy") == pts["iy"]),
            "inner",
        ).select("kix", "kiy", "klo", "khi", "id", "x", "y")

        state = (
            frontier.groupBy(*group_keys)
            .cogroup(cand.groupBy("kix", "kiy", "klo", "khi"))
            .applyInPandas(round_udf, schema=_STATE_SCHEMA)
            .localCheckpoint(eager=True)
        )

        lb = ring_lower_bound(
            spec, F.col("qx"), F.col("qy"), F.col("qix"), F.col("qiy"), F.col("r_hi")
        )
        state = state.withColumn("lb", lb).withColumn(
            "is_done",
            ((F.col("cnt") >= k) & (F.col("kth") < F.col("lb")))
            | (F.col("r_hi") >= r_max),
        )

        finished_parts.append(
            state.filter("is_done").select(
                "qid",
                F.posexplode(F.arrays_zip("best_dist", "best_id")).alias("pos", "z"),
            )
        )

        next_frontier = (
            state.filter(~F.col("is_done"))
            .withColumn("r_lo", F.col("r_hi"))
            .withColumn(
                # Ring jump: lb(R') >= R'*cs, so R' = floor(kth/cs)+1
                # certifies the current k-th distance in one more round.
                # Geometric clamp (<= 2R+8) bounds annulus size; r_max
                # caps at full coverage.
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
            .drop("lb", "is_done")
        )
        n_left = next_frontier.count()
        if debug:
            print(
                f"[knn round {_round}] left={n_left} "
                f"{_time.monotonic() - _t0:.2f}s cs={spec.cell_size:.3g}",
                flush=True,
            )
        if n_left == 0:
            break
        frontier = next_frontier
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
    return out.select(
        "qid",
        F.col("z.best_id").alias("id"),
        F.col("z.best_dist").alias("dist"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


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
    g = knn_for_queries(points, queries, k, spec=spec, cfg=cfg, queries_within_extent=True)
    return g.select(
        F.col("qid").alias("src"), F.col("id").alias("dst"), "dist", "rank"
    )
