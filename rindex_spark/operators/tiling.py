"""Point-in-polygon tiling (BASELINE.json north_star: "point-in-polygon
joins against tile polygons via a broadcast cell-to-polygon map").

The reference has no polygons — tiling is part of the web-scale graft.
Shape: the tile set is small metadata (thousands of polygons), so

1. driver-side: each tile's bbox is rasterized to covering grid cells
   -> a (cell_x, cell_y, tile_id) map, broadcast;
2. points equi-join the map on their cell (broadcast hash join — no
   shuffle of the big side);
3. exact refine: vectorized ray-casting (even-odd rule) in a pandas
   UDF over the surviving (point, tile) candidates.

This is the same filter-and-refine decomposition as the spatial
operators; the cell map plays the sphere-pruning role.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from rindex_spark.config import GridSpec
from rindex_spark.grid import with_cells

Tiles = list[tuple[int, list[tuple[float, float]]]]


def point_in_poly_np(xs: np.ndarray, ys: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting; boundary points count as inside
    on the edges crossed by the +x ray (standard half-open rule)."""
    inside = np.zeros(len(xs), dtype=bool)
    n = len(verts)
    j = n - 1
    for i in range(n):
        xi, yi = verts[i]
        xj, yj = verts[j]
        cross = (yi > ys) != (yj > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (ys - yi) / (yj - yi) + xi
        inside ^= cross & (xs < xint)
        j = i
    return inside


def assign_tiles(
    points: DataFrame,
    tiles: Tiles,
    spec: GridSpec,
    inclusive_l1_diamond: float | None = None,
) -> DataFrame:
    """points (id, x, y) x tiles -> (id, tile_id).

    inclusive_l1_diamond: when the tiles are L1 diamonds of this radius
    (the deterministic test tiles, datagen.generate_tiles), containment
    uses the closed-form |x-cx|+|y-cy| <= r test instead of ray casting
    so boundary points are INCLUSIVE and oracle-checkable; ray casting
    (any simple polygon) is the general path.
    """
    spark = points.sparkSession
    cs = spec.cell_size
    # the (cell, tile) map is built DISTRIBUTED (r2 verdict item 5): the
    # driver holds one bbox row per tile; the per-cell fan-out happens
    # in explode(sequence(...)) on executors — a fine grid x wide tiles
    # would OOM a driver-side double loop (the map is |tiles| x
    # (bbox/cs)^2 entries), while the bbox table is always tile-scale.
    bbox_rows = []
    for tid, verts in tiles:
        vx = [v[0] for v in verts]
        vy = [v[1] for v in verts]
        bbox_rows.append(
            (
                tid,
                math.floor((min(vx) - spec.x0) / cs),
                math.floor((max(vx) - spec.x0) / cs),
                math.floor((min(vy) - spec.y0) / cs),
                math.floor((max(vy) - spec.y0) / cs),
            )
        )
    bbox = spark.createDataFrame(
        bbox_rows, "tile_id long, ix0 long, ix1 long, iy0 long, iy1 long"
    )
    cell_map = (
        bbox.withColumn("cix", F.explode(F.sequence(F.col("ix0"), F.col("ix1"))))
        .withColumn("ciy", F.explode(F.sequence(F.col("iy0"), F.col("iy1"))))
        .select("cix", "ciy", "tile_id")
    )

    pts = with_cells(points.select("id", "x", "y"), spec)
    cand = pts.join(
        F.broadcast(cell_map),
        (pts["ix"] == cell_map["cix"]) & (pts["iy"] == cell_map["ciy"]),
        "inner",
    ).select("id", "x", "y", "tile_id")

    if inclusive_l1_diamond is not None:
        centers = {tid: (sum(v[0] for v in vs) / len(vs), sum(v[1] for v in vs) / len(vs)) for tid, vs in tiles}
        cdf = spark.createDataFrame(
            [(t, cx, cy) for t, (cx, cy) in centers.items()],
            "tile_id long, tcx double, tcy double",
        )
        r = float(inclusive_l1_diamond)
        return (
            cand.join(F.broadcast(cdf), "tile_id")
            .filter(
                (F.abs(F.col("x") - F.col("tcx")) + F.abs(F.col("y") - F.col("tcy")))
                <= F.lit(r)
            )
            .select("id", "tile_id")
        )

    verts_by_tid = {tid: np.asarray(verts, dtype=np.float64) for tid, verts in tiles}

    @pandas_udf(BooleanType())
    def pip(x: pd.Series, y: pd.Series, tile_id: pd.Series) -> pd.Series:
        out = np.zeros(len(x), dtype=bool)
        xs = x.to_numpy()
        ys = y.to_numpy()
        tids = tile_id.to_numpy()
        for tid in np.unique(tids):
            m = tids == tid
            out[m] = point_in_poly_np(xs[m], ys[m], verts_by_tid[int(tid)])
        return pd.Series(out)

    return cand.filter(pip(F.col("x"), F.col("y"), F.col("tile_id"))).select(
        "id", "tile_id"
    )


def tile_pyramid(
    points: DataFrame,
    spec: GridSpec,
    levels: int = 4,
    value_col: str | None = None,
) -> DataFrame:
    """Multi-resolution tile rollup (slippy-map pyramid): level-0 tiles
    are the base grid cells; a level-L tile covers a 2^L x 2^L block of
    base cells (``tx = ix >> L`` — arithmetic shift == floor division,
    so negative cell indices roll up correctly).  The web-map serving
    shape: one table answers every zoom level.

    Two-phase plan — the 100 TB shape:

    1. ONE data-sized hash aggregate to base cells (partial+final
       map-side combine; the shuffle carries |cells| rows, not rows).
    2. each base-cell row explodes to its ``levels`` ancestors — a
       CELL-sized explode, never data-sized — and one more (tiny) hash
       aggregate yields every pyramid level at once.

    Counts re-aggregate exactly and min/max compose, so the rollup is
    exact at every level; ``value_col`` adds a per-tile sum (beware
    float sums are addition-order-dependent across partitions — use
    integer/decimal values where bit-exact rollups matter).

    returns one row per NON-EMPTY tile per level:
    (level int, tx long, ty long, n_points long,
     min_x, max_x, min_y, max_y double [, sum_value double])
    """
    cols = ["x", "y"] + ([value_col] if value_col else [])
    pts = with_cells(points.select(*cols), spec)
    aggs = [
        F.count(F.lit(1)).alias("n_points"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    base = pts.groupBy("ix", "iy").agg(*aggs)

    lv = base.withColumn(
        "level", F.explode(F.sequence(F.lit(0), F.lit(int(levels) - 1)))
    )
    re_aggs = [
        F.sum("n_points").alias("n_points"),
        F.min("min_x").alias("min_x"),
        F.max("max_x").alias("max_x"),
        F.min("min_y").alias("min_y"),
        F.max("max_y").alias("max_y"),
    ]
    if value_col:
        re_aggs.append(F.sum("sum_value").alias("sum_value"))
    return (
        lv.withColumn("tx", F.expr("shiftright(ix, level)"))
        .withColumn("ty", F.expr("shiftright(iy, level)"))
        .groupBy(F.col("level").cast("int").alias("level"), "tx", "ty")
        .agg(*re_aggs)
    )
