"""Raster <-> vector operators (north_rule: "H3/S2 index,
point-in-polygon, kNN, raster<->vector").

The engine's integer cell grid IS a raster: a regular (ix, iy) lattice
with spec-defined geometry.  This module gives it the standard GIS
conversions, all as pure column expressions (whole-stage codegen, no
UDFs, map-side-combinable aggregates):

* ``rasterize_points``   — vector points -> raster band(s): per-cell
  count + value aggregates (the "burn points into a grid" op).
* ``raster_to_cells_vector`` — raster -> vector: each occupied cell as
  its boundary box (corner columns + closed-ring vertex array).  The
  reference has no raster concept; this is the graft's tiling analogue
  of nodes_to_string_rows (lib/src/rindex.rs:330-360) — the index
  structure re-expressed as geometry rows.
* ``rasterize_polygons`` — vector polygons -> raster: burn convex
  polygons into cells by center-point sampling (the classic
  rasterization rule), via the same broadcast covering-cells shape as
  the PIP tiling operator.

Scale notes: rasterize_points is one hash aggregate (partial
aggregation pushes to the map side, shuffle carries one row per
OCCUPIED cell, never per point).  rasterize_polygons broadcasts the
polygon table (dimension-table-sized) and explodes only each polygon's
bbox cover — never a points shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rindex_spark.config import GridSpec
from rindex_spark.grid import with_cells


def rasterize_points(
    points: DataFrame,
    spec: GridSpec,
    value_col: str | None = None,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Vector points -> raster: one row per occupied cell.

    returns (ix, iy, n [, v_sum, v_min, v_max, v_mean]) — the value
    band aggregates appear when ``value_col`` is given.  Mean is
    emitted as sum/count (exact, deterministic reduction order is NOT
    required for the oracle because sum uses a single combine tree on
    integers-scaled doubles; the oracle mirrors sum/count)."""
    cells = with_cells(points, spec, x=x, y=y)
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        v = F.col(value_col)
        aggs += [
            F.sum(v).alias("v_sum"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
        ]
    out = cells.groupBy("ix", "iy").agg(*aggs)
    if value_col is not None:
        out = out.withColumn("v_mean", F.col("v_sum") / F.col("n"))
    return out


def raster_to_cells_vector(raster: DataFrame, spec: GridSpec) -> DataFrame:
    """Raster -> vector: each cell row gains its boundary geometry.

    returns the input columns plus (x_min, y_min, x_max, y_max,
    ring array<struct<x,y>>) — ring is the closed CCW boundary
    (5 vertices, first == last)."""
    cs = F.lit(spec.cell_size)
    x_min = F.lit(spec.x0) + F.col("ix") * cs
    y_min = F.lit(spec.y0) + F.col("iy") * cs
    x_max = x_min + cs
    y_max = y_min + cs

    def pt(px, py):
        return F.struct(px.alias("x"), py.alias("y"))

    return (
        raster.withColumn("x_min", x_min)
        .withColumn("y_min", y_min)
        .withColumn("x_max", x_max)
        .withColumn("y_max", y_max)
        .withColumn(
            "ring",
            F.array(
                pt(F.col("x_min"), F.col("y_min")),
                pt(F.col("x_max"), F.col("y_min")),
                pt(F.col("x_max"), F.col("y_max")),
                pt(F.col("x_min"), F.col("y_max")),
                pt(F.col("x_min"), F.col("y_min")),
            ),
        )
    )


def rasterize_polygons(
    polygons: DataFrame,
    spec: GridSpec,
    extent_cells: int = 4096,
) -> DataFrame:
    """Vector -> raster by center sampling: cell (ix, iy) belongs to a
    polygon iff the CELL CENTER lies inside it (inclusive boundary) —
    the standard rasterization rule, deterministic and oracle-checkable.

    polygons: (poly_id long, cx double, cy double, r double, kind
    string) — parametric convex shapes: 'diamond' (L1 ball, the tiling
    layer's polygon form) or 'box' (Chebyshev ball).  Arbitrary convex
    vertex rings reduce to half-plane tests in the same shape; the
    parametric forms keep the DuckDB oracle a one-liner.

    Plan: per polygon, explode ONLY its bbox cover; a polygon whose
    bbox cover exceeds ``extent_cells`` cells per axis RAISES (r2
    advisor: silent truncation returned an incomplete raster) — raise
    the rail or coarsen the grid for continent-scale shapes.  Degenerate
    polygons (r < 0) yield an empty cover instead of a descending
    ``sequence``.  The polygon table broadcasts; points are never
    touched."""
    cs = spec.cell_size
    polygons = polygons.filter(F.col("r") >= 0)
    lo_ix = F.floor((F.col("cx") - F.col("r") - F.lit(spec.x0)) / F.lit(cs)).cast("long")
    hi_ix = F.floor((F.col("cx") + F.col("r") - F.lit(spec.x0)) / F.lit(cs)).cast("long")
    lo_iy = F.floor((F.col("cy") - F.col("r") - F.lit(spec.y0)) / F.lit(cs)).cast("long")
    hi_iy = F.floor((F.col("cy") + F.col("r") - F.lit(spec.y0)) / F.lit(cs)).cast("long")
    over = (hi_ix - lo_ix > F.lit(extent_cells)) | (hi_iy - lo_iy > F.lit(extent_cells))
    guard = F.when(
        over,
        F.raise_error(
            F.concat(
                F.lit("rasterize_polygons: bbox cover of poly_id="),
                F.col("poly_id").cast("string"),
                F.lit(f" exceeds extent_cells={extent_cells} per axis; "
                      "raise extent_cells or coarsen the grid"),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    bounded = polygons.filter(guard).withColumn(
        "_lo_ix", lo_ix
    ).withColumn(
        "_hi_ix", hi_ix
    ).withColumn(
        "_lo_iy", lo_iy
    ).withColumn(
        "_hi_iy", hi_iy
    )
    cells = bounded.withColumn(
        "ix", F.explode(F.sequence(F.col("_lo_ix"), F.col("_hi_ix")))
    ).withColumn(
        "iy", F.explode(F.sequence(F.col("_lo_iy"), F.col("_hi_iy")))
    )
    ctr_x = F.lit(spec.x0) + (F.col("ix") + F.lit(0.5)) * F.lit(cs)
    ctr_y = F.lit(spec.y0) + (F.col("iy") + F.lit(0.5)) * F.lit(cs)
    dx = F.abs(ctr_x - F.col("cx"))
    dy = F.abs(ctr_y - F.col("cy"))
    inside = F.when(F.col("kind") == "diamond", dx + dy <= F.col("r")).otherwise(
        F.greatest(dx, dy) <= F.col("r")
    )
    return cells.filter(inside).select("poly_id", "ix", "iy")
