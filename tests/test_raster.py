"""Raster <-> vector operators: per-cell burn-in vs pandas groupby
oracle, boundary-ring geometry, and the center-sampling polygon
rasterization rule vs a numpy brute force."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rindex_spark.config import GridSpec
from rindex_spark.operators.raster import (
    raster_to_cells_vector,
    rasterize_points,
    rasterize_polygons,
)

SPEC = GridSpec(cell_size=10.0, x0=-50.0, y0=-50.0)


def _pts(spark, n=400, seed=3):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-49.9, 49.9, size=(n, 2))
    vals = rng.integers(0, 50, size=n).astype(float)
    rows = [(i, float(x), float(y), float(v)) for i, (x, y), v in zip(range(n), xy, vals)]
    return (
        spark.createDataFrame(rows, "id long, x double, y double, val double"),
        xy,
        vals,
    )


def test_rasterize_points_matches_brute(spark):
    df, xy, vals = _pts(spark)
    got = {
        (r["ix"], r["iy"]): (r["n"], r["v_sum"], r["v_min"], r["v_max"], r["v_mean"])
        for r in rasterize_points(df, SPEC, value_col="val").collect()
    }
    ix = np.floor((xy[:, 0] - SPEC.x0) / SPEC.cell_size).astype(np.int64)
    iy = np.floor((xy[:, 1] - SPEC.y0) / SPEC.cell_size).astype(np.int64)
    exp: dict[tuple, list] = {}
    for i in range(len(xy)):
        exp.setdefault((ix[i], iy[i]), []).append(vals[i])
    assert set(got) == set(exp)
    for key, vs in exp.items():
        n, s, lo, hi, mean = got[key]
        assert n == len(vs)
        assert s == sum(vs) and lo == min(vs) and hi == max(vs)
        assert mean == sum(vs) / len(vs)


def test_raster_to_cells_vector_ring(spark):
    df, _, _ = _pts(spark, n=50)
    r = rasterize_points(df, SPEC)
    rows = raster_to_cells_vector(r, SPEC).collect()
    for row in rows:
        assert row["x_min"] == SPEC.x0 + row["ix"] * SPEC.cell_size
        assert row["x_max"] == row["x_min"] + SPEC.cell_size
        ring = row["ring"]
        assert len(ring) == 5 and ring[0] == ring[-1]  # closed
        xs = {p["x"] for p in ring}
        ys = {p["y"] for p in ring}
        assert xs == {row["x_min"], row["x_max"]} and ys == {row["y_min"], row["y_max"]}


def test_rasterize_polygons_center_rule(spark):
    shapes = [
        (0, 0.0, 0.0, 27.0, "diamond"),
        (1, 20.0, -10.0, 12.5, "box"),
        (2, -30.0, 30.0, 11.0, "diamond"),
    ]
    polys = spark.createDataFrame(
        shapes, "poly_id long, cx double, cy double, r double, kind string"
    )
    got = {
        (r["poly_id"], r["ix"], r["iy"])
        for r in rasterize_polygons(polys, SPEC).collect()
    }
    exp = set()
    grid = np.arange(-12, 13)
    for pid, cx, cy, r, kind in shapes:
        for ix in grid:
            for iy in grid:
                mx = SPEC.x0 + (ix + 0.5) * SPEC.cell_size
                my = SPEC.y0 + (iy + 0.5) * SPEC.cell_size
                dx, dy = abs(mx - cx), abs(my - cy)
                inside = (dx + dy <= r) if kind == "diamond" else (max(dx, dy) <= r)
                if inside:
                    exp.add((pid, int(ix), int(iy)))
    assert got == exp and len(exp) > 10


def test_rasterize_polygons_guards(spark):
    """Degenerate (r < 0) polygons yield an EMPTY cover (not a
    descending sequence), and a bbox cover exceeding extent_cells
    RAISES instead of silently truncating the raster (r2 advisor)."""
    import pytest

    neg = spark.createDataFrame(
        [(0, 0.0, 0.0, -5.0, "box")],
        "poly_id long, cx double, cy double, r double, kind string",
    )
    assert rasterize_polygons(neg, SPEC).count() == 0

    huge = spark.createDataFrame(
        [(1, 0.0, 0.0, 100.0, "box")],
        "poly_id long, cx double, cy double, r double, kind string",
    )
    with pytest.raises(Exception, match="extent_cells"):
        rasterize_polygons(huge, SPEC, extent_cells=4).count()
    # same polygon passes with a sufficient rail
    assert rasterize_polygons(huge, SPEC, extent_cells=64).count() > 0
