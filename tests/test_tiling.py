"""Point-in-polygon tiling: the general ray-casting path must agree
with the closed-form L1-diamond containment on the deterministic tile
set, and assignments must match a numpy oracle."""

from __future__ import annotations

import numpy as np

from rindex_spark.config import GridSpec
from rindex_spark.datagen import coords_for_ids, generate_tiles
from rindex_spark.operators.tiling import assign_tiles, point_in_poly_np

from tests.test_knn_oracle import make_points

SPEC = GridSpec(cell_size=20.0, x0=-100.0, y0=-100.0)
TILE_R = 23.7


def test_raycast_agrees_with_l1_formula(spark):
    tiles = generate_tiles(tile_r=TILE_R)
    rng = np.random.default_rng(3)
    coords = rng.uniform(-100, 100, size=(1500, 2))
    pts = make_points(spark, coords)

    ray = {(r["id"], r["tile_id"]) for r in assign_tiles(pts, tiles, SPEC).collect()}
    l1 = {
        (r["id"], r["tile_id"])
        for r in assign_tiles(pts, tiles, SPEC, inclusive_l1_diamond=TILE_R).collect()
    }
    assert ray == l1


def test_assignments_match_numpy_oracle(spark):
    tiles = generate_tiles(tile_r=TILE_R)
    ids = np.arange(800, dtype=np.uint64)
    x, y = coords_for_ids(ids, "clustered", 9)
    coords = np.column_stack([x, y])
    pts = make_points(spark, coords)
    got = {
        (r["id"], r["tile_id"])
        for r in assign_tiles(pts, tiles, SPEC, inclusive_l1_diamond=TILE_R).collect()
    }
    exp = set()
    for tid, verts in tiles:
        cx = sum(v[0] for v in verts) / 4
        cy = sum(v[1] for v in verts) / 4
        m = np.abs(x - cx) + np.abs(y - cy) <= TILE_R
        for i in np.nonzero(m)[0]:
            exp.add((int(i), tid))
    assert got == exp


def test_fine_grid_cell_map_is_distributed(spark):
    """cell_size 0.5 over the full extent: the (cell, tile) map is
    ~9k cells/tile x 49 tiles (~440k entries) — the r2 driver-side
    double loop would build that list in Python on the driver (a fine
    grid x wide tiles OOMs it); the distributed explode makes this
    cheap, and assignments stay exact."""
    tiles = generate_tiles(tile_r=TILE_R)
    fine = GridSpec(cell_size=0.5, x0=-100.0, y0=-100.0)
    rng = np.random.default_rng(5)
    coords = rng.uniform(-100, 100, size=(500, 2))
    pts = make_points(spark, coords)
    got = {
        (r["id"], r["tile_id"])
        for r in assign_tiles(pts, tiles, fine, inclusive_l1_diamond=TILE_R).collect()
    }
    exp = set()
    for tid, verts in tiles:
        cx = sum(v[0] for v in verts) / 4
        cy = sum(v[1] for v in verts) / 4
        m = np.abs(coords[:, 0] - cx) + np.abs(coords[:, 1] - cy) <= TILE_R
        for i in np.nonzero(m)[0]:
            exp.add((int(i), tid))
    assert got == exp


def test_point_in_poly_nonconvex(spark):
    # ray casting handles arbitrary simple polygons (L-shape)
    verts = np.array([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)], dtype=float)
    xs = np.array([1.0, 3.0, 3.0, 1.0, 5.0])
    ys = np.array([1.0, 1.0, 3.0, 3.0, 5.0])
    inside = point_in_poly_np(xs, ys, verts)
    assert inside.tolist() == [True, True, False, True, False]


def test_tile_pyramid_exact_rollup(spark):
    """Every pyramid level must be the exact rollup of level 0 —
    counts re-aggregate, min/max compose, negative base-cell indices
    roll up with floor semantics (ix >> L, not trunc-toward-zero)."""
    from rindex_spark.operators.tiling import tile_pyramid

    rows = [
        (0, -3.5, -3.5),  # ix=-4: level1 tx=-2, level2 tx=-1
        (1, 3.5, 3.5),
        (2, 3.6, 3.6),
        (3, -0.1, 0.1),   # ix=-1: stays -1 at every level (floor)
    ]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    spec = GridSpec(cell_size=1.0, x0=0.0, y0=0.0)
    out = {
        (r["level"], r["tx"], r["ty"]): (r["n_points"], r["min_x"], r["max_x"])
        for r in tile_pyramid(pts, spec, levels=3).collect()
    }
    assert out[(0, -4, -4)] == (1, -3.5, -3.5)
    assert out[(1, -2, -2)][0] == 1
    assert out[(2, -1, -1)][0] == 1
    assert out[(0, 3, 3)] == (2, 3.5, 3.6)
    assert out[(1, 1, 1)][0] == 2
    assert out[(2, 0, 0)][0] == 2
    assert out[(0, -1, 0)][0] == 1 and out[(2, -1, 0)][0] == 1
    # per-level totals all equal n
    import collections

    totals = collections.Counter()
    for (lvl, _, _), (n, _, _) in out.items():
        totals[lvl] += n
    assert totals == {0: 4, 1: 4, 2: 4}


def test_tile_pyramid_random_vs_numpy_oracle(spark):
    """Random points vs a numpy floor-division rollup at every level,
    including a value-column sum (integer values: bit-exact)."""
    from rindex_spark.operators.tiling import tile_pyramid

    rng = np.random.default_rng(41)
    xy = rng.uniform(-50.0, 50.0, size=(500, 2))
    vals = rng.integers(0, 100, size=500)
    pts = spark.createDataFrame(
        [(i, float(x), float(y), int(v)) for i, ((x, y), v) in enumerate(zip(xy, vals))],
        "id long, x double, y double, v long",
    )
    spec = GridSpec(cell_size=7.0, x0=-50.0, y0=-50.0)
    levels = 4
    got = {
        (r["level"], r["tx"], r["ty"]): (r["n_points"], r["sum_value"])
        for r in tile_pyramid(pts, spec, levels=levels, value_col="v").collect()
    }
    ix = np.floor((xy[:, 0] + 50.0) / 7.0).astype(np.int64)
    iy = np.floor((xy[:, 1] + 50.0) / 7.0).astype(np.int64)
    exp: dict = {}
    for lvl in range(levels):
        tx, ty = ix >> lvl, iy >> lvl
        for t_x, t_y, v in zip(tx, ty, vals):
            key = (lvl, int(t_x), int(t_y))
            n, s = exp.get(key, (0, 0))
            exp[key] = (n + 1, s + int(v))
    assert got == exp


def test_zorder_key_matches_python_and_orders_locally(spark):
    """z_order_key must reproduce the canonical Morton interleave
    (python int oracle, incl. negative indices) and preserve curve
    ordering: cells adjacent in z differ by one curve step."""
    from pyspark.sql import functions as F

    from rindex_spark.grid import z_order_key

    B = 1 << 30

    def spread(v):
        v &= 0x7FFFFFFF
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    cells = [(ix, iy) for ix in range(-4, 5) for iy in range(-4, 5)]
    df = spark.createDataFrame(cells, "ix long, iy long")
    rows = df.select(
        "ix", "iy", z_order_key(F.col("ix"), F.col("iy")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == (spread(r["ix"] + B) | (spread(r["iy"] + B) << 1))
        assert r["z"] >= 0
    # distinct cells -> distinct keys (bijective on the supported range)
    assert len({r["z"] for r in rows}) == len(cells)


def test_cluster_by_zorder_tightens_partition_footprints(spark):
    """After cluster_by_zorder, each output partition's spatial bbox
    must be much tighter than the global extent — the property that
    makes file-level min/max pruning work on a z-laid-out table."""
    from pyspark.sql import functions as F

    from rindex_spark.config import GridSpec
    from rindex_spark.grid import cluster_by_zorder

    rng = np.random.default_rng(59)
    xy = rng.uniform(0.0, 100.0, size=(4000, 2))
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(xy)],
        "id long, x double, y double",
    )
    spec = GridSpec(cell_size=2.0, x0=0.0, y0=0.0)
    out = cluster_by_zorder(pts, spec, n_partitions=8)
    boxes = (
        out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("x") - F.min("x")).alias("wx"),
            (F.max("y") - F.min("y")).alias("wy"),
        )
        .collect()
    )
    assert sum(r["n"] for r in boxes) == 4000  # nothing lost
    areas = [r["wx"] * r["wy"] for r in boxes if r["n"] > 1]
    mean_area = sum(areas) / len(areas)
    # random assignment would give every partition the full 100x100
    # extent; z-clustering must cut the mean footprint sharply
    assert mean_area < 100.0 * 100.0 / 3.0, areas
