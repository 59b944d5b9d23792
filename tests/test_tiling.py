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
