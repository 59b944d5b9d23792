"""Skew handling: point-mass (degenerate hot cell) correctness +
hot-supercell salting + skew tooling."""

from __future__ import annotations

import numpy as np

from rindex_spark.config import EngineConfig, GridSpec
from rindex_spark.grid import infer_grid
from rindex_spark.operators import knn as knn_mod
from rindex_spark.operators.knn import build_knn_graph
from rindex_spark.operators.skew import hot_cells, key_skew_profile

from tests.conftest import brute_knn
from tests.test_knn_oracle import check_graph_vs_oracle, make_points


def test_point_mass_hot_cells_exact(spark, monkeypatch):
    """~3 point masses with tiny jitter: the adaptive grid can't spread
    them, so salting must split the giant groups — and the graph must
    still be exact under massive distance ties."""
    monkeypatch.setattr(knn_mod, "_MAX_GROUP_QUERIES", 256)
    rng = np.random.default_rng(5)
    centers = np.array([(0.0, 0.0), (50.0, 0.0), (0.0, 50.0)])
    c = rng.integers(0, 3, size=1200)
    coords = centers[c] + rng.normal(0, 1e-6, size=(1200, 2))
    pts = make_points(spark, coords).cache()
    k = 5
    graph = build_knn_graph(pts, k)
    oracle = brute_knn(coords, np.arange(len(coords)), k)
    check_graph_vs_oracle(graph.collect(), oracle)


def test_hot_cells_detection(spark):
    rng = np.random.default_rng(1)
    uniform = rng.uniform(-100, 100, size=(2000, 2))
    mass = np.full((3000, 2), 7.0) + rng.normal(0, 0.1, size=(3000, 2))
    pts = make_points(spark, np.concatenate([uniform, mass]))
    spec = GridSpec(cell_size=10.0, x0=-100.0, y0=-100.0)
    hot = hot_cells(pts, spec, EngineConfig(hot_cell_factor=8.0)).collect()
    assert len(hot) >= 1
    # the mass cell (7,7) -> ix=10, iy=10
    assert any(r["ix"] == 10 and r["iy"] == 10 for r in hot)


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [(i, i % 10 if i % 100 else 999) for i in range(1000)], "id long, k long"
    )
    prof = key_skew_profile(df, "k")
    assert prof["n_keys"] == 11
    assert prof["max"] >= prof["p99"] >= prof["mean"]
